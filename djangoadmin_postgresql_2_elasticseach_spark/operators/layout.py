"""Table-layout operators — Z-order clustering for multi-dimensional
data skipping.

Extension operator (the reference has no layout management; this is the
100 TB table-maintenance addition): parquet readers prune files and row
groups by min/max column statistics, but a table sorted by ONE column
only skips on that column. Z-ordering (Morton order — bit-interleaving
the dimensions' rank spaces) makes files cover small HYPER-RECTANGLES
of the key space, so min/max stats stay tight on EVERY interleaved
column at once: a predicate on any subset of the z-columns prunes most
files. This is the published technique behind Delta/Iceberg OPTIMIZE
ZORDER (Morton 1966; the Delta Lake paper, VLDB 2020 §4.2); the
implementation here is engine-native and deterministic.

Mechanics:
1. each dimension is rank-normalized to a fixed ``bits``-wide integer —
   ranks (via ntile-style bucketing over a sorted window on distinct
   values) rather than raw values, so skewed/unbounded domains spread
   evenly across the grid (the same reason Delta z-orders range-ids,
   not raw bytes);
2. the per-dimension words are bit-INTERLEAVED into one Morton key
   (dimension d contributes bit i of its word to position
   ``i * n_dims + d``);
3. ``repartitionByRange(z_key)`` + in-partition sort writes files that
   tile the space.

Scale shape: one window over DISTINCT values per dimension (bounded by
the distinct count, not the row count), one broadcast-joinable rank map
per dimension when distincts are small, else a range-bucketed
percent_rank; the interleave itself is a pure column expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morton_interleave(cols: list, bits: int = 8):
    """Column expression: interleave ``bits`` low bits of each integer
    column into one Morton key (column i owns bit-lane i). Pure integer
    arithmetic — identical in any engine (oracle-mirrorable)."""
    n = len(cols)
    if not cols:
        raise ValueError("morton_interleave needs at least one column")
    if bits * n > 62:
        raise ValueError(f"{bits} bits × {n} dims overflows a signed long")
    key = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        w = F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
        for i in range(bits):
            key = key + (
                F.shiftright(w, i).bitwiseAND(F.lit(1))
                * F.lit(1 << (i * n + d))
            ).cast("long")
    return key


def _distinct_rank_map(df: DataFrame, c: str, bits: int) -> DataFrame:
    """(value, quantized percent_rank) map for one dimension, computed
    WITHOUT a global single-partition window. A plain
    ``percent_rank().over(Window.orderBy(c))`` sorts every distinct
    value in ONE task — fine for enum-ish columns, a straggler when a
    dimension has 10^9 distincts. Instead the global rank is assembled
    in two passes (the ``pack_sequences`` prefix-sum trick applied to
    value-ordered ranges):

    1. distincts are ``repartitionByRange`` on the value (ascending,
       NULLS FIRST — the same order the window used), then eagerly
       localCheckpoint'ed so the sampled range boundaries / partition
       ids are IDENTICAL for both downstream passes (range boundary
       sampling re-runs per action otherwise);
    2. ``row_number`` partitioned by partition id gives the local rank
       (each task sorts only its own range slice); per-partition counts
       (≤ shuffle-partitions rows) get a single tiny prefix-sum frame
       whose offsets broadcast-join back.

    global rank = offset + local rank, and percent_rank =
    (rank−1)/(n−1) in double — the exact IEEE expression Spark's and
    DuckDB's ``percent_rank`` evaluate, so the quantized bucket is
    oracle-identical. Checkpoint blocks (one row per distinct value)
    live for the frame's lifetime and are reclaimed by the context
    cleaner when the query's references drop.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        df.select(c)
        .distinct()
        .repartitionByRange(n_part, F.col(c).asc_nulls_first())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # tiny frame: ≤ n_part rows, so the single-partition prefix window
    # is deliberate and cheap
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    base = (
        d.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "_pid",
            F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
            F.sum("_n").over(w_tot).alias("_total"),
        )
    )
    w_local = Window.partitionBy("_pid").orderBy(F.col(c).asc_nulls_first())
    pr = F.when(
        F.col("_total") > 1,
        (F.col("_off") + F.col("_lr") - 1).cast("double")
        / (F.col("_total") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        d.withColumn("_lr", F.row_number().over(w_local))
        .join(F.broadcast(base), "_pid")
        .select(
            c,
            F.least(
                F.floor(pr * (1 << bits)), F.lit((1 << bits) - 1)
            )
            .cast("long")
            .alias(f"_zr_{c}"),
        )
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> DataFrame:
    """Append a ``z_key`` column: Morton interleave of the RANK space of
    each dimension (rank = percent_rank over the column's distinct
    values, quantized to ``bits`` bits — skew-proof normalization).

    The rank maps are per-dimension DISTINCT aggregates (built by the
    range-bucketed two-pass in ``_distinct_rank_map`` — no global
    window) joined back by equality; Catalyst broadcasts them while
    they are small and falls back to a shuffle join when a dimension is
    high-cardinality — both correct, no task ever sorts more than its
    own range slice.
    """
    out = df
    rank_cols = []
    for c in cols:
        out = out.join(_distinct_rank_map(df, c, bits), c, "left")
        rank_cols.append(f"_zr_{c}")
    out = out.withColumn(
        "z_key",
        morton_interleave([F.coalesce(F.col(rc), F.lit(0)) for rc in rank_cols], bits),
    )
    return out.drop(*rank_cols)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int | None = None,
) -> None:
    """OPTIMIZE ZORDER: cluster ``df`` by the Morton key of ``cols`` and
    write parquet whose per-file min/max stats are tight on every
    z-column — multi-column data skipping from a plain parquet table."""
    keyed = zorder_key(df, cols, bits)
    part = keyed.repartitionByRange(
        *([n_files, "z_key"] if n_files else ["z_key"])
    ).sortWithinPartitions("z_key")
    part.drop("z_key").write.mode("overwrite").parquet(path)


def compaction_plan(
    weights: DataFrame,
    id_cols: list[str],
    weight_col: str,
    target: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Small-item compaction planner: assign each item (a file, a
    partition, a shard) to a compaction ``bin`` so consecutive bins fill
    to ~``target`` weight (bytes, rows, tokens). This is the planning
    half of OPTIMIZE/bin-packing table maintenance — at 100 TB the
    killer is millions of kilobyte files written by many incremental
    ticks; readers then pay per-file open cost and the NameNode/listing
    pays per-object cost. Compaction rewrites each bin as one file.

    Items with ``weight >= target`` are already healthy — they keep
    ``action='keep'`` and a NULL bin (rewriting them buys nothing and
    costs a full copy; the same rule Delta's OPTIMIZE applies).

    Deterministic sorted-fill: items are ordered by md5 of the id (a
    content-independent deterministic shuffle — mixes small and large
    items so bins fill evenly regardless of how sizes correlate with
    names), the running weight before each item is computed, and
    ``bin = cum_before div target``. Bins may overshoot by at most one
    item — the standard next-fit guarantee (≥ half full, ≤ target +
    max_item).

    Scale shape: NO global window. The cumulative sum uses the
    ``pack_sequences`` two-pass — hex-prefix buckets of the md5 order
    key get partitioned windows, per-bucket totals (≤ ``n_buckets``
    rows) get one tiny prefix frame that broadcast-joins back. The
    inventory never leaves the executors.
    """
    from pyspark.sql import Window

    n_hex = max(1, min(8, (n_buckets - 1).bit_length() // 4 or 1))
    key = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_cols]))
    small = weights.filter(F.col(weight_col) < target).select(
        *id_cols,
        F.col(weight_col).cast("long").alias("_w"),
        key.alias("_ord"),
        F.conv(F.substring(key, 1, n_hex), 16, 10).cast("long").alias("_bucket"),
    )
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy("_ord", *id_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = small.select(
        *id_cols,
        "_w",
        "_bucket",
        F.coalesce(F.sum("_w").over(w_in), F.lit(0)).alias("_cum_in"),
    )
    # ≤ n_buckets rows: single-partition prefix frame is deliberate
    w_b = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    base = (
        small.groupBy("_bucket")
        .agg(F.sum("_w").alias("_bw"))
        .select(
            "_bucket",
            F.coalesce(F.sum("_bw").over(w_b), F.lit(0)).alias("_base"),
        )
    )
    binned = within.join(F.broadcast(base), "_bucket").select(
        *id_cols,
        F.col("_w").alias(weight_col),
        F.expr(f"(_base + _cum_in) div {int(target)}").alias("bin"),
        F.lit("compact").alias("action"),
    )
    big = weights.filter(F.col(weight_col) >= target).select(
        *id_cols,
        F.col(weight_col).cast("long").alias(weight_col),
        F.lit(None).cast("long").alias("bin"),
        F.lit("keep").alias("action"),
    )
    return binned.unionByName(big)


def plan_file_compaction(
    spark, path: str, target_bytes: int
) -> DataFrame:
    """File-level compaction plan for a parquet directory: inventory
    (file, bytes) from footers and bin-pack with ``compaction_plan``.
    The listing here is driver-side (matching Spark's own file-index
    behavior in local mode); on a real lake the inventory comes from
    the table format's manifest as a DataFrame and feeds
    ``compaction_plan`` directly without any driver listing."""
    import os

    rows = [
        (f, os.path.getsize(os.path.join(path, f)))
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]
    inv = spark.createDataFrame(rows, "file string, bytes long")
    return compaction_plan(inv, ["file"], "bytes", target_bytes)


def file_skipping_stats(
    spark, path: str, col: str, lo, hi
) -> dict[str, int]:
    """Measure the pruning a layout gives a range predicate: how many
    parquet files COULD be skipped by (min, max) footer stats alone.
    Used by tests to pin that z-ordering actually tightens per-file
    ranges on every z-column (the observable contract of the layout)."""
    import pyarrow.parquet as pq
    import os

    total = skippable = 0
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        total += 1
        if fmin is not None and (fmax < lo or fmin > hi):
            skippable += 1
    return {"files": total, "skippable": skippable}


def zorder_maintain(
    spark,
    path: str,
    cols: list[str],
    target_bytes: int,
    bits: int = 8,
) -> dict[str, int]:
    """OPTIMIZE pass over a parquet directory: bin-pack the small files
    (``compaction_plan``) and rewrite each bin as ONE z-ordered file;
    files already ≥ target are left in place untouched. The combined
    table-maintenance step an incremental pipeline runs periodically —
    compaction kills the per-file open/listing cost, z-ordering restores
    multi-column skipping that appends eroded.

    Only binned files are ever read or written — O(small-file bytes),
    not table size. New files land under the same directory with a
    run-unique ``zc-<run>-<bin>`` name before the old small files are
    deleted — unique names mean a repeat run whose plan picks up a
    prior run's still-small ``zc-*`` output can never overwrite an
    unread input or have the cleanup loop delete a freshly written bin
    (the planned-delete set is checked disjoint from the new output
    names — a hard error, not an assert). Concurrent maintenance runs
    on the same path remain unsupported (each run's cleanup can delete
    small files the other's plan selected as inputs); tx_compact on a
    TxLog table is the concurrent-safe path.
    Each bin's INPUTS are deleted immediately after its os.replace
    (ADVICE r9: a deferred all-bins cleanup pass meant a crash mid-loop
    duplicated EVERY bin already replaced) — so a crash duplicates at
    most the one bin whose replace landed but whose deletes did not,
    and bins written before the crash are fully consistent; a re-run
    simply resumes on the remaining small files. Closing even the
    one-bin window needs an atomic manifest commit — see tx_compact;
    documented trade here.
    Returns {files_before, files_after, bins_written}.
    """
    import os
    import shutil
    import uuid

    plan = plan_file_compaction(spark, path, target_bytes).collect()
    binned = [r for r in plan if r["action"] == "compact"]
    before = len(plan)
    if not binned:
        return {"files_before": before, "files_after": before,
                "bins_written": 0}
    bins: dict[int, list[str]] = {}
    for r in binned:
        bins.setdefault(int(r["bin"]), []).append(r["file"])
    run_id = uuid.uuid4().hex[:12]
    delete_set = {f for files in bins.values() for f in files}
    # staging dir is run-unique too: a fixed name would let two
    # CONCURRENT maintenance runs clobber each other's staged bin
    # (mode=overwrite) and delete files the other planned to read
    tmp = os.path.join(path, f"_zc_tmp_{run_id}")
    try:
        for b, files in sorted(bins.items()):
            out_name = f"zc-{run_id}-{b}.parquet"
            if out_name in delete_set:  # not assert: must survive python -O
                raise RuntimeError(
                    f"compaction output {out_name} collides with a "
                    "planned-delete input; refusing to overwrite"
                )
            df = spark.read.parquet(*[os.path.join(path, f) for f in files])
            keyed = zorder_key(df, cols, bits)
            (
                keyed.repartition(1)
                .sortWithinPartitions("z_key")
                .drop("z_key")
                .write.mode("overwrite")
                .parquet(tmp)
            )
            part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
            os.replace(
                os.path.join(tmp, part), os.path.join(path, out_name)
            )
            # retire this bin's inputs NOW — the duplicate window is
            # one bin wide, not run wide (docstring crash contract)
            for f in files:
                os.remove(os.path.join(path, f))
    finally:
        # ALWAYS reclaim the run-unique staging dir: with the fixed
        # '_zc_tmp' name a crashed run's leftovers were overwritten by
        # the next run; unique names would otherwise leak one orphaned
        # directory per crash under periodic maintenance
        shutil.rmtree(tmp, ignore_errors=True)
    after = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    return {
        "files_before": before,
        "files_after": after,
        "bins_written": len(bins),
    }
