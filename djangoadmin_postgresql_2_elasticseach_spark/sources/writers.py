"""Sinks: overwrite refresh, idempotent append, and partitioned layout.

Maps the reference's write paths to Spark:

- destructive refresh ``TRUNCATE ... CASCADE`` then reload (reference
  ``load_data.py:51``) → ``mode("overwrite")``.
- idempotent row insert ``ON CONFLICT (id) DO NOTHING`` (reference
  ``postgres_saver_file.py:17-38``) → stage + ``dropDuplicates([key])``
  anti-join against the existing target, then append. (With a
  transactional table format this is MERGE WHEN NOT MATCHED; plain
  parquet gets the same effect via anti-join.)

Scale note: ``write_partitioned`` lays fact tables out by a low-cardinality
time-derived column so the incremental `modified > ckpt` scan prunes whole
partitions — the Spark replacement for the reference's btree index on
``modified``-adjacent columns (reference ``movies_database.ddl:47``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import free_local_checkpoint


def _layout_changed(session) -> None:
    # a write that changes file layout invalidates memoized
    # under-partitioned verdicts (plans/tuning.py ADVICE-r2 hardening)
    from ..plans.tuning import invalidate_spread_cache

    invalidate_spread_cache(session)


def overwrite(df: DataFrame, path: str) -> None:
    """Full destructive refresh (reference load_data.py:51 TRUNCATE+reload)."""
    df.write.mode("overwrite").parquet(path)
    _layout_changed(df.sparkSession)


def append_if_absent(
    spark: SparkSession, df: DataFrame, path: str, key: str = "id"
) -> int:
    """Idempotent append: insert rows whose `key` is not already in the
    target (reference postgres_saver_file.py:23 ON CONFLICT DO NOTHING).

    Returns the number of rows appended. The anti-join broadcasts the
    incoming (small) batch when possible; for large backfills the join is
    a shuffle on `key`, which is unavoidable for exactly-once-by-key
    semantics without a transactional format.
    """
    fresh = df.dropDuplicates([key])
    if os.path.exists(path):
        existing = spark.read.parquet(path).select(key)
        fresh = fresh.join(existing, on=key, how="left_anti")
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(path)
        _layout_changed(spark)
    return n


def write_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "modified",
    granularity: str = "month",
    mode: str = "overwrite",
) -> None:
    """Write with a time-derived partition column for partition pruning.

    ``granularity`` ∈ {date, month}. The incremental scan's
    ``modified > ckpt`` predicate then skips whole directories.
    """
    fmt = "yyyy-MM-dd" if granularity == "date" else "yyyy-MM"
    part = F.date_format(F.col(ts_col), fmt).alias("p_bucket")
    df.withColumn("p_bucket", part).write.mode(mode).partitionBy(
        "p_bucket"
    ).parquet(path)
    _layout_changed(df.sparkSession)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write — the co-located-join layout.

    Both sides of a recurring equi-join written with the SAME
    (bucket_col, n_buckets) join WITHOUT a shuffle: each task zips
    matching bucket files (pinned by tests/test_plans.py — zero Exchange
    in the joined plan). At 100 TB this is the difference between
    re-shuffling the fact table on every join and never shuffling it;
    size n_buckets so one bucket of the largest table fits an executor
    core (e.g. 100 TB / 2^15 buckets ≈ 3 GB).

    Spark bucketing requires the table catalog (saveAsTable), not bare
    paths — callers use spark.table(name) to read back.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_col: str | None = None,
) -> tuple[int, int]:
    """Compact a small-files parquet directory into ~``target_file_mb``
    files — the maintenance pass every streaming/incremental sink needs:
    micro-batch appends accumulate files far below the row-group size
    the scan planner wants, and at 100 TB the file-listing + footer
    reads dominate query startup long before data volume does.

    File count is sized from the directory's actual bytes (not row
    counts — compression ratio varies per table). The rewrite is atomic
    per call: written to a sibling temp dir, then swapped in via two
    renames (the window where neither dir exists is the same one
    ``mode("overwrite")`` has; a transactional table format removes it).
    A leftover ``._compact_old`` / ``._compact_tmp`` from a crashed
    prior call is recovered at entry (old restored if the swap died
    mid-rename, garbage removed otherwise) so compaction is re-runnable.
    Passing ``partition_col`` preserves a partitioned layout (each
    partition compacts independently — pruning contracts keep holding);
    partition VALUES round-trip verbatim — partition-column type
    inference is disabled for the rewrite, otherwise numeric-looking
    string values ('0101', '007') would be silently rewritten as
    integers (101, 7) with a changed column type.

    Returns (files_before, files_after).
    """
    import shutil

    def _parquet_files(root: str) -> list[str]:
        out = []
        for dirpath, _dirs, files in os.walk(root):
            out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
        return out

    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)  # prior call crashed after swap-in
        else:
            os.rename(old, path)  # prior call crashed mid-swap: restore
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    before = _parquet_files(path)
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    _INFER = "spark.sql.sources.partitionColumnTypeInference.enabled"
    infer_prev = spark.conf.get(_INFER)
    spark.conf.set(_INFER, "false")
    try:
        df = spark.read.parquet(path)
        writer = df.repartition(n_files).write.mode("overwrite")
        if partition_col:
            writer = df.repartition(n_files, partition_col).write.mode(
                "overwrite"
            ).partitionBy(partition_col)
        writer.parquet(tmp)
    finally:
        spark.conf.set(_INFER, infer_prev)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    _layout_changed(spark)
    return len(before), len(_parquet_files(path))

def upsert_by_key(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key: str = "id",
    version_col: str = "modified",
    n_buckets: int = 64,
) -> int:
    """Keyed upsert (MERGE: latest version wins) on plain parquet — the
    parquet-side equivalent of the reference ETL's by-`_id` document
    upsert into ES (reference etl/main.py:163-169: re-indexing a doc id
    replaces the old doc).

    Layout: the table is partitioned by ``p_bucket = hash(key) mod
    n_buckets``. An upsert batch then touches ONLY the buckets its keys
    hash into: read those partitions back (partition-pruned), merge, and
    rewrite just them via dynamic partition overwrite — copy-on-write at
    bucket granularity, the same cost model transactional table formats
    use, without a table format. Size n_buckets so one bucket is a
    comfortable rewrite unit (e.g. 100 TB / 2^15 buckets ≈ 3 GB).

    Merge semantics: per key keep the row with the highest
    ``version_col``; an incoming row beats an existing row at the SAME
    version (re-delivery wins — idempotent retries). Resolution is ONE
    aggregation via the lexicographic struct-max (version, is_incoming,
    remaining columns) — deterministic even for full duplicates, no
    window, no per-key state. Returns the number of incoming rows
    absorbed.

    Bucket count AND key type are part of the table layout: a
    ``_layout`` JSON marker (underscore-prefixed — invisible to Spark's
    file index) is committed BEFORE the first data write and CHECKED on
    every upsert. Upserting with a different n_buckets would silently
    read the wrong partitions; so would the same logical key arriving
    with a different integral type (``xxhash64`` is type-sensitive:
    hash(5L) ≠ hash(5 as int)) — both raise instead of duplicating
    keys. Marker-first ordering means a crash between marker and first
    write leaves a marker-only dir, which the next upsert treats as an
    empty table under the SAME pinned layout — never an unguarded one.
    """
    import json

    from .state import atomic_write_text

    key_type = dict(batch.dtypes)[key]
    layout = {"n_buckets": n_buckets, "key_type": key_type}
    marker = os.path.join(path, "_layout")
    if os.path.exists(marker):
        with open(marker, "r", encoding="utf-8") as f:
            stored = json.load(f)
        if stored != layout:
            raise ValueError(
                f"{path} layout is {stored}; upsert called with "
                f"{layout} — rebucket/cast instead"
            )
    data_cols = [c for c in batch.columns if c not in (key, version_col)]
    bucket = lambda df: F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))  # noqa: E731

    def pack(df: DataFrame, src: int) -> DataFrame:
        return df.select(
            F.col(key),
            bucket(df).alias("p_bucket"),
            F.struct(
                F.col(version_col), F.lit(src).alias("_src"),
                *[F.col(c) for c in data_cols],
            ).alias("_packed"),
        )

    # materialize the packed batch ONCE — count, the distinct-bucket
    # collect, and the merge otherwise re-execute the (possibly
    # expensive) upstream lineage three times
    incoming = pack(batch, 1).localCheckpoint(eager=True)
    resolved = None
    try:
        n_in = incoming.count()
        if n_in == 0:
            return 0
        # commit the layout BEFORE the first data write (see docstring)
        if not os.path.exists(marker):
            os.makedirs(path, exist_ok=True)
            atomic_write_text(marker, json.dumps(layout))
        merged = incoming
        has_data = any(f.startswith("p_bucket=") for f in os.listdir(path))
        if has_data:
            buckets = [
                r["p_bucket"]
                for r in incoming.select("p_bucket").distinct().collect()
            ]
            existing = spark.read.parquet(path).filter(
                F.col("p_bucket").isin(buckets)
            )
            merged = incoming.unionByName(pack(existing.drop("p_bucket"), 0))
        resolved = (
            merged.groupBy(key, "p_bucket")
            .agg(F.max("_packed").alias("_w"))
            .select(
                F.col(key),
                F.col("p_bucket"),
                *[F.col(f"_w.{c}") for c in [version_col] + data_cols],
            )
        )
        # source and destination share partitions: materialize before replace
        resolved = resolved.localCheckpoint(eager=True)
        (
            resolved.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("p_bucket")
            .parquet(path)
        )
        _layout_changed(spark)
        return n_in
    finally:
        # both checkpoints are dead once the rewrite lands — free their
        # block-manager storage (a long-lived upserting driver otherwise
        # accumulates one batch-copy per call)
        free_local_checkpoint(incoming)
        if resolved is not None:
            free_local_checkpoint(resolved)
