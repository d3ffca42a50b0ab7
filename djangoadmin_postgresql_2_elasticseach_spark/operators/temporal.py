"""Temporal join operators — as-of join and range (interval) join.

The reference engine has neither (its ETL is pure equi-join relational —
SURVEY §2.3); these are the two temporal shapes every event-analytics
engine needs, built as compositions of native DataFrame ops per the
"custom operators" doctrine: express the semantics with existing
operators if possible, never a Python loop.

- ``asof_join``: each left row is enriched with the LATEST right row at
  or before its timestamp (per key) — the union-merge realization: tag
  both sides, sort within a single key-partitioned window, propagate the
  last seen right value forward. ONE shuffle on the key; no inequality
  join, no per-row probe. At 100 TB this is the same cost class as
  sessionization (user_sessions).
- ``range_join``: match points to intervals via TIME BUCKETIZATION:
  intervals explode to the fixed-width buckets they cover, points map to
  their single bucket, and the match is a plain equi-join on
  (key, bucket) + an exact bound filter. The naive formulation is an
  inequality join (BroadcastNestedLoop — quadratic); the bucketed form
  is an equi-join whose fan-out is interval_len/bucket_width, the
  standard scale shape (used by every production range-join engine).

Both are oracle-checked in registry.py — asof against DuckDB's native
ASOF JOIN (an independent implementation of the same semantics), range
against the plain inequality join the bucketed plan must reproduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Enrich each left row with `value_cols` (+ the timestamp) of the
    latest right row whose ts ≤ the left row's ts, per `key_col`
    (inclusive match — a right row AT the left timestamp wins).

    Right side must be unique per (key, ts) — pre-aggregate ties before
    calling (the registry query keeps max-event_id per tie) so the
    match is deterministic.

    Plan: union the tagged sides, one window partitioned by key ordered
    by (ts, side) — right rows sort before left rows at equal ts so the
    inclusive bound holds — with ``last(..., ignorenulls)`` propagating
    the right row's (ts, values) packed in ONE struct, so every output
    column comes from the SAME right row even when a value column is
    NULL (per-column propagation would skip a NULL value and pair it
    with an older row's value). Filter back to left rows. Single
    shuffle on the key, linear in |left| + |right|.
    """
    from pyspark.sql import Window

    lcols = left.columns
    rtypes = dict(right.dtypes)
    payload_type = (
        "struct<"
        + ",".join(
            f"`{c}`:{rtypes[c]}" for c in [ts_col, *value_cols]
        )
        + ">"
    )
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_asof_payload"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (key_col, ts_col) else F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
        ],
        F.lit(0).alias("_side"),
        F.struct(F.col(ts_col), *[F.col(v) for v in value_cols]).alias(
            "_asof_payload"
        ),
    )
    merged = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        *lcols,
        "_side",
        F.last(F.col("_asof_payload"), ignorenulls=True).over(w).alias("_p"),
    )
    return filled.filter(F.col("_side") == 1).select(
        *lcols,
        F.col("_p")[ts_col].alias(f"{prefix}{ts_col}"),
        *[F.col("_p")[v].alias(f"{prefix}{v}") for v in value_cols],
    )


def _bucket_of(ts: Column, bucket_minutes: int) -> Column:
    """Fixed-width time bucket index (exact integer FLOOR division —
    engine-exact, no timezone arithmetic).

    ``(a / b).cast("long")`` truncates toward zero, so pre-1970
    (negative-µs) timestamps one tick below a boundary would round UP
    into the wrong bucket and range_join could miss matches (ADVICE r2).
    ``(a - pmod(a, b)) / b`` is a floor for both signs; the division
    runs in DECIMAL (ADVICE r4: the former double leg was exact only
    while |µs| < 2^53 ≈ year 2255). The numerator is an exact multiple
    of b, so the decimal quotient is integral and the final cast is
    exact over the entire long range — no float anywhere, still
    codegen-side.
    """
    us = F.unix_micros(ts)
    b = F.lit(bucket_minutes * 60 * 1_000_000)
    # subtraction in decimal too: a long-typed `us - pmod` would
    # ANSI-overflow within half a bucket of Long.MIN
    num = us.cast("decimal(38,0)") - F.pmod(us, b)
    return (num / b).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket_minutes: int = 30,
) -> DataFrame:
    """All (interval, point) matches where the point's ts lies in the
    interval's [start, end] (inclusive) and the keys are equal.

    Bucketized equi-join: an interval explodes to the bucket indices it
    covers (⌈len/bucket⌉+1 rows), a point maps to its single bucket, the
    join runs on (key, bucket), and the exact bounds filter afterwards.
    Each (interval, bucket) pair is distinct and a point has one bucket,
    so matches are emitted exactly once — no post-join dedup. Size
    ``bucket_minutes`` near the typical interval length: fan-out stays
    ≈2 while each bucket's population stays bounded.

    Output: all interval columns + all point columns.
    """
    b_start = _bucket_of(F.col(start_col), bucket_minutes)
    b_end = _bucket_of(F.col(end_col), bucket_minutes)
    # string aliases (not DataFrame[col] refs): both sides commonly
    # derive from the same source table, and lineage-ambiguous column
    # refs degrade to trivially-true predicates on a self-join
    iv = intervals.select(
        *intervals.columns,
        F.explode(F.sequence(b_start, b_end)).alias("_bucket"),
    ).alias("_iv")
    pt = points.select(
        *points.columns, _bucket_of(F.col(ts_col), bucket_minutes).alias("_bucket")
    ).alias("_pt")
    joined = iv.join(
        pt,
        (F.col(f"_iv.{key_col}") == F.col(f"_pt.{key_col}"))
        & (F.col("_iv._bucket") == F.col("_pt._bucket")),
    )
    matched = joined.filter(
        (F.col(f"_pt.{ts_col}") >= F.col(f"_iv.{start_col}"))
        & (F.col(f"_pt.{ts_col}") <= F.col(f"_iv.{end_col}"))
    )
    keep = [F.col(f"_iv.{c}") for c in intervals.columns] + [
        F.col(f"_pt.{c}") for c in points.columns if c != key_col
    ]
    return matched.select(*keep)


def resample_ffill(
    events: DataFrame,
    unit: str = "day",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Resample an irregular event stream to a regular per-key time grid
    with forward-fill — the gap-fill shape every time-series consumer
    (feature stores, monitoring rollups) needs and plain SQL lacks.

    Per key: truncate timestamps to `unit` ('day'/'hour'/'minute'),
    keep the LAST observed value in each occupied bucket (latest ts,
    ties broken by the highest `tiebreak_col` — deterministic), build
    the full [min_bucket, max_bucket] grid with `sequence`, and
    forward-fill values across the gaps. `is_gap` marks filled rows.

    Scale shape: ONE shuffle on the key drives the bucket aggregation,
    the per-key min/max, and the ordered fill window (AQE coalesces the
    reused exchange). The grid explode is bounded by each key's own
    span/unit — never |keys| × global-span — and the fill window is
    per-key ordered, not global. Same cost class as sessionization.

    Output: (key_col, bucket_ts, value_col, is_gap) — one row per key
    per grid bucket.

    PRECONDITION: `ts_col` and `value_col` non-null (the driver events
    table guarantees both). A NULL observed value would mark its bucket
    `is_gap` and fill from the previous bucket — scrub NULLs first if
    they must be distinguished from gaps.
    """
    picked = (
        events.select(key_col, ts_col, value_col, tiebreak_col)
        .withColumn("_bucket_ts", F.date_trunc(unit, F.col(ts_col)))
        .groupBy(key_col, "_bucket_ts")
        .agg(
            F.max(
                F.struct(
                    F.col(ts_col), F.col(tiebreak_col), F.col(value_col)
                )
            )[value_col].alias("_observed")
        )
    )
    grid = (
        picked.groupBy(key_col)
        .agg(
            F.min("_bucket_ts").alias("_mn"), F.max("_bucket_ts").alias("_mx")
        )
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("_mn"), F.col("_mx"), F.expr(f"INTERVAL 1 {unit}")
                )
            ).alias("bucket_ts"),
        )
    )
    joined = grid.join(
        picked.withColumnRenamed("_bucket_ts", "bucket_ts"),
        [key_col, "bucket_ts"],
        "left",
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        F.col("bucket_ts"),
        F.last("_observed", ignorenulls=True).over(w).alias(value_col),
        F.col("_observed").isNull().alias("is_gap"),
    )
