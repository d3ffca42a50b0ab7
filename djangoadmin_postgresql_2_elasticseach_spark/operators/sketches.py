"""Mergeable cardinality sketches — HyperLogLog with a DETERMINISTIC,
engine-portable hash, so the estimate is bit-identical in any engine
that has md5 (exact DuckDB oracle, unlike approx_count_distinct whose
HLL++ registers are Spark-internal).

Extension operator (the reference has no sketches; this is the
training-pipeline/analytics addition): at 100 TB, exact COUNT(DISTINCT)
is a full shuffle of every distinct value; the skew-safe exact form
(relational.skew_safe_distinct) is two shuffles. An HLL register table
is O(groups × m) REGARDLESS of cardinality, and registers merge by MAX
— so they compose with incremental rollups (streaming/incremental.py):
store per-partition register rows, merge on read, never rescan history.
That merge-by-max property is the entire reason sketches beat exact
distinct at scale; Flajolet et al. 2007 ("HyperLogLog: the analysis of
a near-optimal cardinality estimation algorithm") is the published
basis, including the bias constant alpha_m and the linear-counting
small-range correction.

Determinism contract (mirrored in the oracle SQL):
- h1 = first 8 md5 hex chars of CAST(value AS STRING)  → register index
  ``h1 % m``;
- h2 = next 8 hex chars (+1 so it is never zero)       → rho =
  33 - length(bin(w)) — the MSB position of a 32-bit word computed in
  EXACT INTEGER arithmetic (binary-string length), never via log2:
  engines disagree on log2 at the ulp level (JVM log(x)/log(2) vs libm
  log2) and a 1-ulp slip under floor() flips the register. The
  register SUM of 2^-rho is also exact: each term is a dyadic rational
  with ≤33 fractional bits and ≤2^p terms, so every partial sum fits a
  53-bit mantissa — summation order (distributed vs sequential) cannot
  change it. The only cross-engine float op left is ln() in the
  linear-counting branch (same 1-ulp risk class as the BM25 oracles,
  which hold).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    """Bias-correction constant (Flajolet et al. 2007, fig. 3)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """Per-group HLL register table: (group..., idx, rho) with
    rho = MAX over values hashing to that register.

    This is the MERGEABLE partial: registers from disjoint data slices
    (days, partitions, streams) union + groupBy-max into the registers
    of the union — store these in an incremental rollup and distinct
    counts become re-aggregable without rescanning history.

    Shape: one projection (hashing is codegen-side) + one groupBy on
    (group, idx) — at most groups × 2^p output rows, map-side combined.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p={p} out of the supported 4..16 range")
    m = 1 << p
    group_cols = group_cols or []
    s = F.col(value_col).cast("string")
    h1 = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    w = F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("long") + 1
    # MSB position by binary-string length — exact integers, no log2
    rho = (F.lit(33) - F.length(F.bin(w))).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            (h1 % m).cast("int").alias("idx"),
            rho.alias("_rho"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("_rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """Cardinality estimate from a register table (raw HLL estimator +
    the linear-counting small-range correction; 64-bit hash space needs
    no large-range correction at these cardinalities).

    The estimate is rounded to a BIGINT — the downstream-stable form —
    and computed with the same float operations in the oracle, so
    values hash-match exactly.
    """
    m = 1 << p
    group_cols = group_cols or []
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        # coalesce: a global (ungrouped) estimate over an EMPTY register
        # table must read as zero registers set, not NULL-poison the
        # whole expression
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("rho"))), F.lit(0.0)
        ).alias("_z"),
        F.count(F.lit(1)).alias("_nz"),
    )
    # registers absent from the table are zero registers: 2^-0 each
    z = F.col("_z") + (F.lit(m) - F.col("_nz"))
    raw = F.lit(alpha * m * m) / z
    zeros = F.lit(m) - F.col("_nz")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), linear
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("approx_distinct")
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """One-shot grouped approximate distinct: registers + estimate."""
    return hll_estimate(
        hll_registers(df, value_col, group_cols, p), group_cols, p
    )


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge two register tables (disjoint or overlapping data — HLL
    registers are idempotent max-merge, so double-counted slices cannot
    inflate the estimate)."""
    group_cols = group_cols or []
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_error_bound(p: int = 12) -> float:
    """Theoretical relative standard error 1.04/sqrt(m)."""
    return 1.04 / math.sqrt(1 << p)


# --- KMV / theta sketch -------------------------------------------------
#
# Bottom-k ("k minimum values") distinct sketch — Beyer et al. 2007
# (SIGMOD, "On synopses for distinct-value estimation under multiset
# operations") and the Apache DataSketches theta family. Where HLL only
# merges by UNION, a KMV sketch supports set INTERSECTION (and through
# it Jaccard): keep the k smallest hash values; θ = the k-th smallest
# normalized hash; any derived set's cardinality ≈ (matching sketch
# entries) / θ. That makes "distinct users who did BOTH X and Y"
# computable from two per-segment sketches without ever co-shuffling
# the raw value sets — the 100 TB win.
#
# Determinism contract (mirrored in oracle SQL): the hash is the first
# 15 md5 hex chars as a 60-bit integer (15, not 16 — a 64-bit value
# overflows a SIGNED long in one engine and wraps in the other);
# normalization divides by 2^60 in double (identical IEEE rounding both
# engines); ties are impossible at the distinct-hash level because the
# sketch stores the hash itself.

_KMV_SPACE = float(1 << 60)


def _kmv_hash(value_col: str):
    s = F.col(value_col).cast("string")
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Per-group bottom-k sketch table: (group..., h) — the k smallest
    distinct 60-bit hashes of the value.

    Shape: distinct on (group, hash) — one map-side-combined shuffle —
    then rank-filter. The ``row_number() <= k`` compiles to
    WindowGroupLimit (pinned for the ANN operators in test_plans), so
    each task retains only k rows per group BEFORE the final exchange:
    per-group state is O(k) everywhere, never the distinct count.
    """
    from pyspark.sql import Window

    group_cols = group_cols or []
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, _kmv_hash(value_col).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Distinct estimate from a bottom-k sketch: exact sketch size when
    the group never filled its sketch (< k distincts — the estimate is
    then EXACT by construction), else (k-1)/θ with θ = the k-th
    smallest normalized hash (Beyer et al. 2007, unbiased form)."""
    group_cols = group_cols or []
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_nz"), F.max("h").alias("_kth")
    )
    est = F.when(F.col("_nz") < k, F.col("_nz").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("_kth").cast("double") / F.lit(_KMV_SPACE))
    )
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("approx_distinct")
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None, k: int = 256
) -> DataFrame:
    """Union-merge two sketch tables: k smallest of the union. Like HLL
    max-merge this is idempotent — overlapping slices cannot inflate."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        a.unionByName(b)
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_intersect_estimate(
    a: DataFrame, b: DataFrame, k: int = 256
) -> DataFrame:
    """|A ∩ B| from two UNGROUPED sketch tables (columns: h).

    θ = min(θ_A, θ_B) where a sketch that never filled contributes
    θ = 1 (it is its whole set). Entries below θ present in BOTH
    sketches form a uniform sample of the intersection at rate θ, so
    the estimate is matches/θ (Beyer et al. 2007 §4; the theta-sketch
    intersection rule). One row out: (approx_intersection)."""

    def _theta(s: DataFrame):
        return s.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.max("h").alias("kth")
        ).select(
            F.when(
                F.col("n") < k, F.lit(1.0)
            ).otherwise(F.col("kth").cast("double") / F.lit(_KMV_SPACE)).alias(
                "theta"
            )
        )

    theta = (
        _theta(a).crossJoin(_theta(b).withColumnRenamed("theta", "theta_b"))
        .select(F.least("theta", "theta_b").alias("theta"))
    )
    matches = a.join(b, "h").crossJoin(F.broadcast(theta)).filter(
        F.col("h").cast("double") / F.lit(_KMV_SPACE) < F.col("theta")
    )
    # global aggregate: exactly one row even with zero matches
    m = matches.groupBy().agg(F.count(F.lit(1)).alias("_m"))
    return m.crossJoin(F.broadcast(theta)).select(
        F.round(F.col("_m").cast("double") / F.col("theta"))
        .cast("long")
        .alias("approx_intersection")
    )


# --- Count-min sketch ----------------------------------------------------
#
# Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
# count-min sketch and its applications"). d independent hash rows × w
# counters; point estimate = MIN over rows; one-sided error (estimate ≥
# true count, overshoot ≤ εN with ε = e/w at probability 1-δ, δ = e^-d).
# The sketch is SUM-mergeable — per-slice sketches add into the union's
# sketch — so like the HLL register table it composes with incremental
# rollups: d×w longs summarize ANY number of rows.
#
# The 100 TB heavy-hitter pattern this enables: estimate from the tiny
# sketch (broadcastable — d×w rows), keep only candidates ≥ threshold
# (no false negatives, by one-sidedness), then verify candidates with an
# EXACT count restricted to the candidate set. The full-cardinality
# exact groupBy never runs; the exact pass touches only the (few) heavy
# keys. Hashes are md5-derived like the sketches above — deterministic
# and oracle-mirrorable.


def _cms_cells(value_col: str, d: int, w: int):
    """Array of (row, col) cells a value increments: col_i = the i-th
    8-hex window of md5(value) mod w (one digest = 4 independent 32-bit
    words, so d ≤ 4 — one hash per row regardless of depth, the same
    scan-cost fix as bloom._positions)."""
    if not 1 <= d <= 4:
        raise ValueError("d must be 1..4 (one md5 digest = 4 words)")
    s = F.md5(F.col(value_col).cast("string"))
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    F.conv(
                        F.substring(s, i * 8 + 1, 8), 16, 10
                    ).cast("long")
                    % w
                ).alias("col"),
            )
            for i in range(d)
        ]
    )


def cms_table(
    df: DataFrame, value_col: str, d: int = 3, w: int = 1024
) -> DataFrame:
    """Build the sketch: (row, col, cnt) — at most d×w rows regardless
    of input size. One explode (d rows per input row, map-side combined
    immediately) + one bounded groupBy."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(_cms_cells(value_col, d, w)).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sum-merge two sketches (disjoint slices; unlike HLL/KMV this is
    NOT idempotent — count sketches add, so merge disjoint slices
    only)."""
    return (
        a.unionByName(b).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """Point estimates for a probe relation: min over the d cells.
    The sketch side is broadcast (≤ d×w rows by construction); absent
    cells count 0 — a probe value never seen estimates 0."""
    cells = probes.select(
        value_col, F.explode(_cms_cells(value_col, d, w)).alias("c")
    ).select(value_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        cells.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 256,
) -> DataFrame:
    """Fixed-grid histogram sketch: (group..., bucket, cnt) with
    ``bucket = clamp(floor((v - lo) / (hi - lo) * bins))`` — at most
    groups × bins rows regardless of input size, SUM-mergeable across
    slices (the quantile counterpart of the HLL/CMS tables above: store
    per-partition histograms in a rollup, merge on read, estimate
    quantiles over ALL history without rescanning it).

    Fixed boundaries are the price of exact mergeability + exact
    cross-engine determinism — data-adaptive sketches (t-digest, KLL)
    have tighter tails but engine-specific merge states. Out-of-range
    values clamp into the edge buckets (they stay counted; their
    position saturates). NULLs are dropped.
    """
    group_cols = group_cols or []
    width = (hi - lo) / bins
    b = F.floor((F.col(value_col).cast("double") - lo) / width).cast("long")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, b.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Sum-merge two histogram sketches (disjoint slices — additive,
    like the count-min table)."""
    group_cols = group_cols or []
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def histogram_quantiles(
    sketch: DataFrame,
    qs: list[float],
    group_cols: list[str] | None = None,
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 256,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each q, the
    first bucket whose cumulative count reaches q×total, linearly
    interpolated inside the bucket (the standard grouped-data quantile
    formula). Error ≤ one bucket width. Output: (group..., q, est).

    Shape: the window runs over BUCKETS (≤ bins rows per group), never
    rows; the qs fan-out is a ≤|qs|-element explode.
    """
    from pyspark.sql import Window

    group_cols = group_cols or []
    width = (hi - lo) / bins
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = Window.partitionBy(*group_cols)
    cum = sketch.select(
        *group_cols,
        "bucket",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before"),
        F.sum("cnt").over(wt).alias("total"),
    )
    q = F.explode(F.array(*[F.lit(float(x)) for x in qs])).alias("q")
    hit = cum.select(*group_cols, "bucket", "cnt", "cum_before", "total", q)
    # the target rank q*total falls inside this bucket; q=0 is special-
    # cased to the first NON-EMPTY bucket (cum_before=0, cnt>0) — the
    # strict `<` would otherwise never hit and a requested 0-quantile
    # would silently yield no row instead of the minimum estimate
    is_zero = F.col("q") == 0.0
    hit = hit.filter(
        F.when(
            is_zero,
            (F.col("cum_before") == 0) & (F.col("cnt") > 0),
        ).otherwise(
            (F.col("cum_before") < F.col("q") * F.col("total"))
            & (
                F.col("cum_before") + F.col("cnt")
                >= F.col("q") * F.col("total")
            )
        )
    )
    est = (
        F.lit(lo)
        + F.when(
            is_zero,
            # minimum estimate: the lower edge of the first occupied
            # bucket (grouped-data convention for the 0-quantile)
            F.col("bucket").cast("double"),
        ).otherwise(
            F.col("bucket").cast("double")
            + (F.col("q") * F.col("total") - F.col("cum_before"))
            / F.col("cnt")
        )
        * F.lit(width)
    )
    return hit.select(*group_cols, "q", est.alias("est"))


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    d: int = 3,
    w: int = 1024,
) -> DataFrame:
    """Sketch-pruned exact heavy hitters: estimate every distinct value
    from the broadcast sketch, keep candidates with est ≥ threshold
    (complete, by one-sided error), then count candidates EXACTLY via a
    broadcast semi-join — the full-key exact aggregate never runs.
    Output: (value, est_count, true_count) for true_count ≥ threshold.
    """
    sketch = cms_table(df, value_col, d, w)
    cand = cms_estimate(
        sketch, df.select(value_col).distinct(), value_col, d, w
    ).filter(F.col("est_count") >= threshold)
    exact = (
        df.join(F.broadcast(cand), value_col)
        .groupBy(value_col, "est_count")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .filter(F.col("true_count") >= threshold)
    )
    return exact.select(value_col, "est_count", "true_count")
