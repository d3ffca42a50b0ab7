"""Bloom-filter semi-join pruning — filter a huge fact scan by a
compact bitset built from a dimension's keys.

Extension operator (Bloom 1970; the explicit, deterministic form of
Spark's own AQE runtime bloom filters): joining a 100 TB fact table to
a selective dimension normally shuffles EVERY fact row; rows that can
never match still cross the wire. A bloom filter of the dimension keys
is m bits regardless of dimension size; testing the fact key against it
is a pure column expression INSIDE the fact's scan stage — no shuffle,
no join — and one-sided: a true match always passes (no false
negatives), a non-match passes only with FP probability
(1 - e^{-kn/m})^k. The surviving fraction then pays the exact join.

Determinism contract (mirrored in oracle SQL): position i = the i-th
8-hex window of md5(value) mod m (one digest yields 4 independent
32-bit words; k ≤ 4) — engine and oracle agree bit-for-bit, and each
row pays ONE digest regardless of k. The
engine packs positions into m/64 longs via bit_or aggregation and
broadcasts ONE ROW holding the array; the oracle tests the equivalent
position-set membership (a word's bit is set iff some dimension key set
that position — identical pass/fail, including false positives).

Scale shape: building the bitset is one groupBy over ≤ m word rows; the
driver materializes ≤ m/64 longs (a few KB–MB, bounded by m, NEVER by
data size — the same bounded-collect class as the k-means centroids).
The membership test rides the fact scan via a broadcast-of-one-row
cross join; Catalyst keeps the fact-side filter in the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(value_col: str, m: int, k: int):
    """Array of k bit positions for a value: the k 8-hex windows of ONE
    md5 digest (32 hex chars = 4 independent 32-bit words, so k ≤ 4).
    One digest per row instead of k — the hash is the scan-stage cost
    at 10^9 rows (measured: 3 separate md5 calls were the wall-clock of
    the sf0.1 prune)."""
    if not 1 <= k <= 4:
        raise ValueError("k must be 1..4 (one md5 digest = 4 words)")
    s = F.md5(F.col(value_col).cast("string"))
    return F.array(
        *[
            (
                F.conv(F.substring(s, i * 8 + 1, 8), 16, 10).cast("long")
                % m
            )
            for i in range(k)
        ]
    )


def bloom_build(
    dim: DataFrame, key_col: str, m: int = 1 << 16, k: int = 3
) -> DataFrame:
    """ONE-ROW DataFrame holding the bitset as array<long> (m/64 words,
    dense, index 0..m/64-1). Mergeable: bitsets of two slices OR into
    the union's bitset (idempotent — overlap cannot corrupt)."""
    n_words = (m + 63) // 64
    words = (
        dim.filter(F.col(key_col).isNotNull())
        .select(F.explode(_positions(key_col, m, k)).alias("pos"))
        .select(
            F.expr("pos div 64").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )
    # bounded driver materialization: ≤ m/64 longs, independent of |dim|
    present = {r["w"]: r["bits"] for r in words.collect()}
    dense = [present.get(i, 0) for i in range(n_words)]
    spark = dim.sparkSession
    return spark.createDataFrame([(dense,)], "bloom_bits array<long>")


def _pos_sql(digest_col: str, i: int, m: int) -> str:
    """SQL text of position i over a PRECOMPUTED md5-hex column — the
    same windowing `_positions` builds as a Column (both sides stay in
    lock-step)."""
    return (
        f"(cast(conv(substring({digest_col}, "
        f"{i * 8 + 1}, 8), 16, 10) as bigint) % {m})"
    )


def bloom_might_contain(digest_col: str, m: int, k: int):
    """Boolean column: all k positions set in the broadcast
    ``bloom_bits`` array (which must be in scope via the cross join in
    ``bloom_prune``). ``digest_col`` holds md5(cast(key as string)),
    computed ONCE per row in a projection BELOW the join: because this
    predicate references both the fact key and the broadcast bitset,
    Catalyst necessarily places it in the join CONDITION, where
    codegen's common-subexpression elimination does not apply — an
    inline md5 would be re-evaluated per position reference (2k times;
    measured as the wall-clock of the sf0.1 prune). Windowing the
    stored digest keeps the condition to cheap substring/conv/shift
    integer work."""
    cond = F.lit(True)
    for i in range(k):
        pos = _pos_sql(digest_col, i, m)
        test = F.expr(
            f"(element_at(bloom_bits, cast({pos} div 64 as int) + 1) "
            f">> cast({pos} % 64 as int)) & 1 = 1"
        )
        cond = cond & test
    return cond


_DIGEST = "_bloom_md5"


def bloom_prune(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Fact rows whose key MIGHT be in the dimension (bloom pass).
    Broadcast-of-one-row cross join carries the bitset into the fact
    scan; the filter itself never shuffles the fact. The md5 digest is
    projected on the fact side before the join so the join-condition
    membership test reads it as a column (see bloom_might_contain)."""
    return (
        fact.filter(F.col(key_col).isNotNull())
        .withColumn(_DIGEST, F.md5(F.col(key_col).cast("string")))
        .crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(_DIGEST, m, k))
        .drop("bloom_bits", _DIGEST)
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Exact semi-join with bloom pre-pruning: bloom pass first (the
    cheap scan-stage filter kills the non-matching bulk), exact
    ``leftsemi`` join on the survivors only."""
    pruned = bloom_prune(fact, bloom_build(dim, dim_key, m, k), fact_key, m, k)
    return pruned.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "leftsemi",
    )
