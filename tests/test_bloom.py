"""Bloom semi-join pruning (operators/bloom.py): no false negatives,
false-positive rate in the analytic envelope, bitset mergeability, and
the plan shape — the bloom test must ride the fact scan stage (no
shuffle, no join node for the pruning itself). Engine-vs-DuckDB value
parity runs in test_oracle_parity (bloom_semi_lineitem)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
    bloom_semi_join,
)

M, K = 1 << 14, 3


def test_no_false_negatives_and_fp_envelope(spark):
    dim = spark.range(0, 2000).select(F.col("id").alias("key"))
    fact = spark.range(0, 40_000).select(F.col("id").alias("key"))
    bloom = bloom_build(dim, "key", M, K)
    passed = {r["key"] for r in bloom_prune(fact, bloom, "key", M, K).collect()}
    assert set(range(2000)) <= passed  # every true member passes
    fp = len(passed) - 2000
    p = (1 - math.exp(-K * 2000 / M)) ** K
    # 38k non-members, expected fp ≈ 38000p; allow generous 3x headroom
    assert fp <= 3 * 38_000 * p + 50, (fp, p)


def test_exact_semi_join_matches_plain(spark):
    dim = spark.range(0, 500).select((F.col("id") * 7).alias("key"))
    fact = spark.range(0, 10_000).select(
        F.col("id").alias("key"), (F.col("id") % 13).alias("v")
    )
    got = sorted(
        map(tuple, bloom_semi_join(fact, dim, "key", "key", M, K).collect())
    )
    want = sorted(
        map(
            tuple,
            fact.join(dim.select("key").distinct(), "key", "leftsemi").collect(),
        )
    )
    assert got == want


def test_bitset_or_merge(spark):
    """Bitsets of two slices OR into the union's bitset."""
    a = bloom_build(spark.range(0, 100).select(F.col("id").alias("k")), "k", M, K)
    b = bloom_build(
        spark.range(50, 200).select(F.col("id").alias("k")), "k", M, K
    )
    full = bloom_build(
        spark.range(0, 200).select(F.col("id").alias("k")), "k", M, K
    )
    wa = a.collect()[0]["bloom_bits"]
    wb = b.collect()[0]["bloom_bits"]
    wf = full.collect()[0]["bloom_bits"]
    assert [x | y for x, y in zip(wa, wb)] == wf


def test_prune_stays_in_scan_stage(spark):
    """The pruning filter must appear as a Filter over the fact scan
    under a BroadcastNestedLoopJoin of the ONE-ROW bitset — no shuffle
    exchange between the fact scan and the bloom test."""
    from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import plan_string

    dim = spark.range(0, 100).select(F.col("id").alias("key"))
    fact = spark.range(0, 1000).select(F.col("id").alias("key"))
    plan = plan_string(bloom_prune(fact, bloom_build(dim, "key", M, K), "key", M, K))
    assert "BroadcastNestedLoopJoin" in plan, plan
    pre, _, post = plan.partition("BroadcastNestedLoopJoin")
    # no shuffle below the join on the fact side
    assert "Exchange hashpartitioning" not in post, plan
