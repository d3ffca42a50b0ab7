"""HyperLogLog sketch (operators/sketches.py): accuracy against exact
distinct, register mergeability (the property that makes it the 100 TB
distinct-count workhorse), idempotence under overlap, and grouped
semantics. Engine-vs-DuckDB value parity runs in test_oracle_parity
(hll_distinct_users)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
    hll_distinct,
    hll_error_bound,
    hll_estimate,
    hll_merge,
    hll_registers,
)


@pytest.fixture(scope="module")
def people(spark):
    # 20k rows over 7,321 distinct ids, two groups
    rows = [(i % 7321, "a" if i % 3 else "b") for i in range(20_000)]
    return spark.createDataFrame(rows, "uid long, grp string")


def test_estimate_within_theoretical_bounds(spark, people):
    est = {
        r["grp"]: r["approx_distinct"]
        for r in hll_distinct(people, "uid", ["grp"]).collect()
    }
    exact = {
        r["grp"]: r["n"]
        for r in people.groupBy("grp")
        .agg(F.countDistinct("uid").alias("n"))
        .collect()
    }
    bound = 4 * hll_error_bound(12)  # 4 sigma ≈ 6.5% at p=12
    for g in exact:
        assert abs(est[g] - exact[g]) <= bound * exact[g], (g, est[g], exact[g])


def test_registers_merge_equals_full(spark, people):
    """max-merge of per-slice registers == registers of the union —
    the property that lets rollups store registers per partition and
    re-aggregate distinct counts without rescanning history."""
    a = people.filter(F.col("uid") % 2 == 0)
    b = people.filter(F.col("uid") % 2 == 1)
    merged = hll_merge(
        hll_registers(a, "uid", ["grp"]),
        hll_registers(b, "uid", ["grp"]),
        ["grp"],
    )
    full = hll_registers(people, "uid", ["grp"])
    assert merged.exceptAll(full).isEmpty()
    assert full.exceptAll(merged).isEmpty()


def test_merge_idempotent_under_overlap(spark, people):
    """Overlapping slices cannot inflate the estimate (registers are
    max-idempotent) — the anti-double-counting guarantee exact partial
    counts do NOT have."""
    regs = hll_registers(people, "uid", ["grp"])
    doubled = hll_merge(regs, regs, ["grp"])
    e1 = {r["grp"]: r["approx_distinct"]
          for r in hll_estimate(regs, ["grp"]).collect()}
    e2 = {r["grp"]: r["approx_distinct"]
          for r in hll_estimate(doubled, ["grp"]).collect()}
    assert e1 == e2


def test_small_cardinality_linear_counting_is_tight(spark):
    df = spark.createDataFrame([(i,) for i in range(37)], "uid long")
    [row] = hll_distinct(df, "uid").collect()
    # linear counting at n << m is near-exact
    assert abs(row["approx_distinct"] - 37) <= 1


def test_nulls_ignored_and_bad_p_raises(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "uid long")
    [row] = hll_distinct(df, "uid").collect()
    assert row["approx_distinct"] == 2
    with pytest.raises(ValueError, match="out of the supported"):
        hll_registers(df, "uid", p=2)


def test_register_state_bounded(spark, people):
    """Register table ≤ groups × 2^p rows — cardinality-independent
    state (the scale contract)."""
    regs = hll_registers(people, "uid", ["grp"], p=8)
    assert regs.count() <= 2 * (1 << 8)
    assert regs.agg(F.max("rho")).first()[0] <= 33
    assert regs.agg(F.min("rho")).first()[0] >= 1


# --- KMV / theta ---------------------------------------------------------


def test_kmv_exact_below_k(spark):
    """A group with fewer distincts than k gets the EXACT count."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    df = spark.createDataFrame(
        [(i % 37, "g") for i in range(500)], "uid long, grp string"
    )
    out = kmv_estimate(
        kmv_sketch(df, "uid", ["grp"], k=256), ["grp"], k=256
    ).collect()
    assert out[0]["approx_distinct"] == 37


def test_kmv_accuracy(spark, people):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    est = {
        r["grp"]: r["approx_distinct"]
        for r in kmv_estimate(
            kmv_sketch(people, "uid", ["grp"], k=512), ["grp"], k=512
        ).collect()
    }
    exact = {
        r["grp"]: r["n"]
        for r in people.groupBy("grp")
        .agg(F.countDistinct("uid").alias("n"))
        .collect()
    }
    # RSE ≈ 1/sqrt(k-2) ≈ 4.4% at k=512; allow 4 sigma
    for g in exact:
        assert abs(est[g] - exact[g]) <= 0.18 * exact[g], (g, est[g], exact[g])


def test_kmv_merge_equals_full(spark, people):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )

    a = kmv_sketch(people.filter(F.col("uid") % 2 == 0), "uid", ["grp"], k=128)
    b = kmv_sketch(people.filter(F.col("uid") % 2 == 1), "uid", ["grp"], k=128)
    # overlap idempotence: merge in one slice twice
    merged = kmv_merge(kmv_merge(a, b, ["grp"], 128), a, ["grp"], 128)
    full = kmv_sketch(people, "uid", ["grp"], k=128)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_kmv_intersection_tracks_truth(spark):
    """Intersection estimate lands within the theta-sketch error enve-
    lope of the true overlap, including a zero-overlap case (exact 0)."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
        kmv_intersect_estimate,
        kmv_sketch,
    )

    # A = 0..3999, B = 2000..5999 → |A∩B| = 2000
    a_df = spark.range(4000).select(F.col("id").alias("uid"))
    b_df = spark.range(2000, 6000).select(F.col("id").alias("uid"))
    a = kmv_sketch(a_df, "uid", k=512)
    b = kmv_sketch(b_df, "uid", k=512)
    est = kmv_intersect_estimate(a, b, k=512).collect()[0][
        "approx_intersection"
    ]
    assert abs(est - 2000) <= 0.25 * 2000, est
    # disjoint sets → no matching hashes → exactly 0
    c = kmv_sketch(
        spark.range(100_000, 104_000).select(F.col("id").alias("uid")),
        "uid",
        k=512,
    )
    assert (
        kmv_intersect_estimate(a, c, k=512).collect()[0]["approx_intersection"]
        == 0
    )


# --- Count-min -----------------------------------------------------------


def test_cms_one_sided_and_bounded(spark, people):
    """est ≥ true for EVERY key (no false negatives at any threshold)
    and the sketch never exceeds d×w rows."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
        cms_estimate,
        cms_table,
    )

    sketch = cms_table(people, "uid", d=3, w=512)
    assert sketch.count() <= 3 * 512
    est = {
        r["uid"]: r["est_count"]
        for r in cms_estimate(
            sketch, people.select("uid").distinct(), "uid", d=3, w=512
        ).collect()
    }
    true = {
        r["uid"]: r["n"]
        for r in people.groupBy("uid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(est[u] >= true[u] for u in true)
    # unseen probe estimates small (0 unless cells collide)
    ghost = spark.createDataFrame([(10_000_000,)], "uid long")
    g = cms_estimate(sketch, ghost, "uid", d=3, w=512).collect()[0]["est_count"]
    assert g < 200


def test_cms_merge_is_sum(spark, people):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
        cms_merge,
        cms_table,
    )

    a = cms_table(people.filter("uid % 2 = 0"), "uid", d=3, w=512)
    b = cms_table(people.filter("uid % 2 = 1"), "uid", d=3, w=512)
    merged = sorted(map(tuple, cms_merge(a, b).collect()))
    full = sorted(map(tuple, cms_table(people, "uid", d=3, w=512).collect()))
    assert merged == full


def test_cms_heavy_hitters_exact(spark):
    """Candidate pruning + exact verify returns EXACTLY the true heavy
    set with true counts — the sketch can only add candidates, never
    lose one, and verification removes the extras."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    # skewed: key 1 → 500 rows, key 2 → 120, everything else ≤ 40
    rows = (
        [(1,)] * 500 + [(2,)] * 120 + [(i,) for i in range(100, 140) for _ in range(30)]
    )
    df = spark.createDataFrame(rows, "uid long")
    got = {
        (r["uid"], r["true_count"])
        for r in cms_heavy_hitters(df, "uid", 100, d=3, w=256).collect()
    }
    assert got == {(1, 500), (2, 120)}


# --- histogram quantiles -------------------------------------------------


def test_histogram_quantiles_accuracy_and_merge(spark):
    """Estimates land within one bucket width of the exact quantiles;
    sum-merge of slice sketches equals the full sketch."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
        histogram_merge,
        histogram_quantiles,
        histogram_sketch,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        ((F.col("id") * 37) % 1000).cast("double").alias("v"),
    )
    sk = histogram_sketch(df, "v", ["g"], lo=0.0, hi=1000.0, bins=200)
    got = {
        (r["g"], r["q"]): r["est"]
        for r in histogram_quantiles(
            sk, [0.5, 0.9, 1.0], ["g"], lo=0.0, hi=1000.0, bins=200
        ).collect()
    }
    exact = {
        (r["g"], q): r[f"p{int(q*100)}"]
        for q in (0.5, 0.9, 1.0)
        for r in df.groupBy("g")
        .agg(*[
            F.expr(f"percentile(v, {qq})").alias(f"p{int(qq*100)}")
            for qq in (0.5, 0.9, 1.0)
        ])
        .collect()
    }
    width = 1000.0 / 200
    for k, e in exact.items():
        assert abs(got[k] - e) <= width + 1e-9, (k, got[k], e)
    # merge == full
    a = histogram_sketch(df.filter("id % 3 = 0"), "v", ["g"], 0.0, 1000.0, 200)
    b = histogram_sketch(df.filter("id % 3 != 0"), "v", ["g"], 0.0, 1000.0, 200)
    assert sorted(map(tuple, histogram_merge(a, b, ["g"]).collect())) == sorted(
        map(tuple, sk.collect())
    )


def test_histogram_clamps_out_of_range(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
        histogram_sketch,
    )

    df = spark.createDataFrame(
        [(-50.0,), (0.5,), (99.0,), (1e9,), (None,)], "v double"
    )
    rows = {r["bucket"]: r["cnt"] for r in histogram_sketch(
        df, "v", None, lo=0.0, hi=100.0, bins=10
    ).collect()}
    assert rows[0] == 2          # -50 clamped + 0.5
    assert rows[9] == 2          # 99 + 1e9 clamped
    assert sum(rows.values()) == 4  # NULL dropped


def test_histogram_quantiles_zero_quantile(spark):
    """q=0.0 yields the minimum-bucket estimate (first occupied bucket's
    lower edge) instead of silently emitting no row."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    df = spark.range(1000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id").cast("double") / 2.0 + 100.0).alias("v"),
    )
    sk = histogram_sketch(df, "v", ["g"], lo=0.0, hi=1000.0, bins=100)
    got = {
        (r["g"], r["q"]): r["est"]
        for r in histogram_quantiles(
            sk, [0.0, 0.5], ["g"], lo=0.0, hi=1000.0, bins=100
        ).collect()
    }
    width = 1000.0 / 100
    # every (group, q) pair present — q=0 no longer drops rows
    assert set(got) == {("0", 0.0), ("0", 0.5), ("1", 0.0), ("1", 0.5)}
    exact_min = {r["g"]: r["m"] for r in df.groupBy("g").agg(F.min("v").alias("m")).collect()}
    for g, m in exact_min.items():
        assert abs(got[(g, 0.0)] - m) <= width + 1e-9, (g, got[(g, 0.0)], m)
