"""Record linkage (operators/linkage.py): symmetric-delete blocking
completeness against a brute-force python reference, d=2 neighborhoods,
the stop-bucket guard, and cross-relation joins. Engine-vs-DuckDB value
parity (blocking completeness on real data) runs in test_oracle_parity
(fuzzy_name_pairs — oracle is the naive cross join)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators.linkage import (
    deletion_variants,
    fuzzy_join,
    fuzzy_self_pairs,
)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


NAMES = [
    "smith", "smyth", "smiths", "mith", "smith ", "jones", "jonse",
    "johnson", "jonson", "brown", "browne", "x", "", "ab", "ba",
]


def test_variants_d1_cover_all_edits(spark):
    """Every pair within lev ≤ 1 shares a variant (substitution,
    insertion, deletion, identity — incl. empty and 1-char strings)."""
    df = spark.createDataFrame([(n,) for n in NAMES], "s string")
    rows = df.select("s", deletion_variants("s", 1).alias("v")).collect()
    vs = {r["s"]: set(r["v"]) for r in rows}
    for a, b in itertools.combinations(NAMES, 2):
        if _lev(a, b) <= 1:
            assert vs[a] & vs[b], (a, b)


def test_fuzzy_self_pairs_match_brute_force_d2(spark):
    ids = list(enumerate(NAMES))
    df = spark.createDataFrame(ids, "id long, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_self_pairs(df, "id", "name", max_dist=2).collect()
    }
    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(ids, 2)
        if _lev(a, b) <= 2
    }
    assert got == want


def test_fuzzy_join_cross_relations(spark):
    left = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "lid long, lname string"
    )
    right = spark.createDataFrame(
        [(10, "alpha"), (11, "alpba"), (12, "betas"), (13, "delta")],
        "rid long, rname string",
    )
    got = {
        (r["lid"], r["rid"])
        for r in fuzzy_join(left, right, "lname", "rname", 1).collect()
    }
    assert got == {(1, 10), (1, 11), (2, 12)}


def test_stop_bucket_guard_drops_hot_variant(spark):
    """With max_bucket set, a variant bucket shared by too many left
    rows is dropped — pairs found only through it disappear (documented
    recall trade), everything else survives."""
    # 50 identical 'aa' rows make every 'aa' variant hot
    left = spark.createDataFrame(
        [(i, "aa") for i in range(50)] + [(100, "zzzz")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [(200, "ab"), (201, "zzzz")], "id long, name string"
    )
    l2 = left.withColumnRenamed("name", "lname").withColumnRenamed("id", "lid")
    r2 = right.withColumnRenamed("name", "rname").withColumnRenamed("id", "rid")
    full = {
        (r["lid"], r["rid"])
        for r in fuzzy_join(l2, r2, "lname", "rname", 1).collect()
    }
    assert (0, 200) in full and (100, 201) in full
    capped = {
        (r["lid"], r["rid"])
        for r in fuzzy_join(l2, r2, "lname", "rname", 1, max_bucket=10).collect()
    }
    assert all(p[0] != 0 or p[1] != 200 for p in capped)  # hot pair gone
    assert (100, 201) in capped  # cold pair survives


def test_stop_bucket_guard_caps_right_hot_variant(spark):
    """A variant bucket hot only on the RIGHT side is capped too — the
    guard bounds join fan-out from either side, not just the left."""
    left = spark.createDataFrame(
        [(0, "aa"), (100, "zzzz")], "id long, name string"
    )
    right = spark.createDataFrame(
        [(200 + i, "ab") for i in range(50)] + [(300, "zzzz")],
        "id long, name string",
    )
    l2 = left.withColumnRenamed("name", "lname").withColumnRenamed("id", "lid")
    r2 = right.withColumnRenamed("name", "rname").withColumnRenamed("id", "rid")
    capped = {
        (r["lid"], r["rid"])
        for r in fuzzy_join(l2, r2, "lname", "rname", 1, max_bucket=10).collect()
    }
    assert all(p[0] != 0 for p in capped)  # right-hot 'ab' pairs gone
    assert (100, 300) in capped  # cold pair survives
