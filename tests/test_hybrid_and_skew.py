"""RRF fusion math and salted-distinct equivalence — the semantics the
oracle corpus exercises only at one operating point."""

from __future__ import annotations

from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.search.hybrid import rrf_fuse


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


def test_rrf_fuse_scores_and_order(spark):
    # x only lexical (rank 1), y in both (2 and 1), z only vector (2)
    lex = _ranked(spark, [(100, 1), (200, 2)])
    vec = _ranked(spark, [(200, 1), (300, 2)])
    rows = rrf_fuse([lex, vec], k=10, k0=60).collect()
    got = [(r["doc_id"], r["rrf_score"]) for r in rows]
    assert got[0][0] == 200
    assert got[0][1] == round(1 / 62 + 1 / 61, 6)
    assert got[1] == (100, round(1 / 61, 6))
    assert got[2] == (300, round(1 / 62, 6))


def test_rrf_fuse_tie_breaks_by_id(spark):
    lex = _ranked(spark, [(5, 1), (3, 2)])
    vec = _ranked(spark, [(3, 1), (5, 2)])
    rows = rrf_fuse([lex, vec], k=10).collect()
    # identical fused scores -> ascending id order
    assert [r["doc_id"] for r in rows] == [3, 5]
    assert rows[0]["rrf_score"] == rows[1]["rrf_score"]


def test_rrf_fuse_k_limits_output(spark):
    lex = _ranked(spark, [(i, i) for i in range(1, 8)])
    assert rrf_fuse([lex], k=3).count() == 3


def test_skew_safe_distinct_matches_plain_under_skew(spark):
    # one hot key holding 90% of rows, users overlapping across keys
    rows = [("hot", i % 37) for i in range(900)] + [
        ("cold", i % 11) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long")

    from djangoadmin_postgresql_2_elasticseach_spark.operators.relational import (
        skew_safe_distinct_users,
    )

    out = skew_safe_distinct_users(spark, "", n_salts=8, events=df)
    got = {r["event_type"]: r["distinct_users"] for r in out.collect()}
    assert got == {"hot": 37, "cold": 11}

    # the partial aggregation must group on the salt (the skew-splitting
    # key is in the plan, not just the final event_type rollup)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan
    assert "xxhash64" in plan
