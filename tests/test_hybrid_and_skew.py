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


def test_hybrid_indexed_is_index_resident_and_matches_scan_branches(
    spark, tmp_path
):
    """r13 hybrid_topk_indexed: every input file of the fused frame
    lives inside the two index directories (no corpus, no float
    table), and the fusion equals rrf_fuse over the two branch serves
    it composes."""
    from djangoadmin_postgresql_2_elasticseach_spark.functions.text import (
        analyze,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.operators import (
        similarity as S,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.search.bm25 import (
        bm25_topk_from_index,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.search.hybrid import (
        hybrid_topk_indexed,
        rank_of,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        build_posting_index,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import (
        load_table,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(64)
    toks = docs.select("doc_id", analyze(F.col("text")).alias("tokens"))
    posting = str(tmp_path / "posting")
    build_posting_index(toks, posting, tokens_col={"text": "tokens"})

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(64)
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    books = S.pq_codebooks_deterministic(emb, m=4, ksub=16)
    ivfpq = str(tmp_path / "ivfpq")
    planes = S.build_ivfpq_index(emb, ivfpq, books, n_planes=4)

    fused = hybrid_topk_indexed(
        spark, posting, ivfpq, "spark vector join", q,
        k=5, k_branch=10, probe_hamming=4,
    )
    for f in fused.inputFiles():
        assert posting in f or ivfpq in f, f
    lex = rank_of(
        bm25_topk_from_index(spark, posting, "spark vector join", k=10),
        "score", "doc_id",
    )
    vec = rank_of(
        S.ivfpq_query_indexed(
            spark, ivfpq, books, q, planes, k=10, probe_hamming=4
        ),
        "approx_dist", "vec_id", ascending=True,
    )
    want = rrf_fuse([lex, vec], id_col="doc_id", k=5).collect()
    assert fused.collect() == want
