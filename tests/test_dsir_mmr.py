"""DSIR importance resampling (corpus.importance_resample) and MMR
diversity re-rank (similarity.mmr_topk) — behavioral properties the
oracle hash can't express: target-likeness ordering, seed
reproducibility, and the diversity-over-redundancy pick."""

from __future__ import annotations

from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
    importance_resample,
)
from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import (
    mmr_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TARGET_ROWS = [
    (100, "the cat sat on the mat"),
    (101, "the cat ate the fish"),
    (102, "a cat and the cat purred"),
]
RAW_ROWS = [
    (1, "the cat sat on the mat"),        # pure target-like
    (2, "stocks fell sharply in tokyo trading"),  # off-target
    (3, "the cat sat near stocks tokyo"),  # mixed
    (4, "x"),                              # 0 bigrams
]


def test_dsir_logweight_orders_by_target_likeness(spark):
    raw = _docs(spark, RAW_ROWS)
    tgt = _docs(spark, TARGET_ROWS)
    got = {
        r["doc_id"]: r
        for r in importance_resample(
            raw, tgt, n=10, n_features=256, seed=7
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["log_w"] > got[3]["log_w"] > got[2]["log_w"]
    assert got[4]["n_bigrams"] == 0 and got[4]["log_w"] == 0.0


def test_dsir_seed_reproducible_and_varying(spark):
    raw, tgt = _docs(spark, RAW_ROWS), _docs(spark, TARGET_ROWS)
    a = importance_resample(raw, tgt, n=2, n_features=256, seed=7).collect()
    b = importance_resample(raw, tgt, n=2, n_features=256, seed=7).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    c = importance_resample(raw, tgt, n=2, n_features=256, seed=8).collect()
    assert {r["doc_id"]: r["sel_key"] for r in a} != {
        r["doc_id"]: r["sel_key"] for r in c
    }


def test_dsir_respects_budget_and_key_order(spark):
    raw, tgt = _docs(spark, RAW_ROWS), _docs(spark, TARGET_ROWS)
    got = importance_resample(raw, tgt, n=2, n_features=256, seed=7).collect()
    assert len(got) == 2
    assert got[0]["sel_key"] >= got[1]["sel_key"]


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mmr_prefers_diversity_over_near_duplicate(spark):
    # plain top-2 for q=[1,0] is {0, 1} (1 is a near-dup of 0:
    # sim≈0.99995 but rel only 0.994); MMR at λ=0.5 takes the diverse
    # vector 2 second (score +0.032 vs −0.003). The top pick must NOT
    # be collinear with q — if it were, rel(c) == sim(c, picked) for
    # every c and all step-2 scores tie at exactly 0.
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.1]),
            (1, [1.0, 0.11]),
            (2, [0.8, -0.6]),
        ],
    )
    got = mmr_topk(emb, [1.0, 0.0], k=2, shortlist=3, lam=0.5).collect()
    assert [r["ord"] for r in got] == [1, 2]
    assert got[0]["id"] == 0
    assert got[1]["id"] == 2


def test_mmr_first_pick_is_relevance_argmax(spark):
    emb = _emb(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.7, 0.7])])
    got = mmr_topk(emb, [0.0, 1.0], k=3, shortlist=3, lam=0.7).collect()
    assert got[0]["id"] == 1
    assert len(got) == 3 and len({r["id"] for r in got}) == 3


def test_mmr_single_candidate_shortlist(spark):
    emb = _emb(spark, [(5, [1.0, 0.0])])
    got = mmr_topk(emb, [1.0, 0.0], k=3, shortlist=2, lam=0.7).collect()
    assert len(got) == 1
    assert got[0]["id"] == 5 and got[0]["ord"] == 1


def test_mmr_k_capped_by_shortlist(spark):
    emb = _emb(
        spark, [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])]
    )
    got = mmr_topk(emb, [1.0, 0.0], k=10, shortlist=2, lam=0.7).collect()
    assert len(got) == 2


def test_mmr_batch_matches_single_per_query(spark):
    import random

    rng = random.Random(42)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)
    ]
    emb = _emb(spark, rows)
    queries = emb.filter("vec_id IN (0, 7)")
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import (
        mmr_topk_batch,
    )

    batch = mmr_topk_batch(queries, emb, k=4, shortlist=10, lam=0.6).collect()
    assert sorted({r["qid"] for r in batch}) == [0, 7]
    for qid, vec in [(0, rows[0][1]), (7, rows[7][1])]:
        single = mmr_topk(emb, vec, k=4, shortlist=10, lam=0.6).collect()
        got = [r for r in batch if r["qid"] == qid]
        assert [(r["ord"], r["id"], r["rel"], r["mmr_score"]) for r in got] == [
            (r["ord"], r["id"], r["rel"], r["mmr_score"]) for r in single
        ]


def test_dsir_fit_artifact_roundtrip(spark, tmp_path):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        dsir_fit,
        dsir_select,
    )

    raw, tgt = _docs(spark, RAW_ROWS), _docs(spark, TARGET_ROWS)
    llr = dsir_fit(raw, tgt, n_features=256)
    path = str(tmp_path / "llr")
    llr.write.parquet(path)
    reloaded = spark.read.parquet(path)
    inline = importance_resample(raw, tgt, n=3, n_features=256, seed=5)
    via_artifact = dsir_select(raw, reloaded, n=3, n_features=256, seed=5)
    assert [r.asDict() for r in inline.collect()] == [
        r.asDict() for r in via_artifact.collect()
    ]


def test_r9_operators_on_empty_inputs(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        shingle_novelty,
        vocab_coverage,
    )

    empty_docs = _docs(spark, []).filter("1=0")
    tgt = _docs(spark, TARGET_ROWS)
    # empty raw → empty selection; empty target → still selects from raw
    assert importance_resample(empty_docs, tgt, n=5, n_features=64).count() == 0
    assert (
        importance_resample(tgt, empty_docs, n=2, n_features=64).count() == 2
    )
    assert vocab_coverage(empty_docs, v=10).count() == 0
    assert shingle_novelty(empty_docs).count() == 0
    empty_emb = _emb(spark, []).filter("1=0")
    assert mmr_topk(empty_emb, [1.0, 0.0], k=3, shortlist=5).count() == 0


def test_weighted_sample_statistics_and_determinism(spark):
    """E-S property: across many seeds, an item with weight 9 is picked
    (n=1 of {9, 1}) about 90% of the time; zero/NULL weights never."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 9.0), (2, 1.0), (3, 0.0), (4, None)],
        "doc_id long, w double",
    )
    wins = 0
    trials = 60
    for seed in range(trials):
        got = weighted_sample(df, n=1, weight_col="w", seed=seed).collect()
        assert len(got) == 1 and got[0]["doc_id"] in (1, 2)
        wins += got[0]["doc_id"] == 1
    assert 0.75 * trials <= wins < trials  # ~0.9 expected; 4σ≈0.15
    # determinism: same seed → same pick
    a = weighted_sample(df, n=1, weight_col="w", seed=7).collect()
    b = weighted_sample(df, n=1, weight_col="w", seed=7).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_weighted_sample_stratified_quota(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        weighted_sample,
    )

    rows = [(i, "s" + str(i % 3), float(1 + i)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w double")
    got = weighted_sample(
        df, n=4, weight_col="w", seed=3, strata=["src"]
    ).collect()
    per = {}
    for r in got:
        per.setdefault(r["src"], []).append(r["sel_key"])
    assert set(per) == {"s0", "s1", "s2"}
    for keys in per.values():
        assert len(keys) == 4 and keys == sorted(keys, reverse=True)


def test_weighted_sample_excludes_nan_weights(spark):
    """r9 review fix: NaN weights (e.g. an upstream 0/0) must be
    excluded, not sorted first."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, float("nan")), (3, 1.0)], "doc_id long, w double"
    )
    got = weighted_sample(df, n=3, weight_col="w", seed=11).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 3]


def test_mmr_rerank_tolerates_stale_shortlist_and_zero_vectors(spark):
    """r9 review fixes: a candidate id missing from emb is dropped
    (not a greedy KeyError); a zero-norm vector (NaN rel) never enters
    the selection."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import (
        mmr_rerank,
    )

    emb = _emb(
        spark,
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0])],
    )
    cand = spark.createDataFrame(
        [
            (0, 0, 0.9),            # present
            (0, 1, 0.8),            # present
            (0, 99, 0.7),           # stale: no vector row
            (0, 2, float("nan")),   # zero vector: NaN rel
        ],
        "qid long, id long, rel double",
    )
    got = mmr_rerank(cand, emb, k=4, lam=0.5).collect()
    assert [r["id"] for r in got] == [0, 1]


def test_dsir_select_rejects_feature_count_mismatch(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        dsir_fit,
        dsir_select,
    )
    import pytest

    raw, tgt = _docs(spark, RAW_ROWS), _docs(spark, TARGET_ROWS)
    llr = dsir_fit(raw, tgt, n_features=128)
    with pytest.raises(ValueError, match="n_features"):
        dsir_select(raw, llr, n=2, n_features=256)


def test_probe_buckets_full_hamming_ball():
    """r9 review fix: probe_hamming=h yields the FULL Hamming-≤h ball
    (combinations), not just single-bit flips."""
    from math import comb

    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import (
        fixed_planes,
        probe_buckets,
    )

    planes = fixed_planes(8, 4)
    q = [1.0] * 8
    for h in (0, 1, 2, 3, 4):
        got = probe_buckets(q, planes, probe_hamming=h)
        assert len(got) == sum(comb(4, i) for i in range(h + 1)), h
    # every probed bucket really is within h of the home bucket
    home = next(iter(probe_buckets(q, planes, probe_hamming=0)))
    ball = probe_buckets(q, planes, probe_hamming=2)
    assert all(
        sum(a != b for a, b in zip(home, x)) <= 2 for x in ball
    )


def test_mmr_rerank_string_ids_match_long_ids(spark):
    """String-keyed MMR (r10 contract lift) must select the same docs,
    in the same order, with the same scores as the long-keyed run when
    the string ids are an order-preserving rename of the long ids."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import (
        mmr_topk,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import (
        load_table,
    )
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    long_run = mmr_topk(emb, q, k=5, shortlist=20).collect()

    emb_s = emb.select(
        F.concat(
            F.lit("d"), F.lpad(F.col("vec_id").cast("string"), 6, "0")
        ).alias("vec_id"),
        "embedding",
    )
    str_run = mmr_topk(emb_s, q, k=5, shortlist=20).collect()
    assert [r["id"] for r in str_run] == [
        f"d{r['id']:06d}" for r in long_run
    ]
    assert [(r["ord"], r["rel"], r["mmr_score"]) for r in str_run] == [
        (r["ord"], r["rel"], r["mmr_score"]) for r in long_run
    ]
    # the schema follows the key type
    assert dict(mmr_topk(emb_s, q, k=2, shortlist=5).dtypes)["id"] == "string"


def test_mmr_rerank_rejects_non_key_id_types(spark):
    """Loud contract: float ids are neither integral nor string."""
    import pytest
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import (
        mmr_rerank,
    )
    from pyspark.sql import functions as F

    cand = spark.createDataFrame(
        [(0, 1.5, 0.9)], "qid long, id double, rel double"
    )
    emb = spark.createDataFrame(
        [(1.5, [1.0, 0.0])], "vec_id double, embedding array<double>"
    )
    with pytest.raises(TypeError, match="integral or string"):
        mmr_rerank(cand, emb, k=2)


def test_mmr_normalize_rel_squashes_to_unit_range(spark):
    """normalize_rel: min-max to [0,1] within the shortlist — the
    lowest-rel candidate maps to 0, the highest to 1, and the greedy
    trade-off actually diversifies (ADVICE r9: unbounded BM25 rel made
    the diversity term inert)."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import (
        mmr_rerank,
    )

    # two near-identical high-rel vectors + one distinct mid-rel vector:
    # un-normalized BM25-ish rel (scores 9/8.9/2) would pick both twins;
    # normalized, diversity kicks the twin out at step 2
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.04, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    cand = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 8.9), (0, 3, 2.0)],
        "qid long, id long, rel double",
    )
    rows = mmr_rerank(cand, emb, k=2, lam=0.5, normalize_rel=True).collect()
    assert [r["id"] for r in rows] == [1, 3]
    rels = {r["id"]: r["rel"] for r in rows}
    assert rels[1] == 1.0 and rels[3] == 0.0
    # un-normalized: relevance dwarfs diversity, the twin survives
    raw = mmr_rerank(cand, emb, k=2, lam=0.5).collect()
    assert [r["id"] for r in raw] == [1, 2]
