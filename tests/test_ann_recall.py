"""r14 (r13 verdict #5): ANN retrieval QUALITY pinned as a regression
metric. The arithmetic-parity oracles prove the Spark plans compute
the IVF-PQ math exactly as specified — they can NOT catch a
quantizer/probe change that silently degrades what that math
retrieves. This file pins recall@10 against the exact brute-force
answer at sf0.01 (the synthetic near-uniform 64-dim embeddings — the
HARD case for PQ: no cluster structure to exploit), so a code change
that drops retrieval quality fails CI while still passing the value
oracles. Everything here is deterministic (deterministic codebooks,
fixed hyperplanes, fixed query set) — the bounds sit safely under the
measured values (SCALING.md r14 recall table) rather than at them, so
only a REAL quality regression trips them."""

from __future__ import annotations

import numpy as np
import pytest

from djangoadmin_postgresql_2_elasticseach_spark.operators import similarity as S
from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT

K = 10
QUERY_IDS = [0, 7, 23, 41, 99]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        load_table(spark, SF_CORRECT, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([[float(x) for x in r["embedding"]] for r in rows])
    return ids, mat


@pytest.fixture(scope="module")
def idx(spark):
    path, books, planes = S.ivfpq_index_cached(
        spark, SF_CORRECT, m=4, ksub=16, n_planes=4,
        store_cols=("label", "embedding"),
    )
    return path, books, planes


def _exact_top(ids, mat, q):
    d = ((mat - q) ** 2).sum(axis=1)
    return set(ids[np.argsort(d, kind="stable")[:K]].tolist())


def _mean_recall(spark, corpus, serve):
    ids, mat = corpus
    vals = []
    for qi in QUERY_IDS:
        q = mat[ids.tolist().index(qi)]
        exact = _exact_top(ids, mat, q)
        got = {r[0] for r in serve(spark, [float(x) for x in q]).collect()}
        vals.append(len(got & exact) / K)
    return sum(vals) / len(vals)


def test_rerank_and_adc_recall_bounds(spark, corpus, idx):
    """Measured (sf0.01, 5 fixed queries): rerank@10 shortlist=50 mean
    0.58 at both probe_hamming 1 and 2; raw ADC@10 mean 0.32/0.30.
    Bounds pinned with margin: rerank ≥ 0.45, ADC ≥ 0.15, and the
    exact re-rank must never retrieve WORSE than the raw ADC ranking
    it refines."""
    path, books, planes = idx
    for h in (1, 2):
        rr = _mean_recall(
            spark, corpus,
            lambda sp, q, h=h: S.ivfpq_serve_rerank(
                sp, path, q, k=K, shortlist=50, probe_hamming=h
            ),
        )
        adc = _mean_recall(
            spark, corpus,
            lambda sp, q, h=h: S.ivfpq_query_indexed(
                sp, path, books, q, planes, k=K, probe_hamming=h
            ),
        )
        assert rr >= 0.45, f"rerank recall@{K} h={h} degraded: {rr}"
        assert adc >= 0.15, f"ADC recall@{K} h={h} degraded: {adc}"
        assert rr >= adc, f"re-rank below raw ADC at h={h}: {rr} < {adc}"


@pytest.fixture(scope="module")
def residual_idx(spark):
    """The TRAINED residual index (Lloyd coarse centroids + residual-
    trained codebooks — deterministic, not SQL-expressible; the
    deterministic variant backs the value oracles instead)."""
    path, cents, books = S.residual_ivfpq_index_cached(
        spark, SF_CORRECT, nlist=8, m=4, ksub=16, trained=True,
        store_cols=("embedding",),
    )
    return path


def test_residual_ivfpq_recall_floors(spark, corpus, residual_idx):
    """r15 (r14 verdict next #2): residual encoding raises the recall
    floors the hyperplane-coarse index could not reach. Measured
    (sf0.01, same 5 fixed queries, trained quantizers, m=4/ksub=16 —
    the SAME code budget as the hyperplane index): rerank@10
    nprobe=4/shortlist=100 mean 0.78 (hyperplane shortlist=100: 0.70);
    raw per-cell ADC@10 nprobe=4 mean ~0.28 (hyperplane: 0.30-0.32 at
    a much larger probe volume). Floors pinned with margin: rerank ≥
    0.7 — the verdict's stated target — and ADC ≥ 0.2."""
    rr = _mean_recall(
        spark, corpus,
        lambda sp, q: S.residual_ivfpq_serve_rerank(
            sp, residual_idx, q, k=K, shortlist=100, nprobe=4
        ),
    )
    adc = _mean_recall(
        spark, corpus,
        lambda sp, q: S.residual_ivfpq_topk(
            sp, residual_idx, q, k=K, nprobe=4
        ),
    )
    assert rr >= 0.7, f"residual rerank recall@{K} degraded: {rr}"
    assert adc >= 0.2, f"residual ADC recall@{K} degraded: {adc}"
    assert rr >= adc


def test_residual_recall_grows_with_nprobe(spark, corpus, residual_idx):
    """nprobe is the residual form's recall/cost dial: probing every
    cell must not retrieve worse than probing two, and with the full
    probe set + a generous shortlist the re-rank recovers ≥ 0.9."""
    def at(npb, sl):
        return _mean_recall(
            spark, corpus,
            lambda sp, q: S.residual_ivfpq_serve_rerank(
                sp, residual_idx, q, k=K, shortlist=sl, nprobe=npb
            ),
        )

    r2, r8 = at(2, 100), at(8, 200)
    assert r8 >= r2, (r2, r8)
    assert r8 >= 0.9, f"full-probe rerank recall degraded: {r8}"


def test_rerank_recall_grows_with_shortlist(spark, corpus, idx):
    """The shortlist is the recall/cost dial (measured: 50 → 0.58,
    100 → 0.70, 200 → 0.74): a widened shortlist must not retrieve
    worse — catches a candidate-nomination bug that a fixed-shortlist
    bound would miss."""
    path, _books, _planes = idx

    def at(sl):
        return _mean_recall(
            spark, corpus,
            lambda sp, q: S.ivfpq_serve_rerank(
                sp, path, q, k=K, shortlist=sl, probe_hamming=1
            ),
        )

    r50, r200 = at(50), at(200)
    assert r200 >= r50, (r50, r200)
    assert r200 >= 0.6, f"shortlist=200 recall degraded: {r200}"


def test_hyperplane_sql_parity(spark, corpus):
    """r15: hyperplane_bucket's SQL fast path (one server-side parse —
    the Column form built n_planes x dim literal nodes through py4j,
    ~0.3 s of per-tick plan-construction time) must stay BIT-identical
    to the Column form: same fold order, same cast-to-double element
    math, array_join(transform) == concat of per-plane sign bits. Run
    over the real sf0.01 embeddings — every vector, both forms."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_CORRECT, "embeddings")
    planes = S.fixed_planes(64, 4)
    both = emb.select(
        "vec_id",
        S.hyperplane_bucket(
            F.col("embedding").cast("array<double>"), planes
        ).alias("b_col"),
        S.hyperplane_bucket(
            "cast(`embedding` as array<double>)", planes
        ).alias("b_sql"),
    )
    assert both.filter(F.col("b_col") != F.col("b_sql")).count() == 0
    assert both.filter(F.col("b_sql").isNull()).count() == 0
