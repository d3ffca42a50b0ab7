"""Product quantization (operators/similarity.py pq_*): code shape,
ADC ordering against a python reference, shortlist re-rank recall, and
trained-codebook sanity. Engine-vs-DuckDB value parity for the
deterministic-codebook ADC path runs in test_oracle_parity
(pq_topk_adc)."""

from __future__ import annotations

import pytest

from djangoadmin_postgresql_2_elasticseach_spark.operators import similarity as S
from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def vecs(emb):
    return {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }


def _sqdist(a, b):
    return sum((x - y) ** 2 for x, y in zip(a, b))


def test_codes_shape_and_python_parity(spark, emb, vecs):
    books = S.pq_codebooks_deterministic(emb, m=4, ksub=16)
    assert len(books) == 4 and len(books[0]) == 16 and len(books[0][0]) == 16
    codes = {
        r["vec_id"]: list(r["codes"]) for r in S.pq_encode(emb, books).collect()
    }
    assert all(len(c) == 4 and all(0 <= x < 16 for x in c) for c in codes.values())
    # python reference argmin (lowest code wins ties)
    some = list(vecs)[:25]
    for vid in some:
        v = vecs[vid]
        for j in range(4):
            sub = v[j * 16 : (j + 1) * 16]
            want = min(
                range(16), key=lambda c: (_sqdist(sub, books[j][c]), c)
            )
            assert codes[vid][j] == want, (vid, j)


def test_adc_matches_python_and_rerank_recall(spark, emb, vecs):
    books = S.pq_codebooks_deterministic(emb, m=4, ksub=16)
    codes_df = S.pq_encode(emb, books)
    q = vecs[min(vecs)]
    got = [
        (r["vec_id"], r["approx_dist"])
        for r in S.pq_topk(codes_df, books, q, k=10).collect()
    ]
    # python ADC reference
    codes = {
        r["vec_id"]: list(r["codes"]) for r in codes_df.collect()
    }
    table = [
        [_sqdist(q[j * 16 : (j + 1) * 16], books[j][c]) for c in range(16)]
        for j in range(4)
    ]
    ref = sorted(
        (
            (round(sum(table[j][codes[v][j]] for j in range(4)), 6), v)
            for v in codes
        )
    )[:10]
    assert [(v, d) for d, v in ref] == got
    # shortlist + exact re-rank beats raw ADC recall
    bf = sorted(vecs, key=lambda i: (_sqdist(vecs[i], q), i))[:10]
    raw = {v for v, _ in got}
    rer = {
        r["vec_id"]
        for r in S.pq_topk_rerank(
            codes_df, emb, books, q, k=10, shortlist=100
        ).collect()
    }
    assert len(rer & set(bf)) >= len(raw & set(bf))
    assert len(rer & set(bf)) >= 6  # measured 8/10 on this corpus


def test_trained_codebooks_encode_and_search(spark, emb, vecs):
    books = S.pq_train(emb, m=4, ksub=8, iters=3)
    assert len(books) == 4 and len(books[0]) == 8
    q = vecs[min(vecs)]
    got = S.pq_topk(S.pq_encode(emb, books), books, q, k=5).collect()
    assert len(got) == 5
    # the query vector itself must rank first (its cell contains it)
    assert got[0]["vec_id"] == min(vecs)


def test_dim_not_divisible_raises(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="not divisible"):
        S.pq_codebooks_deterministic(df, m=2, ksub=1)


def test_int8_quantization_roundtrip_and_accuracy(spark, emb, vecs):
    """Codes stay in [-127, 127]; quantized cosine tracks the exact
    float cosine within the sq8 error envelope; zero vectors are safe."""
    import math

    q = S.quantize_embeddings(emb)
    rows = q.collect()
    assert all(
        all(-127 <= x <= 127 for x in r["qvec"]) and r["scale"] >= 0
        for r in rows
    )
    query = vecs[min(vecs)]
    top = S.quantized_cosine_topk(q, query, k=10).collect()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    for r in top:
        exact = cos(vecs[r["vec_id"]], query)
        assert abs(r["qcos"] - exact) < 0.01, (r["vec_id"], r["qcos"], exact)
    # exact top-1 (the query itself) survives quantization
    assert top[0]["vec_id"] == min(vecs)

    zero = spark.createDataFrame(
        [(999, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    zq = S.quantize_embeddings(zero).collect()[0]
    assert zq["scale"] == 0.0 and set(zq["qvec"]) == {0}
    assert S.quantized_cosine_topk(
        S.quantize_embeddings(zero), query, k=1
    ).collect()[0]["qcos"] == 0.0


def test_ivf_pq_composition_matches_prune_then_adc(spark, emb, vecs):
    """ivf_pq_topk == (bucket-prune → encode → ADC) composed by hand:
    every returned id lies in the probe set, and distances equal the
    full-corpus ADC values restricted to the probed buckets (a vector's
    codes depend only on itself + the codebooks, so encode-after-prune
    must be result-identical)."""
    books = S.pq_codebooks_deterministic(emb, m=4, ksub=16)
    q = vecs[min(vecs)]
    planes = S.fixed_planes(len(q), 4)
    probes = S.probe_buckets(q, planes, 1)
    assert len(probes) == 5  # exact bucket + 4 single-bit flips

    got = [
        (r["vec_id"], r["approx_dist"])
        for r in S.ivf_pq_topk(emb, books, q, k=10).collect()
    ]
    # hand composition: full-corpus ADC, then keep only probed ids
    from pyspark.sql import functions as F

    bucketed = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id",
            S.hyperplane_bucket(
                F.col("embedding").cast("array<double>"), planes
            ).alias("b"),
        ).collect()
    }
    full_adc = S.pq_topk(
        S.pq_encode(emb, books), books, q, k=len(vecs)
    ).collect()
    want = [
        (r["vec_id"], r["approx_dist"])
        for r in full_adc
        if bucketed[r["vec_id"]] in probes
    ][:10]
    assert got == want
    assert all(bucketed[vid] in probes for vid, _ in got)


def test_ivf_pq_rerank_recall_at_least_adc(spark, emb, vecs):
    """Exact re-rank of the IVF-PQ shortlist: within the probed
    buckets, recall vs the probe-restricted exact ranking must be >=
    the raw ADC ordering's (the rerank can only fix ADC mistakes), and
    returned distances are the true squared-L2 values."""
    books = S.pq_codebooks_deterministic(emb, m=4, ksub=16)
    q = vecs[min(vecs)]
    planes = S.fixed_planes(len(q), 4)
    probes = S.probe_buckets(q, planes, 1)
    from pyspark.sql import functions as F

    bucketed = {
        r["vec_id"]: r["b"]
        for r in emb.select(
            "vec_id",
            S.hyperplane_bucket(
                F.col("embedding").cast("array<double>"), planes
            ).alias("b"),
        ).collect()
    }
    in_probe = [vid for vid in vecs if bucketed[vid] in probes]
    exact = sorted(
        in_probe, key=lambda vid: (_sqdist(vecs[vid], q), vid)
    )[:10]
    got = S.ivf_pq_topk_rerank(
        emb, books, q, k=10, shortlist=50
    ).collect()
    got_ids = [r["vec_id"] for r in got]
    adc_ids = [
        r["vec_id"] for r in S.ivf_pq_topk(emb, books, q, k=10).collect()
    ]
    want = set(exact)
    assert len(set(got_ids) & want) >= len(set(adc_ids) & want)
    for r in got:
        assert r["dist"] == round(_sqdist(vecs[r["vec_id"]], q), 6)


def test_ivfpq_index_ticks_upsert_equal_one_shot(spark, emb, vecs, tmp_path):
    """Tick-maintained IVF-PQ index (r11): build + frozen-codebook
    append + an UPSERT tick must serve exactly the one-shot indexed
    query; deletes tombstone vectors out; compaction applies
    tombstones physically and values stay invariant."""
    import os

    from pyspark.sql import functions as F

    books = S.pq_codebooks_deterministic(emb, m=4, ksub=16)
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]

    one = str(tmp_path / "one_shot")
    planes = S.build_ivfpq_index(emb, one, books, n_planes=4)
    want = [
        tuple(r)
        for r in S.ivfpq_query_indexed(
            spark, one, books, q, planes, k=10
        ).collect()
    ]

    tick = str(tmp_path / "ticks")
    planes2 = S.build_ivfpq_index(
        emb.filter(F.col("vec_id") % 3 == 0), tick, books, n_planes=4
    )
    assert planes2 == planes
    S.append_ivfpq_index(emb.filter(F.col("vec_id") % 3 == 1), tick)
    S.upsert_ivfpq_index(emb.filter(F.col("vec_id") % 3 == 2), tick)
    got = [
        tuple(r)
        for r in S.ivfpq_query_indexed(
            spark, tick, books, q, planes, k=10
        ).collect()
    ]
    assert got == want and len(got) == 10

    # delete the current top hit -> it disappears, the rest keep order
    top_id = got[0][0]
    S.delete_from_ivfpq_index(
        spark.createDataFrame([(top_id,)], "vec_id long"), tick
    )
    after = [
        tuple(r)
        for r in S.ivfpq_query_indexed(
            spark, tick, books, q, planes, k=10
        ).collect()
    ]
    assert top_id not in {r[0] for r in after}
    assert after[: len(want) - 1] == [r for r in want if r[0] != top_id][:9]

    # compaction: physical drop, tombstones cleared, served values same
    n_raw = spark.read.parquet(S._ivfpq_root(tick)).count()
    S.compact_ivfpq_index(spark, tick)
    # resolve through the generation pointer: same dir on POSIX,
    # _gen-<g> after a no-rename pointer swap
    assert spark.read.parquet(S._ivfpq_root(tick)).count() < n_raw
    assert not os.path.exists(
        os.path.join(S._ivfpq_root(tick), "_tombstones")
    )
    assert [
        tuple(r)
        for r in S.ivfpq_query_indexed(
            spark, tick, books, q, planes, k=10
        ).collect()
    ] == after


def test_ivfpq_index_empty_build_serves_empty(spark, tmp_path):
    """An all-empty index (zero-doc build) serves an empty result
    instead of a schema-inference error."""
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    books = [[[0.0] * 4] * 2] * 4  # 4 subspaces x 2 centroids x ds=4
    path = str(tmp_path / "idx")
    planes = S.build_ivfpq_index(empty, path, books, n_planes=4)
    out = S.ivfpq_query_indexed(
        spark, path, books, [0.1] * 16, planes, k=5
    )
    assert out.count() == 0


# ---------------------------------------------------------------------------
# r15: residual-encoding IVF-PQ (IVFADC, Jégou et al. 2011 §V.A)
# ---------------------------------------------------------------------------


def test_residual_ivfpq_ticks_upsert_equal_one_shot(spark, emb, vecs, tmp_path):
    """The residual index under the SAME tick machinery: frozen
    centroids + codebooks make build-third + append + upsert == the
    one-shot probe exactly; deletes tombstone out; compaction is
    value-invariant; the probe prunes to the nprobe cell DIRECTORIES
    (PartitionFilters on the bucket column)."""
    import os

    from pyspark.sql import functions as F

    cents = S.coarse_centroids_deterministic(emb, nlist=8)
    books = S.residual_codebooks_deterministic(emb, cents, m=4, ksub=16)
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]

    one = str(tmp_path / "one_shot")
    S.build_ivfpq_index(emb, one, books, coarse_centroids=cents)
    want = [
        tuple(r)
        for r in S.residual_ivfpq_topk(spark, one, q, k=10, nprobe=3).collect()
    ]
    assert len(want) == 10

    tick = str(tmp_path / "ticks")
    S.build_ivfpq_index(
        emb.filter(F.col("vec_id") % 3 == 0), tick, books,
        coarse_centroids=cents,
    )
    S.append_ivfpq_index(emb.filter(F.col("vec_id") % 3 == 1), tick)
    S.upsert_ivfpq_index(emb.filter(F.col("vec_id") % 3 == 2), tick)
    got_df = S.residual_ivfpq_topk(spark, tick, q, k=10, nprobe=3)
    got = [tuple(r) for r in got_df.collect()]
    assert got == want

    # the probe is a partition filter over the cell directories
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "bucket" in pf[0], plan[:3000]

    # delete the top hit -> gone; compaction -> values invariant
    top_id = got[0][0]
    S.delete_from_ivfpq_index(
        spark.createDataFrame([(top_id,)], "vec_id long"), tick
    )
    after = [
        tuple(r)
        for r in S.residual_ivfpq_topk(spark, tick, q, k=10, nprobe=3).collect()
    ]
    assert top_id not in {r[0] for r in after}
    S.compact_ivfpq_index(spark, tick)
    assert [
        tuple(r)
        for r in S.residual_ivfpq_topk(spark, tick, q, k=10, nprobe=3).collect()
    ] == after


def test_residual_rerank_serves_from_stored_tier(spark, emb, tmp_path):
    """The rerank path reads full-precision vectors from the index's
    OWN stored tier — the embeddings table is not in the plan — and a
    payload-less index refuses loudly."""
    cents = S.coarse_centroids_deterministic(emb, nlist=8)
    books = S.residual_codebooks_deterministic(emb, cents, m=4, ksub=16)
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    path = str(tmp_path / "ridx")
    S.build_ivfpq_index(
        emb, path, books, coarse_centroids=cents,
        store_cols=("embedding",),
    )
    got = S.residual_ivfpq_serve_rerank(
        spark, path, q, k=5, shortlist=30, nprobe=3
    )
    rows = got.collect()
    assert len(rows) == 5 and rows[0]["vec_id"] == 0  # self-query
    assert all(path in f for f in got.inputFiles())
    bare = str(tmp_path / "bare")
    S.build_ivfpq_index(emb, bare, books, coarse_centroids=cents)
    with pytest.raises(ValueError, match="store_cols"):
        S.residual_ivfpq_serve_rerank(spark, bare, q, k=5)
