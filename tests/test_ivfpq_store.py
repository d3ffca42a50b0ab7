"""r13 stored-fields tier for the IVF-PQ vector index: payload columns
persisted WITH the index (`_docstore/`, id-bucket partitioned) under
the same commit/tombstone liveness as the codes — ANN serves return
(id, payload, score) with neither the embeddings float table nor any
corpus table in the plan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators import similarity as S
from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return (
        load_table(spark, SF_SMOKE, "embeddings")
        .limit(64)
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]


def _build(emb, path):
    books = S.pq_codebooks_deterministic(emb, m=4, ksub=16)
    planes = S.build_ivfpq_index(
        emb, path, books, n_planes=4, store_cols=("label",)
    )
    return books, planes


def test_stored_serve_returns_payload_without_float_table(
    spark, emb, qvec, tmp_path
):
    path = str(tmp_path / "ivfpq")
    books, planes = _build(emb, path)
    got = S.ivfpq_topk_stored(spark, path, qvec, k=5, probe_hamming=4)
    # every input file of the serve frame lives INSIDE the index dir —
    # no embeddings/corpus table anywhere in the plan
    for f in got.inputFiles():
        assert path in f, f
    rows = got.collect()
    assert [r.asDict() for r in rows] and list(rows[0].asDict()) == [
        "vec_id", "label", "approx_dist",
    ]
    # payload values match the source table; ranking matches the
    # code-only probe exactly
    want = S.ivfpq_query_indexed(
        spark, path, books, qvec, planes, k=5, probe_hamming=4
    ).collect()
    assert [(r["vec_id"], r["approx_dist"]) for r in rows] == [
        (r["vec_id"], r["approx_dist"]) for r in want
    ]
    labels = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    assert all(r["label"] == labels[r["vec_id"]] for r in rows)


def test_store_rides_upsert_delete_and_compaction(spark, emb, qvec, tmp_path):
    path = str(tmp_path / "ivfpq")
    _build(emb, path)
    top1 = S.ivfpq_topk_stored(spark, path, qvec, k=1, probe_hamming=4).first()
    vid = top1["vec_id"]
    # upsert the top hit with a CHANGED payload: the stored tier must
    # serve the new value under the same atomic commit
    changed = emb.filter(F.col("vec_id") == vid).withColumn(
        "label", F.lit(999).cast("int")
    )
    S.upsert_ivfpq_index(changed, path)
    got = S.ivfpq_topk_stored(spark, path, qvec, k=1, probe_hamming=4).first()
    assert got["vec_id"] == vid and got["label"] == 999
    # payload point lookup reads only the index tree (store +
    # tombstone liveness), never the embeddings table
    fetched = S.ivfpq_fetch_payload(spark, path, [vid])
    assert fetched.inputFiles() and all(path in f for f in fetched.inputFiles())
    assert fetched.first()["label"] == 999
    # compaction folds the store physically; serving is unchanged
    S.compact_ivfpq_index(spark, path)
    after = S.ivfpq_topk_stored(spark, path, qvec, k=1, probe_hamming=4).first()
    assert after["vec_id"] == vid and after["label"] == 999
    # deletes retire payload rows with the codes
    S.delete_from_ivfpq_index(
        spark.createDataFrame([(int(vid),)], "vec_id long"), path
    )
    remaining = {
        r["vec_id"]
        for r in S.ivfpq_topk_stored(
            spark, path, qvec, k=5, probe_hamming=4
        ).collect()
    }
    assert vid not in remaining


def test_store_batch_missing_column_fails_before_write(spark, emb, tmp_path):
    path = str(tmp_path / "ivfpq")
    _build(emb, path)
    with pytest.raises(ValueError, match="stored fields"):
        S.append_ivfpq_index(emb.drop("label"), path)


def test_serve_rerank_matches_table_rerank_and_stays_index_resident(
    spark, emb, qvec, tmp_path
):
    """ivfpq_serve_rerank == the same ADC shortlist re-ranked against
    the source float table (_exact_l2_rerank), and every file it reads
    lives inside the index directory."""
    path = str(tmp_path / "ivfpq")
    books = S.pq_codebooks_deterministic(emb, m=4, ksub=16)
    planes = S.build_ivfpq_index(
        emb, path, books, n_planes=4, store_cols=("label", "embedding")
    )
    got = S.ivfpq_serve_rerank(
        spark, path, qvec, k=5, shortlist=20, probe_hamming=4
    )
    assert got.inputFiles() and all(path in f for f in got.inputFiles())
    cand = S.ivfpq_query_indexed(
        spark, path, books, qvec, planes, k=20, probe_hamming=4
    ).select("vec_id")
    want = S._exact_l2_rerank(emb, cand, qvec, 5, "vec_id", "embedding")
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_serve_rerank_requires_stored_vectors(spark, emb, qvec, tmp_path):
    path = str(tmp_path / "ivfpq")
    _build(emb, path)  # stores label only
    with pytest.raises(ValueError, match="store_cols"):
        S.ivfpq_serve_rerank(spark, path, qvec, k=5)


def test_rebuild_holds_lease_for_whole_build(spark, emb, qvec, tmp_path):
    """r13 advice #4: build_ivfpq_index used to delete its own lease
    via the overwrite of ``path``, leaving the rest of the rebuild
    unprotected. Now the rebuild is STAGED (temp dir + rename) — a
    tick attempting to allocate MID-REBUILD hits the live lease and
    fails fast instead of committing into a generation about to be
    clobbered."""
    import threading

    from djangoadmin_postgresql_2_elasticseach_spark.search import index as IX

    path = str(tmp_path / "ivfpq")
    books, _planes = _build(emb, path)

    build_entered = threading.Event()
    let_build_finish = threading.Event()
    orig = S._build_ivfpq_staged

    def gated(*a, **k):
        build_entered.set()
        assert let_build_finish.wait(30)
        return orig(*a, **k)

    S._build_ivfpq_staged = gated
    result = {}

    def rebuild():
        try:
            result["planes"] = S.build_ivfpq_index(
                emb, path, books, n_planes=4, store_cols=("label",)
            )
        except Exception as e:  # noqa: BLE001 — surfaced below
            result["err"] = e

    t = threading.Thread(target=rebuild)
    t.start()
    try:
        assert build_entered.wait(30)
        # mid-rebuild: a tick's allocation is rejected by the lease
        with pytest.raises(IX.ConcurrentIndexWriter):
            S.append_ivfpq_index(emb.limit(4), path)
    finally:
        let_build_finish.set()
        S._build_ivfpq_staged = orig
        t.join(60)
    assert "err" not in result, result.get("err")
    # the rebuild completed, released the lease, and serves normally
    assert not os.path.exists(os.path.join(path, "_writer.lease"))
    got = S.ivfpq_topk_stored(spark, path, qvec, k=5, probe_hamming=4)
    assert got.count() == 5
    # and the post-rebuild index accepts ticks again
    S.append_ivfpq_index(emb.limit(4), path)
