"""r15: the object-store strategy, PROVEN — the index tiers' swap
protocols running against a backend with NO atomic rename
(metastore.NoRenameMetastore), via the manifest-pointer generation
form the metastore contract promises (metastore.py docstring): writers
stage a complete new generation directory under the index root, CAS
the sidecar's ``generation`` pointer in one publish, and reclaim the
superseded generation under the writer lease. This file pins the
crash windows and the served-value invariance; the FULL index /
docstore / IVF-PQ / compaction suites additionally run against this
backend in CI (``make test-norename`` —
SPARK_GRAFT_METASTORE=norename selects it process-wide).

POSIX plan-neutrality is pinned here too: the default backend never
writes a ``generation`` key, so every existing inputFiles/pruning pin
keeps meaning what it meant.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import djangoadmin_postgresql_2_elasticseach_spark.metastore as MS
from djangoadmin_postgresql_2_elasticseach_spark.functions import text as T
from djangoadmin_postgresql_2_elasticseach_spark.operators import similarity as S
from djangoadmin_postgresql_2_elasticseach_spark.search import index as IX
from djangoadmin_postgresql_2_elasticseach_spark.search.bm25 import (
    bm25_topk_from_index,
)
from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_table
from tests.conftest import POSIX_METASTORE, SF_SMOKE


@pytest.fixture()
def norename():
    prev = MS.set_metastore(MS.NoRenameMetastore())
    yield MS.get_metastore()
    MS.set_metastore(prev)


@pytest.fixture(scope="module")
def toks(spark):
    return (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 60)
        .withColumn("tokens", T.analyze(F.col("text")))
        .localCheckpoint(eager=True)
    )


def _serve(spark, path, q="spark vector join", k=10):
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in bm25_topk_from_index(spark, path, q, k=k).collect()
    ]


def _build_ticked(spark, toks, path):
    IX.build_posting_index(
        toks.filter(F.col("doc_id") < 30), path, tokens_col="tokens",
        store_cols=("text",),
    )
    IX.upsert_posting_index(
        toks.filter(F.col("doc_id") >= 30), path, tokens_col="tokens",
        store_cols=("text",),
    )


@pytest.mark.skipif(
    not POSIX_METASTORE,
    reason="pins the DEFAULT backend's plan-neutrality; meaningless "
    "when the norename backend is installed process-wide",
)
def test_posix_indexes_never_carry_a_generation(spark, toks, tmp_path):
    """Plan-neutrality pin: on the default backend the pointer does not
    exist — artifacts stay at the bare root through builds, ticks, and
    both compactions, so every existing physical pin is untouched."""
    path = str(tmp_path / "idx")
    _build_ticked(spark, toks, path)
    IX.compact_posting_index(spark, path)
    meta = IX.read_posting_meta(path)
    assert "generation" not in meta
    df = bm25_topk_from_index(spark, path, "spark vector", k=5)
    pdir = os.path.join(path, "postings")
    assert df.inputFiles() and all(pdir in f for f in df.inputFiles())


def test_norename_full_compaction_is_a_pointer_swap(
    spark, toks, tmp_path, norename
):
    """Under the no-rename backend the full compaction writes the next
    generation and CASes the pointer: served values are invariant, the
    superseded artifacts are reclaimed, and no rename ever happens
    (the backend raises if one is attempted)."""
    path = str(tmp_path / "idx")
    _build_ticked(spark, toks, path)
    before = _serve(spark, path)
    assert before
    # a delete so compaction has tombstones to retire
    victim = before[-1][0]
    IX.delete_from_posting_index(
        spark.createDataFrame([(victim,)], "doc_id long"), path
    )
    pre_del = _serve(spark, path)
    assert victim not in [d for d, _ in pre_del]
    IX.compact_posting_index(spark, path)
    meta = IX.read_posting_meta(path)
    assert meta["generation"] == 1
    assert meta["dead_ranges"] == []
    assert _serve(spark, path) == pre_del
    # superseded root-level artifacts are gone; only the generation
    # dir + sidecar + lease remain
    assert not os.path.isdir(os.path.join(path, "postings"))
    assert not os.path.isdir(os.path.join(path, "_tombstones"))
    assert os.path.isdir(os.path.join(path, "_gen-1", "postings"))
    # the serve plan reads the generation directories and nothing else
    df = bm25_topk_from_index(spark, path, "spark vector", k=5)
    gdir = os.path.join(path, "_gen-1")
    assert df.inputFiles() and all(gdir in f for f in df.inputFiles())
    # a second compaction moves the pointer again and reclaims gen-1
    IX.compact_posting_index(spark, path)
    assert IX.read_posting_meta(path)["generation"] == 2
    assert not os.path.isdir(os.path.join(path, "_gen-1"))
    assert _serve(spark, path) == pre_del


def test_norename_ticks_append_into_current_generation(
    spark, toks, tmp_path, norename
):
    """Appends need no rename anywhere: after a generation swap, ticks
    land inside the current generation root and N-ticks == one-shot
    still holds exactly."""
    path = str(tmp_path / "idx")
    IX.build_posting_index(
        toks.filter(F.col("doc_id") < 20), path, tokens_col="tokens",
        store_cols=("text",),
    )
    IX.compact_posting_index(spark, path)  # -> generation 1
    IX.upsert_posting_index(
        toks.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 60)),
        path, tokens_col="tokens", store_cols=("text",),
    )
    oneshot = str(tmp_path / "oneshot")
    IX.build_posting_index(
        toks, oneshot, tokens_col="tokens", store_cols=("text",)
    )
    assert _serve(spark, path) == _serve(spark, oneshot)
    # the tick's artifacts really live under the generation root
    assert os.path.isdir(os.path.join(path, "_gen-1", "_tombstones"))


def test_norename_crash_before_pointer_publish_serves_old_view(
    spark, toks, tmp_path, norename
):
    """A compaction that dies after staging the new generation but
    BEFORE the pointer CAS leaves the old view served and the staging
    as unreferenced debris; the next compaction reclaims it."""
    path = str(tmp_path / "idx")
    _build_ticked(spark, toks, path)
    before = _serve(spark, path)
    # simulate the crash: stage a complete bogus next generation and
    # never publish — readers must not resolve it
    os.makedirs(os.path.join(path, "_gen-1", "postings"))
    assert _serve(spark, path) == before
    assert "generation" not in IX.read_posting_meta(path)
    # the next full compaction publishes gen 2?? no — it computes
    # gen = pointer+1 = 1 and OVERWRITES the debris before staging
    IX.compact_posting_index(spark, path)
    assert IX.read_posting_meta(path)["generation"] == 1
    assert _serve(spark, path) == before


def test_norename_rebuild_swaps_generation(spark, toks, tmp_path, norename):
    """A rebuild over an existing index takes the generation form: the
    sliver build's view replaces the full one atomically at the meta
    publish, and the old generation's artifacts are reclaimed."""
    path = str(tmp_path / "idx")
    IX.build_posting_index(toks, path, tokens_col="tokens")
    full = _serve(spark, path)
    IX.build_posting_index(
        toks.filter(F.col("doc_id") < 30), path, tokens_col="tokens"
    )
    sliver_oracle = str(tmp_path / "sliver")
    IX.build_posting_index(
        toks.filter(F.col("doc_id") < 30), sliver_oracle,
        tokens_col="tokens",
    )
    assert IX.read_posting_meta(path)["generation"] == 1
    assert _serve(spark, path) == _serve(spark, sliver_oracle) != full
    assert not os.path.isdir(os.path.join(path, "postings"))


def test_norename_tiered_delegates_to_generation_rewrite(
    spark, toks, tmp_path, norename
):
    """The per-leaf fold protocol is rename-based; on a no-rename
    backend the tiered entry point runs the generation rewrite instead
    — same served view, pointer bumped."""
    path = str(tmp_path / "idx")
    _build_ticked(spark, toks, path)
    before = _serve(spark, path)
    IX.compact_posting_index_tiered(spark, path, max_files=1)
    assert IX.read_posting_meta(path)["generation"] == 1
    assert _serve(spark, path) == before


def test_norename_icontains_and_docstore_serve_after_swap(
    spark, tmp_path, norename
):
    """The unstemmed stored index (icontains + fetch path) works across
    a generation swap — chardict, docstore, and termdict all resolve
    through the pointer."""
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 60)
        .withColumn("tokens", T.analyze(F.col("text"), stem=False))
        .localCheckpoint(eager=True)
    )
    path = str(tmp_path / "idx")
    IX.build_posting_index(
        docs, path, tokens_col={"text": "tokens"}, stem=False,
        store_cols=("text",), char_ngrams=True,
    )
    want = sorted(
        (r["doc_id"], r["text"])
        for r in IX.icontains_from_index(spark, path, "usto").collect()
    )
    IX.compact_posting_index(spark, path)
    assert IX.read_posting_meta(path)["generation"] == 1
    got = sorted(
        (r["doc_id"], r["text"])
        for r in IX.icontains_from_index(spark, path, "usto").collect()
    )
    assert got == want and want
    assert IX.fetch_docs(spark, path, [docs.first()["doc_id"]]).count() == 1


def test_norename_ivfpq_full_lifecycle(spark, tmp_path, norename):
    """Vector tier: fresh build at the bare root, ticks into the
    current generation, staged REBUILD and compaction as pointer
    swaps, serves (probe / payload / rerank) resolving through the
    pointer — zero renames anywhere."""
    emb = load_table(spark, SF_SMOKE, "embeddings").localCheckpoint(
        eager=True
    )
    q = [float(x) for x in emb.first()["embedding"]]
    books = S.pq_codebooks_deterministic(emb, m=4, ksub=16)
    path = str(tmp_path / "ivf")
    planes = S.build_ivfpq_index(
        emb.filter(F.col("vec_id") % 2 == 0), path, books,
        store_cols=("embedding",),
    )
    assert "generation" not in S._ivfpq_meta(path)
    S.append_ivfpq_index(emb.filter(F.col("vec_id") % 2 == 1), path)
    ticked = [
        (r["vec_id"], round(r["approx_dist"], 6))
        for r in S.ivfpq_query_indexed(
            spark, path, books, q, planes, k=5
        ).collect()
    ]
    S.compact_ivfpq_index(spark, path)
    assert S._ivfpq_meta(path)["generation"] == 1
    assert [
        (r["vec_id"], round(r["approx_dist"], 6))
        for r in S.ivfpq_query_indexed(
            spark, path, books, q, planes, k=5
        ).collect()
    ] == ticked
    # upsert into the swapped generation, then exact re-rank from the
    # index's own stored tier
    S.upsert_ivfpq_index(emb.limit(3), path)
    rr = S.ivfpq_serve_rerank(spark, path, q, k=3).collect()
    assert len(rr) == 3
    # staged rebuild = pointer swap
    S.build_ivfpq_index(emb, path, books, store_cols=("embedding",))
    assert S._ivfpq_meta(path)["generation"] == 2
    assert not os.path.isdir(os.path.join(path, "_gen-1"))
    assert S.ivfpq_query_indexed(
        spark, path, books, q, planes, k=5
    ).count() == 5
