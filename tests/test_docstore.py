"""Stored-fields tier (`docstore/`) of the incremental posting index —
the ES `_source` model: payload columns persist WITH the index,
maintained by the same ticks under the same atomic commits, so search
responses and point lookups never read the source corpus table.
Reference parity: ES stores `_source` per doc and serves GET /_doc/<id>
and search hits from it; the reference's API detail endpoint
(views.py retrieve) is the same point-lookup shape."""

from __future__ import annotations

import glob

import pytest
import os

from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.search.dsl import (
    search,
    search_indexed,
)
from tests.conftest import POSIX_METASTORE

from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
    append_posting_index,
    build_posting_index,
    compact_posting_index,
    compact_posting_index_tiered,
    delete_from_posting_index,
    fetch_docs,
    read_docstore,
    store_buckets,
    upsert_posting_index,
)

SCHEMA = "doc_id long, text string, lang string, n_chars long"


def _docs(spark, lo=1, hi=8):
    return spark.createDataFrame(
        [
            (i, f"alpha beta document number {i}", "en" if i % 3 else "fr", 100 + i)
            for i in range(lo, hi + 1)
        ],
        SCHEMA,
    )


def _build(spark, tmp_path, split=4):
    p = str(tmp_path / "idx")
    docs = _docs(spark)
    build_posting_index(
        docs.filter(F.col("doc_id") <= split), p, fields=("text",),
        id_col="doc_id", store_cols=("lang", "n_chars"),
    )
    append_posting_index(
        docs.filter(F.col("doc_id") > split), p, fields=("text",),
        id_col="doc_id",
    )
    return p, docs


def test_docstore_matches_corpus_projection(spark, tmp_path):
    p, docs = _build(spark, tmp_path)
    got = sorted(map(tuple, read_docstore(spark, p).collect()))
    want = sorted(
        map(tuple, docs.select("doc_id", "lang", "n_chars").collect())
    )
    assert got == want


def test_upsert_replaces_payload_delete_hides(spark, tmp_path):
    p, _docs_df = _build(spark, tmp_path)
    upsert_posting_index(
        spark.createDataFrame([(3, "gamma delta", "de", 999)], SCHEMA),
        p, fields=("text",), id_col="doc_id",
    )
    delete_from_posting_index(
        spark.createDataFrame([(5,)], "doc_id long"), p
    )
    rows = {r.doc_id: (r.lang, r.n_chars) for r in read_docstore(spark, p).collect()}
    assert rows[3] == ("de", 999)
    assert 5 not in rows and len(rows) == 7


def test_fetch_docs_point_lookup_partition_pruned(spark, tmp_path):
    p, _ = _build(spark, tmp_path)
    df = fetch_docs(spark, p, [3, 7])
    assert sorted(r.doc_id for r in df.collect()) == [3, 7]
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    want = store_buckets([3, 7], 16)
    assert any("dsb" in ln and "IN" in ln for ln in pf), plan[:3000]
    # and the pushed id predicate reaches the scan
    assert any("In(doc_id" in ln for ln in plan.splitlines()), plan[:3000]
    # driver-side bucket computation agrees with the physical layout:
    # the ids' buckets exist as dsb directories on disk
    leafs = {
        int(d.split("=")[1])
        for d in os.listdir(os.path.join(p, "docstore"))
        if d.startswith("dsb=")
    }
    assert set(want) <= leafs


def test_search_served_entirely_from_index(spark, tmp_path):
    """search_indexed over read_docstore == search over the corpus
    frame: a DSL body answered with NO source-table read at all."""
    p, docs = _build(spark, tmp_path)
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"text": "alpha"}}],
                "filter": [{"range": {"n_chars": {"gte": 103}}}],
            }
        },
        "size": 20,
        "aggs": {"langs": {"terms": {"field": "lang"}}},
    }
    scan = search(docs.select("doc_id", "text", "lang", "n_chars"), body, id_col="doc_id")
    stored = search_indexed(spark, read_docstore(spark, p), body, p, id_col="doc_id")
    # _source differs by design (the docstore holds stored fields, not
    # the text body) — compare ids, totals, and aggregations
    assert stored["hits"]["total"]["value"] == scan["hits"]["total"]["value"]
    assert [h["_id"] for h in stored["hits"]["hits"]] == [
        h["_id"] for h in scan["hits"]["hits"]
    ]
    assert stored["aggregations"] == scan["aggregations"]


def test_compactions_carry_and_fold_docstore(spark, tmp_path):
    p, _ = _build(spark, tmp_path)
    upsert_posting_index(
        spark.createDataFrame([(2, "epsilon zeta", "it", 555)], SCHEMA),
        p, fields=("text",), id_col="doc_id",
    )
    before = sorted(map(tuple, read_docstore(spark, p).collect()))
    # tiered: fold any docstore leaf past the small-file threshold;
    # values invariant
    compact_posting_index_tiered(spark, p, max_files=1)
    assert sorted(map(tuple, read_docstore(spark, p).collect())) == before
    # full: the directory swap must CARRY the docstore and drop the
    # dead payload version physically
    compact_posting_index(spark, p)
    assert sorted(map(tuple, read_docstore(spark, p).collect())) == before
    from djangoadmin_postgresql_2_elasticseach_spark.search import index as IX

    physical = spark.read.parquet(
        IX._art(p, "docstore", IX.read_posting_meta(p))
    ).count()
    assert physical == len(before)  # doc 2's old version is gone


def test_tick_missing_stored_column_rejected_before_write(spark, tmp_path):
    p, _ = _build(spark, tmp_path)
    n_files_before = len(
        glob.glob(os.path.join(p, "docstore", "*", "*.parquet"))
    )
    try:
        append_posting_index(
            spark.createDataFrame([(9, "eta")], "doc_id long, text string"),
            p, fields=("text",), id_col="doc_id",
        )
        raise AssertionError("expected ValueError")
    except ValueError as ex:
        assert "stores fields" in str(ex)
    # clean no-op: nothing was written anywhere
    n_files_after = len(
        glob.glob(os.path.join(p, "docstore", "*", "*.parquet"))
    )
    assert n_files_after == n_files_before
    assert 9 not in {r.doc_id for r in read_docstore(spark, p).collect()}


def test_string_keys_bucket_consistently(spark, tmp_path):
    """UUID-string doc keys (the reference's shape) hash to the same
    bucket driver-side and engine-side — a point lookup with a string
    id prunes to the right directory and finds the row."""
    p = str(tmp_path / "sidx")
    docs = spark.createDataFrame(
        [("a-1", "alpha beta", "en", 10), ("b-2", "beta gamma", "fr", 20)],
        "doc_id string, text string, lang string, n_chars long",
    )
    build_posting_index(
        docs, p, fields=("text",), id_col="doc_id",
        store_cols=("lang", "n_chars"),
    )
    got = fetch_docs(spark, p, ["b-2"]).collect()
    assert len(got) == 1 and got[0].lang == "fr"


def test_fetch_docs_dataframe_and_bulk_paths(spark, tmp_path):
    """fetch_docs accepts a key DataFrame (semi-join bulk path) and
    caps literal pruning at max_literal_ids — all three routes return
    the same live rows."""
    p, docs = _build(spark, tmp_path)
    want = sorted(
        map(tuple, docs.select("doc_id", "lang", "n_chars").filter(
            F.col("doc_id").isin([2, 4, 6])
        ).collect())
    )
    lit = sorted(map(tuple, fetch_docs(spark, p, [2, 4, 6]).collect()))
    keys = spark.createDataFrame([(2,), (4,), (6,)], ["doc_id"])
    joined = sorted(map(tuple, fetch_docs(spark, p, keys).collect()))
    forced = sorted(
        map(tuple, fetch_docs(spark, p, [2, 4, 6], max_literal_ids=2).collect())
    )
    assert lit == joined == forced == want


@pytest.mark.skipif(
    not POSIX_METASTORE,
    reason="pins the POSIX per-leaf rename-swap recovery protocol; "
    "no-rename backends fold via the generation rewrite "
    "(test_metastore_norename.py)",
)
def test_tiered_crash_mid_swap_recovers_leaf(spark, tmp_path):
    """A crash exactly between _swap_leaf's two renames leaves the leaf
    directory missing and its rows only in `_fold-old-<name>`; the next
    tiered pass must RESTORE it (rename back), not reclaim it as debris
    — no crash instant may lose a partition."""
    import shutil

    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        compact_posting_index_tiered,
        read_postings,
    )

    p, _ = _build(spark, tmp_path)
    before = sorted(map(tuple, read_postings(spark, p).collect()))
    # simulate the mid-swap crash on one postings leaf: old rows moved
    # aside, folded rows staged, leaf gone
    leaves = sorted(
        os.path.join(dp)
        for dp, _dns, fns in os.walk(os.path.join(p, "postings"))
        if any(f.endswith(".parquet") for f in fns)
    )
    from urllib.parse import quote

    leaf = leaves[0]
    enc = quote(os.path.relpath(leaf, p), safe="")
    os.rename(leaf, os.path.join(p, f"_fold-old-{enc}"))
    shutil.copytree(
        os.path.join(p, f"_fold-old-{enc}"), os.path.join(p, f"_fold-{enc}")
    )
    # the raw directory state IS the crash state: the leaf is gone and
    # its rows live only in the aside dir. (Observed on the filesystem,
    # not through the public reader — r15 moved the meta read, and with
    # it _maybe_recover_folds' first-access recovery, AHEAD of the file
    # listing, so the very first read through read_postings already
    # heals the leaf. Strictly better: no reader can ever see the torn
    # view.)
    assert not os.path.isdir(leaf)
    assert os.path.isdir(os.path.join(p, f"_fold-old-{enc}"))
    assert sorted(map(tuple, read_postings(spark, p).collect())) == before
    assert os.path.isdir(leaf)  # first access restored it
    compact_posting_index_tiered(spark, p, max_files=10_000)
    assert sorted(map(tuple, read_postings(spark, p).collect())) == before
    # all staging debris reclaimed
    assert not [
        d
        for dp, dns, _f in os.walk(p)
        for d in dns
        if d.startswith("_fold-")
    ]


def test_rebuild_without_store_clears_stale_docstore(spark, tmp_path):
    """Rebuilding an index WITHOUT store_cols over a path that had a
    stored tier must remove the old docstore — the fresh seq counter
    would otherwise resurrect the previous generation's payload rows
    (including tombstone-retired versions)."""
    p, docs = _build(spark, tmp_path)
    upsert_posting_index(
        spark.createDataFrame([(3, "gamma delta", "de", 999)], SCHEMA),
        p, fields=("text",), id_col="doc_id",
    )
    build_posting_index(docs, p, fields=("text",), id_col="doc_id")
    assert not os.path.exists(os.path.join(p, "docstore"))


def test_partial_tokens_col_still_validates_stem(spark, tmp_path):
    """A tick whose tokens_col covers only SOME fields must still fail
    the analyzer check for the uncovered ones — they are analyzed
    in-plan with the tick's stem and would mix analyzers."""
    from djangoadmin_postgresql_2_elasticseach_spark.functions.text import (
        analyze,
    )

    p = str(tmp_path / "mixidx")
    docs = spark.createDataFrame(
        [(1, "running quickly", "books")],
        "doc_id long, text string, source string",
    )
    build_posting_index(
        docs, p, fields=("text", "source"), id_col="doc_id", stem=False
    )
    batch = spark.createDataFrame(
        [(2, "jumping high", "wiki")],
        "doc_id long, text string, source string",
    ).withColumn("tokens", analyze(F.col("text"), stem=False))
    try:
        append_posting_index(
            batch, p, fields=("text", "source"), id_col="doc_id",
            stem=True, tokens_col={"text": "tokens"},
        )
        raise AssertionError("expected ValueError")
    except ValueError as ex:
        assert "mix" in str(ex) and "source" in str(ex)
