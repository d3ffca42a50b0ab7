"""Inverted-index materialization: posting-table lookups must equal the
scan-based search results; analyzer config parses from the reference's
actual ES settings JSON; salted join equals plain join."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import salted_join
from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
    analyzed_docs,
    analyzer_from_es_settings,
    doc_frequencies,
    load_es_settings,
    posting_table,
    term_lookup,
)
from djangoadmin_postgresql_2_elasticseach_spark.search.query import match_query
from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE

REF_ES_SETTINGS = "/root/reference/etl/json/es_movies.json"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


@pytest.fixture(scope="module")
def postings(docs):
    return posting_table(docs, ["text"], id_col="doc_id").cache()


def test_posting_lookup_equals_scan(docs, postings):
    """Index path ≡ scan path for a term query (stemmed token)."""
    via_index = term_lookup(postings, docs, "doc_id", "text", "spark")
    via_scan = match_query(docs, "text", "spark")
    a = {r["doc_id"] for r in via_index.collect()}
    b = {r["doc_id"] for r in via_scan.collect()}
    assert a == b and len(a) > 0


def test_analyzed_docs_columns(docs):
    out = analyzed_docs(docs, ["text"])
    assert "text_tokens" in out.columns
    row = out.filter(F.col("doc_id") == 0).first()
    assert len(row["text_tokens"]) > 0
    assert all(t == t.lower() for t in row["text_tokens"])


def test_doc_frequencies(postings, docs):
    df_stats = {r["token"]: r["df"] for r in doc_frequencies(postings).collect()}
    n_docs = docs.count()
    assert 0 < df_stats["spark"] <= n_docs
    # df can never exceed corpus size
    assert all(v <= n_docs for v in df_stats.values())


@pytest.mark.skipif(
    not os.path.exists(REF_ES_SETTINGS), reason="reference repo not mounted"
)
def test_analyzer_config_from_reference_settings():
    """The engine's analyzer chain is derivable from the reference's own
    ES settings JSON (etl/json/es_movies.json:4-40)."""
    cfg = analyzer_from_es_settings(load_es_settings(REF_ES_SETTINGS))
    assert cfg["tokenizer"] == "standard"
    assert cfg["stem"] is True
    # both builtin stop sets resolved
    assert "the" in cfg["stopwords"] and "не" in cfg["stopwords"]
    # the chain the reference declares
    for expected in ("lowercase", "english_stop", "russian_stop"):
        assert any(expected in f for f in cfg["filters"]), cfg["filters"]


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey", salt=4).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_analyzed_corpus_cache_builds_and_invalidates(spark, tmp_path):
    """The persisted index-time artifact must (1) serve identical tokens
    to a fresh analysis, (2) reuse the artifact while the corpus is
    unchanged, (3) rebuild when the corpus file changes."""
    import os

    from djangoadmin_postgresql_2_elasticseach_spark.functions import text as T
    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        analyzed_corpus_cached,
    )
    from pyspark.sql import functions as F

    sf = str(tmp_path / "sf")
    cache = str(tmp_path / "cache")
    os.makedirs(sf)
    docs = spark.createDataFrame(
        [(1, "Running dogs ran quickly"), (2, "кошки бегали быстро")],
        "doc_id long, text string",
    )
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    got = {
        r["doc_id"]: r["tokens"]
        for r in analyzed_corpus_cached(spark, sf, cache_root=cache).collect()
    }
    want = {
        r["doc_id"]: r["tokens"]
        for r in docs.select(
            "doc_id", T.analyze(F.col("text")).alias("tokens")
        ).collect()
    }
    assert got == want
    # second call reuses the same artifact (exactly one cache dir)
    analyzed_corpus_cached(spark, sf, cache_root=cache).collect()
    dirs = [d for d in os.listdir(cache) if d.startswith("analyzed-")]
    assert len(dirs) == 1
    # corpus change → new key → rebuild picks up the new row
    docs2 = spark.createDataFrame(
        [(1, "Running dogs ran quickly"), (2, "кошки бегали быстро"),
         (3, "new document arrives")],
        "doc_id long, text string",
    )
    docs2.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    got2 = analyzed_corpus_cached(spark, sf, cache_root=cache)
    assert got2.count() == 3
    assert len([d for d in os.listdir(cache) if d.startswith("analyzed-")]) == 2


# ---------------------------------------------------------------------------
# Incremental posting index (r11): N ticks == one-shot, partition-pruned
# serving, compaction bounds the per-tick small files.
# ---------------------------------------------------------------------------

def _parquet_files(root):
    return [
        os.path.join(dp, fn)
        for dp, _, fns in os.walk(root)
        for fn in fns
        if fn.endswith(".parquet")
    ]


@pytest.fixture(scope="module")
def posting_idx(docs, tmp_path_factory):
    """Index built as build + 2 append ticks over disjoint corpus
    thirds — the same shape the registry's incremental_* queries use.
    The build runs the in-plan analyzer; the appends consume a
    PRE-ANALYZED tokens column (tokens_col), so the one-shot-parity
    assertions below also pin that the two ingest paths produce
    identical index rows."""
    from djangoadmin_postgresql_2_elasticseach_spark.functions import text as T
    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        append_posting_index,
        build_posting_index,
    )

    path = str(tmp_path_factory.mktemp("posting_idx"))
    build_posting_index(docs.filter(F.col("doc_id") % 3 == 0), path)
    toks = (
        docs.filter(F.col("doc_id") % 3 > 0)
        .select("doc_id", T.analyze(F.col("text")).alias("tokens"))
        .localCheckpoint(eager=True)
    )
    append_posting_index(
        toks.filter(F.col("doc_id") % 3 == 1), path, tokens_col="tokens"
    )
    append_posting_index(
        toks.filter(F.col("doc_id") % 3 == 2), path, tokens_col="tokens"
    )
    return path


def test_posting_index_ticks_equal_one_shot_df(spark, docs, posting_idx):
    """df served from the tick-built index must equal a from-scratch
    analysis of the full corpus — the O(delta) upkeep claim."""
    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        doc_frequencies_from_index,
    )

    got = {
        (r["field"], r["token"]): r["df"]
        for r in doc_frequencies_from_index(spark, posting_idx).collect()
    }
    want = {
        (r["field"], r["token"]): r["df"]
        for r in doc_frequencies(
            posting_table(docs, ["text"], id_col="doc_id")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_posting_index_bm25_matches_scan(spark, docs, posting_idx):
    """BM25 served from the index == the corpus-scan scorer, score and
    order, at the scorer's own 4dp rounding."""
    from djangoadmin_postgresql_2_elasticseach_spark.search.bm25 import (
        bm25_topk,
        bm25_topk_from_index,
    )

    q = "spark vector join"
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_from_index(spark, posting_idx, q, k=10).collect()
    ]
    want = [
        (r["doc_id"], r["score"]) for r in bm25_topk(docs, q, k=10).collect()
    ]
    assert got == want and len(got) == 10


def test_posting_index_probe_prunes_buckets(spark, posting_idx):
    """Serving plan pin: the postings scan must carry the driver-side
    crc32 bucket predicate as a PARTITION filter (field + tkb) — a term
    probe opens only the query terms' bucket directories."""
    from djangoadmin_postgresql_2_elasticseach_spark.search.bm25 import (
        bm25_topk_from_index,
    )

    df = bm25_topk_from_index(spark, posting_idx, "spark vector join", k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("tkb" in ln for ln in pf_lines), plan[:4000]


def test_posting_index_compaction_bounds_files(spark, docs, tmp_path):
    """After K ticks the index accumulates one file-set per tick;
    compaction folds them (file count strictly drops) without changing
    any served value."""
    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        append_posting_index,
        build_posting_index,
        compact_posting_index,
        doc_frequencies_from_index,
    )

    from djangoadmin_postgresql_2_elasticseach_spark.functions import text as T

    path = str(tmp_path / "idx")
    # pre-analyze the sliver once — the test is about FILES, and one
    # analyzer plan instead of four keeps it fast (the analyzer chain's
    # per-plan Catalyst cost dominates tiny-batch ticks)
    sliver = (
        docs.filter(F.col("doc_id") < 40)
        .select("doc_id", T.analyze(F.col("text")).alias("tokens"))
        .localCheckpoint(eager=True)
    )
    build_posting_index(
        sliver.filter(F.col("doc_id") < 10), path, tokens_col="tokens"
    )
    for lo, hi in ((10, 20), (20, 30), (30, 40)):
        append_posting_index(
            sliver.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            path,
            tokens_col="tokens",
        )
    before_files = len(_parquet_files(path))
    before = {
        (r["field"], r["token"]): r["df"]
        for r in doc_frequencies_from_index(spark, path).collect()
    }
    compact_posting_index(spark, path)
    after_files = len(_parquet_files(path))
    after = {
        (r["field"], r["token"]): r["df"]
        for r in doc_frequencies_from_index(spark, path).collect()
    }
    assert after == before
    assert after_files < before_files


def test_posting_index_empty_query_raises(spark, posting_idx):
    from djangoadmin_postgresql_2_elasticseach_spark.search.bm25 import (
        bm25_topk_from_index,
    )

    with pytest.raises(ValueError):
        bm25_topk_from_index(spark, posting_idx, "the and of")


def test_match_phrase_from_index_equals_scan(spark, docs, posting_idx):
    """Phrase search served from the positional postings == the
    scan-based match_phrase over the same corpus (the Lucene posting-
    intersection execution vs the token-array exists probe)."""
    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        match_phrase_from_index,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.search.query import (
        match_phrase,
    )

    for phrase in ("table hash", "spark", "distributed hash table"):
        got = {
            r["doc_id"]
            for r in match_phrase_from_index(
                spark, posting_idx, phrase
            ).collect()
        }
        want = {
            r["doc_id"]
            for r in match_phrase(docs, "text", phrase).collect()
        }
        assert got == want, phrase
    # at least one multi-term phrase must actually match something for
    # the parity above to mean anything
    assert (
        match_phrase_from_index(spark, posting_idx, "table hash").count() > 0
    )


def test_match_phrase_from_index_empty_phrase_raises(spark, posting_idx):
    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        match_phrase_from_index,
    )

    with pytest.raises(ValueError):
        match_phrase_from_index(spark, posting_idx, "the and of")


def test_posting_index_delete_upsert_and_merge(spark, tmp_path):
    """The Lucene/ES update model on the persisted index: deletes are
    tombstones (no index rewrite), an upsert's re-added rows outrank
    the tombstone, every reader serves only live versions, and
    compaction applies tombstones physically then clears them."""
    import os

    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        build_posting_index,
        compact_posting_index,
        delete_from_posting_index,
        doc_frequencies_from_index,
        match_phrase_from_index,
        read_doclens,
        read_postings,
        upsert_posting_index,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.search.query import (
        analyze_query,
    )

    a, b, c = analyze_query("alpha beta gamma")

    def mk(rows):
        return spark.createDataFrame(
            rows, "doc_id long, tokens array<string>"
        )

    path = str(tmp_path / "idx")
    build_posting_index(
        mk([(1, [a, b]), (2, [b, c]), (3, [a, b, c])]),
        path,
        tokens_col="tokens",
    )

    def df_now():
        return {
            r["token"]: r["df"]
            for r in doc_frequencies_from_index(spark, path).collect()
        }

    delete_from_posting_index(
        spark.createDataFrame([(2,)], "doc_id long"), path
    )
    assert df_now() == {a: 2, b: 2, c: 1}

    # upsert doc 1 -> [gamma, gamma]: old rows die, new version serves
    upsert_posting_index(mk([(1, [c, c])]), path, tokens_col="tokens")
    assert df_now() == {a: 1, b: 1, c: 2}
    hits = {
        r["doc_id"]
        for r in match_phrase_from_index(spark, path, "alpha beta").collect()
    }
    assert hits == {3}
    assert {
        (r["doc_id"], r["dl"]) for r in read_doclens(spark, path).collect()
    } == {(1, 2), (3, 3)}

    # compaction: values invariant, dead rows physically gone,
    # tombstone set cleared
    before = df_now()
    n_live = read_postings(spark, path).count()
    assert read_postings(spark, path, live_only=False).count() > n_live
    compact_posting_index(spark, path)
    assert df_now() == before
    assert read_postings(spark, path, live_only=False).count() == n_live
    assert not os.path.exists(os.path.join(path, "_tombstones"))


def test_posting_index_empty_batches(spark, tmp_path):
    """Empty corpus build and empty tick appends are no-ops: readers
    return empty/unchanged results instead of erroring — the
    empty-input convention every operator family here follows."""
    from djangoadmin_postgresql_2_elasticseach_spark.search.bm25 import (
        bm25_topk_from_index,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        append_posting_index,
        build_posting_index,
        delete_from_posting_index,
        doc_frequencies_from_index,
        match_phrase_from_index,
        upsert_posting_index,
    )

    empty = spark.createDataFrame([], "doc_id long, tokens array<string>")
    path = str(tmp_path / "idx")
    build_posting_index(empty, path, tokens_col="tokens")
    assert doc_frequencies_from_index(spark, path).count() == 0
    assert bm25_topk_from_index(spark, path, "anything spark").count() == 0
    assert match_phrase_from_index(spark, path, "any phrase").count() == 0

    one = spark.createDataFrame(
        [(1, ["alpha", "beta"])], "doc_id long, tokens array<string>"
    )
    append_posting_index(one, path, tokens_col="tokens")
    before = {
        (r["token"], r["df"])
        for r in doc_frequencies_from_index(spark, path).collect()
    }
    append_posting_index(empty, path, tokens_col="tokens")
    upsert_posting_index(empty, path, tokens_col="tokens")
    delete_from_posting_index(
        spark.createDataFrame([], "doc_id long"), path
    )
    after = {
        (r["token"], r["df"])
        for r in doc_frequencies_from_index(spark, path).collect()
    }
    assert after == before == {("alpha", 1), ("beta", 1)}


def test_posting_index_stem_config_is_honored(spark, tmp_path):
    """The index persists its build-time analyzer config; serving
    defaults to it (a stemmed query against a stem=False index would
    silently match nothing), and a mixed-analyzer append tick raises."""
    from djangoadmin_postgresql_2_elasticseach_spark.search.bm25 import (
        bm25_topk_from_index,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.search.index import (
        append_posting_index,
        build_posting_index,
        match_phrase_from_index,
    )

    docs = spark.createDataFrame(
        [(1, "running runners everywhere"), (2, "walking walks daily")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    build_posting_index(docs, path, stem=False)

    # query analyzed with the INDEX's config: 'running' stays unstemmed
    # and matches; under the old always-stem default it became 'run'
    # and silently matched nothing
    hits = bm25_topk_from_index(spark, path, "running", k=5)
    assert [r["doc_id"] for r in hits.collect()] == [1]
    assert {
        r["doc_id"]
        for r in match_phrase_from_index(
            spark, path, "running runners"
        ).collect()
    } == {1}

    with pytest.raises(ValueError, match="stem"):
        append_posting_index(
            spark.createDataFrame([(3, "jumping")], "doc_id long, text string"),
            path,
            stem=True,
        )
