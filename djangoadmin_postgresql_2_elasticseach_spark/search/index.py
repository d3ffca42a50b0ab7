"""Materialized search index — the Spark equivalent of Elasticsearch's
inverted index build (the reference delegates this to ES at bulk-index
time; mappings etl/json/es_movies.json).

Two artifacts, both plain DataFrames/parquet:

- analyzed doc table: source columns + one `<field>_tokens` array per
  searchable field (analyzer applied once at WRITE time, so queries skip
  re-analysis — ES's "index-time analysis").
- posting table: exploded (field, token, doc_id) — the inverted index.
  Term/match queries become a broadcast-able equi-join on `token`
  instead of a full scan; stored partitioned/bucketed by token prefix it
  is the serving path at 100 TB.

`term_lookup` uses the posting table; parity with the scan-based
search/query.py functions is pinned in tests/test_search_index.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T


def analyzed_docs(
    docs: DataFrame, fields: list[str], stem: bool = True
) -> DataFrame:
    """Add `<field>_tokens` analyzed-token columns (index-time analysis)."""
    out = docs
    for f in fields:
        out = out.withColumn(
            f"{f}_tokens", F.array_distinct(T.analyze(F.col(f), stem=stem))
        )
    return out


def _analyzer_version() -> str:
    """Content hash of the whole analyzer definition (tokenizer regex +
    stopword sets + the deterministic stemmer-SQL emission), so ANY rule
    change invalidates cached index artifacts automatically."""
    sig = "\x1f".join(
        (T.TOKEN_SPLIT_RE, ",".join(T.ALL_STOPWORDS), T.stem_sql("arr"))
    )
    return hashlib.md5(sig.encode()).hexdigest()[:12]


def analyzed_corpus_cached(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_root: str | None = None,
    extra_fields: tuple[str, ...] = (),
) -> DataFrame:
    """Index-time analysis, persisted: the (id, tokens) projection of the
    corpus with the full ru_en analyzer applied ONCE per corpus version,
    written as parquet and re-read by every subsequent query — the Spark
    realization of ES analyzing documents at bulk-index time (reference
    etl/main.py bulk path), not per search.

    Cache key = corpus file identity (path + mtime + size of every
    part file) + the analyzer-rule hash, so both data regeneration and
    stemmer changes invalidate. Token arrays are stored UN-deduplicated
    in document order; consumers needing a set apply array_distinct
    (cheap) downstream. At 100 TB this artifact is the search index's
    source of truth — built by the indexing pipeline, partitioned on
    write; queries never re-run the analyzer over document bodies.

    ``extra_fields`` analyzes additional columns into
    ``<field>_tokens`` alongside the primary ``tokens`` column (one
    artifact per field set) — the multi-field search queries
    (multi_match / query_string over text+source) read ALL their
    per-field token arrays from the one artifact.
    """
    src = os.path.join(sf_dir, f"{table}.parquet")
    parts = [src]
    if os.path.isdir(src):
        parts = sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(src)
            for f in fs
            if f.endswith(".parquet")
        ) or [src]
    ident = [
        os.path.abspath(src), _analyzer_version(), id_col, text_col,
        ",".join(extra_fields),
    ]
    for p in parts:
        st = os.stat(p)
        ident.append(f"{p}:{st.st_mtime_ns}:{st.st_size}")
    key = hashlib.md5("\x1f".join(ident).encode()).hexdigest()[:16]
    root = cache_root or os.environ.get(
        "SPARK_GRAFT_INDEX_CACHE",
        os.path.join(tempfile.gettempdir(), "spark_graft_index_cache"),
    )
    path = os.path.join(root, f"analyzed-{table}-{key}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from ..plans.tuning import spread

        docs = spread(
            spark.read.parquet(src).select(id_col, text_col, *extra_fields)
        )
        # build into a pid-suffixed dir, then one atomic rename — a
        # concurrent builder loses the race cleanly and reuses the winner
        tmp = f"{path}.build-{os.getpid()}"
        docs.select(
            id_col,
            T.analyze(F.col(text_col)).alias("tokens"),
            *[
                T.analyze(F.col(f)).alias(f"{f}_tokens")
                for f in extra_fields
            ],
        ).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)


def posting_table(
    docs: DataFrame, fields: list[str], id_col: str, stem: bool = True
) -> DataFrame:
    """Inverted index: one row per (field, token, doc_id).

    Scale notes: written sorted/bucketed by `token`, term lookups prune
    to one bucket; document frequency (for scoring) is a groupBy(token)
    count on this table — never a scan of the corpus.
    """
    parts = []
    for f in fields:
        parts.append(
            docs.select(
                F.lit(f).alias("field"),
                F.explode(F.array_distinct(T.analyze(F.col(f), stem=stem))).alias(
                    "token"
                ),
                F.col(id_col).alias("doc_id"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def term_lookup(
    postings: DataFrame, docs: DataFrame, id_col: str, field: str, token: str
) -> DataFrame:
    """Term query via the inverted index: filter postings (pushes to the
    token-bucketed scan) → semi-join docs. No corpus scan."""
    hits = postings.filter(
        (F.col("field") == field) & (F.col("token") == token)
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(F.broadcast(hits), id_col, "left_semi")


def doc_frequencies(postings: DataFrame) -> DataFrame:
    """df(token) per field — the scoring statistic ES keeps per segment."""
    return postings.groupBy("field", "token").agg(
        F.count_distinct(F.col("doc_id")).alias("df")
    )


# ---------------------------------------------------------------------------
# Incremental posting index (r11): O(delta) tick upkeep for the search
# artifact tier — the last rebuild-the-world artifact (r10 verdict #3).
# The reference's incremental ETL (etl/main.py:35) re-indexes only
# new/changed rows into ES; this is that posture for the Spark-side
# index: per-doc posting rows are independent across docs, so a tick
# APPENDS one batch's partials and never re-analyzes the corpus.
# ---------------------------------------------------------------------------

N_TOKEN_BUCKETS = 16


def _token_bucket(token) -> "F.Column":
    """Partition key for the postings layout: crc32(token) % 16 —
    computable engine-side AND in plain Python (zlib.crc32) so a query
    can turn its analyzed terms into a partition filter before any
    file opens."""
    return F.pmod(F.crc32(F.col(token) if isinstance(token, str) else token),
                  F.lit(N_TOKEN_BUCKETS))


def _posting_partials(
    docs: DataFrame,
    fields: tuple[str, ...],
    id_col: str,
    stem: bool,
    tokens_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One batch's index rows: postings (field, token, doc_id, tf) over
    the NON-deduplicated analyzed stream (tf is the BM25 term
    frequency; df = one row per (doc, token)) and doclens
    (field, doc_id, dl = Σ tf, derived FROM the postings partial so the
    batch is analyzed exactly once — the postings frame is eagerly
    materialized, batch-delta-sized, before the two writes read it).
    Docs whose analyzed stream is empty produce no rows — exactly the
    one-shot scorer's universe. Each posting also stores the token's
    sorted POSITIONS in the analyzed stream (the Lucene postings shape)
    so phrase queries are served from the index too
    (match_phrase_from_index) — positions are per-doc facts, so the
    append-tick contract is unchanged.

    ``tokens_col``: an ALREADY-ANALYZED array<string> column (the full
    T.analyze stream, duplicates kept — e.g. analyzed_corpus_cached's
    ``tokens``) to explode instead of re-running the analyzer. This is
    not just a convenience: the full Snowball chain is a very large
    Column expression whose per-query Catalyst cost (~10 s) is fixed
    regardless of batch size, so serving ticks from the persisted
    analyzed artifact is the same amortize-at-ingest posture every
    other analyzer query here takes. Single-field only (the artifact
    carries one field's stream)."""
    from ..plans.tuning import spread

    if tokens_col is not None and len(fields) != 1:
        raise ValueError("tokens_col requires exactly one field")
    post_parts = []
    for f in fields:
        if tokens_col is not None:
            toks = spread(docs.select(id_col, tokens_col)).select(
                F.col(id_col).alias("doc_id"),
                F.posexplode(F.col(tokens_col)).alias("pos", "token"),
            )
        else:
            toks = spread(docs.select(id_col, f)).select(
                F.col(id_col).alias("doc_id"),
                F.posexplode(T.analyze(F.col(f), stem=stem)).alias(
                    "pos", "token"
                ),
            )
        post_parts.append(
            toks.groupBy("doc_id", "token")
            .agg(
                F.count(F.lit(1)).alias("tf"),
                F.sort_array(F.collect_list("pos")).alias("positions"),
            )
            .select(
                F.lit(f).alias("field"),
                "token",
                "doc_id",
                "tf",
                "positions",
                _token_bucket("token").alias("tkb"),
            )
        )
    posts = post_parts[0]
    for p in post_parts[1:]:
        posts = posts.unionByName(p)
    # batch sequence stamp: liveness is "written after the doc's latest
    # tombstone" (the Lucene deleted-docs model — see
    # delete_from_posting_index). One value per batch; the single-writer
    # contract makes time monotone across ticks.
    import time as _time

    posts = posts.withColumn("seq", F.lit(_time.time_ns()))
    posts = posts.localCheckpoint(eager=True)
    lens = posts.groupBy("field", "doc_id", "seq").agg(
        F.sum("tf").alias("dl")
    ).select("field", "doc_id", "dl", "seq")
    return posts, lens


def _posting_meta_path(path: str) -> str:
    return os.path.join(path, "_index_meta.json")


def read_posting_meta(path: str) -> dict:
    """The index's build-time analyzer config ({"stem": bool, "fields":
    [...]}) — serving reads it so query analysis can never silently
    diverge from what the stored tokens went through. Absent on
    pre-meta indexes: callers fall back to the stemmed default."""
    p = _posting_meta_path(path)
    if not os.path.exists(p):
        return {"stem": True, "fields": ["text"]}
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def _write_posting_batch(
    posts: DataFrame, lens: DataFrame, path: str, mode: str
) -> None:
    """One batch's two writes, REPARTITIONED BY the partition columns
    first: without it every task holds an open parquet writer per
    partition directory it touches (tasks × ~17 dirs of concurrent
    row-group buffers — enough to OOM a default heap on a tiny batch,
    and a files-per-tick explosion at scale). After the slim
    batch-delta-sized shuffle, each partition directory is written by
    exactly one task: bounded writer memory, one file per (field, tkb)
    per tick."""
    from ..session import free_local_checkpoint

    posts.repartition("field", "tkb").write.mode(mode).partitionBy(
        "field", "tkb"
    ).parquet(os.path.join(path, "postings"))
    lens.repartition("field").write.mode(mode).partitionBy(
        "field"
    ).parquet(os.path.join(path, "doclens"))
    # the batch checkpoint fed both writes — release its blocks, or a
    # long-running CDC driver leaks one batch-sized block set per tick
    free_local_checkpoint(posts)


def build_posting_index(
    docs: DataFrame,
    path: str,
    fields: tuple[str, ...] = ("text",),
    id_col: str = "doc_id",
    stem: bool = True,
    tokens_col: str | None = None,
) -> None:
    """Persist the serving search index: `postings/` PARTITIONED BY
    (field, token-bucket) — a term query prunes to one bucket directory
    before any file opens — and `doclens/` PARTITIONED BY field (the
    BM25 length-normalization table). Analyzer runs ONCE, at ingest
    (or earlier: pass ``tokens_col`` to build from a persisted analyzed
    stream, see _posting_partials). A REBUILD over an existing path
    also clears its tombstones — stale ones would hide the fresh rows
    of any doc deleted in the previous index generation (and liveness
    would silently ride wall-clock ordering across generations)."""
    import shutil

    shutil.rmtree(os.path.join(path, "_tombstones"), ignore_errors=True)
    posts, lens = _posting_partials(docs, fields, id_col, stem, tokens_col)
    _write_posting_batch(posts, lens, path, "overwrite")
    with open(_posting_meta_path(path), "w", encoding="utf-8") as fh:
        json.dump({"stem": stem, "fields": list(fields)}, fh)


def append_posting_index(
    new_docs: DataFrame,
    path: str,
    fields: tuple[str, ...] = ("text",),
    id_col: str = "doc_id",
    stem: bool = True,
    tokens_col: str | None = None,
) -> None:
    """Tick upkeep: append ONE batch's posting + doclen rows — O(batch)
    analyze/explode/agg, no corpus re-analysis, no index rewrite.
    Contract (same as the minhash/shingle indexes): batches are
    disjoint in doc_id — a CHANGED doc retires its old rows via the
    compaction/txlog path, not by double-appending. ``tokens_col``:
    append from an already-analyzed stream (_posting_partials). A tick
    whose ``stem`` disagrees with the index's build-time config raises
    — mixed-analyzer postings would be silently unsearchable."""
    if os.path.exists(_posting_meta_path(path)):
        built = read_posting_meta(path)["stem"]
        if tokens_col is None and stem != built:
            raise ValueError(
                f"index at {path} was built with stem={built}; "
                f"appending stem={stem} rows would mix analyzers"
            )
    posts, lens = _posting_partials(new_docs, fields, id_col, stem, tokens_col)
    _write_posting_batch(posts, lens, path, "append")

    from ..plans.tuning import invalidate_spread_cache

    invalidate_spread_cache(new_docs.sparkSession)


def _apply_tombstones(
    spark: SparkSession, path: str, df: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """Exclude dead rows: a row is live iff no tombstone exists for its
    key, or it was written AFTER the key's latest tombstone (seq
    comparison — an upsert's re-added rows carry a newer seq than the
    delete that retired the old version). The tombstone set is bounded
    by churn between compactions (the compaction passes apply it
    physically and clear it), so the max-per-key frame broadcasts.
    Shared by the posting index (key=doc_id) and the IVF-PQ vector
    index (key=vec_id, operators/similarity.py)."""
    tpath = os.path.join(path, "_tombstones")
    if not os.path.exists(tpath):
        return df
    tomb = (
        spark.read.parquet(tpath)
        .groupBy(key)
        .agg(F.max("seq").alias("_tomb_seq"))
    )
    return (
        df.join(F.broadcast(tomb), key, "left")
        .filter(
            F.col("_tomb_seq").isNull() | (F.col("seq") > F.col("_tomb_seq"))
        )
        .drop("_tomb_seq")
    )


POSTINGS_SCHEMA = (
    "token string, doc_id long, tf long, positions array<int>, seq long, "
    "field string, tkb int"
)
DOCLENS_SCHEMA = "doc_id long, dl long, seq long, field string"


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a parquet dataset, degrading to a typed EMPTY frame when the
    directory holds no data files (an all-empty-batch index writes only
    _SUCCESS — there is no footer to infer from). The declared schema
    uses the default long doc key; a real write always wins over it."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return spark.createDataFrame([], schema)


def read_postings(
    spark: SparkSession, path: str, live_only: bool = True
) -> DataFrame:
    df = _read_or_empty(spark, os.path.join(path, "postings"), POSTINGS_SCHEMA)
    return _apply_tombstones(spark, path, df) if live_only else df


def read_doclens(
    spark: SparkSession, path: str, live_only: bool = True
) -> DataFrame:
    df = _read_or_empty(spark, os.path.join(path, "doclens"), DOCLENS_SCHEMA)
    return _apply_tombstones(spark, path, df) if live_only else df


def delete_from_posting_index(
    doc_ids: DataFrame, path: str, id_col: str = "doc_id"
) -> None:
    """Mark documents deleted WITHOUT rewriting the index — the
    Lucene/ES deletion model (ES marks the old version deleted on every
    update; segment merges drop the bodies later). Appends (doc_id,
    seq) tombstones; every reader (df / BM25 / phrase) excludes rows at
    or below a doc's latest tombstone, and compact_posting_index
    applies tombstones physically and clears them. O(|deletes|) — the
    index is never scanned."""
    import time as _time

    # doc_id keeps the caller's key type (long testdata ids, the
    # reference's UUID strings) — the liveness join must type-match the
    # postings' doc_id
    doc_ids.select(
        F.col(id_col).alias("doc_id"),
        F.lit(_time.time_ns()).alias("seq"),
    ).write.mode("append").parquet(os.path.join(path, "_tombstones"))


def upsert_posting_index(
    new_docs: DataFrame,
    path: str,
    fields: tuple[str, ...] = ("text",),
    id_col: str = "doc_id",
    stem: bool = True,
    tokens_col: str | None = None,
) -> None:
    """Re-index CHANGED documents: tombstone the old rows (one slim
    append), then append the new versions' postings — the ES update
    path (reference etl/main.py re-indexes modified movies by _id; ES
    internally does exactly delete-mark + new segment). Cost is
    O(batch): the existing index is neither read nor rewritten. The
    re-added rows carry a newer batch seq than the tombstone, so
    readers serve only the new version; compaction folds the dead rows
    out physically."""
    delete_from_posting_index(new_docs.select(id_col), path, id_col)
    append_posting_index(new_docs, path, fields, id_col, stem, tokens_col)


def doc_frequencies_from_index(spark: SparkSession, path: str) -> DataFrame:
    """df(field, token) served from the persisted postings: each stored
    row is one (doc, token) occurrence (disjoint batches), so df is a
    COUNT over the slim index — SUM-merged across ticks by
    construction, N appends == one-shot rebuild exactly. The corpus is
    never touched."""
    return (
        read_postings(spark, path)
        .groupBy("field", "token")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def match_phrase_from_index(
    spark: SparkSession,
    path: str,
    phrase: str,
    field: str = "text",
    stem: bool | None = None,
) -> DataFrame:
    """ES ``match_phrase`` (slop=0) served from the PERSISTED positional
    postings — how Lucene actually executes phrase queries: intersect
    the phrase terms' posting lists and check positions line up
    consecutively, never touching documents. The scan is pruned to the
    analyzed terms' crc32 bucket directories (driver-side partition
    filter, same as bm25_topk_from_index) + a pushed ``token IN``;
    per-doc alignment is one native exists() over the first term's
    positions probing ``array_contains(pos_j, p + j)``.

    Returns matching ``doc_id`` rows (callers join back for payload —
    the index stays slim). Same stopword-gap divergence as the
    scan-based match_phrase (positions are post-stopword indexes);
    equal output to it over the same docs, pinned in tests."""
    import functools
    import operator
    import zlib

    from .query import analyze_query

    if stem is None:  # default to the index's build-time analyzer
        stem = read_posting_meta(path)["stem"]
    qterms = analyze_query(phrase, stem=stem)
    if not qterms:
        raise ValueError("empty phrase after analysis")
    buckets = sorted(
        {zlib.crc32(t.encode("utf-8")) % N_TOKEN_BUCKETS for t in qterms}
    )
    posts = read_postings(spark, path).filter(
        (F.col("field") == field)
        & F.col("tkb").isin(buckets)
        & F.col("token").isin(list(set(qterms)))
    )
    # one row per (doc, token) across disjoint batches, so first() picks
    # the unique positions array per term
    pivot = posts.groupBy("doc_id").agg(
        *[
            F.first(
                F.when(F.col("token") == F.lit(t), F.col("positions")),
                ignorenulls=True,
            ).alias(f"pos{i}")
            for i, t in enumerate(qterms)
        ]
    )
    all_present = functools.reduce(
        operator.and_,
        [F.col(f"pos{i}").isNotNull() for i in range(len(qterms))],
    )
    if len(qterms) == 1:
        aligned = F.lit(True)
    else:
        aligned = F.exists(
            F.col("pos0"),
            lambda p: functools.reduce(
                operator.and_,
                [
                    F.array_contains(F.col(f"pos{j}"), p + F.lit(j))
                    for j in range(1, len(qterms))
                ],
            ),
        )
    return pivot.filter(all_present).filter(aligned).select("doc_id")


def compact_posting_index(spark: SparkSession, path: str) -> None:
    """Fold the per-tick small files into one file-set per partition
    and apply tombstones physically (Lucene's segment merge: dead doc
    versions leave the data files; the tombstone set resets to empty).
    Periodic maintenance, not correctness — readers already serve the
    live view. Same single-writer overwrite-after-read contract as
    compact_token_count_index."""
    import shutil

    from ..session import free_local_checkpoint

    for sub, parts, schema in (
        ("postings", ["field", "tkb"], POSTINGS_SCHEMA),
        ("doclens", ["field"], DOCLENS_SCHEMA),
    ):
        p = os.path.join(path, sub)
        live = _apply_tombstones(
            spark, path, _read_or_empty(spark, p, schema)
        ).localCheckpoint(eager=True)
        live.repartition(*parts).write.mode("overwrite").partitionBy(
            *parts
        ).parquet(p)
        free_local_checkpoint(live)
    # both live sets are rewritten — drop the applied tombstones. A
    # crash before this point just re-applies them on the already-live
    # rows (idempotent: live rows are strictly newer than any tombstone)
    shutil.rmtree(os.path.join(path, "_tombstones"), ignore_errors=True)


def posting_index_cdc_sink(
    path: str,
    fields: tuple[str, ...] = ("title",),
    id_col: str = "id",
    compact_every: int = 64,
):
    """(sink, on_delete) pair wiring the persisted posting index into
    the incremental ETL drivers (streaming/incremental.IncrementalEtl,
    streaming/cdc.TxlogCdcEtl) — the engine serving the reference's
    ENTIRE loop end-to-end without an external Elasticsearch: the
    reference polls Postgres and bulk-upserts denormalized docs into
    ES by _id (etl/main.py bulk path); here the same tick upserts them
    into the Spark-side index (tombstone + re-add, O(batch)) and hard
    deletes become tombstones. Searches (term/BM25/phrase *_from_index)
    then serve the post-tick corpus — effectively-once composes with
    the drivers' commit-after-sink checkpointing because re-indexing
    the same batch twice just re-tombstones and re-adds the same
    version (last write wins, values identical).

    ``sink(docs, entity)`` ignores entities ≠ the indexed one when
    ``path`` is a str; pass a dict {entity: path} to index several.

    ``compact_every``: every Nth sink call per entity runs
    compact_posting_index. Upserting can't know which incoming docs are
    first-time inserts without reading the index, so EVERY indexed doc
    leaves a tombstone — without periodic compaction the tombstone set
    (and its broadcast liveness join) would grow with total docs ever
    processed, not with churn. Pass 0 to disable (caller owns
    maintenance)."""
    paths = path if isinstance(path, dict) else None
    ticks: dict[str, int] = {}

    def _path_for(entity: str):
        if paths is None:
            return path
        return paths.get(entity)

    def sink(docs: DataFrame, entity: str) -> None:
        p = _path_for(entity)
        if p is not None:
            upsert_posting_index(docs, p, fields=fields, id_col=id_col)
            ticks[entity] = ticks.get(entity, 0) + 1
            if compact_every and ticks[entity] % compact_every == 0:
                compact_posting_index(docs.sparkSession, p)

    def on_delete(ids: DataFrame, entity: str) -> None:
        p = _path_for(entity)
        if p is not None:
            delete_from_posting_index(ids, p, id_col=id_col)

    return sink, on_delete


# ---------------------------------------------------------------------------
# ES-settings-driven analyzer configuration
# ---------------------------------------------------------------------------


def analyzer_from_es_settings(settings: dict) -> dict:
    """Parse an ES index-settings JSON (the reference's
    etl/json/es_movies.json shape: settings.analysis.{filter,analyzer})
    into the engine's analyzer config: which filters run, and the
    stopword sets. Raises KeyError on an incompatible config — the
    reference's `dynamic: strict` spirit."""
    analysis = settings["settings"]["analysis"]
    analyzer = analysis["analyzer"]["ru_en"]
    chain = analyzer["filter"]
    stopwords: list[str] = []
    for filt_name in chain:
        filt = analysis["filter"].get(filt_name, {})
        if filt.get("type") == "stop":
            sw = filt.get("stopwords")
            # "_english_"/"_russian_" name the lucene built-in sets
            if sw == "_english_":
                stopwords.extend(T.EN_STOPWORDS)
            elif sw == "_russian_":
                stopwords.extend(T.RU_STOPWORDS)
            elif isinstance(sw, list):
                stopwords.extend(sw)
    return {
        "tokenizer": analyzer["tokenizer"],
        "filters": chain,
        "stopwords": stopwords,
        "stem": any("stemmer" in f for f in chain),
    }


def load_es_settings(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)
