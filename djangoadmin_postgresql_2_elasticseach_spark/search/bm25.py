"""BM25 ranked retrieval — the full-text relevance operator behind the
reference's ES search surface (SURVEY §2.9 T2/O5; ES's default
similarity IS BM25, reference etl/json/es_movies.json mappings). The
deterministic 3·exact+1·fuzzy scorer in search/query.py stays as the
golden-test surface; this module is the production-ranking counterpart,
Spark-first and oracle-checked.

Plan shape (deliberate — two aggregations, zero per-term joins):
1. tokenize → explode → ONE groupBy(doc) computing doc length AND the
   per-query-term term frequencies as pivoted conditional sums (the
   query has a handful of terms, so tf columns are a fixed small set);
2. ONE global single-row aggregate over that frame computing N, avgdl,
   and per-term document frequencies;
3. broadcast cross-join of the 1-row stats + native column expression
   for Σ idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) → top-k via
   TakeOrderedAndProject.

At 100 TB both shuffles carry (doc_id, dl, tf...) rows — never token
postings across the wire twice, never document bodies. For a served
corpus, stage 1's output is the materialized index: store it
partitioned and step 2/3 become a scan of ~|query| columns.

idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the Robertson–Sparck Jones
form ES uses, always ≥ 0); scores rounded to 4dp for cross-engine
float-determinism, ties broken by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.tuning import spread
from .query import analyze_query, field_tokens, fuzzy_distance

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k docs by BM25 score for `query`. Returns (id, score).

    Terms are the ANALYZED stream on both sides (tokenize → stopwords →
    snowball, exactly like ES's BM25 which scores post-analysis terms);
    a frame carrying a persisted ``tokens`` column skips re-analysis."""
    qterms = analyze_query(query)
    if not qterms:
        raise ValueError("empty query after analysis")

    has_index = "tokens" in dict(docs.dtypes)
    base = docs.select(id_col, "tokens") if has_index else docs.select(id_col, text_col)
    toks = spread(base).select(
        F.col(id_col), F.explode(field_tokens(base, text_col)).alias("term")
    )
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("term") == F.lit(t)).cast("long")).alias(f"tf{i}")
            for i, t in enumerate(qterms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(qterms))
        ],
    )
    return _score_per_doc(per_doc, stats, len(qterms), id_col, k, k1, b)


def _score_per_doc(
    per_doc: DataFrame,
    stats: DataFrame,
    n_terms: int,
    id_col: str,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Stage 3 of the BM25 plan — broadcast the 1-row stats, build the
    RSJ score as ONE native column expression, top-k. Shared by the
    corpus-scan scorer and the persisted-index serving path so the
    score arithmetic exists once (two hand-kept copies would have to
    stay bit-identical for the 4dp parity assertions)."""
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(n_terms):
        tf = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / norm
    tf_cols = [F.col(f"tf{i}") for i in range(n_terms)]
    matched = (F.greatest(*tf_cols) if len(tf_cols) > 1 else tf_cols[0]) > 0
    return (
        scored.filter(matched)
        .select(F.col(id_col), F.round(score, 4).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def bm25_topk_from_index(
    spark,
    path: str,
    query: str,
    field: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = K1,
    b: float = B,
    stem: bool | None = None,
) -> DataFrame:
    """BM25 served from the persisted posting index (search/index.py
    build/append_posting_index) — the production path: the corpus is
    NEVER scanned or re-analyzed at query time. Postings are read with
    a partition filter (crc32 token bucket, computed driver-side for
    the analyzed query terms) plus a pushed `token IN (...)` predicate,
    so the scan opens ≤ |terms| bucket directories of the slim
    (token, doc_id, tf) table; doclens supplies dl/N/avgdl. Identical
    output to bm25_topk over the same docs — N appends == one-shot
    (tf/dl/df are per-doc facts, df a COUNT over disjoint batches).
    ``stem`` defaults to the index's persisted build-time setting
    (_index_meta.json): the query goes through the same analyzer the
    stored tokens did — a stemmed query against a stem=False index
    would silently match nothing."""
    import zlib

    from .index import (
        N_TOKEN_BUCKETS,
        read_doclens,
        read_posting_meta,
        read_postings,
    )

    if stem is None:  # default to the index's build-time analyzer
        stem = read_posting_meta(path)["stem"]
    qterms = analyze_query(query, stem=stem)
    if not qterms:
        raise ValueError("empty query after analysis")
    buckets = sorted(
        {zlib.crc32(t.encode("utf-8")) % N_TOKEN_BUCKETS for t in qterms}
    )
    posts = read_postings(spark, path).filter(
        (F.col("field") == field)
        & F.col("tkb").isin(buckets)
        & F.col("token").isin(list(set(qterms)))
    )
    pivot = posts.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("token") == F.lit(t), F.col("tf")).otherwise(0)
            ).alias(f"tf{i}")
            for i, t in enumerate(qterms)
        ]
    )
    lens = read_doclens(spark, path).filter(F.col("field") == field)
    per_doc = (
        lens.select("doc_id", "dl")
        .join(pivot, "doc_id", "left")
        .fillna(0, [f"tf{i}" for i in range(len(qterms))])
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(qterms))
        ],
    )
    scored = _score_per_doc(per_doc, stats, len(qterms), "doc_id", k, k1, b)
    return (
        scored if id_col == "doc_id"
        else scored.withColumnRenamed("doc_id", id_col)
    )


def multi_match_bm25(
    docs: DataFrame,
    query: str,
    fields: list[str],
    id_col: str = "doc_id",
    k: int = 10,
    max_edits: int = 1,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """ES-shaped ``multi_match`` ranking: per-field BM25, combined with
    ``best_fields`` (the ES default: doc score = MAX over fields), with
    fuzzy term expansion — each index term within ``max_edits`` of an
    analyzed query term scores with its own document frequency, scaled
    by Lucene's fuzzy boost ``1 − distance/len(term)``.

    This is the production-ranking counterpart of
    ``query.multi_match_fuzzy`` (which stays the deterministic golden
    scorer): on the reference's real dataset it reproduces the
    reference's pinned top-1 for the fuzzy "camp" golden
    (tests/test_reference_data_parity.py) — a short title field with an
    exact match outranks long-description matches through BM25 length
    normalization, exactly the behavior the reference asserts.

    Plan: per field — explode analyzed tokens → per-doc (dl, tf per
    matched term) in ONE aggregation → 1-row stats broadcast → score;
    fields union by doc with max. Scores round to 4dp, ties break by id.
    """
    qterms = analyze_query(query)
    if not qterms:
        raise ValueError("empty query after analysis")

    dtypes = dict(docs.dtypes)
    per_field_scores = []
    for field in fields:
        # carry the persisted token column through the projection when
        # the frame has one (field_tokens resolves it by name)
        tok_col = (
            "tokens"
            if field == "text" and "tokens" in dtypes
            else f"{field}_tokens"
        )
        keep = tok_col if tok_col in dtypes else field
        base = spread(docs.select(id_col, keep)).select(
            F.col(id_col), F.explode(field_tokens(docs, field)).alias("term")
        )
        # fuzzy expansion condition + boost per (query term, index term)
        matched = None
        for i, qt in enumerate(qterms):
            exact = F.col("term") == F.lit(qt)
            # threshold-bounded OSA distance (Damerau: a transposition
            # is ONE edit, ES transpositions:true) — NULL past
            # max_edits; within a match d IS the distance for the boost
            d = fuzzy_distance(F.col("term"), qt, max_edits)
            cond = exact | d.isNotNull() if max_edits > 0 else exact
            boost = F.when(exact, F.lit(1.0)).otherwise(
                F.lit(1.0) - d / F.greatest(F.length(F.col("term")), F.lit(1))
            )
            m = F.when(cond, boost).otherwise(F.lit(None)).alias(f"b{i}")
            matched = [m] if matched is None else matched + [m]
        per_doc = base.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("dl"),
            # tf of matched terms and max boost per query term
            *[
                F.sum(F.when(F.col("term").isNotNull() & m.isNotNull(), 1)
                      .otherwise(0)).alias(f"tf{i}")
                for i, m in enumerate(matched)
            ],
            *[F.max(m).alias(f"bo{i}") for i, m in enumerate(matched)],
        )
        stats = per_doc.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            *[
                F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
                for i in range(len(qterms))
            ],
        )
        scored = per_doc.crossJoin(F.broadcast(stats))
        fs = F.lit(0.0)
        for i in range(len(qterms)):
            tf = F.col(f"tf{i}").cast("double")
            df = F.col(f"df{i}").cast("double")
            idf = F.log(
                F.lit(1.0)
                + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
            )
            norm = tf + F.lit(k1) * (
                F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
            )
            term_score = idf * tf * F.lit(k1 + 1.0) / norm
            fs = fs + F.when(
                F.col(f"tf{i}") > 0,
                term_score * F.coalesce(F.col(f"bo{i}"), F.lit(1.0)),
            ).otherwise(F.lit(0.0))
        per_field_scores.append(
            scored.filter(
                sum((F.col(f"tf{i}") > 0).cast("int") for i in range(len(qterms)))
                > 0
            ).select(F.col(id_col), fs.alias("fscore"))
        )
    allf = per_field_scores[0]
    for p in per_field_scores[1:]:
        allf = allf.unionByName(p)
    return (
        allf.groupBy(id_col)
        .agg(F.round(F.max("fscore"), 4).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
