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

from ..functions.text import tokenize
from ..plans.tuning import spread
from .query import query_tokens

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
    """Top-k docs by BM25 score for `query`. Returns (id, score)."""
    qterms = query_tokens(query)
    if not qterms:
        raise ValueError("empty query after tokenization")

    toks = spread(docs.select(id_col, text_col)).select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("term")
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
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
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
        score = score + idf * tf * F.lit(k1 + 1.0) / norm
    tf_cols = [F.col(f"tf{i}") for i in range(len(qterms))]
    matched = (F.greatest(*tf_cols) if len(tf_cols) > 1 else tf_cols[0]) > 0
    return (
        scored.filter(matched)
        .select(F.col(id_col), F.round(score, 4).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
