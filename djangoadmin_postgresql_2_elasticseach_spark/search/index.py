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

import json

from pyspark.sql import DataFrame
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
