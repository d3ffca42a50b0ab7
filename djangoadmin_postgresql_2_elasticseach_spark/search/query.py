"""Search queries — the reference's ES query-DSL surface (SURVEY §2.9)
over the `documents` table / denormalized doc frames.

Implements: term query (T3), match with analyzer (T1/T5), fuzzy
multi_match with deterministic scoring + top-k ranking (T2/O5), nested
query (T4 — see operators/relational.nested_exists), terms agg (T6 — see
operators/relational.terms_agg_parts), match-all+size (T7 = .limit).

Scoring is deliberately NOT a BM25 clone (SURVEY §7 risk register: ES
scores are not replicable bit-for-bit); it is a documented deterministic
scheme: score = 3·exact-token hits + 1·fuzzy (levenshtein≤1) hits,
tie-broken by id. Goldens come from the DuckDB oracle, not from ES.

Scale: token arrays are computed in-scan (native expressions inside
whole-stage codegen); for a served index the analyzed-token column is
materialized at write time so queries skip re-analysis — the Spark
equivalent of ES's inverted index build.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

# Python twin of functions.text.tokenize for the query string itself —
# the same analyzer must hit both sides of the match (ES analyzes the
# query with the field's analyzer too).
_QUERY_SPLIT = re.compile(r"[^0-9a-zA-ZЀ-ӿ]+")


def query_tokens(query: str) -> list[str]:
    return [t for t in _QUERY_SPLIT.split(query.lower()) if t]


def term_query(docs: DataFrame, field: str, value: str) -> DataFrame:
    """Exact keyword match (reference ETLTests-2.json:220 term query)."""
    return docs.filter(F.col(field) == F.lit(value))


def match_query(
    docs: DataFrame, field: str, query: str, text_col: str | None = None
) -> DataFrame:
    """Analyzed single-field match: any query token present in the
    analyzed field tokens."""
    text_col = text_col or field
    toks = tokenize(F.col(text_col))
    qtoks = query_tokens(query)
    cond = None
    for t in qtoks:
        c = F.array_contains(toks, t)
        cond = c if cond is None else (cond | c)
    return docs.filter(cond if cond is not None else F.lit(False))


def multi_match_fuzzy(
    docs: DataFrame,
    query: str,
    fields: list[tuple[str, float]],
    id_col: str = "doc_id",
    k: int = 20,
    max_edits: int = 1,
) -> DataFrame:
    """Fuzzy multi_match + relevance top-k (reference ETLTests-2.json:123
    `multi_match` with fuzziness:auto over 5 fields).

    score = Σ_fields weight · (3·#exact-token-hits + 1·#fuzzy-hits)
    where fuzzy = levenshtein ≤ max_edits (and not exact). Deterministic,
    oracle-reproducible; ranking by (score desc, id asc).

    ``max_edits=0`` is exact-only: the fuzzy term is SKIPPED entirely
    (not levenshtein≤0 — that predicate still costs a scan of every
    token), so a non-fuzzy multi_match can never match a doc with zero
    exact hits.
    """
    from ..plans.tuning import spread

    docs = spread(docs)  # levenshtein×tokens is CPU-bound; see tuning.py
    dtypes = dict(docs.dtypes)
    score = F.lit(0.0)
    qtoks = query_tokens(query)
    for field, weight in fields:
        if dtypes.get(field, "").startswith("array"):
            # analyzed keyword arrays (ES: text multi-fields on arrays):
            # tokenize each element, flatten to one token set
            toks = F.array_distinct(
                F.flatten(F.transform(F.col(field), lambda e: tokenize(e)))
            )
        else:
            toks = F.array_distinct(tokenize(F.col(field)))
        for t in qtoks:
            exact = F.array_contains(toks, t).cast("int")
            if max_edits > 0:
                fuzzy = (
                    F.size(
                        F.filter(
                            toks,
                            lambda x: (F.levenshtein(x, F.lit(t)) <= max_edits)
                            & (x != F.lit(t)),
                        )
                    )
                    > 0
                ).cast("int")
                score = score + F.lit(weight) * (3 * exact + 1 * fuzzy)
            else:
                score = score + F.lit(weight) * (3 * exact)
    scored = docs.withColumn("score", score).filter(F.col("score") > 0)
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
