"""Unicode tokenizer parity: Spark's tokenize must agree with the DuckDB
oracle expression across scripts — with the two DOCUMENTED divergences
(registry.py header) pinned so a behavior change is caught either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.functions.text import tokenize
from djangoadmin_postgresql_2_elasticseach_spark.registry import _sql_tokens

PARITY_SAMPLES = [
    "Hello WORLD",
    "Straße GROSS",          # ß stays, SS lowers plainly
    "naïve café",
    "日本語 text",
    "emoji 😀 here",
    "МОСКВА москва",
    "ǅungla titlecase-digraph",
    "a\xadb soft-hyphen",
    "num١٢٣ arabic digits",
    "ｆｕｌｌwidth ＡＢＣ",
    "tabs\tand\nnewlines",
    "",
]

KNOWN_DIVERGENT = [
    "İstanbul TITLE",        # Java: i + combining dot → token split
    "ΣΙΣΥΦΟΣ τέλος",        # Java: contextual final sigma ς, RE2: σ
]


def _spark_tokens(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "id long, t string"
    ).select("id", tokenize(F.col("t")).alias("toks"))
    return {r["id"]: list(r["toks"]) for r in df.collect()}


def _duck_tokens(duck, text):
    return duck.execute(
        f"select {_sql_tokens('?')}".replace("lower(?)", "lower(?)"), [text]
    ).fetchone()[0]


def test_tokenizer_cross_engine_parity(spark, duck):
    got = _spark_tokens(spark, PARITY_SAMPLES)
    for i, s in enumerate(PARITY_SAMPLES):
        assert got[i] == _duck_tokens(duck, s), f"diverged on {s!r}"


def test_known_casefold_divergences_still_diverge(spark, duck):
    """If an engine upgrade harmonizes these, this test fails and the
    registry docstring + ingest guidance should be updated."""
    got = _spark_tokens(spark, KNOWN_DIVERGENT)
    diffs = [
        s for i, s in enumerate(KNOWN_DIVERGENT)
        if got[i] != _duck_tokens(duck, s)
    ]
    assert diffs == KNOWN_DIVERGENT, (
        "documented divergence set changed — update registry.py notes"
    )


def test_normalize_text_removes_divergences(spark, duck):
    """After NFKC+casefold ingest normalization, the previously
    divergent inputs tokenize identically in both engines."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import normalize_text

    docs = spark.createDataFrame(
        list(enumerate(KNOWN_DIVERGENT)), "doc_id long, text string"
    )
    normed = normalize_text(docs)
    rows = {r["doc_id"]: r["text"] for r in normed.collect()}
    toks = _spark_tokens(spark, [rows[i] for i in range(len(KNOWN_DIVERGENT))])
    for i in range(len(KNOWN_DIVERGENT)):
        assert toks[i] == _duck_tokens(duck, rows[i]), rows[i]
    # casefold resolves the final-sigma contextual form to σ everywhere
    assert "σισυφοσ" in toks[1]
