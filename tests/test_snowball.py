"""Snowball stemmer: three-way parity between the pure-Python reference,
the PySpark Column pipeline, and the DuckDB SQL emission — all generated
from the suffix tables in functions/snowball.py (reference analyzer pin:
es_movies.json:10-33, english + possessive + russian stemmer filters)."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.functions import snowball as S

# True-Snowball outputs (snowballstem.org demo vocabulary) — ground
# truth for the pure-Python reference itself.
EN_PINNED = {
    "running": "run", "hopping": "hop", "falling": "fall", "flies": "fli",
    "movies": "movi", "ponies": "poni", "caresses": "caress",
    "classes": "class", "watches": "watch", "played": "play",
    "agreed": "agre", "discussed": "discuss", "quickly": "quick",
    "address": "address", "cats": "cat", "dies": "die", "ties": "tie",
    "cries": "cri", "gaps": "gap", "gas": "gas", "this": "this",
    "kiwis": "kiwi", "relational": "relat", "conditional": "condit",
    "sized": "size", "hoping": "hope", "generate": "generat",
    "generates": "generat", "general": "general",
    "communication": "communic", "communism": "communism",
    "arsenal": "arsenal", "skis": "ski", "skies": "sky", "dying": "die",
    "lying": "lie", "tying": "tie", "idly": "idl", "gently": "gentl",
    "ugly": "ugli", "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
    "inning": "inning", "outing": "outing", "canning": "canning",
    "herring": "herring", "earring": "earring", "proceed": "proceed",
    "exceed": "exceed", "succeed": "succeed", "happy": "happi",
    "happily": "happili", "controlling": "control", "knit": "knit",
    "knitting": "knit", "consistency": "consist", "consisted": "consist",
    "consign": "consign", "consignment": "consign", "digitizer": "digit",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "adjustable": "adjust", "replacement": "replac", "adoption": "adopt",
    "activate": "activ", "angularity": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "late": "late", "cease": "ceas",
    "basement": "basement", "department": "depart",
    "commitment": "commit", "axes": "axe", "dry": "dri", "say": "say",
    "by": "by", "enjoyed": "enjoy", "apparently": "appar",
    "animated": "anim", "basically": "basic", "beautiful": "beauti",
    "beautifully": "beauti", "believes": "believ",
    "argument": "argument", "arguments": "argument",
}
RU_PINNED = {
    "фильмы": "фильм", "фильмами": "фильм", "красивая": "красив",
    "человека": "человек", "возможностью": "возможн",
    "возможности": "возможн", "книги": "книг", "книгами": "книг",
    "делали": "дела", "делавши": "дела", "читавшись": "чита",
    "прочитав": "прочита", "говорить": "говор", "говорила": "говор",
    "красивейший": "красив", "женщинами": "женщин", "женщина": "женщин",
    "российский": "российск", "большие": "больш", "новостей": "новост",
    "новости": "новост", "тексты": "текст", "текстами": "текст",
    "первый": "перв", "время": "врем", "жизнь": "жизн", "жизни": "жизн",
    "людей": "люд", "люди": "люд", "ёлками": "елк",
}


def _gen_vocab() -> list[str]:
    """Deterministic morphological + random-soup vocabulary."""
    rng = random.Random(42)
    en_roots = ["run", "hop", "talk", "program", "beauti", "nation",
                "rate", "ski", "cry", "free", "employ", "destabil",
                "character", "modern", "triv", "gener", "commun",
                "arsen", "box", "mix", "control", "excel", "feed",
                "agree", "plast", "tann", "fall", "mes", "happ", "luck",
                "relat", "condition", "electric", "adopt", "basem"]
    en_sufs = ["", "s", "es", "ies", "ied", "ed", "ing", "ingly", "edly",
               "eed", "eedly", "ly", "li", "ization", "ational",
               "fulness", "ousness", "iveness", "tional", "biliti",
               "lessli", "entli", "ation", "alism", "aliti", "ousli",
               "iviti", "fulli", "enci", "anci", "abli", "izer", "ator",
               "alli", "bli", "ogi", "ical", "icate", "iciti", "ative",
               "alize", "ness", "ful", "ement", "ance", "ence", "able",
               "ible", "ment", "ant", "ent", "ism", "ate", "iti", "ous",
               "ive", "ize", "ion", "al", "er", "ic", "e", "ll", "y",
               "sses", "us", "ss"]
    ru_roots = ["книг", "говор", "дел", "чита", "красив", "возможн",
                "женщин", "нов", "стар", "бег", "я", "мо", "перв",
                "росси", "текст", "жизн", "люд", "врем", "ребен",
                "сказ", "ва"]
    ru_sufs = ["", "а", "ы", "и", "ой", "ами", "ями", "иями", "ость",
               "ости", "остью", "ть", "ла", "ли", "в", "вши", "вшись",
               "ив", "ивши", "ившись", "ыв", "ая", "яя", "ое", "ими",
               "ыми", "его", "ого", "ему", "ому", "ся", "сь", "ейш",
               "ейше", "нн", "н", "ь", "ю", "ий", "ый", "ем", "им",
               "ет", "ют", "ишь", "ите", "уйте", "ейте", "ует", "уют",
               "ены", "ено", "й", "л", "но", "ще", "ющ", "ущ", "авши",
               "явшись", "ённ", "ие", "ья", "ью", "ия"]
    vocab = {r + s for r in en_roots for s in en_sufs}
    vocab |= {r + s for r in ru_roots for s in ru_sufs}
    lat = "abcdefghijklmnopqrstuvwxyz"
    cyr = "абвгдежзийклмнопрстуфхцчшщъыьэюяё"
    for _ in range(800):
        n = rng.randint(1, 12)
        alpha = rng.choice([lat, cyr, lat + cyr + "0123456789"])
        vocab.add("".join(rng.choice(alpha) for _ in range(n)))
    return sorted(vocab)


def test_python_reference_matches_true_snowball():
    bad = {w: (S.stem_en(w), e) for w, e in EN_PINNED.items()
           if S.stem_en(w) != e}
    assert not bad, f"english reference diverges from snowball: {bad}"
    bad = {w: (S.stem_ru(w), e) for w, e in RU_PINNED.items()
           if S.stem_ru(w) != e}
    assert not bad, f"russian reference diverges from snowball: {bad}"


def test_cross_script_noop():
    """Each stemmer must pass the other script through untouched — the
    analyzer applies both filters to every token."""
    for w in ("running", "basement", "mixed123"):
        assert S.stem_ru(w) == w
    for w in ("фильмами", "возможностью", "привет"):
        assert S.stem_en(w) == w
    assert S.stem("фильмами") == "фильм" and S.stem("movies") == "movi"


def test_duckdb_backend_matches_reference():
    vocab = _gen_vocab()
    py = [S.stem(w) for w in vocab]
    arr = "[" + ",".join("'" + w.replace("'", "''") + "'" for w in vocab) + "]"
    duck = duckdb.sql("SELECT " + S.stem_array_sql(arr) + " AS r").fetchone()[0]
    bad = [(w, p, d) for w, p, d in zip(vocab, py, duck) if p != d]
    assert not bad, f"{len(bad)} duckdb mismatches, first: {bad[:5]}"


def test_spark_backend_matches_reference(spark):
    vocab = _gen_vocab()
    py = [S.stem(w) for w in vocab]
    chunks = [vocab[i:i + 500] for i in range(0, len(vocab), 500)]
    df = spark.createDataFrame(
        list(enumerate(chunks)), "id long, toks array<string>"
    )
    rows = df.select("id", S.stem_array_column(F.col("toks")).alias("r")).collect()
    out: list[str] = []
    for r in sorted(rows, key=lambda r: r["id"]):
        out.extend(r["r"])
    bad = [(w, p, s) for w, p, s in zip(vocab, py, out) if p != s]
    assert not bad, f"{len(bad)} spark mismatches, first: {bad[:5]}"


def test_spark_sql_backend_matches_reference(spark):
    """r15: the Spark SQL text emission (stem_array_spark_sql — the
    one-parse fast path analyze() takes for SQL-fragment inputs) must
    match the pure-Python reference over the same generated vocabulary
    the Column backend is held to — the FOURTH realization of the one
    rule set, same ground truth."""
    vocab = _gen_vocab()
    py = [S.stem(w) for w in vocab]
    chunks = [vocab[i:i + 500] for i in range(0, len(vocab), 500)]
    df = spark.createDataFrame(
        list(enumerate(chunks)), "id long, toks array<string>"
    )
    rows = df.select(
        "id", F.expr(S.stem_array_spark_sql("toks")).alias("r")
    ).collect()
    out: list[str] = []
    for r in sorted(rows, key=lambda r: r["id"]):
        out.extend(r["r"])
    bad = [(w, p, s) for w, p, s in zip(vocab, py, out) if p != s]
    assert not bad, f"{len(bad)} spark-sql mismatches, first: {bad[:5]}"


def test_analyze_sql_parity_full_corpus(spark):
    """r15: analyze()'s SQL-fragment fast path must stay BIT-identical
    to the Column path — full chain (tokenize → stop sets → snowball),
    both stem modes, over every real sf0.01 document body (the corpus
    the oracles run on, mixed en/ru/unicode)."""
    import os

    from djangoadmin_postgresql_2_elasticseach_spark.functions import text as T

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if not os.path.isdir(sf):
        sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    both = docs.select(
        T.analyze(F.col("text")).alias("a_col"),
        T.analyze("`text`").alias("a_sql"),
        T.analyze(F.col("text"), stem=False).alias("r_col"),
        T.analyze("`text`", stem=False).alias("r_sql"),
    )
    diff = both.filter(
        (F.col("a_col") != F.col("a_sql"))
        | (F.col("r_col") != F.col("r_sql"))
        | F.col("a_sql").isNull()
        | F.col("r_sql").isNull()
    )
    assert diff.count() == 0


def test_markers_cannot_collide_with_tokens():
    """The in-band '!', '#', '%' markers are unreachable: the tokenizer
    splits on every non-alphanumeric character."""
    from djangoadmin_postgresql_2_elasticseach_spark.functions.text import TOKEN_SPLIT_RE
    import re

    # Java \p{L}\p{Nd} ≈ python str.isalnum for these ASCII marks
    for mark in ("!", "#", "%"):
        assert not mark.isalnum()
        assert re.match(r"\[\^", TOKEN_SPLIT_RE)  # split-on-negated-class
