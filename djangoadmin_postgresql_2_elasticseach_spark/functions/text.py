"""Text-analysis chain — the Spark realization of the reference's
``ru_en`` Elasticsearch analyzer (reference ``etl/json/es_movies.json:4-40``:
standard tokenizer → lowercase → en/ru stopwords → en stemmer →
en possessive stemmer → ru stemmer).

Everything is a native Column expression (regexp split, higher-order
filter/transform) so the chain stays inside whole-stage codegen; the only
non-native piece a full Snowball stemmer would need is replaced by a
suffix-stripping "light" stemmer that is expressible as chained
regexp_replace — deterministic, cheap, and reproducible in the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode-aware token boundary: any run of non-letter/digit characters.
TOKEN_SPLIT_RE = r"[^\p{L}\p{Nd}]+"

# Minimal en+ru stopword lists — the `_english_`/`_russian_` sets trimmed
# to high-frequency members (reference es_movies.json:9-19 uses the full
# lucene sets; the engine keeps the list as data, swap in the full set for
# production parity).
EN_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
]
RU_STOPWORDS = [
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как", "а",
    "то", "все", "она", "так", "его", "но", "да", "ты", "к", "у", "же",
    "вы", "за", "бы", "по", "только", "ее", "мне", "было", "вот", "от",
    "меня", "еще", "нет", "о", "из", "ему",
]
ALL_STOPWORDS = EN_STOPWORDS + RU_STOPWORDS

# English possessive stemmer (reference analyzer's english_possessive_stemmer)
POSSESSIVE_RE = r"'s$"
# Light English suffix stripper (stand-in for the snowball `english` stemmer)
EN_SUFFIX_RE = r"(ings?|edly|ed|ly|ies|es|s)$"
# Light Russian suffix stripper (stand-in for `russian` snowball)
RU_SUFFIX_RE = r"(ами|ями|ого|его|ому|ему|ыми|ими|ая|яя|ые|ие|ий|ый|ой|ом|ов|ев|ах|ях|ам|ям|ет|ут|ют|ит|ат|ят|а|я|о|е|ы|и|у|ю|ь)$"


def tokenize(col: Column | str) -> Column:
    """lowercase + split on non-alphanumeric runs, drop empty tokens.

    Matches the oracle expression
    ``list_filter(regexp_split_to_array(lower(x), '[^\\p{L}\\p{Nd}]+'), t -> t <> '')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: t != "")


def remove_stopwords(tokens: Column, stopwords: list[str] | None = None) -> Column:
    """Drop stopword tokens (order-preserving) — the analyzer's en/ru
    stop filters."""
    sw = F.array(*[F.lit(s) for s in (stopwords or ALL_STOPWORDS)])
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def stem_token(t: Column) -> Column:
    """Light stemmer: possessive strip → en suffix strip (len>4 guard) →
    ru suffix strip (len>4 guard). Guards keep short roots intact."""
    t1 = F.regexp_replace(t, POSSESSIVE_RE, "")
    t2 = F.when(F.length(t1) > 4, F.regexp_replace(t1, EN_SUFFIX_RE, "")).otherwise(t1)
    t3 = F.when(F.length(t2) > 4, F.regexp_replace(t2, RU_SUFFIX_RE, "")).otherwise(t2)
    return t3


def analyze(col: Column | str, stem: bool = True) -> Column:
    """Full ru_en analyzer chain → array<string> of analyzed tokens."""
    toks = remove_stopwords(tokenize(col))
    if stem:
        toks = F.transform(toks, stem_token)
    return toks


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined) of the lowercased
    tokenized text — the dedup shingle unit.

    Word-level shingles stay distinctive even for small-vocabulary
    corpora (character n-grams of such corpora all collide, turning the
    LSH posting lists into hot keys — a skew trap at scale).
    """
    toks = tokenize(col)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.slice(toks, i + 1, n)
        ),
    )
    return F.array_distinct(grams)


def char_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of the whitespace-normalized lowercase
    text — the shingle set for Jaccard / MinHash dedup.

    Native expression: sequence(1, len-n+1) → transform(substring) →
    array_distinct. Stays JVM-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(c), r"\s+", " ")
    # sequence(a, b) counts DOWN when a > b — guard the short-string case.
    idx = F.when(
        F.length(norm) >= n, F.sequence(F.lit(1), F.length(norm) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: norm.substr(i, F.lit(n)))
    return F.array_distinct(grams)
