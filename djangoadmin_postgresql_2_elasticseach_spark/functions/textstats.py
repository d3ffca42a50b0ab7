"""Text-analysis columns for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All native Column expressions (regexp + length arithmetic) — each has an
exact DuckDB-SQL twin in registry.py, so these are fully oracle-checked.
FP parity note: the only floating-point ops are single divisions of
integer counts; identical inputs → bitwise-identical doubles in both
engines (no accumulation-order sensitivity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import EN_STOPWORDS


def _count_re(c: Column, pattern: str) -> Column:
    """Number of characters matching `pattern` (by deleting the rest)."""
    return F.length(F.regexp_replace(c, pattern, ""))


def lang_id(text: Column | str) -> Column:
    """n-gram-free heuristic language ID: script-based cyrillic vs latin
    ratio. Deterministic; mirrors registry.py's SQL twin exactly."""
    c = F.col(text) if isinstance(text, str) else text
    cyr = _count_re(c, r"[^а-яА-ЯёЁ]")
    lat = _count_re(c, "[^a-zA-Z]")
    return (
        F.when(cyr + lat == 0, F.lit("und"))
        .when(cyr * 2 > lat, F.lit("ru"))
        .otherwise(F.lit("en"))
    )


def token_count(text: Column | str) -> Column:
    """Whitespace token count (BPE-ish estimate is token_estimate)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    return F.size(toks)


def token_estimate(text: Column | str) -> Column:
    """BPE-ish subword-count estimate: word-chunks + digits + punctuation
    as separate tokens (regex count, no tokenizer dependency)."""
    c = F.col(text) if isinstance(text, str) else text
    # count word chunks of <=4 chars as 1, longer words as ceil(len/4)
    words = F.filter(F.split(F.lower(c), r"[^\p{L}\p{Nd}]+"), lambda t: t != "")
    word_cost = F.aggregate(
        F.transform(words, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    punct = _count_re(c, r"[\p{L}\p{Nd}\s]")
    return word_cost + punct


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring feature columns (length / punctuation / stopword /
    digit ratios + mean word length). Combine with quality_score()."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    words = F.filter(F.split(F.lower(c), r"[^\p{L}\p{Nd}]+"), lambda t: t != "")
    n_words = F.size(words)
    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(words, lambda t: F.array_contains(sw, t)))
    n_punct = _count_re(c, r"[\p{L}\p{Nd}\s]")
    n_digit = _count_re(c, r"[^0-9]")
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / n_words,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "stopword_ratio": F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "digit_ratio": F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0)),
        "mean_word_len": mean_word_len,
    }


def quality_score(text: Column | str) -> Column:
    """Scalar quality score in [0,1]: boolean heuristic gates averaged —
    each gate an exact-integer comparison, so the score is k/5 with k an
    int (FP-parity safe)."""
    f = quality_features(text)
    gates = [
        (f["n_words"] >= 10).cast("int"),
        ((f["stopword_ratio"] >= 0.05) & (f["stopword_ratio"] <= 0.7)).cast("int"),
        (f["punct_ratio"] <= 0.2).cast("int"),
        (f["digit_ratio"] <= 0.3).cast("int"),
        ((f["mean_word_len"] >= 2.0) & (f["mean_word_len"] <= 12.0)).cast("int"),
    ]
    total = gates[0]
    for g in gates[1:]:
        total = total + g
    return (total / F.lit(5.0)).alias("quality_score")


def _hex_nibble(h: Column, i: int) -> Column:
    """hex char at 1-based position i → int 0-15, via ascii arithmetic
    (portable: ascii() exists and agrees in every engine)."""
    a = F.ascii(F.substring(h, i, 1))
    return F.when(a <= 57, a - 48).otherwise(a - 87)


def rolling_fingerprint(text: Column | str, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over the token stream:
    ``h = fold(tokens, 7, (h, t) -> (h*31 + v(t)) % mod)`` with
    ``v(t) = 16·nib₁ + nib₂`` of md5(t) — order-sensitive (unlike the
    set-based md5 fingerprint), so re-ordered documents get different
    prints. Native fold, engine-portable (DuckDB twin uses
    list_prepend + list_reduce)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(F.split(F.lower(c), r"[^\p{L}\p{Nd}]+"), lambda t: t != "")
    vals = F.transform(
        toks,
        lambda t: (16 * _hex_nibble(F.md5(t), 1) + _hex_nibble(F.md5(t), 2)).cast(
            "long"
        ),
    )
    return F.aggregate(
        vals,
        F.lit(7).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(mod).cast("long"),
    )


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-collapsed, lowercased,
    trimmed text — the exact-dedup key. (The rolling-hash variant for
    near-dup windows lives in operators/dedup.py as shingle hashes.)"""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(norm)


def doc_lines(text: Column | str) -> Column:
    """Non-empty trimmed lines of the document (the unit of the
    duplicate-line repetition signals)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.transform(F.split(c, r"\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )


def dup_line_fraction(text: Column | str) -> Column:
    """Fraction of lines that repeat an earlier line — the Gopher-rules
    `duplicate_line_fraction` repetition signal (Rae et al. 2021, table
    A1; public filter used by most LLM corpus pipelines). Native:
    1 − |distinct lines| / |lines|; 0 for line-less docs."""
    lines = doc_lines(text)
    n = F.size(lines)
    return F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(lines)) / n.cast("double")
    ).otherwise(F.lit(0.0))
