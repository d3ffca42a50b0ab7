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

# The COMPLETE Lucene `_english_` stopword set (33 words — Lucene
# EnglishAnalyzer's default stop set; reference es_movies.json:9-13 names
# it as `_english_`).
EN_STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
]
# The COMPLETE Lucene `_russian_` stopword set (the Snowball russian stop
# list Lucene ships as russian_stop.txt; reference es_movies.json:14-18
# names it as `_russian_`).
RU_STOPWORDS = [
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как", "а",
    "то", "все", "она", "так", "его", "но", "да", "ты", "к", "у", "же",
    "вы", "за", "бы", "по", "только", "ее", "мне", "было", "вот", "от",
    "меня", "еще", "нет", "о", "из", "ему", "теперь", "когда", "даже",
    "ну", "вдруг", "ли", "если", "уже", "или", "ни", "быть", "был",
    "него", "до", "вас", "нибудь", "опять", "уж", "вам", "ведь", "там",
    "потом", "себя", "ничего", "ей", "может", "они", "тут", "где",
    "есть", "надо", "ней", "для", "мы", "тебя", "их", "чем", "была",
    "сам", "чтоб", "без", "будто", "чего", "раз", "тоже", "себе", "под",
    "будет", "ж", "тогда", "кто", "этот", "того", "потому", "этого",
    "какой", "совсем", "ним", "здесь", "этом", "один", "почти", "мой",
    "тем", "чтобы", "нее", "сейчас", "были", "куда", "зачем", "всех",
    "никогда", "можно", "при", "наконец", "два", "об", "другой", "хоть",
    "после", "над", "больше", "тот", "через", "эти", "нас", "про",
    "всего", "них", "какая", "много", "разве", "три", "эту", "моя",
    "впрочем", "хорошо", "свою", "этой", "перед", "иногда", "лучше",
    "чуть", "том", "нельзя", "такой", "им", "более", "всегда", "конечно",
    "всю", "между",
]
ALL_STOPWORDS = EN_STOPWORDS + RU_STOPWORDS

# English possessive stemmer (reference analyzer's english_possessive_stemmer)
POSSESSIVE_RE = r"'s$"
# Light English stemmer — Porter2(snowball `english`)-style step-1a plus
# suffix stripping, kept RE2-safe (no backreferences) so the DuckDB
# oracle mirrors the chain verbatim:
#   sses→ss | ies→i | (ss|us)→keep | else: undouble+strip ing/ed on a
#   doubled consonant, then strip the general suffix alternation.
SSES_RE = r"sses$"
IES_RE = r"ies$"
EN_KEEP_RE = r"(ss|us)$"
# Porter2's undoubling set (ll/ss excluded, as in Porter2)
EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
EN_SUFFIX_RE = r"(ings?|edly|ed|ly|es|s)$"
# Light Russian suffix stripper (toward snowball `russian`: noun/adj
# endings plus the productive verb/derivational endings — ость/ство/
# ение families, reflexive -ся forms; longest-first alternation)
RU_SUFFIX_RE = (
    r"(ениями|ениях|ениям|ением|ствами|ствах|ствам|ством|остями|остях"
    r"|остям|остью|ость|ости|ство|ства|ение|ения|ении|ению|ться|тся"
    r"|лась|лось|лись|лся|ешь|ете|ите"
    r"|ами|ями|ого|его|ому|ему|ыми|ими|ая|яя|ые|ие|ий|ый|ой|ом|ов|ев"
    r"|ах|ях|ам|ям|ет|ут|ют|ит|ат|ят|а|я|о|е|ы|и|у|ю|ь)$"
)


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


def _en_stem(t1: Column) -> Column:
    """Porter2-style English step on a possessive-stripped token (one
    branch applies, mirroring Porter2 step-1a's longest-match-wins):
    sses→ss; ies→i; ss/us kept; otherwise a doubled consonant before
    ing/ed undoubles as it strips (running→run, hopped→hop — ll is not
    in Porter2's undouble set, so falling→fall), then the general
    suffix alternation strips once. len ≤ 4 tokens pass through."""
    stripped = t1
    for d in EN_DOUBLES:
        stripped = F.regexp_replace(stripped, d + r"(ings?|ed)$", d[0])
    stripped = F.regexp_replace(stripped, EN_SUFFIX_RE, "")
    return (
        F.when(F.length(t1) <= 4, t1)
        .when(t1.rlike(SSES_RE), F.regexp_replace(t1, SSES_RE, "ss"))
        .when(t1.rlike(IES_RE), F.regexp_replace(t1, IES_RE, "i"))
        .when(t1.rlike(EN_KEEP_RE), t1)
        .otherwise(stripped)
    )


def stem_token(t: Column) -> Column:
    """Light stemmer: possessive strip → Porter2-style en step (len>4
    guard) → ru suffix strip (len>4 guard). Guards keep short roots
    intact. SQL mirror: stem_sql_stages()."""
    t1 = F.regexp_replace(t, POSSESSIVE_RE, "")
    t2 = _en_stem(t1)
    t3 = F.when(F.length(t2) > 4, F.regexp_replace(t2, RU_SUFFIX_RE, "")).otherwise(t2)
    return t3


def stem_sql_stages() -> tuple[str, str, str]:
    """DuckDB mirrors of the three stem_token stages, as SQL expression
    templates over lambda variables ``t`` / ``t1`` / ``t2`` — generated
    from the SAME pattern constants the Column chain uses, so the two
    engines cannot drift. Compose as
    ``list_transform(list_transform(list_transform(toks, t -> <s0>),
    t1 -> <s1>), t2 -> <s2>)``. Pattern quotes are SQL-escaped here —
    each stage pastes into DuckDB SQL verbatim."""
    s0 = f"regexp_replace(t, '{POSSESSIVE_RE.replace(chr(39), chr(39) * 2)}', '')"
    stripped = "t1"
    for d in EN_DOUBLES:
        stripped = f"regexp_replace({stripped}, '{d}(ings?|ed)$', '{d[0]}')"
    stripped = f"regexp_replace({stripped}, '{EN_SUFFIX_RE}', '')"
    s1 = (
        "(CASE WHEN length(t1) <= 4 THEN t1 "
        f"WHEN regexp_matches(t1, '{SSES_RE}') THEN regexp_replace(t1, '{SSES_RE}', 'ss') "
        f"WHEN regexp_matches(t1, '{IES_RE}') THEN regexp_replace(t1, '{IES_RE}', 'i') "
        f"WHEN regexp_matches(t1, '{EN_KEEP_RE}') THEN t1 "
        f"ELSE {stripped} END)"
    )
    s2 = (
        "(CASE WHEN length(t2) > 4 "
        f"THEN regexp_replace(t2, '{RU_SUFFIX_RE}', '') ELSE t2 END)"
    )
    return s0, s1, s2


def analyze(col: Column | str, stem: bool = True) -> Column:
    """Full ru_en analyzer chain → array<string> of analyzed tokens."""
    toks = remove_stopwords(tokenize(col))
    if stem:
        toks = F.transform(toks, stem_token)
    return toks


def token_bigrams(toks: Column, as_struct: bool = False) -> Column:
    """Adjacent token pairs of a token array (empty array below 2
    tokens) — the ONE definition of "bigram" shared by top_bigrams,
    bigram_pmi, and repetition_stats, so a tokenizer or boundary change
    lands everywhere at once. String form joins with a single space
    (tokens never contain spaces — tokenize splits on non-alphanumerics);
    struct form keeps (a, b) separate for per-side count joins."""
    n = F.size(toks)
    if as_struct:
        def pair(i):
            return F.struct(
                F.element_at(toks, i).alias("a"),
                F.element_at(toks, i + 1).alias("b"),
            )

        empty = F.array().cast("array<struct<a:string,b:string>>")
    else:
        def pair(i):
            return F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            )

        empty = F.array().cast("array<string>")
    return F.when(n >= 2, F.transform(F.sequence(F.lit(1), n - 1), pair)).otherwise(
        empty
    )


def winnow_fingerprints(toks: Column, k: int = 8, w: int = 16) -> Column:
    """Winnowing fingerprints of a token array (Schleimer, Wilkerson &
    Aiken, SIGMOD 2003 — the MOSS algorithm): hash every k-token gram,
    then keep the MINIMUM hash of each w-gram window, distinct. The
    winnowing guarantee: two documents sharing a verbatim token run of
    ≥ w+k-1 tokens (23 at the defaults) ALWAYS share at least one
    fingerprint — exact-substring duplicate detection with ~n/w
    fingerprints per doc instead of n (the suffix-array result of Lee
    et al. 2022 "Deduplicating Training Data Makes Language Models
    Better", re-expressed as a per-row column expression + equi-join
    instead of a monolithic offline index).

    Docs with ≥1 gram but fewer than w windows contribute their single
    global-min fingerprint; docs under k tokens contribute none. Gram
    hash = first 8 md5 hex chars of the space-joined gram as a long —
    the same engine-portable construction as the MinHash family.

    PERF: this composed single-expression form re-evaluates the gram
    array in each WHEN branch — fine for a one-off column, 10× too slow
    on a corpus scan. Hot-path callers (duplicated_passage_pairs) stage
    `gram_hashes` and `winnow_from_grams` through separate projections
    so each array is computed once per row (measured 13.9 s → 1.0 s on
    the 5k-doc bench corpus)."""
    return winnow_from_grams(gram_hashes(toks, k), w)


def gram_hashes(toks: Column, k: int = 8) -> Column:
    """array<long> of k-token-gram hashes (empty under k tokens) — the
    winnowing input. One md5 per gram position."""
    n = F.size(toks)

    def gram_hash(i):
        return F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i, k))), 1, 8), 16, 10
        ).cast("long")

    return F.when(
        n >= k, F.transform(F.sequence(F.lit(1), n - k + 1), gram_hash)
    ).otherwise(F.array().cast("array<long>"))


def winnow_from_grams(grams: Column, w: int = 16) -> Column:
    """Distinct per-window minima of a gram-hash array — the winnowing
    selection step. Bind `grams` to a NAMED column (separate select)
    before calling when the input expression is expensive; the three
    branches below each reference it."""
    ng = F.size(grams)
    return (
        F.when(
            ng >= w,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), ng - w + 1),
                    lambda i: F.array_min(F.slice(grams, i, w)),
                )
            ),
        )
        .when(ng >= 1, F.array(F.array_min(grams)))
        .otherwise(F.array().cast("array<long>"))
    )


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
