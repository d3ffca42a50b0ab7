"""Snowball stemmers (Porter2 English + Snowball Russian) — full-fidelity
replacements for the round-1..3 "light" regex stemmer, matching the
reference analyzer chain (reference ``etl/json/es_movies.json:10-33``:
``english_stemmer`` + ``english_possessive_stemmer`` + ``russian_stemmer``
— ES's Lucene filters, which are generated from the same published
Snowball sources this module re-implements).

Three faithful realizations of ONE rule set, all generated from the same
suffix tables in this module so they cannot drift:

1. ``stem_en`` / ``stem_ru`` / ``stem`` — pure-Python reference (ground
   truth for tests; not used in the engine hot path).
2. A PySpark ``Column`` pipeline (``stem_array_column``) — each stemmer
   step is one ``F.transform`` stage over the token array, so every
   stage's lambda variable is bound once per element (no expression-tree
   blowup) and the whole chain stays JVM-side / codegen-friendly.
3. A DuckDB SQL pipeline (``stem_array_sql``) — the same stages emitted
   as nested ``list_transform`` lambdas for the oracle queries.

(2) and (3) are emitted by the SAME stage functions written against a
tiny two-backend expression builder, so Spark and the DuckDB oracle are
structurally identical.

Semantics notes (pinned against the published snowball sources):

* English steps 2-4 are ``[substring] R1/R2 among(...)``: the LONGEST
  listed suffix of the word is selected first, THEN the region test runs;
  if it fails nothing happens (no fallback to a shorter suffix).
* Russian wraps its whole backward mode in ``setlimit tomark pV``:
  suffix matching cannot see left of RV, so an ending that does not fit
  inside RV is invisible and a SHORTER ending can match instead. An
  а/я pre-condition that fails (or would cross the RV limit) fails the
  whole step, falling through to the next alternative (verb → noun).
* Regions R1/R2/RV are recomputed per stage from the current word.
  This is equivalent to Snowball's compute-once-after-prelude because
  every modification is a suffix truncation/replacement gated on the
  region lying inside the untouched prefix (see the stage docstrings).
* Words are processed english-stemmer-first then russian-stemmer, like
  the reference's filter chain; each stemmer is a provable no-op on the
  other script (no Latin suffix matches Cyrillic and vice versa, and the
  region of a word with no vowels from the other alphabet is null).

Markers: the stages communicate "processing finished" in-band with a
``!`` prefix (english exceptional forms) and "step-1 resolved" with a
``#`` prefix (russian); analyzer tokens can never contain either (the
tokenizer splits on every non-alphanumeric), and both markers are
stripped before the stage that introduced them hands off.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shared rule tables (single source of truth for all three realizations)
# ---------------------------------------------------------------------------

EN_V = "aeiouy"          # after y-marking, consonant y is 'Y' ∉ this set
EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
EN_LI_ENDING = "cdeghkmnrt"
EN_R1_PREFIXES = ("commun", "gener", "arsen")   # longest-first

EN_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
EN_EXCEPTIONS2 = (
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
)

# (suffix, replacement-or-None) — longest-first; None means delete.
# Specials handled in the stage code: 'ogi' needs a preceding 'l';
# 'li' needs a valid li-ending before it.
EN_STEP2 = (
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"),
    ("tional", "tion"), ("biliti", "ble"), ("lessli", "less"),
    ("entli", "ent"), ("ation", "ate"), ("alism", "al"),
    ("aliti", "al"), ("ousli", "ous"), ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"),
    ("li", None),
)
# 'ative' additionally needs R2 (handled in stage code).
EN_STEP3 = (
    ("ational", "ate"), ("tional", "tion"),
    ("alize", "al"), ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", None),
    ("ful", None),
)
# all delete; 'ion' needs preceding s/t (stage code).
EN_STEP4 = (
    "ement",
    "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
    "al", "er", "ic",
)

RU_V = "аеиоуыэюя"

# group-1 endings require а/я immediately before (which stays);
# entries as (suffix, needs_prev_a_ya), longest-first by suffix length.
RU_PERFECTIVE_GERUND = (
    ("ившись", False), ("ывшись", False),
    ("вшись", True),
    ("ивши", False), ("ывши", False),
    ("вши", True),
    ("ив", False), ("ыв", False),
    ("в", True),
)
RU_REFLEXIVE = ("ся", "сь")
RU_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им",
    "ым", "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею",
)
RU_PARTICIPLE = (
    ("ивш", False), ("ывш", False), ("ующ", False),
    ("ем", True), ("нн", True), ("вш", True), ("ющ", True),
    ("щ", True),
)
RU_VERB = (
    ("ейте", False), ("уйте", False),
    ("ила", False), ("ыла", False), ("ена", False), ("ите", False),
    ("или", False), ("ыли", False), ("ило", False), ("ыло", False),
    ("ено", False), ("ует", False), ("уют", False), ("ены", False),
    ("ить", False), ("ыть", False), ("ишь", False),
    ("ете", True), ("йте", True), ("ешь", True), ("нно", True),
    ("ей", False), ("уй", False), ("ил", False), ("ыл", False),
    ("им", False), ("ым", False), ("ен", False), ("ят", False),
    ("ит", False), ("ыт", False), ("ую", False),
    ("ла", True), ("на", True), ("ли", True), ("ем", True),
    ("ло", True), ("но", True), ("ет", True), ("ют", True),
    ("ны", True), ("ть", True),
    ("ю", False),
    ("й", True), ("л", True), ("н", True),
)
RU_NOUN = (
    "иями",
    "ями", "ами", "ией", "иям", "ием", "иях",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям",
    "ем", "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
)
RU_SUPERLATIVE = ("ейше", "ейш")
RU_DERIVATIONAL = ("ость", "ост")


def _longest_first(entries):
    """Stable longest-first ordering guard for suffix tables."""
    if entries and isinstance(entries[0], tuple):
        key = [len(e[0]) for e in entries]
    else:
        key = [len(e) for e in entries]
    assert key == sorted(key, reverse=True), entries
    return entries


for _t in (RU_PERFECTIVE_GERUND, RU_ADJECTIVE, RU_PARTICIPLE, RU_VERB,
           RU_NOUN, RU_SUPERLATIVE, RU_DERIVATIONAL, EN_STEP2, EN_STEP3,
           EN_STEP4):
    _longest_first(_t)


# ---------------------------------------------------------------------------
# 1. Pure-Python reference (tests' ground truth)
# ---------------------------------------------------------------------------

def _en_r1(w: str) -> int:
    for p in EN_R1_PREFIXES:
        if w.startswith(p):
            return len(p)
    for i in range(len(w) - 1):
        if w[i] in EN_V and w[i + 1] not in EN_V:
            return i + 2
    return len(w)


def _en_r2(w: str, r1: int) -> int:
    for i in range(r1, len(w) - 1):
        if w[i] in EN_V and w[i + 1] not in EN_V:
            return i + 2
    return len(w)


def _en_ends_short_syllable(w: str) -> bool:
    if (len(w) >= 3 and w[-3] not in EN_V and w[-2] in EN_V
            and w[-1] not in EN_V and w[-1] not in "wxY"):
        return True
    return len(w) == 2 and w[0] in EN_V and w[1] not in EN_V


def stem_en(word: str) -> str:
    """Porter2 (Snowball english) — pure-Python reference."""
    if len(word) <= 2:
        return word
    if word in EN_EXCEPTIONS1:
        return EN_EXCEPTIONS1[word]
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in EN_V:
            chars[i] = "Y"
    w = "".join(chars)
    r1 = _en_r1(w)
    r2 = _en_r2(w, r1)

    # step 1a
    if w.endswith("sses"):
        w = w[:-4] + "ss"
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s") and any(c in EN_V for c in w[:-2]):
        w = w[:-1]
    if w in EN_EXCEPTIONS2:
        return w

    # step 1b
    if w.endswith("eedly"):
        if len(w) - 5 >= r1:
            w = w[:-5] + "ee"
    elif w.endswith("eed"):
        if len(w) - 3 >= r1:
            w = w[:-3] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(c in EN_V for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(EN_DOUBLES):
                        w = w[:-1]
                    elif r1 >= len(w) and _en_ends_short_syllable(w):
                        w += "e"
                break

    # step 1c
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in EN_V:
        w = w[:-1] + "i"

    # step 2 — longest match first, THEN the R1 gate (no fallback)
    for suf, repl in EN_STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in EN_LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + repl
            break

    # step 3
    for suf, repl in EN_STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - 5 >= r2:
                        w = w[:-5]
                elif repl is None:
                    w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + repl
            break

    # step 4
    for suf in EN_STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _en_ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]

    return w.replace("Y", "y")


def _ru_rv(w: str) -> int:
    for i, c in enumerate(w):
        if c in RU_V:
            return i + 1
    return len(w)


def _ru_r2(w: str) -> int:
    r1 = len(w)
    for i in range(len(w) - 1):
        if w[i] in RU_V and w[i + 1] not in RU_V:
            r1 = i + 2
            break
    for i in range(r1, len(w) - 1):
        if w[i] in RU_V and w[i + 1] not in RU_V:
            return i + 2
    return len(w)


def _ru_match(w: str, rv: int, entries) -> tuple[str | None, bool]:
    """RV-limited longest-suffix match.

    Returns (suffix, cond_ok). Entries that do not fit inside RV are
    invisible (shorter ones may match). For a group-1 entry the а/я
    pre-condition (char inside RV too) is evaluated; cond failure is
    returned so the caller can fail the whole step without fallback.
    """
    for e in entries:
        suf, needs = (e, False) if isinstance(e, str) else e
        if w.endswith(suf) and len(w) - len(suf) >= rv:
            if not needs:
                return suf, True
            i = len(w) - len(suf) - 1
            return suf, (i >= rv and w[i] in "ая")
    return None, False


def stem_ru(word: str) -> str:
    """Snowball russian — pure-Python reference."""
    w = word.replace("ё", "е")
    rv = _ru_rv(w)

    # step 1: perfective gerund, else [reflexive] adjectival|verb|noun
    suf, ok = _ru_match(w, rv, RU_PERFECTIVE_GERUND)
    if suf is not None and ok:
        w = w[: -len(suf)]
    else:
        suf, ok = _ru_match(w, rv, RU_REFLEXIVE)
        if suf is not None and ok:
            w = w[: -len(suf)]
        suf, ok = _ru_match(w, rv, RU_ADJECTIVE)
        if suf is not None and ok:
            w = w[: -len(suf)]
            psuf, pok = _ru_match(w, rv, RU_PARTICIPLE)
            if psuf is not None and pok:
                w = w[: -len(psuf)]
        else:
            suf, ok = _ru_match(w, rv, RU_VERB)
            if suf is not None and ok:
                w = w[: -len(suf)]
            else:
                suf, ok = _ru_match(w, rv, RU_NOUN)
                if suf is not None and ok:
                    w = w[: -len(suf)]

    # step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational (RV-limited match + R2 gate, no fallback)
    suf, ok = _ru_match(w, rv, RU_DERIVATIONAL)
    if suf is not None and ok and len(w) - len(suf) >= _ru_r2(w):
        w = w[: -len(suf)]

    # step 4: tidy up — нн | superlative(+нн) | ь, longest RV-limited.
    # The нн undouble's literal test for the preceding н is itself
    # RV-limited (crossing the limit fails), hence len-2 >= rv.
    if w.endswith("нн") and len(w) - 2 >= rv:
        w = w[:-1]
    else:
        suf, ok = _ru_match(w, rv, RU_SUPERLATIVE)
        if suf is not None and ok:
            w = w[: -len(suf)]
            if w.endswith("нн") and len(w) - 2 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w


def stem(word: str) -> str:
    """The analyzer's stemming contract: english then russian, matching
    the reference filter order (es_movies.json:28-32; the possessive
    filter is a no-op here because the tokenizer splits on apostrophes).
    """
    return stem_ru(stem_en(word))


# ---------------------------------------------------------------------------
# 2+3. Expression backends: the same stages emitted as PySpark Columns and
# as DuckDB SQL. Stage functions are written ONCE against the tiny builder
# API below; `stem_array_column` / `stem_array_sql` apply them as one
# transform / list_transform per stage so each stage's lambda variable is
# bound once per token (no expression-tree duplication across stages).
# ---------------------------------------------------------------------------

class _SqlExpr:
    """A SQL fragment with operator overloads so stage code written in
    Column style also emits DuckDB SQL."""

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    def __str__(self):
        return self.s

    def _b(self, op, other):
        return _SqlExpr(f"({self.s} {op} {_sq(other)})")

    def __and__(self, o):
        return self._b("AND", o)

    def __or__(self, o):
        return self._b("OR", o)

    def __invert__(self):
        return _SqlExpr(f"(NOT {self.s})")

    def __eq__(self, o):  # noqa: A003 - intentional non-bool eq
        return self._b("=", o)

    def __ne__(self, o):
        return self._b("<>", o)

    def __ge__(self, o):
        return self._b(">=", o)

    def __gt__(self, o):
        return self._b(">", o)

    def __le__(self, o):
        return self._b("<=", o)

    def __lt__(self, o):
        return self._b("<", o)

    def __add__(self, o):
        return self._b("+", o)

    def __sub__(self, o):
        return self._b("-", o)


def _sq(v) -> str:
    if isinstance(v, _SqlExpr):
        return v.s
    if isinstance(v, int):
        return str(v)
    raise TypeError(type(v))


class _SqlWhen:
    def __init__(self, cond, val):
        self.pairs = [(cond, val)]

    def when(self, cond, val):
        self.pairs.append((cond, val))
        return self

    def otherwise(self, val):
        parts = " ".join(
            f"WHEN {_sq(c)} THEN {_sq(v)}" for c, v in self.pairs
        )
        return _SqlExpr(f"(CASE {parts} ELSE {_sq(val)} END)")


class SqlBackend:
    """DuckDB SQL emitter."""

    name = "duckdb"

    @staticmethod
    def lit(s: str):
        return _SqlExpr("'" + s.replace("'", "''") + "'")

    @staticmethod
    def i(n: int):
        return _SqlExpr(str(n))

    @staticmethod
    def length(e):
        return _SqlExpr(f"length({_sq(e)})")

    @staticmethod
    def substr(e, start, ln):
        return _SqlExpr(f"substr({_sq(e)}, {_sq(start)}, {_sq(ln)})")

    @staticmethod
    def concat(*es):
        return _SqlExpr("(" + " || ".join(_sq(e) for e in es) + ")")

    @staticmethod
    def rlike(e, pat: str):
        p = pat.replace("'", "''")
        return _SqlExpr(f"regexp_matches({_sq(e)}, '{p}')")

    @staticmethod
    def rrepl(e, pat: str, repl: str):
        p = pat.replace("'", "''")
        r = repl.replace("'", "''")
        return _SqlExpr(f"regexp_replace({_sq(e)}, '{p}', '{r}', 'g')")

    @staticmethod
    def rrepl_bref(e, pat: str, repl_tmpl: str):
        # repl_tmpl uses {1} for the first capture group
        return SqlBackend.rrepl(e, pat, repl_tmpl.format(g1=r"\1"))

    @staticmethod
    def when(cond, val):
        return _SqlWhen(cond, val)

    @staticmethod
    def in_strs(e, options):
        opts = ", ".join("'" + o.replace("'", "''") + "'" for o in options)
        return _SqlExpr(f"({_sq(e)} IN ({opts}))")


def _spark_str(s: str) -> str:
    """Spark SQL string literal. Unlike DuckDB, Spark's default parser
    processes backslash escapes inside single-quoted literals
    (escapedStringLiterals=false), so a regex like ``\\p{L}`` must be
    written ``\\\\p{L}`` in the SQL text to reach the engine as the
    same pattern string the Column API passes verbatim."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


class SparkSqlBackend:
    """Spark SQL text emitter — the THIRD realization of the same stage
    functions (r15). Motivation is pure driver cost: the Column
    realization builds the chain through tens of thousands of py4j
    round-trips (~10-60 s per fresh process, measured; it was the
    single largest plan-construction item in the engine), while this
    emitter produces one SQL string (~135 KB) in ~10 ms that
    ``F.expr`` parses server-side in ~0.1 s. Dialect mapping is chosen
    so the parsed tree is the SAME Catalyst expression the Column API
    builds (substr/concat/regexp_replace/RLIKE/CASE/IN); equality is
    pinned bit-for-bit over the full published Snowball vocabularies
    and the real corpus (tests/test_snowball.py,
    tests/test_unicode_tokens.py::test_analyze_sql_parity)."""

    name = "spark-sql"

    @staticmethod
    def lit(s: str):
        return _SqlExpr(_spark_str(s))

    @staticmethod
    def i(n: int):
        return _SqlExpr(str(n))

    @staticmethod
    def length(e):
        return _SqlExpr(f"length({_sq(e)})")

    @staticmethod
    def substr(e, start, ln):
        return _SqlExpr(f"substr({_sq(e)}, {_sq(start)}, {_sq(ln)})")

    @staticmethod
    def concat(*es):
        return _SqlExpr("concat(" + ", ".join(_sq(e) for e in es) + ")")

    @staticmethod
    def rlike(e, pat: str):
        return _SqlExpr(f"({_sq(e)} RLIKE {_spark_str(pat)})")

    @staticmethod
    def rrepl(e, pat: str, repl: str):
        return _SqlExpr(
            f"regexp_replace({_sq(e)}, {_spark_str(pat)}, {_spark_str(repl)})"
        )

    @staticmethod
    def rrepl_bref(e, pat: str, repl_tmpl: str):
        # Spark (Java regex) backreference syntax — same as the Column
        # realization's "$1", NOT DuckDB's "\\1"
        return SparkSqlBackend.rrepl(e, pat, repl_tmpl.format(g1="$1"))

    @staticmethod
    def when(cond, val):
        return _SqlWhen(cond, val)

    @staticmethod
    def in_strs(e, options):
        return _SqlExpr(
            f"({_sq(e)} IN ("
            + ", ".join(_spark_str(o) for o in options)
            + "))"
        )

    # Suffix/prefix tests as the engine primitives: endswith(t, s) is
    # value-identical to the generic (length >= k AND substr(...) = s)
    # form — false for too-short strings, NULL-propagating — in a
    # quarter of the text (the chain holds ~450 suffix tests; guide §7.3
    # plan-size discipline). Only this emitter overrides; the Column and
    # DuckDB trees stay exactly as before.
    @staticmethod
    def ends(t, s: str):
        return _SqlExpr(f"endswith({_sq(t)}, {_spark_str(s)})")

    @staticmethod
    def starts(t, s: str):
        return _SqlExpr(f"startswith({_sq(t)}, {_spark_str(s)})")

    # LET-binding via a single-element higher-order transform: the value
    # expression is emitted once and the body references the lambda
    # variable (lexical capture of outer lambda vars is part of Spark's
    # higher-order-function semantics). Variable names sbb<N> are
    # analyzer-token-impossible like sbw/sb0../sbz; the counter is reset
    # by stem_array_spark_sql so the emitted text is deterministic (plan
    # canonicalization and text-keyed caches see one stable string).
    _bind_seq = 0

    @classmethod
    def bind(cls, val, fn):
        v = f"sbb{cls._bind_seq}"
        cls._bind_seq += 1
        return _SqlExpr(
            f"element_at(transform(array({_sq(val)}), "
            f"{v} -> {_sq(fn(_SqlExpr(v)))}), 1)"
        )


class ColBackend:
    """PySpark Column emitter."""

    name = "spark"

    @staticmethod
    def lit(s: str):
        return F.lit(s)

    @staticmethod
    def i(n: int):
        return F.lit(n)

    @staticmethod
    def length(e):
        return F.length(e)

    @staticmethod
    def substr(e, start, ln):
        s = F.lit(start) if isinstance(start, int) else start
        l = F.lit(ln) if isinstance(ln, int) else ln
        return F.substr(e, s, l)

    @staticmethod
    def concat(*es):
        return F.concat(*es)

    @staticmethod
    def rlike(e, pat: str):
        return e.rlike(pat)

    @staticmethod
    def rrepl(e, pat: str, repl: str):
        return F.regexp_replace(e, pat, repl)

    @staticmethod
    def rrepl_bref(e, pat: str, repl_tmpl: str):
        return F.regexp_replace(e, pat, repl_tmpl.format(g1="$1"))

    @staticmethod
    def when(cond, val):
        return F.when(cond, val)

    @staticmethod
    def in_strs(e, options):
        return e.isin(list(options))


# --- shared expression helpers (B = backend, t = current-token expr) ---

def _bind(B, val, fn):
    """Evaluate ``fn`` with ``val`` bound to a single name — a LET.

    Backends that define ``bind`` (the Spark SQL emitter) get a real
    binding, so a region expression (R1/R2/RV — one regexp each) that a
    stage consults once per candidate suffix appears ONCE in the
    emitted tree instead of once per suffix test. Every other backend
    (Column, DuckDB SQL — including the oracle emission the analyzer
    version hash pins) inlines, producing exactly the tree it produced
    before this helper existed (r16: the 135 KB Spark analyzer tree was
    ~75% duplicated region expressions, and single-threaded Catalyst
    analysis of it dominated every fresh process's first execution)."""
    b = getattr(B, "bind", None)
    return b(val, fn) if b is not None else fn(val)


def _ends(B, t, s: str):
    e = getattr(B, "ends", None)
    if e is not None:
        return e(t, s)
    k = len(s)
    return (B.length(t) >= B.i(k)) & (
        B.substr(t, B.length(t) - B.i(k - 1), B.i(k)) == B.lit(s)
    )


def _starts(B, t, s: str):
    st = getattr(B, "starts", None)
    if st is not None:
        return st(t, s)
    return B.substr(t, B.i(1), B.i(len(s))) == B.lit(s)


def _chop(B, t, k: int):
    return B.substr(t, B.i(1), B.length(t) - B.i(k))


def _chop_add(B, t, k: int, add: str):
    return B.concat(_chop(B, t, k), B.lit(add))


def _char_from_end(B, t, k: int):
    """1-char substring k positions before the end (k=1 → last char)."""
    return B.substr(t, B.length(t) - B.i(k - 1), B.i(1))


def _vc_after(B, t, vowels: str):
    """0-based position after the first vowel-nonvowel pair; len if none."""
    stripped = B.rrepl(t, f"^.*?[{vowels}][^{vowels}]", "")
    return B.when(
        B.rlike(t, f"[{vowels}][^{vowels}]"),
        B.length(t) - B.length(stripped),
    ).otherwise(B.length(t))


def _en_r1x(B, t):
    w = B.when(_starts(B, t, "commun"), B.i(6))
    for p in ("gener", "arsen"):
        w = w.when(_starts(B, t, p), B.i(5))
    return w.otherwise(_vc_after(B, t, EN_V))


def _en_r2x(B, t, r1=None):
    """R2 position; ``r1`` — an already-bound R1 expression (else inline)."""
    if r1 is None:
        r1 = _en_r1x(B, t)
    rest = B.substr(t, r1 + B.i(1), B.length(t))
    return r1 + _vc_after(B, rest, EN_V)


def _in_r1(B, t, k: int, r1=None):
    return (B.length(t) - B.i(k)) >= (
        _en_r1x(B, t) if r1 is None else r1
    )


def _in_r2(B, t, k: int, r2=None):
    return (B.length(t) - B.i(k)) >= (
        _en_r2x(B, t) if r2 is None else r2
    )


def _has_vowel_before(B, t, k: int, vowels: str = EN_V):
    """True if w[:-k] contains a vowel."""
    return B.rlike(B.substr(t, B.i(1), B.length(t) - B.i(k)), f"[{vowels}]")


_SHORT_SYLL_END = f"([^{EN_V}][{EN_V}][^{EN_V}wxY]$)|(^[{EN_V}][^{EN_V}]$)"


def _marked(B, t, mark: str):
    return B.substr(t, B.i(1), B.i(1)) == B.lit(mark)


def _mark(B, e, mark: str):
    return B.concat(B.lit(mark), e)


def _pass_marked(B, t, body, marks=("!",)):
    w = None
    for m in marks:
        w = B.when(_marked(B, t, m), t) if w is None else w.when(
            _marked(B, t, m), t
        )
    return w.otherwise(body)


# --- English stages --------------------------------------------------------

_SHORT_E_END = f"([^{EN_V}][{EN_V}][^{EN_V}wxY]e$)|(^[{EN_V}][^{EN_V}]e$)"


def _st_en0(B, t):
    """Guard (len<=2), exceptional forms (-> '!'-marked final output),
    y-marking (initial y / y-after-vowel -> consonant Y)."""
    w = B.when(B.length(t) <= B.i(2), _mark(B, t, "!"))
    for src, out in EN_EXCEPTIONS1.items():
        w = w.when(t == B.lit(src), _mark(B, B.lit(out), "!"))
    ymarked = B.rrepl_bref(
        B.rrepl(t, "^y", "Y"), f"([{EN_V}])y", "{g1}Y"
    )
    return w.otherwise(ymarked)


def _st_en1a(B, t):
    """Step 1a: sses->ss | ied/ies->i(e) | us/ss keep | s-with-earlier-
    vowel delete."""
    ies_val = B.when(
        B.length(t) > B.i(4), _chop_add(B, t, 3, "i")
    ).otherwise(_chop_add(B, t, 3, "ie"))
    body = (
        B.when(_ends(B, t, "sses"), _chop_add(B, t, 4, "ss"))
        .when(_ends(B, t, "ied") | _ends(B, t, "ies"), ies_val)
        .when(_ends(B, t, "us") | _ends(B, t, "ss"), t)
        .when(_ends(B, t, "s") & _has_vowel_before(B, t, 2), _chop(B, t, 1))
        .otherwise(t)
    )
    return _pass_marked(B, t, body)


def _st_en1b(B, t):
    """Post-1a invariants (inning, proceed, ...) stop processing."""
    body = B.when(
        B.in_strs(t, EN_EXCEPTIONS2), _mark(B, t, "!")
    ).otherwise(t)
    return _pass_marked(B, t, body)


def _st_en2(B, t):
    """Step 1b: eed(ly)->ee in R1; ed/edly/ing/ingly deleted when a
    vowel precedes, then at/bl/iz +e | undouble | short-word +e.
    is-short uses R1 of the pre-deletion word (== Snowball's fixed p1:
    deletion only shortens, and both agree whenever the region test
    matters — see module docstring)."""
    from functools import reduce

    def body_of(r1):
        def after_del(k):
            d = _chop(B, t, k)
            atbliz = (
                _ends(B, d, "at") | _ends(B, d, "bl") | _ends(B, d, "iz")
            )
            dbl = reduce(
                lambda a, b: a | b, [_ends(B, d, x) for x in EN_DOUBLES]
            )
            short = (r1 >= B.length(d)) & B.rlike(d, _SHORT_SYLL_END)
            return (
                B.when(atbliz, B.concat(d, B.lit("e")))
                .when(dbl, _chop(B, d, 1))
                .when(short, B.concat(d, B.lit("e")))
                .otherwise(d)
            )

        return (
            B.when(
                _ends(B, t, "eedly"),
                B.when(
                    _in_r1(B, t, 5, r1), _chop_add(B, t, 5, "ee")
                ).otherwise(t),
            )
            .when(
                _ends(B, t, "eed"),
                B.when(
                    _in_r1(B, t, 3, r1), _chop_add(B, t, 3, "ee")
                ).otherwise(t),
            )
            .when(
                _ends(B, t, "ingly") & _has_vowel_before(B, t, 5),
                after_del(5),
            )
            .when(_ends(B, t, "ingly"), t)
            .when(
                _ends(B, t, "edly") & _has_vowel_before(B, t, 4),
                after_del(4),
            )
            .when(_ends(B, t, "edly"), t)
            .when(
                _ends(B, t, "ing") & _has_vowel_before(B, t, 3),
                after_del(3),
            )
            .when(_ends(B, t, "ing"), t)
            .when(
                _ends(B, t, "ed") & _has_vowel_before(B, t, 2),
                after_del(2),
            )
            .otherwise(t)
        )

    return _pass_marked(B, t, _bind(B, _en_r1x(B, t), body_of))


def _st_en3(B, t):
    """Step 1c: final y/Y -> i when preceded by a non-vowel that is not
    the first letter."""
    cond = (
        (B.length(t) > B.i(2))
        & B.in_strs(_char_from_end(B, t, 1), ["y", "Y"])
        & ~B.in_strs(_char_from_end(B, t, 2), list(EN_V))
    )
    return _pass_marked(
        B, t, B.when(cond, _chop_add(B, t, 1, "i")).otherwise(t)
    )


def _st_en4(B, t):
    """Step 2: longest suffix first, then the R1 gate (no fallback)."""

    def body_of(r1):
        w = None
        for suf, repl in EN_STEP2:
            cond = _ends(B, t, suf)
            if suf == "ogi":
                val = B.when(
                    _in_r1(B, t, 3, r1) & _ends(B, t, "logi"),
                    _chop(B, t, 1),
                ).otherwise(t)
            elif suf == "li":
                val = B.when(
                    _in_r1(B, t, 2, r1)
                    & (B.length(t) >= B.i(3))
                    & B.in_strs(
                        _char_from_end(B, t, 3), list(EN_LI_ENDING)
                    ),
                    _chop(B, t, 2),
                ).otherwise(t)
            else:
                val = B.when(
                    _in_r1(B, t, len(suf), r1),
                    _chop_add(B, t, len(suf), repl),
                ).otherwise(t)
            w = B.when(cond, val) if w is None else w.when(cond, val)
        return w.otherwise(t)

    return _pass_marked(B, t, _bind(B, _en_r1x(B, t), body_of))


def _st_en5(B, t):
    """Step 3 (R1 gate; 'ative' needs R2)."""

    def body_of(r1):
        w = None
        for suf, repl in EN_STEP3:
            cond = _ends(B, t, suf)
            if suf == "ative":
                val = B.when(
                    _in_r1(B, t, 5, r1)
                    & _in_r2(B, t, 5, _en_r2x(B, t, r1)),
                    _chop(B, t, 5),
                ).otherwise(t)
            elif repl is None:
                val = B.when(
                    _in_r1(B, t, len(suf), r1), _chop(B, t, len(suf))
                ).otherwise(t)
            else:
                val = B.when(
                    _in_r1(B, t, len(suf), r1),
                    _chop_add(B, t, len(suf), repl),
                ).otherwise(t)
            w = B.when(cond, val) if w is None else w.when(cond, val)
        return w.otherwise(t)

    return _pass_marked(B, t, _bind(B, _en_r1x(B, t), body_of))


def _st_en6(B, t):
    """Step 4 (R2 gate; 'ion' additionally needs preceding s/t)."""

    def body_of(r2):
        w = None
        for suf in EN_STEP4:
            cond = _ends(B, t, suf)
            if suf == "ion":
                val = B.when(
                    _in_r2(B, t, 3, r2)
                    & B.in_strs(_char_from_end(B, t, 4), ["s", "t"]),
                    _chop(B, t, 3),
                ).otherwise(t)
            else:
                val = B.when(
                    _in_r2(B, t, len(suf), r2), _chop(B, t, len(suf))
                ).otherwise(t)
            w = B.when(cond, val) if w is None else w.when(cond, val)
        return w.otherwise(t)

    return _pass_marked(
        B,
        t,
        _bind(
            B,
            _en_r1x(B, t),
            lambda r1: _bind(B, _en_r2x(B, t, r1), body_of),
        ),
    )


def _st_en7(B, t):
    """Step 5 (final e / double-l), postlude Y->y, strip the '!' marker."""

    def body_of(r1):
        r2 = _en_r2x(B, t, r1)
        e_del = _in_r2(B, t, 1, r2) | (
            _in_r1(B, t, 1, r1) & ~B.rlike(t, _SHORT_E_END)
        )
        return (
            B.when(_ends(B, t, "e") & e_del, _chop(B, t, 1))
            .when(_ends(B, t, "ll") & _in_r2(B, t, 1, r2), _chop(B, t, 1))
            .otherwise(t)
        )

    unmarked = B.when(
        _marked(B, t, "!"), B.substr(t, B.i(2), B.length(t))
    ).otherwise(_bind(B, _en_r1x(B, t), body_of))
    return B.rrepl(unmarked, "Y", "y")


# --- Russian stages --------------------------------------------------------

def _rv_rux(B, t):
    stripped = B.rrepl(t, f"^[^{RU_V}]*[{RU_V}]", "")
    return B.when(
        B.rlike(t, f"[{RU_V}]"), B.length(t) - B.length(stripped)
    ).otherwise(B.length(t))


def _fits_rv(B, t, k: int, rv=None):
    return (B.length(t) - B.i(k)) >= (
        _rv_rux(B, t) if rv is None else rv
    )


def _prev_aya(B, t, k: int, rv=None):
    """Group-1 pre-condition: а/я immediately before the k-suffix, and
    itself inside RV (the limit test can't cross pV)."""
    return (
        (B.length(t) - B.i(k + 1)) >= (_rv_rux(B, t) if rv is None else rv)
    ) & B.in_strs(_char_from_end(B, t, k + 1), ["а", "я"])


def _ru_r2x(B, t):
    r1 = _vc_after(B, t, RU_V)
    rest = B.substr(t, r1 + B.i(1), B.length(t))
    return r1 + _vc_after(B, rest, RU_V)


def _ru_among(B, t, entries, on_match, cond_fail_val, rv=None):
    """RV-limited longest-match WHEN chain: an entry that does not fit
    inside RV falls through to shorter entries (Snowball setlimit);
    a failing а/я pre-condition yields cond_fail_val (no fallback).
    ``rv`` — an already-bound RV expression for ``t`` (else inline)."""
    w = None
    for e in entries:
        suf, needs = (e, False) if isinstance(e, str) else e
        cond = _ends(B, t, suf) & _fits_rv(B, t, len(suf), rv)
        hit = on_match(suf)
        val = (
            B.when(_prev_aya(B, t, len(suf), rv), hit).otherwise(
                cond_fail_val
            )
            if needs
            else hit
        )
        w = B.when(cond, val) if w is None else w.when(cond, val)
    return w


def _st_ru0(B, t):
    return B.rrepl(t, "ё", "е")


def _st_ru1a(B, t):
    """Step 1, perfective gerund: success resolves step 1 ('#')."""
    return _bind(
        B,
        _rv_rux(B, t),
        lambda rv: _ru_among(
            B, t, RU_PERFECTIVE_GERUND,
            lambda suf: _mark(B, _chop(B, t, len(suf)), "#"),
            cond_fail_val=t, rv=rv,
        ).otherwise(t),
    )


def _st_ru1b(B, t):
    """try reflexive (ся/сь) before the adjectival|verb|noun chain."""
    body = _bind(
        B,
        _rv_rux(B, t),
        lambda rv: _ru_among(
            B, t, RU_REFLEXIVE, lambda suf: _chop(B, t, len(suf)),
            cond_fail_val=t, rv=rv,
        ).otherwise(t),
    )
    return _pass_marked(B, t, body, marks=("#",))


def _st_ru1c(B, t):
    """Adjective endings: match resolves into '%' (participle pending)."""
    body = _bind(
        B,
        _rv_rux(B, t),
        lambda rv: _ru_among(
            B, t, RU_ADJECTIVE,
            lambda suf: _mark(B, _chop(B, t, len(suf)), "%"),
            cond_fail_val=t, rv=rv,
        ).otherwise(t),
    )
    return _pass_marked(B, t, body, marks=("#",))


def _st_ru1cp(B, t):
    """'%'-marked words try a preceding participle, then resolve ('#')."""
    d = B.substr(t, B.i(2), B.length(t))
    resolved = _bind(
        B,
        _rv_rux(B, d),
        lambda rv: _ru_among(
            B, d, RU_PARTICIPLE, lambda suf: _chop(B, d, len(suf)),
            cond_fail_val=d, rv=rv,
        ).otherwise(d),
    )
    return B.when(
        _marked(B, t, "%"), _mark(B, resolved, "#")
    ).otherwise(t)


def _st_ru1d(B, t):
    """Verb endings (а/я-conditional group fails the whole verb step)."""
    body = _bind(
        B,
        _rv_rux(B, t),
        lambda rv: _ru_among(
            B, t, RU_VERB,
            lambda suf: _mark(B, _chop(B, t, len(suf)), "#"),
            cond_fail_val=t, rv=rv,
        ).otherwise(t),
    )
    return _pass_marked(B, t, body, marks=("#",))


def _st_ru1e(B, t):
    """Noun endings — the last alternative of step 1."""
    body = _bind(
        B,
        _rv_rux(B, t),
        lambda rv: _ru_among(
            B, t, RU_NOUN,
            lambda suf: _mark(B, _chop(B, t, len(suf)), "#"),
            cond_fail_val=t, rv=rv,
        ).otherwise(t),
    )
    return _pass_marked(B, t, body, marks=("#",))


def _st_ru2(B, t):
    """Strip the step-1 marker; step 2: drop a final и inside RV."""
    w = B.when(
        _marked(B, t, "#"), B.substr(t, B.i(2), B.length(t))
    ).otherwise(t)
    return B.when(
        _ends(B, w, "и") & _fits_rv(B, w, 1), _chop(B, w, 1)
    ).otherwise(w)


def _st_ru3(B, t):
    """Step 3: derivational ость/ост, RV-limited match + R2 gate."""

    def body_of(r2):
        w = None
        for suf in RU_DERIVATIONAL:
            cond = _ends(B, t, suf) & _fits_rv(B, t, len(suf))
            val = B.when(
                (B.length(t) - B.i(len(suf))) >= r2,
                _chop(B, t, len(suf)),
            ).otherwise(t)
            w = B.when(cond, val) if w is None else w.when(cond, val)
        return w.otherwise(t)

    return _bind(B, _ru_r2x(B, t), body_of)


def _st_ru4(B, t):
    """Step 4: undouble нн | superlative (+undouble) | drop ь."""

    def undouble(d):
        # d differs per branch (chop-4 vs chop-3) — its RV stays inline
        return B.when(
            _ends(B, d, "нн") & _fits_rv(B, d, 2), _chop(B, d, 1)
        ).otherwise(d)

    return _bind(
        B,
        _rv_rux(B, t),
        lambda rv: (
            B.when(
                _ends(B, t, "нн") & _fits_rv(B, t, 2, rv), _chop(B, t, 1)
            )
            .when(
                _ends(B, t, "ейше") & _fits_rv(B, t, 4, rv),
                undouble(_chop(B, t, 4)),
            )
            .when(
                _ends(B, t, "ейш") & _fits_rv(B, t, 3, rv),
                undouble(_chop(B, t, 3)),
            )
            .when(_ends(B, t, "ь") & _fits_rv(B, t, 1, rv), _chop(B, t, 1))
            .otherwise(t)
        ),
    )


STAGES = (
    ("en0", _st_en0), ("en1a", _st_en1a), ("en1b", _st_en1b),
    ("en2", _st_en2), ("en3", _st_en3), ("en4", _st_en4),
    ("en5", _st_en5), ("en6", _st_en6), ("en7", _st_en7),
    ("ru0", _st_ru0), ("ru1a", _st_ru1a), ("ru1b", _st_ru1b),
    ("ru1c", _st_ru1c), ("ru1cp", _st_ru1cp), ("ru1d", _st_ru1d),
    ("ru1e", _st_ru1e), ("ru2", _st_ru2), ("ru3", _st_ru3),
    ("ru4", _st_ru4),
)

# Script-dispatch gates: the en chain is a provable net no-op on tokens
# with no Latin letter and the ru chain on tokens with no Cyrillic
# character (module docstring, "Semantics notes"; the en0 `!`-marking of
# short tokens is stripped again by en7, so skipping the WHOLE chain as a
# unit preserves the net result). Each token's script flags are computed
# ONCE up front and carried through the stages in a struct, so a typical
# single-script token evaluates only its own 9-10 stages and a numeric
# token evaluates none — ~2× less per-row stage work on mixed corpora.
EN_GATE_RE = "[A-Za-z]"
RU_GATE_RE = "[Ѐ-ӿ]"  # full Cyrillic block (incl. ё/Ё)


def _gate_flag(name: str) -> str:
    return "en" if name.startswith("en") else "ru"


def stem_array_column(arr: Column) -> Column:
    """Apply the full en+ru snowball chain to an array<string> Column —
    one F.transform per stage (lambda var bound once per element), each
    stage gated on the token's script flag (see EN_GATE_RE/RU_GATE_RE)."""
    # NOTE: F.transform introspects the lambda's arity (a 2-arg lambda
    # receives (element, index)), so stage/flag must be bound via a
    # closure-returning factory, never via lambda default arguments.
    def _wrap():
        return lambda x: F.struct(
            x.alias("t"),
            x.rlike(EN_GATE_RE).alias("en"),
            x.rlike(RU_GATE_RE).alias("ru"),
        )

    def _gated(fn, flag):
        def apply(s):
            return F.struct(
                F.when(s[flag], fn(ColBackend, s["t"]))
                .otherwise(s["t"])
                .alias("t"),
                s["en"].alias("en"),
                s["ru"].alias("ru"),
            )

        return apply

    arr = F.transform(arr, _wrap())
    for name, fn in STAGES:
        arr = F.transform(arr, _gated(fn, _gate_flag(name)))
    return F.transform(arr, lambda s: s["t"])


def stem_token_column(tok: Column) -> Column:
    """Single-token convenience wrapper."""
    return F.element_at(stem_array_column(F.array(tok)), 1)


def stem_array_spark_sql(arr_sql: str) -> str:
    """The same chain as SPARK SQL text over an array expression —
    identical stage structure to ``stem_array_column`` (one transform
    per stage, struct-carried script flags), emitted through
    ``SparkSqlBackend`` so ``F.expr`` parses it in one server-side call
    instead of building the tree through py4j. Lambda variables sbw /
    sb0..sbN / sbz / sbb<K> are analyzer-token-impossible names, so they
    cannot shadow a caller's columns."""
    SparkSqlBackend._bind_seq = 0  # deterministic emitted text
    out = (
        f"transform({arr_sql}, sbw -> named_struct('t', sbw, "
        f"'en', sbw RLIKE {_spark_str(EN_GATE_RE)}, "
        f"'ru', sbw RLIKE {_spark_str(RU_GATE_RE)}))"
    )
    for i, (name, fn) in enumerate(STAGES):
        v = f"sb{i}"
        body = _sq(fn(SparkSqlBackend, _SqlExpr(f"{v}.t")))
        flag = _gate_flag(name)
        out = (
            f"transform({out}, {v} -> named_struct("
            f"'t', CASE WHEN {v}.{flag} THEN {body} ELSE {v}.t END, "
            f"'en', {v}.en, 'ru', {v}.ru))"
        )
    return f"transform({out}, sbz -> sbz.t)"


def stem_array_sql(arr_sql: str) -> str:
    """The same chain as DuckDB SQL over an array expression — struct-
    carried script flags gate each stage exactly like the Column side."""
    out = (
        f"list_transform({arr_sql}, sbw -> {{'t': sbw, "
        f"'en': regexp_matches(sbw, '{EN_GATE_RE}'), "
        f"'ru': regexp_matches(sbw, '{RU_GATE_RE}')}})"
    )
    for i, (name, fn) in enumerate(STAGES):
        v = f"sb{i}"
        body = _sq(fn(SqlBackend, _SqlExpr(f"{v}.t")))
        flag = _gate_flag(name)
        out = (
            f"list_transform({out}, {v} -> "
            f"{{'t': CASE WHEN {v}.{flag} THEN {body} ELSE {v}.t END, "
            f"'en': {v}.en, 'ru': {v}.ru}})"
        )
    return f"list_transform({out}, sbf -> sbf.t)"
