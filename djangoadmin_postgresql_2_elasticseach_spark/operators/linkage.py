"""Entity resolution / record linkage — fuzzy equi-join WITHOUT a
cross join.

Extension operator (the reference's fuzziness lives in search-side
`multi_match` — `etl/json/ETLTests-2.json` fuzzy goldens; this applies
the same edit-distance semantics to a JOIN between relations, the
classic record-linkage step a warehouse needs for dedup'ing entity
tables). A naive fuzzy join is |L|×|R| `levenshtein` evaluations — a
cartesian product that no cluster survives at 100 TB. The standard
published fix is BLOCKING: only pairs sharing a blocking key are
compared.

The blocking scheme here is the symmetric-delete neighborhood
(SymSpell, Garbe 2012; the same family as the q-gram/deletion
neighborhoods in Navarro 2001's approximate-matching survey): every
string generates its variants with up to ``max_dist`` characters
DELETED. If lev(a, b) ≤ d then a and b share at least one common
variant in their ≤d-deletion neighborhoods — substitutions delete the
differing position on both sides, insertions/deletions delete the extra
character on the longer side. So an equi-join on variants is a COMPLETE
candidate generator (no missed pairs — the oracle proves this by brute
force), and the exact ``levenshtein`` verify runs only on candidates.

Scale shape: the explode factor is len+1 variants at d=1 (O(len²/2) at
d=2) — a bounded per-row constant, NOT a data-dependent blowup; the
candidate join is a plain shuffled equi-join on the variant string;
verification is JVM-side `levenshtein` on candidate pairs only. Skewed
variant buckets (very common short strings) can be capped with
``max_bucket`` — the same stop-bucket guard the MinHash/SimHash LSH
joins use, with the same documented recall trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: str, max_dist: int = 1):
    """Column expression: array of DISTINCT variants of ``col`` with up
    to ``max_dist`` single-character deletions (the string itself
    included). Pure codegen-side expression — transform/sequence/
    substring, no UDF."""
    if max_dist not in (1, 2):
        raise ValueError("deletion_variants supports max_dist 1 or 2")

    def dels(expr: str) -> str:
        # all strings with exactly ONE character of `expr` deleted
        return (
            f"transform(sequence(1, greatest(length({expr}), 1)), "
            f"i -> concat(substring({expr}, 1, i - 1), "
            f"substring({expr}, i + 1, length({expr}) - i)))"
        )

    one = f"concat(array({col}), {dels(col)})"
    if max_dist == 1:
        return F.expr(f"array_distinct({one})")
    two = f"flatten(transform({one}, v -> concat(array(v), {dels('v')})))"
    return F.expr(f"array_distinct({two})")


def _exploded_variants(df: DataFrame, col: str, max_dist: int) -> DataFrame:
    """All rows × their ≤``max_dist``-deletion variants as a ``_var``
    column — the JOIN-side form of ``deletion_variants``.

    Generated with explode(sequence) + substring/concat instead of the
    higher-order ``transform``: HOFs (ArrayTransform / array_distinct)
    run INTERPRETED, outside whole-stage codegen, and profiling the
    sf0.1 self-join showed the variant expression itself — not the join
    — was the wall-clock (3.6 s per side for 15k rows). The generator
    form is fully codegen'd. Position 0 means "delete nothing", so the
    string itself is always included; repeated characters yield
    duplicate variants (no per-row distinct — the verify + final
    distinct absorb the modest extra candidate volume far cheaper than
    interpreted array_distinct did).
    """
    def _delete_at(src, i):
        return F.when(i == 0, src).otherwise(
            F.concat(
                F.substring(src, F.lit(1), i - 1),
                F.substring(src, i + 1, F.length(src) - i),
            )
        )

    def _canonical(src, i):
        # deleting ANY char of an identical-char run yields the same
        # variant (zero-padded keys have long zero runs — multiplicity
        # 7×7 on a candidate pair was the measured blow-up); keep only
        # the run's LAST position. charAt(len+1) = '' ≠ any char, so the
        # final position always survives.
        return (i == 0) | (
            F.substring(src, i, 1) != F.substring(src, i + 1, 1)
        )

    def _one_pass(src_df, src_col, keep: list[str]):
        src = F.col(src_col)
        return (
            src_df.select(
                "*",
                F.explode(F.sequence(F.lit(0), F.length(src))).alias("_i"),
            )
            .filter(_canonical(src, F.col("_i")))
            .select(*keep, _delete_at(src, F.col("_i")).alias("_var"))
        )

    out = _one_pass(df, col, df.columns)
    if max_dist == 1:
        return out
    if max_dist != 2:
        raise ValueError("fuzzy_join supports max_dist 1 or 2")
    return _one_pass(
        out.withColumnRenamed("_var", "_var0"), "_var0", df.columns
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    max_bucket: int | None = None,
    pair_filter=None,
) -> DataFrame:
    """Join rows whose string columns are within ``max_dist`` edits
    (Levenshtein). Output: all left columns + all right columns (the
    caller disambiguates names) for verified pairs.

    Candidate pairs come from the symmetric-delete variant equi-join —
    complete for the given distance — then the exact distance filter
    keeps true matches only. With ``max_bucket`` set, variant buckets
    larger than the cap are dropped before the join (guards a hot
    variant; complete-ness then becomes best-effort, exactly like the
    LSH stop-bucket guard).

    ``pair_filter`` (optional Column over the joined row) is applied
    IMMEDIATELY after the variant join, before the dedupe — a self-join
    passes its half-matrix condition here so self-matches and mirrored
    pairs (every string trivially shares all its own variants) die at
    the join output instead of riding through the distinct. Measured on
    the sf0.1 customer self-join: ~2× less candidate volume.
    """
    from ..plans.tuning import spread

    # spread BEFORE the explode: a small parquet input arrives in one
    # split, the variant join broadcasts the right side, and the
    # levenshtein verify then runs in that ONE task (measured 6.5 s of
    # an 8 s sf0.1 self-join on a single core). spread is a no-op on
    # well-partitioned production inputs.
    lv = _exploded_variants(spread(left), left_col, max_dist)
    rv = _exploded_variants(spread(right), right_col, max_dist)
    if max_bucket is not None:
        # hot buckets are judged PER SIDE then unioned: a variant hot
        # only on the right would otherwise never be capped and the
        # skew guard would not bound right-heavy buckets (join fan-out
        # is |left bucket| x |right bucket| — either side can blow it)
        def _hot(v):
            return (
                v.groupBy("_var")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > max_bucket)
                .select("_var")
            )

        hot = _hot(lv).unionByName(_hot(rv)).distinct()
        lv = lv.join(F.broadcast(hot), "_var", "left_anti")
        rv = rv.join(F.broadcast(hot), "_var", "left_anti")
    cand = lv.join(rv, "_var")
    if pair_filter is not None:
        cand = cand.filter(pair_filter)
    # cheap length band ahead of the dedupe: |len(a)-len(b)| > d can
    # never verify (levenshtein lower bound)
    cand = cand.filter(
        F.abs(F.length(F.col(left_col)) - F.length(F.col(right_col)))
        <= max_dist
    )
    # verify BEFORE the dedupe: levenshtein is a shuffle-free codegen
    # expression, so re-evaluating it per candidate occurrence is
    # cheaper than shuffling the full candidate multiset through
    # distinct — the distinct then only sees verified pairs,
    # |output|-sized
    pairs = (
        cand.drop("_var")
        .filter(F.levenshtein(F.col(left_col), F.col(right_col)) <= max_dist)
        .distinct()
    )
    return pairs


def fuzzy_self_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate entity pairs within ONE relation: unordered pairs
    (id_a < id_b) whose names are within ``max_dist`` edits. The
    self-join form of ``fuzzy_join`` with the standard half-matrix
    dedupe."""
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(name_col).alias("name_a")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(name_col).alias("name_b")
    )
    return fuzzy_join(
        a,
        b,
        "name_a",
        "name_b",
        max_dist,
        max_bucket,
        pair_filter=F.col("id_a") < F.col("id_b"),
    )
