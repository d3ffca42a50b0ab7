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


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    max_bucket: int | None = None,
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
    """
    lv = left.withColumn(
        "_var", F.explode(deletion_variants(left_col, max_dist))
    )
    rv = right.withColumn(
        "_var", F.explode(deletion_variants(right_col, max_dist))
    )
    if max_bucket is not None:
        hot = (
            lv.groupBy("_var")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("_var")
        )
        lv = lv.join(F.broadcast(hot), "_var", "left_anti")
        rv = rv.join(F.broadcast(hot), "_var", "left_anti")
    pairs = (
        lv.join(rv, "_var")
        .drop("_var")
        .distinct()
        .filter(F.levenshtein(F.col(left_col), F.col(right_col)) <= max_dist)
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
    return fuzzy_join(a, b, "name_a", "name_b", max_dist, max_bucket).filter(
        F.col("id_a") < F.col("id_b")
    )
