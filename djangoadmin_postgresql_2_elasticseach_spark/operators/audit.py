"""Dataset auditing — snapshot diffs and key-skew profiling.

Operational diagnostics a large pipeline runs between ticks: "what
changed between yesterday's table and today's?" (the audit a
destructive refresh like the reference's `etl/load_data.py` DROP+COPY
never answers — our `snapshot_diff` makes the delta a first-class
frame) and "which keys will hot-spot the next shuffle?" (the skew
check you run BEFORE a groupBy/join at 100 TB, feeding the salting /
AQE-skew-join decision documented in SCALING.md).

Both are single-pass, bounded-output operators:

- `snapshot_diff` emits one row per CHANGED key — output scales with
  churn, not table size — via one full-outer join on the key columns
  (the only shuffle; both sides hash-partition on the same key, no
  broadcast needed and none attempted since both snapshots are
  table-sized).
- `key_skew_profile` is a groupBy(key) count with a broadcast 1-row
  total joined back; the top-N head is TakeOrderedAndProject (per-
  partition top-N + driver merge of N·P candidates — never a global
  sort), and ranking happens on the N-row result, a constant-size
  frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots of the same table, keyed by
    ``keys``: one output row per added / removed / changed key, with
    the sorted list of differing columns (comma-joined — a stable
    string for cross-engine hashing). Unchanged rows are filtered out,
    so the result is churn-sized, not table-sized.

    ``compare_cols`` defaults to every shared non-key column. Column
    comparison is null-safe (NULL→value and value→NULL both count as a
    change; NULL→NULL does not) — the `IS DISTINCT FROM` semantics,
    Spark's negated `<=>`.

    Output: (*keys, status, changed_cols) where status ∈
    {'added','removed','changed'} and changed_cols = '' for
    added/removed rows.

    Scale: ONE full-outer sort-merge/hash join on the key columns —
    both snapshots shuffle once on the same key, every downstream
    expression is per-row. No window, no collect; at 10⁹ rows the
    plan is exactly the same three exchanges a MERGE would need.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]

    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    # null-SAFE key equality: a NULL-keyed row present in both
    # snapshots is one (possibly changed) row, not a removed+added
    # pair — the same silent hot spot key_skew_profile warns about
    cond = None
    for k in keys:
        eq = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")

    # membership flags, not key nullability: with eqNullSafe keys a
    # NULL key no longer implies an unmatched side
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    # sorted-by-name differing columns; array_join('', …) for add/remove
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~(F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))),
                    F.lit(c),
                )
                for c in sorted(compare_cols)
            ]
        )
    )
    any_diff = F.size(diffs) > 0
    key_out = [
        F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
        for k in keys
    ]
    return (
        j.select(
            *key_out,
            status.alias("status"),
            F.when(
                F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull(),
                F.array_join(diffs, ","),
            )
            .otherwise(F.lit(""))
            .alias("changed_cols"),
            F.col("_in_old").isNotNull().alias("_io"),
            F.col("_in_new").isNotNull().alias("_in"),
            any_diff.alias("_ad"),
        )
        .filter(~(F.col("_io") & F.col("_in")) | F.col("_ad"))
        .drop("_io", "_in", "_ad")
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(status, n_rows) rollup of `snapshot_diff` — the dashboard
    number ("+1,204 / −88 / ~312 rows since v41"). Same single-join
    plan with a 3-row aggregate on top."""
    return (
        snapshot_diff(old, new, keys, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("status")
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top: int = 20,
) -> DataFrame:
    """Pre-shuffle skew diagnosis: the ``top`` heaviest values of
    ``key_col`` with their absolute count, share of all rows, and
    skew ratio (count ÷ mean-per-key). A skew ratio ≫ 1 on the head
    key is the signal to salt that key or lean on AQE's skew-join
    before running the real groupBy/join.

    NULL keys participate (they hash to one reducer like any value —
    the classic silent hot spot) and surface as a NULL-key row.

    Output: (rank, key, n, share, skew) ordered by rank; key is cast
    to string so the frame is schema-stable across key types.

    Scale: groupBy(key) with map-side combine is the only data-sized
    shuffle; totals ride a broadcast 1-row join (same shape as
    corpus_stats); the head is TakeOrderedAndProject (top-N per
    partition, never a global sort) and the final row_number window
    runs on the N-row result — constant-size state.
    """
    counts = df.select(F.col(key_col).cast("string").alias("key")).groupBy(
        "key"
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    head = (
        counts.join(F.broadcast(tot))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("share"),
            # multiply in DOUBLE: long n · long n_keys wraps negative
            # past 2⁶³ (a 10¹¹-row hot key × 10⁸ keys — exactly the
            # scale this profiler exists for)
            F.round(
                F.col("n").cast("double") * F.col("_nkeys") / F.col("_total"),
                6,
            ).alias("skew"),
        )
        .orderBy(F.desc("n"), F.asc_nulls_first("key"))
        .limit(top)
    )
    w = Window.orderBy(F.desc("n"), F.asc_nulls_first("key"))
    return head.select(
        F.row_number().over(w).alias("rank"), "key", "n", "share", "skew"
    ).orderBy("rank")
