"""Slowly-changing-dimension type 2 — versioned dimension history as a
pure DataFrame transform.

Extension operator (the reference's `modified`-timestamp polling
rebuilds documents in place — current-state-only; SCD2 is what a
warehouse keeps when history itself is the product, Kimball's
dimensional-modeling type 2): every key carries versioned rows
(valid_from, valid_to, is_current); an incoming snapshot CLOSES the
current row of keys whose tracked attributes changed and OPENS a new
version; unchanged keys and already-closed history pass through
untouched.

Scale shape: one equi-join of the update batch against CURRENT rows
only (history never joins), change detection by null-safe struct
comparison (a pure codegen expression, no per-attribute UDF), and the
output is a union of disjoint row sets — each derived from one side of
that single join. O(|dim| + |batch|), one shuffle on the key. Combined
with `writers.upsert_merge`'s bucket-scoped copy-on-write, only the
partitions holding touched keys get rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    eff_col: str = "eff_ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply one snapshot batch to an SCD2 history frame.

    ``dim`` columns: key_cols + attr_cols + from_col + to_col (NULL
    ``to_col`` marks the current version). ``updates`` columns:
    key_cols + attr_cols + eff_col (at most one row per key — callers
    with multi-version batches apply them in ``eff_col`` order).

    Emitted rows:
    - history (``to_col`` not NULL): untouched;
    - current rows whose key is absent from the batch, or present with
      IDENTICAL attributes (null-safe comparison): untouched;
    - current rows whose key arrives with changed attributes: closed
      (``to_col`` = the update's ``eff_col``);
    - one new current row per changed or brand-new key.
    """
    keyed_up = updates.select(
        *key_cols,
        F.struct(*[F.col(c) for c in attr_cols]).alias("_new_attrs"),
        F.col(eff_col).alias("_eff"),
    )
    hist = dim.filter(F.col(to_col).isNotNull())
    cur = dim.filter(F.col(to_col).isNull())
    joined = cur.join(keyed_up, key_cols, "full_outer")
    old_attrs = F.struct(*[F.col(c) for c in attr_cols])
    has_cur = F.col(from_col).isNotNull()
    has_up = F.col("_eff").isNotNull()
    changed = has_cur & has_up & ~old_attrs.eqNullSafe(F.col("_new_attrs"))

    untouched_cur = joined.filter(
        has_cur & (~has_up | old_attrs.eqNullSafe(F.col("_new_attrs")))
    ).select(*key_cols, *attr_cols, from_col, F.lit(None).cast(
        dim.schema[to_col].dataType
    ).alias(to_col))
    closed = joined.filter(changed).select(
        *key_cols, *attr_cols, from_col, F.col("_eff").alias(to_col)
    )
    opened = joined.filter(changed | (~has_cur & has_up)).select(
        *key_cols,
        *[F.col("_new_attrs")[c].alias(c) for c in attr_cols],
        F.col("_eff").alias(from_col),
        F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
    )
    return (
        hist.select(*key_cols, *attr_cols, from_col, to_col)
        .unionByName(untouched_cur)
        .unionByName(closed)
        .unionByName(opened)
    )


def scd2_as_of(
    dim: DataFrame, ts, from_col: str = "valid_from", to_col: str = "valid_to"
) -> DataFrame:
    """Point-in-time view: the version valid AT ``ts`` (from ≤ ts < to;
    current rows have NULL ``to_col``). A partition-prunable filter —
    no join, no window."""
    t = F.lit(ts)
    return dim.filter(
        (F.col(from_col) <= t)
        & (F.col(to_col).isNull() | (F.col(to_col) > t))
    )
