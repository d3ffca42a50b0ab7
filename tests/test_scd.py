"""SCD2 (operators/scd.py): multi-batch version chains, new-key insert,
no-op updates, null-safe attribute comparison, point-in-time view.
Engine-vs-DuckDB parity runs in test_oracle_parity
(scd2_customer_history)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators.scd import scd2_apply, scd2_as_of

DIM_SCHEMA = (
    "k long, seg string, nation long, valid_from date, valid_to date"
)
UP_SCHEMA = "k long, seg string, nation long, eff_ts date"


def _d(y, m, day):
    return dt.date(y, m, day)


def test_two_batches_build_version_chain(spark):
    dim = spark.createDataFrame(
        [(1, "A", 10, _d(1990, 1, 1), None), (2, "B", 20, _d(1990, 1, 1), None)],
        DIM_SCHEMA,
    )
    b1 = spark.createDataFrame(
        [(1, "X", 10, _d(1995, 1, 1)),        # change
         (2, "B", 20, _d(1995, 1, 1)),        # no-op
         (3, "C", 30, _d(1995, 1, 1))],       # brand-new key
        UP_SCHEMA,
    )
    h1 = scd2_apply(dim, b1, ["k"], ["seg", "nation"])
    b2 = spark.createDataFrame(
        [(1, "Y", 11, _d(2000, 6, 1))], UP_SCHEMA
    )
    h2 = scd2_apply(h1, b2, ["k"], ["seg", "nation"])
    got = sorted(map(tuple, h2.collect()))
    assert got == sorted(
        [
            (1, "A", 10, _d(1990, 1, 1), _d(1995, 1, 1)),
            (1, "X", 10, _d(1995, 1, 1), _d(2000, 6, 1)),
            (1, "Y", 11, _d(2000, 6, 1), None),
            (2, "B", 20, _d(1990, 1, 1), None),
            (3, "C", 30, _d(1995, 1, 1), None),
        ]
    )
    # point-in-time views
    at_1997 = {r["k"]: r["seg"] for r in scd2_as_of(h2, _d(1997, 1, 1)).collect()}
    assert at_1997 == {1: "X", 2: "B", 3: "C"}
    at_1992 = {r["k"]: r["seg"] for r in scd2_as_of(h2, _d(1992, 1, 1)).collect()}
    assert at_1992 == {1: "A", 2: "B"}


def test_null_attribute_comparison_is_null_safe(spark):
    """NULL→NULL is UNCHANGED; NULL→value and value→NULL are changes."""
    dim = spark.createDataFrame(
        [(1, None, 10, _d(1990, 1, 1), None),
         (2, None, 20, _d(1990, 1, 1), None),
         (3, "C", 30, _d(1990, 1, 1), None)],
        DIM_SCHEMA,
    )
    up = spark.createDataFrame(
        [(1, None, 10, _d(1995, 1, 1)),   # no-op (null == null)
         (2, "B", 20, _d(1995, 1, 1)),    # null -> value
         (3, None, 30, _d(1995, 1, 1))],  # value -> null
        UP_SCHEMA,
    )
    h = scd2_apply(dim, up, ["k"], ["seg", "nation"])
    rows = list(map(tuple, h.collect()))
    assert (1, None, 10, _d(1990, 1, 1), None) in rows          # untouched
    assert (2, None, 20, _d(1990, 1, 1), _d(1995, 1, 1)) in rows
    assert (2, "B", 20, _d(1995, 1, 1), None) in rows
    assert (3, "C", 30, _d(1990, 1, 1), _d(1995, 1, 1)) in rows
    assert (3, None, 30, _d(1995, 1, 1), None) in rows
    assert len(rows) == 5


def test_history_rows_never_touched(spark):
    dim = spark.createDataFrame(
        [(1, "OLD", 9, _d(1980, 1, 1), _d(1990, 1, 1)),
         (1, "A", 10, _d(1990, 1, 1), None)],
        DIM_SCHEMA,
    )
    up = spark.createDataFrame([(1, "NEW", 10, _d(2000, 1, 1))], UP_SCHEMA)
    h = sorted(map(tuple, scd2_apply(dim, up, ["k"], ["seg", "nation"]).collect()))
    assert (1, "OLD", 9, _d(1980, 1, 1), _d(1990, 1, 1)) in h
    assert len(h) == 3
