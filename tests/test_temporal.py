"""As-of join and range join semantics: inclusive bounds, missing-match
NULLs, bucket-boundary crossings — the edges the oracle corpus may not
discriminate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators.temporal import asof_join, range_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 12, minute, 0)


def test_asof_inclusive_and_null_before_first(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), 7), (2, _ts(10), 7), (3, _ts(20), 7), (4, _ts(5), 8)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [(7, _ts(10), 1.5), (7, _ts(15), 2.5)],
        "user_id long, ts timestamp, value double",
    )
    rows = {r["event_id"]: r for r in asof_join(left, right, "user_id", "ts", ["value"]).collect()}
    assert rows[1]["asof_value"] is None          # before any right row
    assert rows[2]["asof_value"] == 1.5           # INCLUSIVE: ts == right ts
    assert rows[3]["asof_value"] == 2.5           # latest wins
    assert rows[4]["asof_value"] is None          # other key untouched
    assert rows[3]["asof_ts"] == _ts(15)


def test_range_join_bucket_boundary_and_inclusive_ends(spark):
    # interval [12:05, 12:35] with 30-min buckets spans two buckets;
    # points at both exact endpoints must match, just-outside must not
    iv = spark.createDataFrame(
        [(100, 7, _ts(5), _ts(35))],
        "interval_id long, user_id long, w_start timestamp, w_end timestamp",
    )
    pts = spark.createDataFrame(
        [(7, _ts(4)), (7, _ts(5)), (7, _ts(29)), (7, _ts(31)), (7, _ts(35)), (7, _ts(36)), (8, _ts(10))],
        "user_id long, ts timestamp",
    )
    got = sorted(
        r["ts"] for r in range_join(
            pts, iv, "user_id", "ts", "w_start", "w_end", bucket_minutes=30
        ).collect()
    )
    assert got == [_ts(5), _ts(29), _ts(31), _ts(35)]


def test_range_join_no_duplicate_matches(spark):
    # a point matched by an interval spanning 3 buckets appears ONCE
    iv = spark.createDataFrame(
        [(1, 7, _ts(0), dt.datetime(2024, 1, 1, 13, 5))],
        "interval_id long, user_id long, w_start timestamp, w_end timestamp",
    )
    pts = spark.createDataFrame([(7, _ts(30))], "user_id long, ts timestamp")
    out = range_join(pts, iv, "user_id", "ts", "w_start", "w_end", bucket_minutes=30)
    assert out.count() == 1
