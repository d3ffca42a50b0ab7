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


def test_range_join_pre_epoch_floor_buckets(spark):
    """ADVICE r2: truncate-toward-zero bucketing put negative-µs
    timestamps one tick below a boundary in the wrong bucket, so a
    pre-1970 point could miss its interval. Floor division must pair
    them — interval [1969-12-31 23:50, 23:59] with a 23:55 point."""
    iv = spark.createDataFrame(
        [(1, 7, dt.datetime(1969, 12, 31, 23, 50), dt.datetime(1969, 12, 31, 23, 59))],
        "interval_id long, user_id long, w_start timestamp, w_end timestamp",
    )
    pts = spark.createDataFrame(
        [
            (7, dt.datetime(1969, 12, 31, 23, 55)),
            (7, dt.datetime(1969, 12, 31, 23, 49)),  # outside
            (7, dt.datetime(1970, 1, 1, 0, 1)),      # outside
        ],
        "user_id long, ts timestamp",
    )
    out = range_join(pts, iv, "user_id", "ts", "w_start", "w_end", bucket_minutes=30)
    got = [r["ts"] for r in out.collect()]
    assert got == [dt.datetime(1969, 12, 31, 23, 55)]


def test_range_join_no_duplicate_matches(spark):
    # a point matched by an interval spanning 3 buckets appears ONCE
    iv = spark.createDataFrame(
        [(1, 7, _ts(0), dt.datetime(2024, 1, 1, 13, 5))],
        "interval_id long, user_id long, w_start timestamp, w_end timestamp",
    )
    pts = spark.createDataFrame([(7, _ts(30))], "user_id long, ts timestamp")
    out = range_join(pts, iv, "user_id", "ts", "w_start", "w_end", bucket_minutes=30)
    assert out.count() == 1


def test_sliced_sessionization_merges_midnight_spans(spark, tmp_path):
    """A session crossing midnight (and one spanning THREE days via a
    chain of short gaps) must come out identical to the plain
    single-window sessionization."""
    import os

    from djangoadmin_postgresql_2_elasticseach_spark.operators.relational import (
        user_sessions,
        user_sessions_sliced,
    )

    rows = []
    eid = 0

    def ev(user, day, hour, minute):
        nonlocal eid
        eid += 1
        return (eid, dt.datetime(2024, 1, day, hour, minute), user, "view", 1.0, "{}")

    # user 1: one session crossing midnight (23:50 → 00:10)
    rows += [ev(1, 1, 23, 50), ev(1, 2, 0, 10)]
    # user 1: separate later session (gap > 30 min)
    rows += [ev(1, 2, 6, 0)]
    # user 2: a chain alive across three days via 20-min steps at the edges
    rows += [ev(2, 1, 23, 40), ev(2, 2, 0, 0), ev(2, 2, 0, 20)]
    rows += [ev(2, 2, 23, 55), ev(2, 3, 0, 15)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "events_midnight")
    os.makedirs(d, exist_ok=True)
    # the loaders read ts as raw nanosecond longs (driver testdata format)
    raw = df.withColumn("ts", (F.unix_micros(F.col("ts")) * 1000))
    raw.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

    plain = sorted(map(tuple, user_sessions(spark, d).collect()))
    sliced = sorted(map(tuple, user_sessions_sliced(spark, d).collect()))
    assert plain == sliced
    # hierarchical slicing: hourly slices give the identical result too
    hourly = sorted(
        map(tuple, user_sessions_sliced(spark, d, slice_unit="hour").collect())
    )
    assert hourly == plain
    # and the midnight span really is ONE session
    u1 = [r for r in plain if r[0] == 1]
    assert len(u1) == 2 and u1[0][4] == 2  # 2 events in the crossing session
    u2 = [r for r in plain if r[0] == 2]
    assert len(u2) == 2  # 23:40-00:20 chain, then 23:55-00:15 chain


def test_asof_null_value_in_latest_right_row(spark):
    # The LATEST right row's value is NULL: per-column last(ignorenulls)
    # would skip it and pair asof_ts=11:00 with the OLDER row's 5.0 —
    # the struct-packed propagation must return the whole latest row,
    # NULL value included (matches DuckDB ASOF JOIN).
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 11, 30), 7)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [
            (7, dt.datetime(2024, 1, 1, 10, 0), 5.0),
            (7, dt.datetime(2024, 1, 1, 11, 0), None),
        ],
        "user_id long, ts timestamp, value double",
    )
    row = asof_join(left, right, "user_id", "ts", ["value"]).collect()[0]
    assert row["asof_ts"] == dt.datetime(2024, 1, 1, 11, 0)
    assert row["asof_value"] is None


def test_resample_ffill_gaps_and_in_bucket_pick(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.temporal import resample_ffill

    # user 7: days 1 (two events — latest ts wins), 2 missing, 4 present
    # user 8: single day (grid of one, no gaps)
    events = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 9, 0), 7, 10.0),
            (2, dt.datetime(2024, 1, 1, 18, 0), 7, 11.0),
            (3, dt.datetime(2024, 1, 4, 12, 0), 7, 40.0),
            (4, dt.datetime(2024, 1, 2, 0, 0), 8, 99.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    rows = {
        (r["user_id"], r["bucket_ts"].day): (r["value"], r["is_gap"])
        for r in resample_ffill(events, unit="day").collect()
    }
    assert rows[(7, 1)] == (11.0, False)   # latest event in day wins
    assert rows[(7, 2)] == (11.0, True)    # gap forward-filled
    assert rows[(7, 3)] == (11.0, True)
    assert rows[(7, 4)] == (40.0, False)
    assert rows[(8, 2)] == (99.0, False)
    assert len(rows) == 5                  # grid spans min..max per key


def test_resample_ffill_tie_on_ts_breaks_by_event_id(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.temporal import resample_ffill

    t = dt.datetime(2024, 1, 1, 9, 0)
    events = spark.createDataFrame(
        [(5, t, 7, 1.0), (9, t, 7, 2.0), (2, t, 7, 3.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    [row] = resample_ffill(events, unit="day").collect()
    assert row["value"] == 2.0  # highest event_id at the tied timestamp
