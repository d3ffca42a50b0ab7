"""Adversarial semantics tests for the event-analytics extension
operators (ordered funnel, cohort retention) on hand-built frames —
the oracle-parity suite covers bulk equivalence; these pin the edge
semantics a random corpus may never hit: order violations, timestamp
ties broken by event_id, and the offset-0 cohort invariant.
"""

from __future__ import annotations

import datetime as dt

from djangoadmin_postgresql_2_elasticseach_spark.operators.relational import (
    cohort_retention,
    event_funnel,
)

SF = "unused"  # all tests inject `events=` frames


def _events(spark, rows):
    """rows: (event_id, user_id, ts, event_type)"""
    return spark.createDataFrame(
        [(e, u, t, ty) for e, u, t, ty in rows],
        "event_id long, user_id long, ts timestamp, event_type string",
    )


T0 = dt.datetime(2024, 3, 4, 12, 0, 0)  # a Monday


def _t(seconds: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def _funnel_counts(df) -> dict[int, int]:
    return {r["step"]: r["n_users"] for r in df.collect()}


def test_funnel_requires_strict_order(spark):
    # user 1: view -> click -> purchase (full funnel)
    # user 2: click BEFORE view, never clicks again -> stops at step 1
    # user 3: purchase only -> reaches no step
    ev = _events(
        spark,
        [
            (1, 1, _t(0), "view"),
            (2, 1, _t(10), "click"),
            (3, 1, _t(20), "purchase"),
            (4, 2, _t(0), "click"),
            (5, 2, _t(10), "view"),
            (6, 2, _t(20), "purchase"),
            (7, 3, _t(0), "purchase"),
        ],
    )
    counts = _funnel_counts(event_funnel(spark, SF, events=ev))
    assert counts == {1: 2, 2: 1, 3: 1}


def test_funnel_zero_count_steps_are_emitted(spark):
    ev = _events(spark, [(1, 1, _t(0), "view")])
    out = event_funnel(spark, SF, events=ev).collect()
    assert [(r["step"], r["step_name"], r["n_users"]) for r in out] == [
        (1, "view", 1),
        (2, "click", 0),
        (3, "purchase", 0),
    ]


def test_funnel_tie_broken_by_event_id(spark):
    # view and click share a timestamp; event_id orders click AFTER the
    # view, so the funnel advances. The reverse ids must NOT advance.
    ev_ok = _events(spark, [(1, 1, _t(0), "view"), (2, 1, _t(0), "click")])
    ev_rev = _events(spark, [(2, 1, _t(0), "view"), (1, 1, _t(0), "click")])
    assert _funnel_counts(event_funnel(spark, SF, events=ev_ok))[2] == 1
    assert _funnel_counts(event_funnel(spark, SF, events=ev_rev))[2] == 0


def test_funnel_reuses_one_event_per_step_only(spark):
    # a single 'view' cannot satisfy both a view step and a later
    # repeat of the same type; steps=("view","view") needs TWO views
    one = _events(spark, [(1, 1, _t(0), "view")])
    two = _events(spark, [(1, 1, _t(0), "view"), (2, 1, _t(5), "view")])
    steps = ("view", "view")
    assert _funnel_counts(event_funnel(spark, SF, steps=steps, events=one)) == {
        1: 1,
        2: 0,
    }
    assert _funnel_counts(event_funnel(spark, SF, steps=steps, events=two)) == {
        1: 1,
        2: 1,
    }


def test_cohort_offset_zero_is_cohort_size(spark):
    # users 1,2 first seen in week of Mar 4; user 3 the following week.
    # user 1 returns in offset weeks 1 and 2; user 2 never returns.
    wk = 7 * 24 * 3600
    ev = _events(
        spark,
        [
            (1, 1, _t(0), "view"),
            (2, 2, _t(3600), "view"),
            (3, 1, _t(wk + 60), "view"),
            (4, 1, _t(2 * wk + 60), "view"),
            (5, 3, _t(wk + 120), "view"),
        ],
    )
    rows = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(spark, SF, events=ev).collect()
    }
    mon1 = dt.date(2024, 3, 4)
    mon2 = dt.date(2024, 3, 11)
    assert rows == {
        (mon1, 0): 2,
        (mon1, 1): 1,
        (mon1, 2): 1,
        (mon2, 0): 1,
    }


def test_cohort_week_boundary_is_monday(spark):
    # Sunday 23:59:59 and the following Monday 00:00:01 are DIFFERENT
    # cohorts/offsets (ISO week truncation)
    sun = dt.datetime(2024, 3, 10, 23, 59, 59)
    mon = dt.datetime(2024, 3, 11, 0, 0, 1)
    ev = _events(spark, [(1, 1, sun, "view"), (2, 1, mon, "view")])
    rows = sorted(
        (r["cohort_week"], r["week_offset"], r["n_users"])
        for r in cohort_retention(spark, SF, events=ev).collect()
    )
    assert rows == [
        (dt.date(2024, 3, 4), 0, 1),
        (dt.date(2024, 3, 4), 1, 1),
    ]
