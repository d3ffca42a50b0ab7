"""Data-quality suite (operators/quality.py): violation counting on
deliberately dirty data, FK NULL semantics, strict-spec rejection, and
the single-scan plan contract for row-level checks. Engine-vs-DuckDB
value parity runs in test_oracle_parity (dq_orders_checks)."""

from __future__ import annotations

import pytest

from djangoadmin_postgresql_2_elasticseach_spark.operators.quality import run_checks


def _dirty(spark):
    rows = [
        (1, "a", 10.0, "ok-1"),
        (2, None, -5.0, "ok-2"),     # null cat, negative val
        (2, "b", 3.0, "bad"),        # dup id, regex miss
        (3, "z", None, "ok-3"),      # cat out of domain, null val
        (None, "a", 7.0, "ok-4"),    # null id (FK: null doesn't violate)
        (9, "a", 2.0, "ok-5"),       # FK miss (9 not in ref)
    ]
    return spark.createDataFrame(rows, "id long, cat string, val double, tag string")


def test_violation_counts(spark):
    df = _dirty(spark)
    ref = spark.createDataFrame([(1,), (2,), (3,)], "rid long")
    got = {
        (r["check"], r["target"]): (r["violations"], r["passed"])
        for r in run_checks(
            df,
            [
                {"check": "not_null", "col": "id"},
                {"check": "accepted_values", "col": "cat", "values": ["a", "b"]},
                {"check": "min_max", "col": "val", "lo": 0.0, "hi": 100.0},
                {"check": "regex", "col": "tag", "pattern": "^ok-"},
                {"check": "predicate", "expr": "val >= 2.0 OR val IS NULL"},
                {"check": "unique", "cols": ["id"]},
                {"check": "foreign_key", "col": "id", "ref": "r", "ref_col": "rid"},
            ],
            refs={"r": ref},
        ).collect()
    }
    assert got[("not_null", "id")] == (1, False)
    assert got[("accepted_values", "cat")] == (2, False)  # None + 'z'
    assert got[("min_max", "val")] == (2, False)          # -5 + NULL
    assert got[("regex", "tag")] == (1, False)
    assert got[("predicate", "val >= 2.0 OR val IS NULL")] == (1, False)  # -5
    assert got[("unique", "id")] == (1, False)            # one extra '2'
    # FK: NULL id exempt; only id=9 misses
    assert got[("foreign_key", "id->r.rid")] == (1, False)
    assert all(r == 6 for r in [next(iter(got.values()))[0] + 5])  # smoke


def test_clean_data_all_pass(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, cat string")
    out = run_checks(
        df,
        [
            {"check": "not_null", "col": "id"},
            {"check": "unique", "cols": ["id"]},
        ],
    ).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in out)
    assert all(r["total"] == 2 for r in out)


def test_unknown_check_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown check"):
        run_checks(df, [{"check": "freshness", "col": "id"}])


def test_row_level_checks_share_one_scan(spark, tmp_path):
    """All row-level checks must compile into ONE aggregate over ONE
    scan of the table — adding a check adds an aggregate expression,
    never a pass over the data."""
    from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import plan_string

    p = str(tmp_path / "t")
    spark.range(100).selectExpr("id", "cast(id % 7 as string) cat").write.parquet(p)
    df = spark.read.parquet(p)
    out = run_checks(
        df,
        [
            {"check": "not_null", "col": "id"},
            {"check": "accepted_values", "col": "cat", "values": ["0", "1"]},
            {"check": "min_max", "col": "id", "lo": 0},
            {"check": "regex", "col": "cat", "pattern": "^[0-9]$"},
        ],
    )
    import re

    plan = plan_string(out)
    # formatted explain names each node once in the tree and once in the
    # detail section — count distinct scan NODE ids
    scan_ids = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scan_ids) == 1, plan
    # and the pivot is an explode (Generate), not a union of aggregates
    assert "Union" not in plan, plan


def test_profile_table_values_and_two_scans(spark, tmp_path):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.quality import profile_table
    from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import plan_string

    p = str(tmp_path / "t")
    rows = [(i, None if i % 10 == 0 else i % 500, f"s{i % 7}") for i in range(5000)]
    spark.createDataFrame(rows, "a long, b long, c string").write.parquet(p)
    df = spark.read.parquet(p)
    out = profile_table(df, ["a", "b", "c"])
    got = {r["col_name"]: r for r in out.collect()}
    assert got["a"]["n_rows"] == 5000 and got["a"]["n_nulls"] == 0
    assert got["b"]["n_nulls"] == 500
    assert got["a"]["min_value"] == "0.000000"
    assert got["a"]["max_value"] == "4999.000000"
    assert got["c"]["min_value"] == "s0" and got["c"]["max_value"] == "s6"
    # NDV within the 4-sigma HLL envelope (p=12 → rse 1.6%)
    assert abs(got["a"]["approx_ndv"] - 5000) <= 0.07 * 5000
    # b: value v = i%500 is null whenever i%10==0, and i%10 == v%10 for
    # every occurrence — so multiples of 10 NEVER appear: 450 distincts
    assert abs(got["b"]["approx_ndv"] - 450) <= 0.07 * 450 + 5
    # tiny set: linear counting is near-exact (these 7 strings happen to
    # collide on one register under md5 → deterministic 6)
    assert abs(got["c"]["approx_ndv"] - 7) <= 1
    # exactly TWO scans regardless of column count
    import re

    plan = plan_string(out)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2, plan


def test_profile_table_empty_frame(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.quality import profile_table

    df = spark.createDataFrame([], "a long, c string")
    got = {r["col_name"]: r for r in profile_table(df, ["a", "c"]).collect()}
    assert got["a"]["n_rows"] == 0 and got["a"]["approx_ndv"] == 0
    assert got["c"]["min_value"] is None
