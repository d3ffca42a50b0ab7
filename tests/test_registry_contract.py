"""Driver-contract guards on the registry:

1. Hashability: no query output column may be array/map/struct-typed —
   the driver canonicalizes with a pandas sort over all columns, and
   Python lists are unhashable there (the round-1 failure mode for 7
   queries). registry._serialize_array_cols enforces this at the
   boundary; this test pins it for every present and future query.
2. Oracle sync: every query has either a SQL oracle or an explicit,
   justified ROWS_ONLY registration — the weaker rows-only check can
   never grow silently.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from djangoadmin_postgresql_2_elasticseach_spark import registry
from tests.conftest import SF_SMOKE


def test_every_query_has_oracle_or_justification():
    q = set(registry.QUERIES)
    o = set(registry.ORACLES)
    ro = set(registry.ROWS_ONLY)
    assert not (o & ro), f"both oracle and rows-only: {sorted(o & ro)}"
    assert ro <= q, f"rows-only entries without a query: {sorted(ro - q)}"
    assert q == o | ro, (
        f"queries missing an oracle AND a rows-only justification: "
        f"{sorted(q - o - ro)}; oracles without a query: {sorted(o - q)}"
    )
    for name, why in registry.ROWS_ONLY.items():
        assert isinstance(why, str) and len(why) >= 20, (
            f"{name}: rows-only justification must be a real sentence"
        )


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_output_is_driver_hashable(name, spark):
    df = registry.QUERIES[name](spark, SF_SMOKE)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: non-scalar output columns {bad} would break the driver "
        f"canonicalizer — serialize them at the registry boundary"
    )


def test_boundary_json_matches_duckdb(spark):
    """The r4 VERDICT harness fix: boundary serialization must be
    collision-free AND byte-identical across engines on adversarial
    values — literal '|', '#', quotes, backslashes, control chars,
    non-ASCII, null elements/fields, null/empty arrays. The former
    delimiter scheme serialized ['a|b'] and ['a','b'] identically
    (a false-PASS hazard); JSON cannot."""
    import duckdb

    from djangoadmin_postgresql_2_elasticseach_spark.registry import (
        _serialize_array_cols,
    )

    strs = ['a|b', 'c#d', 'a', 'b', 'q"uote', 'back\\slash', 'кот',
            'tab\tx', 'nl\nx', '', 'é€𝄞']
    sdf = _serialize_array_cols(
        spark.createDataFrame(
            [(strs, [1, 2, None], [0.5, 1.0 / 3], [("F", None), ("O", "x|y")])],
            "s array<string>, i array<bigint>, d array<double>, "
            "st array<struct<status:string,priority:string>>",
        )
    )
    row = sdf.first()
    con = duckdb.connect()
    want_s = con.execute(
        "SELECT to_json(?::VARCHAR[])::VARCHAR", [strs]
    ).fetchone()[0]
    want_i = con.execute(
        "SELECT to_json(list_transform([1,2,NULL], x -> CAST(x AS VARCHAR)))::VARCHAR"
    ).fetchone()[0]
    want_d = con.execute(
        "SELECT to_json(list_transform([0.5, 1.0/3], x -> printf('%.6f', x)))::VARCHAR"
    ).fetchone()[0]
    want_st = con.execute(
        "SELECT to_json([{'status': 'F', 'priority': NULL},"
        " {'status': 'O', 'priority': 'x|y'}])::VARCHAR"
    ).fetchone()[0]
    assert row["s"] == want_s
    assert row["i"] == want_i
    assert row["d"] == want_d
    assert row["st"] == want_st
    # the two shapes the delimiter scheme conflated must now differ
    two = _serialize_array_cols(
        spark.createDataFrame([(["a|b"],), (["a", "b"],)], "s array<string>")
    )
    got = {r["s"] for r in two.collect()}
    assert len(got) == 2, got
    # null and empty arrays keep their distinct encodings on both sides
    ne = _serialize_array_cols(
        spark.createDataFrame([(None,), ([],)], "s array<string>")
    ).collect()
    assert {r["s"] for r in ne} == {"", "[]"}
