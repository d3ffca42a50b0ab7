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
