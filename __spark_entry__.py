"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship denormalization query (the reference's
movies-ETL shape, reference etl/main.py:24-38, mapped onto the testdata
star schema) at sf0.001. `queries()`/`oracle_sql()` expose every
implemented SURVEY.md §2 operator plus the LLM-data-pipeline extensions;
see djangoadmin_postgresql_2_elasticseach_spark/registry.py for the definitions and the
engine-parity rules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from djangoadmin_postgresql_2_elasticseach_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["denorm_orders"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every queries() entry."""
    return dict(registry.ORACLES)
