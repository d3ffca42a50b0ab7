"""Schema-enforced readers.

Every scan declares its schema (``spark.read.schema(...)``) so Catalyst
prunes columns against a known layout and no inference pass runs — the
Spark-side equivalent of the reference's fixed DDL + ``dynamic: strict``
mappings (reference ``etl/json/es_movies.json:43``).

Scale notes (100 TB): parquet scans get predicate pushdown + min/max
row-group skipping for free once filters are expressed on the DataFrame;
the incremental `modified > ckpt` predicate therefore prunes at the file/
row-group level when data is written time-partitioned (see
streaming/incremental.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import schemas


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts as raw nanosecond longs — the form incremental
    predicates should filter on (a comparison on the RAW column pushes
    to the parquet scan; one on the derived timestamp does not)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.schema(schemas.EVENTS_RAW).parquet(
        os.path.join(sf_dir, "events.parquet")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-testdata parquet table with its declared schema."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS): read raw ns as long, floor to µs
        # (identical to DuckDB's read-time truncation of the same file).
        from pyspark.sql import functions as F

        raw = load_events_raw(spark, sf_dir)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        ).select([f.name for f in schemas.EVENTS.fields])
    schema = schemas.TESTDATA_TABLES[name]
    return spark.read.schema(schema).parquet(path)


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read all driver-testdata tables present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in schemas.TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def load_movies(spark: SparkSession, fixture_dir: str) -> dict[str, DataFrame]:
    """Read the movies star/bridge tables (film_work, genre, person,
    genre_film_work, person_film_work) from a fixture directory.

    Reference table set: ``postgres/init.sql:35-101``.
    """
    out: dict[str, DataFrame] = {}
    for name, schema in schemas.MOVIES_TABLES.items():
        out[name] = spark.read.schema(schema).parquet(
            os.path.join(fixture_dir, f"{name}.parquet")
        )
    return out


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    *,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    num_partitions: int = 32,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
):
    """Partitioned JDBC scan builder.

    Replaces the reference's manual pagination loops — SQLite
    ``LIMIT step OFFSET`` (reference ``sqlite_extractor_file.py:13-20``)
    and the Postgres server cursor with ``fetchmany(100)`` (reference
    ``etl/main.py:324,135-137``) — with Spark's partitioned JDBC read:
    ``numPartitions`` concurrent range scans, ``fetchsize`` rows per
    round-trip, and Catalyst pushing filters into the dbtable subquery.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader
