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

Runtime dependency note: the events-unit probe (``events_ts_unit``)
reads the parquet footer via pyarrow, making pyarrow a hard dependency
of every events read path (it ships with PySpark's SQL extra and is
baked into this environment).
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession

from .. import schemas


@functools.lru_cache(maxsize=256)
def _events_ts_unit_cached(path: str, mtime_ns: int) -> str:
    """Footer-only probe of the physical unit of ``events.ts``.

    Returns one of ``"ns" | "us" | "ms" | "long"``.  The cache key
    includes the file mtime so a regenerated testdata directory (the
    exact failure mode of round 3, where the driver silently switched
    TIMESTAMP(NANOS) → TIMESTAMP(MICROS)) invalidates automatically.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(probe):
        # recursive walk (ADVICE r4): a partitioned layout nests part
        # files under key=value subdirectories, which a top-level
        # listing misses
        parts = sorted(
            os.path.join(root, f)
            for root, _dirs, files in os.walk(probe)
            for f in files
            if f.endswith(".parquet")
        )
        if not parts:
            raise FileNotFoundError(f"no parquet parts under {probe}")
        probe = parts[0]
    t = pq.read_schema(probe).field("ts").type
    if pa.types.is_timestamp(t):
        return t.unit  # 'ns' / 'us' / 'ms'
    return "long"


def events_ts_unit(sf_dir: str) -> str:
    """Physical unit of the events table's ``ts`` column under sf_dir."""
    path = os.path.join(sf_dir, "events.parquet")
    return _events_ts_unit_cached(path, os.stat(path).st_mtime_ns)


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts as raw NANOSECOND longs.

    Only valid when :func:`events_ts_unit` is ``"ns"`` — Spark has no
    nanosecond timestamp type, so the ns file is surfaced as int64 via
    ``spark.sql.legacy.parquet.nanosAsLong`` and comparisons on the raw
    column push to the parquet scan.  For µs/ms files use
    :func:`load_events_after` (a plain timestamp predicate pushes down
    there — no raw-long detour needed).
    """
    unit = events_ts_unit(sf_dir)
    if unit not in ("ns", "long"):
        raise ValueError(
            f"events.ts is {unit!r}, not 'ns'/'long' — use load_table/"
            "load_events_after, which handle the native unit"
        )
    # nanosAsLong surfaces TIMESTAMP(NANOS) as int64; a plain INT64
    # column (ns-long fixtures) reads as long under the same schema.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.schema(schemas.EVENTS_RAW).parquet(
        os.path.join(sf_dir, "events.parquet")
    )


def load_events_after(
    spark: SparkSession, sf_dir: str, ckpt_us_exclusive: int
) -> DataFrame:
    """events with ``floor_to_µs(ts) > checkpoint`` pushed to the scan
    in the file's NATIVE unit (the incremental `modified > %s` contract,
    reference etl/main.py:35 — strict: rows at the checkpoint excluded).

    µs/ms files: filter on the TimestampType column with a timestamp
    literal — parquet pushes timestamp predicates natively, so this
    reaches PushedFilters with zero conversion tricks.  ns files: Spark
    can't compare ns timestamps, so filter the raw int64 with
    ``raw >= (ckpt_µs+1)·1000``, which is exactly the same strict-µs
    predicate, then floor to µs.
    """
    from pyspark.sql import functions as F

    unit = events_ts_unit(sf_dir)
    if unit in ("ns", "long"):
        raw = load_events_raw(spark, sf_dir)
        return raw.filter(
            F.col("ts") >= F.lit((ckpt_us_exclusive + 1) * 1000)
        ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = load_table(spark, sf_dir, "events")
    return df.filter(
        F.col("ts") >= F.timestamp_micros(F.lit(ckpt_us_exclusive + 1))
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-testdata parquet table with its declared schema."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # ts unit is probed from the parquet footer, NOT assumed: the
        # driver has shipped this file as both TIMESTAMP(NANOS) and
        # TIMESTAMP(MICROS) across testdata generations.
        unit = events_ts_unit(sf_dir)
        if unit in ("ns", "long"):
            # No µs-precision Spark type for ns (plain int64 fixtures
            # carry ns by contract): read raw ns as long, floor to µs
            # (identical to DuckDB's read-time truncation).
            from pyspark.sql import functions as F

            raw = load_events_raw(spark, sf_dir)
            return raw.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            ).select([f.name for f in schemas.EVENTS.fields])
        # µs (or ms, which widens losslessly): native TimestampType read.
        return spark.read.schema(schemas.EVENTS).parquet(path)
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
