"""Explicit StructType schemas — declared once, never inferred.

Mirrors the reference's fixed/declared-schema stance (Postgres DDL
``my_app/schema_design/movies_database.ddl:3-42``, ES mappings with
``dynamic: strict`` at ``etl/json/es_movies.json:43``): every read goes
through ``spark.read.schema(...)``.

Two schema families:

1. Movies star/bridge schema (the reference's own data model,
   reference ``postgres/init.sql:35-101``): UUIDs as strings, UTC
   timestamps.
2. Driver testdata (TPC-H-ish; TESTDATA.md) used by the correctness
   harness.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Movies domain (reference schema; FIXTURES.md)
# ---------------------------------------------------------------------------

FILM_WORK = StructType(
    [
        StructField("id", StringType(), False),
        StructField("title", StringType(), False),
        StructField("description", StringType(), True),
        StructField("creation_date", DateType(), True),
        StructField("rating", DoubleType(), True),
        StructField("type", StringType(), False),
        StructField("created", TimestampType(), True),
        StructField("modified", TimestampType(), True),
        StructField("certificate", StringType(), True),
        StructField("file_path", StringType(), True),
    ]
)

GENRE = StructType(
    [
        StructField("id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("description", StringType(), True),
        StructField("created", TimestampType(), True),
        StructField("modified", TimestampType(), True),
    ]
)

PERSON = StructType(
    [
        StructField("id", StringType(), False),
        StructField("full_name", StringType(), False),
        StructField("created", TimestampType(), True),
        StructField("modified", TimestampType(), True),
    ]
)

GENRE_FILM_WORK = StructType(
    [
        StructField("id", StringType(), False),
        StructField("genre_id", StringType(), False),
        StructField("film_work_id", StringType(), False),
        StructField("created", TimestampType(), True),
    ]
)

PERSON_FILM_WORK = StructType(
    [
        StructField("id", StringType(), False),
        StructField("film_work_id", StringType(), False),
        StructField("person_id", StringType(), False),
        StructField("role", StringType(), False),
        StructField("created", TimestampType(), True),
    ]
)

MOVIES_TABLES = {
    "film_work": FILM_WORK,
    "genre": GENRE,
    "person": PERSON,
    "genre_film_work": GENRE_FILM_WORK,
    "person_film_work": PERSON_FILM_WORK,
}

# Output document schemas (the ETL's three materialized views,
# reference etl/main.py:67-119 + etl/json/es_movies.json:44-105).
PERSON_REF = StructType(
    [StructField("id", StringType(), True), StructField("name", StringType(), True)]
)

MOVIE_DOC = StructType(
    [
        StructField("id", StringType(), False),
        StructField("imdb_rating", DoubleType(), True),
        StructField("genre", ArrayType(StringType(), False), False),
        StructField("title", StringType(), False),
        StructField("description", StringType(), True),
        StructField("director", StringType(), False),
        StructField("actors_names", ArrayType(StringType(), False), False),
        StructField("writers_names", ArrayType(StringType(), False), False),
        StructField("actors", ArrayType(PERSON_REF, False), False),
        StructField("writers", ArrayType(PERSON_REF, False), False),
        StructField("modified", TimestampType(), True),
    ]
)

GENRE_DOC = StructType(
    [
        StructField("id", StringType(), False),
        StructField("name", StringType(), False),
        StructField("description", StringType(), True),
        StructField("film_ids", ArrayType(StringType(), False), False),
        StructField("modified", TimestampType(), True),
    ]
)

FILM_REF = StructType(
    [
        StructField("film_id", StringType(), True),
        StructField("role", StringType(), True),
    ]
)

PERSON_DOC = StructType(
    [
        StructField("id", StringType(), False),
        StructField("full_name", StringType(), False),
        StructField("films", ArrayType(FILM_REF, False), False),
        StructField("modified", TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata (TPC-H-ish; TESTDATA.md)
# ---------------------------------------------------------------------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType(), True),
        StructField("r_name", StringType(), True),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType(), True),
        StructField("n_name", StringType(), True),
        StructField("n_regionkey", IntegerType(), True),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType(), True),
        StructField("c_name", StringType(), True),
        StructField("c_nationkey", IntegerType(), True),
        StructField("c_acctbal", DoubleType(), True),
        StructField("c_mktsegment", StringType(), True),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType(), True),
        StructField("s_name", StringType(), True),
        StructField("s_nationkey", IntegerType(), True),
        StructField("s_acctbal", DoubleType(), True),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType(), True),
        StructField("p_name", StringType(), True),
        StructField("p_brand", StringType(), True),
        StructField("p_type", StringType(), True),
        StructField("p_size", IntegerType(), True),
        StructField("p_retailprice", DoubleType(), True),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType(), True),
        StructField("o_custkey", LongType(), True),
        StructField("o_orderstatus", StringType(), True),
        StructField("o_totalprice", DoubleType(), True),
        StructField("o_orderdate", TimestampType(), True),
        StructField("o_orderpriority", StringType(), True),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType(), True),
        StructField("l_partkey", LongType(), True),
        StructField("l_suppkey", LongType(), True),
        StructField("l_linenumber", IntegerType(), True),
        StructField("l_quantity", DoubleType(), True),
        StructField("l_extendedprice", DoubleType(), True),
        StructField("l_discount", DoubleType(), True),
        StructField("l_tax", DoubleType(), True),
        StructField("l_returnflag", StringType(), True),
        StructField("l_linestatus", StringType(), True),
        StructField("l_shipdate", TimestampType(), True),
    ]
)

# Raw layout for events files whose ts is parquet TIMESTAMP(NANOS) —
# Spark has no nanosecond timestamp type, so the raw read uses LongType
# (ns since epoch, via spark.sql.legacy.parquet.nanosAsLong) and
# readers.load_table converts to microsecond TimestampType with the same
# floor-truncation DuckDB applies. Files with µs ts (the driver has
# shipped both) are read natively with EVENTS; readers.events_ts_unit
# probes the footer to pick the path.
EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), True),
        StructField("embedding", ArrayType(FloatType(), True), True),
        StructField("label", IntegerType(), True),
    ]
)

TESTDATA_TABLES = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
