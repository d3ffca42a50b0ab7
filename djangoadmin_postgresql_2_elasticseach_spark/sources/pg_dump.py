"""PostgreSQL COPY-format dump reader — loads the reference's actual
dataset (reference ``postgres/init.sql``: DDL + ``COPY ... FROM stdin``
blocks for the five ``content.*`` tables, 999 films) into typed Spark
DataFrames, so the engine's denormalization/search surface can be
checked against the reference's REAL golden numbers (ETLTests-2.json),
not only synthetic fixtures.

Format handled: the text COPY protocol psql/pg_dump emit — one row per
line, tab-separated fields, ``\\N`` for NULL, backslash escapes
(``\\t \\n \\r \\b \\f \\v \\\\``) inside fields, block terminated by
``\\.``.

Scale note: this module parses on the driver — correct for its job
(bootstrap/migration of a config-sized dump; the reference's is 14 k
lines). A multi-TB dump would instead be split at COPY-block offsets
and parsed executor-side with ``spark.read.text`` + the same
``_unescape`` per partition; the JDBC reader (``readers.jdbc_reader``)
remains the scale path for live databases.
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DateType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_COPY_RE = re.compile(r"^COPY\s+([\w.]+)\s*\(([^)]*)\)\s+FROM\s+stdin;")

_ESC = {
    "\\": "\\",
    "t": "\t",
    "n": "\n",
    "r": "\r",
    "b": "\b",
    "f": "\f",
    "v": "\v",
}


def _unescape(field: str) -> str | None:
    if field == "\\N":
        return None
    if "\\" not in field:
        return field
    out: list[str] = []
    i = 0
    n = len(field)
    while i < n:
        c = field[i]
        if c == "\\" and i + 1 < n:
            nxt = field[i + 1]
            if nxt in _ESC:
                out.append(_ESC[nxt])
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_copy_blocks(
    path: str, tables: set[str] | None = None
) -> dict[str, tuple[list[str], list[list[str | None]]]]:
    """{table_name: (columns, rows-of-optional-strings)} for every COPY
    block in the dump (all tables, or just ``tables``)."""
    blocks: dict[str, tuple[list[str], list[list[str | None]]]] = {}
    current: str | None = None
    cols: list[str] = []
    rows: list[list[str | None]] = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if current is None:
                m = _COPY_RE.match(line)
                if m and (tables is None or m.group(1) in tables):
                    current = m.group(1)
                    cols = [c.strip() for c in m.group(2).split(",")]
                    rows = []
                continue
            if line == "\\.":
                blocks[current] = (cols, rows)
                current = None
                continue
            rows.append([_unescape(fld) for fld in line.split("\t")])
    return blocks


_TS = TimestampType()
_S = StringType()

CONTENT_SCHEMAS: dict[str, StructType] = {
    "content.film_work": StructType(
        [
            StructField("id", _S),
            StructField("title", _S),
            StructField("description", _S),
            StructField("creation_date", DateType()),
            StructField("rating", DoubleType()),
            StructField("type", _S),
            StructField("created", _TS),
            StructField("modified", _TS),
            StructField("certificate", _S),
            StructField("file_path", _S),
        ]
    ),
    "content.genre": StructType(
        [
            StructField("id", _S),
            StructField("name", _S),
            StructField("description", _S),
            StructField("created", _TS),
            StructField("modified", _TS),
        ]
    ),
    "content.person": StructType(
        [
            StructField("id", _S),
            StructField("full_name", _S),
            StructField("created", _TS),
            StructField("modified", _TS),
        ]
    ),
    "content.genre_film_work": StructType(
        [
            StructField("id", _S),
            StructField("genre_id", _S),
            StructField("film_work_id", _S),
            StructField("created", _TS),
        ]
    ),
    "content.person_film_work": StructType(
        [
            StructField("id", _S),
            StructField("person_id", _S),
            StructField("film_work_id", _S),
            StructField("role", _S),
            StructField("created", _TS),
        ]
    ),
}


def _conv(value: str | None, dtype) -> object:
    if value is None:
        return None
    if isinstance(dtype, TimestampType):
        # pg emits '2023-05-05 17:24:39.564001+00'
        v = value
        if v.endswith("+00"):
            v += ":00"
        return dt.datetime.fromisoformat(v)
    if isinstance(dtype, DateType):
        return dt.date.fromisoformat(value)
    if isinstance(dtype, DoubleType):
        return float(value)
    return value


def load_pg_dump(
    spark: SparkSession,
    path: str,
    tables: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Load the dump's ``content.*`` tables as typed DataFrames keyed by
    bare table name (``film_work``, ``genre``, ...). Unknown requested
    tables raise (strict — no silently-missing inputs)."""
    wanted = tables or [t.split(".", 1)[1] for t in CONTENT_SCHEMAS]
    qualified = {f"content.{t}" for t in wanted}
    unknown = qualified - set(CONTENT_SCHEMAS)
    if unknown:
        raise ValueError(f"no schema for {sorted(unknown)}")
    blocks = parse_copy_blocks(path, tables=qualified)
    missing = qualified - set(blocks)
    if missing:
        raise ValueError(f"dump has no COPY block for {sorted(missing)}")
    out: dict[str, DataFrame] = {}
    for qname in sorted(qualified):
        cols, rows = blocks[qname]
        schema = CONTENT_SCHEMAS[qname]
        want_cols = [f.name for f in schema.fields]
        if cols != want_cols:
            raise ValueError(
                f"{qname}: dump columns {cols} != expected {want_cols}"
            )
        typed = [
            [_conv(v, f.dataType) for v, f in zip(r, schema.fields)]
            for r in rows
        ]
        out[qname.split(".", 1)[1]] = spark.createDataFrame(typed, schema)
    return out
