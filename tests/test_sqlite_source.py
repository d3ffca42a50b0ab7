"""Distributed SQLite source (S1 — the reference's sqlite→postgres
migration seam, my_app/sqlite_to_postgres/load_data.py) exercised
against a REAL sqlite file built with the stdlib module: discovery
order, parallel rowid-range scan parity, affinity mapping, idempotent
and destructive migration modes."""

from __future__ import annotations

import os
import sqlite3

import pytest

from djangoadmin_postgresql_2_elasticseach_spark.sources.sqlite_source import (
    migrate_sqlite,
    read_sqlite,
    sqlite_tables,
)


@pytest.fixture(scope="module")
def sqlite_db(tmp_path_factory):
    """A movies-shaped sqlite DB: 5 tables matching the reference's
    schema names, film_work big enough (10k rows) to spread over every
    rowid range partition."""
    path = str(tmp_path_factory.mktemp("sqlite") / "db.sqlite")
    conn = sqlite3.connect(path)
    c = conn.cursor()
    c.execute("CREATE TABLE genre (id TEXT PRIMARY KEY, name TEXT)")
    c.execute("CREATE TABLE person (id TEXT PRIMARY KEY, full_name TEXT)")
    c.execute(
        "CREATE TABLE film_work (id TEXT PRIMARY KEY, title TEXT,"
        " rating REAL, votes INTEGER, poster BLOB, created TIMESTAMP)"
    )
    c.execute(
        "CREATE TABLE genre_film_work (id TEXT, genre_id TEXT,"
        " film_work_id TEXT)"
    )
    c.execute(
        "CREATE TABLE person_film_work (id TEXT, person_id TEXT,"
        " film_work_id TEXT, role TEXT)"
    )
    c.executemany(
        "INSERT INTO genre VALUES (?, ?)",
        [(f"g{i}", f"genre-{i}") for i in range(26)],
    )
    c.executemany(
        "INSERT INTO person VALUES (?, ?)",
        [(f"p{i}", f"person {i}") for i in range(100)],
    )
    c.executemany(
        "INSERT INTO film_work VALUES (?, ?, ?, ?, ?, ?)",
        [
            (
                f"f{i:05d}",
                f"film {i}",
                (i % 101) / 1.0 if i % 7 else None,  # NULL ratings too
                i * 3,
                bytes([i % 256, (i + 1) % 256]),
                f"2021-01-{1 + i % 28:02d} 00:00:00",
            )
            for i in range(10_000)
        ],
    )
    c.executemany(
        "INSERT INTO genre_film_work VALUES (?, ?, ?)",
        [(f"gf{i}", f"g{i % 26}", f"f{i % 10_000:05d}") for i in range(500)],
    )
    conn.commit()
    conn.close()
    return path


def test_discovery_reference_name_length_order(sqlite_db):
    # the reference sorts sqlite_master names by LENGTH (load_data.py:43-47)
    assert sqlite_tables(sqlite_db) == [
        "genre", "person", "film_work", "genre_film_work",
        "person_film_work",
    ]


def test_parallel_scan_matches_direct_read(spark, sqlite_db):
    df = read_sqlite(spark, sqlite_db, "film_work", partitions=8)
    # declared-affinity schema: REAL→double, INTEGER→long, BLOB→binary,
    # TIMESTAMP→string (text storage surfaces as text, caller casts)
    dt = dict(df.dtypes)
    assert dt == {
        "id": "string", "title": "string", "rating": "double",
        "votes": "bigint", "poster": "binary", "created": "string",
    }
    rows = {r["id"]: r for r in df.collect()}
    with sqlite3.connect(sqlite_db) as conn:
        direct = conn.execute(
            "SELECT id, title, rating, votes, poster, created"
            " FROM film_work"
        ).fetchall()
    assert len(rows) == len(direct) == 10_000
    for rid, title, rating, votes, poster, created in direct:
        r = rows[rid]
        assert (r["title"], r["votes"], r["created"]) == (title, votes, created)
        assert r["rating"] == rating  # incl. NULLs
        assert bytes(r["poster"]) == poster
    # the scan genuinely split: >1 task produced rows
    n_parts = (
        df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)])
        .filter(lambda n: n > 0)
        .count()
    )
    assert n_parts > 1


def test_empty_table_single_partition(spark, sqlite_db):
    df = read_sqlite(spark, sqlite_db, "person_film_work", partitions=8)
    assert df.count() == 0
    assert df.columns == ["id", "person_id", "film_work_id", "role"]


def test_unknown_table_raises(spark, sqlite_db):
    with pytest.raises(ValueError, match="not found"):
        read_sqlite(spark, sqlite_db, "nope")


def test_migrate_destructive_and_idempotent(spark, sqlite_db, tmp_path):
    out = str(tmp_path / "lake")
    counts = migrate_sqlite(spark, sqlite_db, out, partitions=4)
    assert counts == {
        "genre": 26, "person": 100, "film_work": 10_000,
        "genre_film_work": 500, "person_film_work": 0,
    }
    # destructive re-run converges to the same state (TRUNCATE+reload)
    counts2 = migrate_sqlite(spark, sqlite_db, out, partitions=4)
    assert counts2 == counts
    # idempotent mode appends 0 over an already-migrated lake
    counts3 = migrate_sqlite(
        spark, sqlite_db, out, partitions=4, destructive=False
    )
    assert counts3 == {
        "genre": 0, "person": 0, "film_work": 0, "genre_film_work": 0,
        "person_film_work": 0,
    }
    got = spark.read.parquet(os.path.join(out, "film_work")).count()
    assert got == 10_000
