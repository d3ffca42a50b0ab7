"""Batch migration — the reference's SQLite→PostgreSQL loader
(reference my_app/sqlite_to_postgres/load_data.py) as Spark jobs.

The reference loops LIMIT/OFFSET pages of 3000 rows through dataclass
validation into row-at-a-time ``INSERT ON CONFLICT DO NOTHING``
(reference sqlite_extractor_file.py:13-20, postgres_saver_file.py:17-38).
Spark replaces all three moving parts:

- extraction: partitioned JDBC (or parquet) scan — no OFFSET loop;
- validation: explicit StructType + check_constraints() (the dataclass
  equivalents, engine-side);
- load: overwrite (TRUNCATE-equivalent, reference load_data.py:51) or
  idempotent append via writers.append_if_absent (ON CONFLICT DO
  NOTHING equivalent).

Table order is explicit config (FK parents first) — the reference
derives it by sorting table names by length (load_data.py:43-47), which
happens to work for its five tables; we don't reproduce the trick.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from . import writers

# FK-respecting load order (parents before bridges).
TABLE_ORDER = ["genre", "person", "film_work", "genre_film_work", "person_film_work"]


def check_constraints(tables: dict[str, DataFrame]) -> dict[str, int]:
    """Engine-side validation mirroring the reference's dataclass +
    DB constraints: rating bounds 0-100 (reference models.py:108-110),
    type/role domains, FK integrity (reference movies_database.ddl:31-39),
    (film_work_id, person_id, role) uniqueness (ddl:48).
    Returns violation counts by rule (all zero on clean data)."""
    v: dict[str, int] = {}
    fw = tables["film_work"]
    v["rating_bounds"] = fw.filter(
        F.col("rating").isNotNull() & ~F.col("rating").between(0.0, 100.0)
    ).count()
    v["type_domain"] = fw.filter(
        ~F.col("type").isin("movie", "tv_show", "MV", "TV")
    ).count()
    pfw = tables["person_film_work"]
    v["role_domain"] = pfw.filter(
        ~F.col("role").isin("actor", "director", "writer", "AC", "DR", "WR", "OP", "PR")
    ).count()
    v["pfw_unique"] = (
        pfw.groupBy("film_work_id", "person_id", "role")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    v["fk_gfw_genre"] = (
        tables["genre_film_work"]
        .join(tables["genre"].select(F.col("id").alias("gid")),
              F.col("genre_id") == F.col("gid"), "left_anti")
        .count()
    )
    v["fk_pfw_person"] = (
        pfw.join(tables["person"].select(F.col("id").alias("pid")),
                 F.col("person_id") == F.col("pid"), "left_anti")
        .count()
    )
    return v


def migrate(
    spark: SparkSession,
    source: dict[str, DataFrame],
    dest_dir: str,
    mode: str = "overwrite",
) -> dict[str, int]:
    """Move every table to `dest_dir` parquet in FK order.

    mode="overwrite": destructive refresh (reference TRUNCATE CASCADE).
    mode="append_if_absent": idempotent by id (reference ON CONFLICT
    DO NOTHING) — re-running the migration adds nothing.
    Returns written row counts per table.
    """
    counts: dict[str, int] = {}
    for name in TABLE_ORDER:
        if name not in source:
            continue
        df = source[name]
        path = os.path.join(dest_dir, f"{name}")
        if mode == "overwrite":
            writers.overwrite(df, path)
            counts[name] = df.count()
        elif mode == "append_if_absent":
            counts[name] = writers.append_if_absent(spark, df, path, key="id")
        else:
            raise ValueError(mode)
    return counts


def load_migrated(spark: SparkSession, dest_dir: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.schema(schemas.MOVIES_TABLES[name]).parquet(
            os.path.join(dest_dir, name)
        )
        for name in TABLE_ORDER
    }
