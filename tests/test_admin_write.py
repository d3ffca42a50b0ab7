"""Admin write path (operators/admin_write.py): ModelForm-save merge
semantics (reference models.py:9-13 TimeStampedMixin, 106-115
validators/choices; admin.py:38-45 inlines) and the end-to-end
edit → incremental-ETL re-index flow."""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators.admin_write import (
    admin_inline_save,
    admin_save,
)

NOW = dt.datetime(2024, 6, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def films(spark):
    return spark.createDataFrame(
        [
            ("f1", "Alpha", 50.0, "movie", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)),
            ("f2", "Beta", 60.0, "tv_show", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 3)),
            ("f3", "Gamma", None, "movie", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 4)),
        ],
        "id string, title string, rating double, type string, "
        "created timestamp, modified timestamp",
    )


def _by_id(df):
    return {r["id"]: r.asDict() for r in df.collect()}


def test_update_stamps_modified_keeps_created(spark, films):
    edits = spark.createDataFrame(
        [("f1", "Alpha Redux", 75.0)], "id string, title string, rating double"
    )
    out = _by_id(admin_save(films, edits, now=NOW))
    assert out["f1"]["title"] == "Alpha Redux"
    assert out["f1"]["rating"] == 75.0
    assert out["f1"]["modified"] == NOW            # auto_now
    assert out["f1"]["created"] == dt.datetime(2024, 1, 1)  # kept
    assert out["f1"]["type"] == "movie"            # column not in form: untouched
    # untouched rows byte-identical
    assert out["f2"] == _by_id(films)["f2"]
    assert len(out) == 3


def test_insert_stamps_both_and_nulls_missing(spark, films):
    edits = spark.createDataFrame([("f9", "Delta")], "id string, title string")
    out = _by_id(admin_save(films, edits, now=NOW))
    assert len(out) == 4
    assert out["f9"]["created"] == NOW and out["f9"]["modified"] == NOW
    assert out["f9"]["rating"] is None and out["f9"]["type"] is None


def test_explicit_null_clears_field(spark, films):
    # a cleared blank=True form field submits NULL — it must win
    edits = spark.createDataFrame(
        [("f2", None)], "id string, rating double"
    )
    out = _by_id(admin_save(films, edits, now=NOW))
    assert out["f2"]["rating"] is None
    assert out["f2"]["title"] == "Beta"


def test_validators_and_choices_raise(spark, films):
    bad_rating = spark.createDataFrame(
        [("f1", 150.0)], "id string, rating double"
    )
    with pytest.raises(ValueError, match="rating:validator"):
        admin_save(
            films, bad_rating, now=NOW,
            validators={"rating": F.col("rating").between(0, 100)},
        )
    bad_type = spark.createDataFrame(
        [("f1", "opera")], "id string, type string"
    )
    with pytest.raises(ValueError, match="type:choices"):
        admin_save(
            films, bad_type, now=NOW, choices={"type": ["movie", "tv_show"]}
        )
    # NULL passes validation (blank=True)
    ok = spark.createDataFrame([("f1", None)], "id string, rating double")
    admin_save(
        films, ok, now=NOW,
        validators={"rating": F.col("rating").between(0, 100)},
    ).collect()


def test_audit_and_unknown_columns_rejected(spark, films):
    with pytest.raises(ValueError, match="not\\s+editable"):
        admin_save(
            films,
            spark.createDataFrame([("f1", NOW)], "id string, modified timestamp"),
            now=NOW,
        )
    with pytest.raises(ValueError, match="not in table"):
        admin_save(
            films,
            spark.createDataFrame([("f1", "x")], "id string, nope string"),
            now=NOW,
        )
    with pytest.raises(ValueError, match="explicit `now`"):
        admin_save(films, spark.createDataFrame([("f1",)], "id string"))


@pytest.fixture(scope="module")
def bridge(spark):
    return spark.createDataFrame(
        [
            ("b1", "f1", "g1", dt.datetime(2024, 1, 1)),
            ("b2", "f1", "g2", dt.datetime(2024, 1, 1)),
            ("b3", "f2", "g1", dt.datetime(2024, 1, 1)),
        ],
        "id string, film_work_id string, genre_id string, created timestamp",
    )


def test_inline_delete_and_add(spark, bridge):
    deletes = spark.createDataFrame([("b2",)], "id string")
    adds = spark.createDataFrame(
        [("b9", "f2", "g2")], "id string, film_work_id string, genre_id string"
    )
    out = _by_id(admin_inline_save(bridge, adds=adds, deletes=deletes, now=NOW))
    assert set(out) == {"b1", "b3", "b9"}
    assert out["b9"]["created"] == NOW


def test_inline_pk_collision_raises_but_readd_ok(spark, bridge):
    adds = spark.createDataFrame(
        [("b1", "f3", "g1")], "id string, film_work_id string, genre_id string"
    )
    with pytest.raises(ValueError, match="collide"):
        admin_inline_save(bridge, adds=adds, now=NOW)
    # delete-then-readd of the same pk in one save is legal
    deletes = spark.createDataFrame([("b1",)], "id string")
    out = _by_id(admin_inline_save(bridge, adds=adds, deletes=deletes, now=NOW))
    assert out["b1"]["film_work_id"] == "f3" and out["b1"]["created"] == NOW


def test_edit_flows_into_incremental_etl(spark, tmp_path):
    """The reference loop end-to-end: admin_save bumps `modified`
    (auto_now), the strict-> checkpoint scan picks up EXACTLY the
    edited film on the next tick (reference etl/main.py incremental
    contract)."""
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import load_movies
    from djangoadmin_postgresql_2_elasticseach_spark.sources.state import JsonFileState
    from djangoadmin_postgresql_2_elasticseach_spark.streaming.incremental import (
        IncrementalEtl,
    )
    from tests import movies_fixtures

    work = str(tmp_path / "tables")
    movies_fixtures.build(work)
    state = JsonFileState(str(tmp_path / "state.json"))

    def run_tick():
        tables = load_movies(spark, work)
        return IncrementalEtl(state, tables, lambda df, entity: df.count()).run_tick()

    run_tick()
    assert run_tick() == {"movies": 0, "genres": 0, "persons": 0}

    fw = load_movies(spark, work)["film_work"]
    target = fw.orderBy("id").first()
    edits = spark.createDataFrame(
        [(target["id"], "Edited Title")], "id string, title string"
    )
    merged = admin_save(fw, edits, now=dt.datetime(2024, 2, 1))
    merged.write.mode("overwrite").parquet(str(tmp_path / "fw_new"))
    # the fixture writes film_work.parquet as a single file; replace it
    # with the merged directory (spark reads either shape)
    fw_path = os.path.join(work, "film_work.parquet")
    os.remove(fw_path)
    shutil.copytree(str(tmp_path / "fw_new"), fw_path)

    n = run_tick()
    assert n == {"movies": 1, "genres": 0, "persons": 0}


def test_duplicate_and_null_pks_rejected(spark, films):
    dup = spark.createDataFrame(
        [("f1", "A"), ("f1", "B")], "id string, title string"
    )
    with pytest.raises(ValueError, match="duplicate"):
        admin_save(films, dup, now=NOW)
    nul = spark.createDataFrame([(None, "A")], "id string, title string")
    with pytest.raises(ValueError, match="NULL id"):
        admin_save(films, nul, now=NOW)


def test_inline_duplicate_add_pks_rejected(spark, bridge):
    adds = spark.createDataFrame(
        [("b9", "f1", "g1"), ("b9", "f2", "g2")],
        "id string, film_work_id string, genre_id string",
    )
    with pytest.raises(ValueError, match="duplicate"):
        admin_inline_save(bridge, adds=adds, now=NOW)
