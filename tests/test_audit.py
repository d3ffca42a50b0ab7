"""operators/audit.py — snapshot diff and key-skew profile behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators.audit import (
    key_skew_profile,
    snapshot_diff,
    snapshot_diff_summary,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b double")


def test_snapshot_diff_statuses_and_changed_cols(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (4, None, 4.0)])
    new = _snap(
        spark,
        [
            (1, "x", 1.0),        # unchanged → filtered out
            (2, "y2", 2.0),       # a changed
            (4, "w", 4.5),        # NULL→value on a, b changed
            (5, "new", 5.0),      # added
        ],                        # 3 removed
    )
    rows = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert 1 not in rows
    assert rows[2]["status"] == "changed" and rows[2]["changed_cols"] == "a"
    assert rows[3]["status"] == "removed" and rows[3]["changed_cols"] == ""
    assert rows[4]["status"] == "changed" and rows[4]["changed_cols"] == "a,b"
    assert rows[5]["status"] == "added" and rows[5]["changed_cols"] == ""


def test_snapshot_diff_null_to_null_is_unchanged(spark):
    old = _snap(spark, [(1, None, 1.0)])
    new = _snap(spark, [(1, None, 1.0)])
    assert snapshot_diff(old, new, ["k"]).count() == 0


def test_snapshot_diff_respects_compare_cols_subset(spark):
    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, "x", 9.0)])
    # b differs but only a is compared → no diff row
    assert snapshot_diff(old, new, ["k"], compare_cols=["a"]).count() == 0


def test_snapshot_diff_summary_counts(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0)])
    new = _snap(spark, [(2, "y9", 2.0), (3, "z", 3.0)])
    got = {
        r["status"]: r["n_rows"]
        for r in snapshot_diff_summary(old, new, ["k"]).collect()
    }
    assert got == {"added": 1, "removed": 1, "changed": 1}


def test_snapshot_diff_empty_inputs(spark):
    old = _snap(spark, [(1, "x", 1.0)])
    empty = old.filter(F.lit(False))
    assert snapshot_diff(empty, empty, ["k"]).count() == 0
    all_removed = snapshot_diff(old, empty, ["k"]).collect()
    assert [r["status"] for r in all_removed] == ["removed"]
    all_added = snapshot_diff(empty, old, ["k"]).collect()
    assert [r["status"] for r in all_added] == ["added"]


def test_key_skew_profile_ranks_and_ratios(spark):
    # 6×'hot', 2×'warm', 1×'cold', 1×NULL → 4 keys, 10 rows, mean 2.5
    rows = [("hot",)] * 6 + [("warm",)] * 2 + [("cold",)] + [(None,)]
    df = spark.createDataFrame(rows, "u string")
    got = key_skew_profile(df, "u", top=3).collect()
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert got[0]["key"] == "hot" and got[0]["n"] == 6
    assert abs(got[0]["share"] - 0.6) < 1e-9
    assert abs(got[0]["skew"] - 2.4) < 1e-9  # 6 / (10/4)
    assert got[1]["key"] == "warm"
    # NULL key participates: widen to top=4 and find it
    all4 = key_skew_profile(df, "u", top=4).collect()
    assert any(r["key"] is None for r in all4)


def test_key_skew_profile_tie_breaks_on_key(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], "u string")
    got = key_skew_profile(df, "u", top=3).collect()
    assert [r["key"] for r in got] == ["a", "b", "c"]


def test_vocab_coverage_curve_properties(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        vocab_coverage,
    )

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], "doc_id long, text string"
    )
    got = vocab_coverage(docs, v=3).collect()
    # counts: a=4, b=3, c=1, d=1 → top-3 = a, b, c (tie c<d); total 9
    assert [(r["rank"], r["token"], r["n"]) for r in got] == [
        (1, "a", 4), (2, "b", 3), (3, "c", 1),
    ]
    assert abs(got[0]["cum_coverage"] - round(4 / 9, 6)) < 1e-9
    assert abs(got[2]["cum_coverage"] - round(8 / 9, 6)) < 1e-9
    # cum_coverage is non-decreasing and ≤ 1
    cums = [r["cum_coverage"] for r in got]
    assert cums == sorted(cums) and cums[-1] <= 1.0


def test_shingle_novelty_flags_shared_boilerplate(spark):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        shingle_novelty,
    )

    boiler = "all rights reserved contact us for details"
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta"),
            (2, boiler + " epsilon zeta eta theta"),
            (3, "completely original text about owls and rivers"),
            (4, "xy"),  # 1 token → 0 shingles → vacuous novelty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in shingle_novelty(docs, n=3).collect()}
    # docs 1/2 share the boilerplate 3-grams → novelty well below 1
    assert got[1]["novelty"] < 1.0 and got[2]["novelty"] < 1.0
    assert got[3]["novelty"] == 1.0
    assert got[4]["n_shingles"] == 0 and got[4]["novelty"] == 1.0
    # the shared grams are exactly the boilerplate-internal ones
    assert got[1]["n_novel"] < got[1]["n_shingles"]


def test_snapshot_diff_agrees_with_txlog_cdc(spark, tmp_path):
    """Cross-module consistency: diffing two txlog versions with
    snapshot_diff (full-outer join over the data) must name exactly
    the keys/kinds that tx_changes derives from the manifest symmetric
    difference (which never reads carried-over files). Same truth, two
    radically different plans."""
    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import (
        tx_append,
        tx_merge,
        tx_read,
    )

    p = str(tmp_path / "tbl")
    v1 = tx_append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, val string"
        ),
        p,
    )
    v2 = tx_merge(
        spark,
        p,
        spark.createDataFrame([(2, "B"), (4, "d")], "k long, val string"),
        key="k",
    )
    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import (
        tx_changes,
    )

    cdc = {
        r["k"]: r["change"]
        for r in tx_changes(spark, p, v1, v2, key="k").collect()
    }
    diff = {
        r["k"]: r["status"]
        for r in snapshot_diff(
            tx_read(spark, p, version=v1),
            tx_read(spark, p, version=v2),
            keys=["k"],
        ).collect()
    }
    rename = {"added": "insert", "removed": "delete", "changed": "update"}
    assert {k: rename[s] for k, s in diff.items()} == cdc


def test_snapshot_diff_null_key_matches_across_snapshots(spark):
    """r9 review fix: NULL-keyed rows present in both snapshots must
    pair up (eqNullSafe join), not surface as removed+added."""
    old = _snap(spark, [(None, "x", 1.0), (1, "y", 2.0)])
    new = _snap(spark, [(None, "x", 1.0), (1, "y", 2.0)])
    assert snapshot_diff(old, new, ["k"]).count() == 0
    new2 = _snap(spark, [(None, "CHANGED", 1.0), (1, "y", 2.0)])
    got = snapshot_diff(old, new2, ["k"]).collect()
    assert len(got) == 1
    assert got[0]["k"] is None and got[0]["status"] == "changed"
    assert got[0]["changed_cols"] == "a"


def test_admin_inline_save_rejects_unknown_columns(spark):
    """r9 review fix: a misspelled inline-add column raises (same
    strictness as admin_save) instead of silently null-filling."""
    import datetime as dt

    import pytest

    from djangoadmin_postgresql_2_elasticseach_spark.operators.admin_write import (
        admin_inline_save,
    )

    bridge = spark.createDataFrame(
        [(1, 10, 100, dt.datetime(2020, 1, 1))],
        "id long, film_work_id long, genre_id long, created timestamp",
    )
    bad = spark.createDataFrame(
        [(2, 10, 200)], "id long, film_work_id long, genre_ids long"
    )
    with pytest.raises(ValueError, match="genre_ids"):
        admin_inline_save(
            bridge, adds=bad, now=dt.datetime(2024, 1, 1)
        )


def test_vocab_coverage_index_ticks_equal_one_shot(spark, tmp_path):
    """r10 incremental form: build + N append ticks of the token-count
    artifact must serve the EXACT one-shot curve — counts are additive
    partials, per-tick cost is one groupBy over the batch only."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        append_token_count_index,
        build_token_count_index,
        compact_token_count_index,
        vocab_coverage,
        vocab_coverage_from_index,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import (
        load_table,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    path = str(tmp_path / "vocab_idx")
    build_token_count_index(b0, path)
    append_token_count_index(b1, path)
    append_token_count_index(b2, path)

    want = sorted(map(tuple, vocab_coverage(docs, v=50).collect()))
    got = sorted(map(tuple, vocab_coverage_from_index(spark, path, v=50).collect()))
    # SF_SMOKE's synthetic corpus has <50 distinct tokens — the head is
    # the full (identical) vocabulary in both forms
    assert got == want and len(got) > 0
    # compaction folds partials without changing the curve
    compact_token_count_index(spark, path)
    post = sorted(map(tuple, vocab_coverage_from_index(spark, path, v=50).collect()))
    assert post == want


def test_shingle_index_ticks_equal_one_shot(spark, tmp_path):
    """r10 incremental form: build + append ticks of the (id, shingle)
    artifact serve the EXACT one-shot shingle_novelty — including docs
    with no shingles (vacuously novel) supplied via the id universe."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        append_shingle_index,
        build_shingle_index,
        shingle_novelty,
        shingle_novelty_from_index,
    )

    base = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, base + " one two three"),
            (2, base + " four five six"),
            (3, "totally different words entirely here now"),
            (4, "xy"),  # single token -> no 3-gram shingles
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sh_idx")
    build_shingle_index(docs.filter(F.col("doc_id") <= 2), path, n=3)
    append_shingle_index(docs.filter(F.col("doc_id") > 2), path, n=3)

    want = sorted(map(tuple, shingle_novelty(docs, n=3).collect()))
    got = sorted(
        map(
            tuple,
            shingle_novelty_from_index(
                spark, docs.select("doc_id"), path
            ).collect(),
        )
    )
    assert got == want
    # the shared-boilerplate docs are non-novel, the distinct doc fully
    # novel, the shingle-less doc vacuously novel
    by_id = {t[0]: t for t in got}
    assert by_id[3][3] == 1.0 and by_id[4] == (4, 0, 0, 1.0)
    assert by_id[1][3] < 1.0 and by_id[2][3] < 1.0


def test_shingle_index_compaction_bounds_files(spark, tmp_path):
    """r11 maintenance pass (r10 verdict #5): after K append ticks the
    shingle index holds one file-set per tick; compact_shingle_index
    folds them (file count strictly drops, atomic rename-swap) with
    novelty values exactly invariant."""
    import os

    from djangoadmin_postgresql_2_elasticseach_spark.operators.corpus import (
        append_shingle_index,
        build_shingle_index,
        compact_shingle_index,
        shingle_novelty_from_index,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} word{i} tail{i} extra") for i in range(12)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sh_idx")
    build_shingle_index(docs.filter(F.col("doc_id") < 3), path, n=3)
    for lo in (3, 6, 9):
        append_shingle_index(
            docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 3)
            ),
            path,
            n=3,
        )

    def _files():
        return [f for f in os.listdir(path) if f.endswith(".parquet")]

    before_vals = sorted(
        map(
            tuple,
            shingle_novelty_from_index(
                spark, docs.select("doc_id"), path
            ).collect(),
        )
    )
    n_before = len(_files())
    got_before, got_after = compact_shingle_index(spark, path)
    assert (got_before, got_after) == (n_before, len(_files()))
    assert len(_files()) < n_before
    after_vals = sorted(
        map(
            tuple,
            shingle_novelty_from_index(
                spark, docs.select("doc_id"), path
            ).collect(),
        )
    )
    assert after_vals == before_vals
