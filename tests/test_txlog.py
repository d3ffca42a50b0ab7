"""Transaction log (sources/txlog.py): atomic visibility, snapshot
isolation, optimistic-concurrency conflicts, compaction atomicity,
time travel, orphan vacuum."""

from __future__ import annotations

import os

import pytest

from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import (
    CommitConflict,
    TxLog,
    tx_append,
    tx_compact,
    tx_overwrite,
    tx_read,
)


def test_overwrite_append_and_time_travel(spark, tmp_path):
    p = str(tmp_path / "t")
    os.makedirs(p)
    v0 = tx_overwrite(spark.range(0, 100).withColumnRenamed("id", "k"), p)
    v1 = tx_append(spark.range(100, 150).withColumnRenamed("id", "k"), p)
    assert (v0, v1) == (0, 1)
    assert tx_read(spark, p).count() == 150
    assert tx_read(spark, p, version=0).count() == 100  # time travel
    v2 = tx_overwrite(spark.range(0, 7).withColumnRenamed("id", "k"), p)
    assert v2 == 2 and tx_read(spark, p).count() == 7
    assert tx_read(spark, p, version=1).count() == 150


def test_uncommitted_files_invisible(spark, tmp_path):
    """A crashed writer's data files are orphans: present on disk,
    invisible to every reader, reclaimed by vacuum."""
    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import _write_data_files

    p = str(tmp_path / "t")
    os.makedirs(p)
    tx_overwrite(spark.range(10).withColumnRenamed("id", "k"), p)
    # simulate crash: files written, commit never happened
    orphans = _write_data_files(
        spark.range(1000, 2000).withColumnRenamed("id", "k"), p
    )
    assert all(os.path.exists(os.path.join(p, f)) for f in orphans)
    assert tx_read(spark, p).count() == 10  # snapshot unchanged
    removed = TxLog(p).vacuum(retention_sec=0)
    assert removed == len(orphans)
    assert tx_read(spark, p).count() == 10


def test_vacuum_retention_protects_inflight_writer(spark, tmp_path):
    """A default-retention vacuum racing an in-flight writer must NOT
    delete its just-published (not yet committed) data files: the
    writer's subsequent commit has to reference files that still
    exist. Fresh orphans survive the default window; only an explicit
    zero-retention vacuum (safe when no writer is live) reclaims."""
    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import _write_data_files

    p = str(tmp_path / "t")
    os.makedirs(p)
    tx_overwrite(spark.range(10).withColumnRenamed("id", "k"), p)
    log = TxLog(p)
    # in-flight writer: files published, manifest commit not yet done
    names = _write_data_files(
        spark.range(100, 120).withColumnRenamed("id", "k"), p
    )
    assert log.vacuum() == 0  # default retention skips young files
    assert all(os.path.exists(os.path.join(p, f)) for f in names)
    # the writer's commit now succeeds against intact files
    log.commit(log.snapshot() + names, "append", log.latest_version())
    assert tx_read(spark, p).count() == 30


def test_commit_conflict_and_append_retry(spark, tmp_path):
    p = str(tmp_path / "t")
    os.makedirs(p)
    tx_overwrite(spark.range(10).withColumnRenamed("id", "k"), p)
    log = TxLog(p)
    # a stale writer (based on v0) loses to a commit that moved to v1
    snap = log.snapshot(0)
    log.commit(snap, "noop", 0)  # someone else commits v1
    with pytest.raises(CommitConflict):
        log.commit(snap, "stale", 0)
    # append retries transparently on top of the winner
    v = tx_append(spark.range(10, 20).withColumnRenamed("id", "k"), p)
    assert v == 2 and tx_read(spark, p).count() == 20


def test_compact_is_atomic_and_preserves_rows(spark, tmp_path):
    p = str(tmp_path / "t")
    os.makedirs(p)
    for i in range(6):
        tx_append(
            spark.range(i * 50, (i + 1) * 50).withColumnRenamed("id", "k")
            .repartition(3),
            p,
        )
    before = TxLog(p).snapshot()
    assert len(before) >= 18
    tx_compact(spark, p, target_files=2)
    after = TxLog(p).snapshot()
    assert len(after) <= 2
    df = tx_read(spark, p)
    assert df.count() == 300
    assert df.agg({"k": "sum"}).collect()[0][0] == sum(range(300))
    # old files still on disk (time travel), vacuum keeps them (still
    # referenced by older versions)
    assert TxLog(p).vacuum() == 0
    assert tx_read(spark, p, version=5).count() == 300


def test_compact_conflict_aborts_cleanly(spark, tmp_path):
    """Compaction racing a concurrent commit must abort, leave the
    table at the winner's snapshot, and remove its own orphans."""
    import djangoadmin_postgresql_2_elasticseach_spark.sources.txlog as T

    p = str(tmp_path / "t")
    os.makedirs(p)
    tx_append(spark.range(100).withColumnRenamed("id", "k").repartition(4), p)
    log = TxLog(p)

    orig = T._write_data_files

    def race_then_write(df, path):
        names = orig(df, path)
        # concurrent writer lands AFTER compaction wrote its files but
        # BEFORE its commit
        log.commit(log.snapshot(), "concurrent", log.latest_version())
        return names

    T._write_data_files = race_then_write
    try:
        with pytest.raises(CommitConflict):
            tx_compact(spark, p, target_files=1)
    finally:
        T._write_data_files = orig
    assert tx_read(spark, p).count() == 100
    assert TxLog(p).vacuum() == 0  # compactor removed its own orphans


def test_tx_merge_prunes_by_file_stats(spark, tmp_path):
    """MERGE rewrites ONLY the files whose key range overlaps the
    updates; every other file carries over by NAME into the new
    manifest (provably untouched), and the result is exact."""
    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import tx_merge

    p = str(tmp_path / "t")
    os.makedirs(p)
    # three key-clustered commits: [0,100), [100,200), [200,300)
    for lo in (0, 100, 200):
        tx_append(
            spark.range(lo, lo + 100)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1),
            p,
        )
    log = TxLog(p)
    before = set(log.snapshot())
    # updates hit the middle range only, plus brand-new keys
    updates = spark.createDataFrame(
        [(150, -1), (199, -2), (500, -3)], "k long, v long"
    )
    v = tx_merge(spark, p, updates, "k")
    after = set(log.snapshot())
    carried = before & after
    # the [0,100) and [200,300) files carried over untouched
    assert len(carried) == 2
    df = tx_read(spark, p)
    assert df.count() == 301  # 300 originals - 2 replaced + 2 + 1 new
    got = {r["k"]: r["v"] for r in df.filter("k in (150, 199, 500, 10)").collect()}
    assert got == {150: -1, 199: -2, 500: -3, 10: 20}
    # version advanced exactly once
    assert v == log.latest_version() == 3


def test_tx_merge_empty_table_and_full_overlap(spark, tmp_path):
    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import tx_merge

    p = str(tmp_path / "t")
    os.makedirs(p)
    ups = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    tx_merge(spark, p, ups, "k")
    assert tx_read(spark, p).count() == 2
    # full-overlap second merge replaces in place
    tx_merge(spark, p, spark.createDataFrame([(2, 99)], "k long, v long"), "k")
    got = {r["k"]: r["v"] for r in tx_read(spark, p).collect()}
    assert got == {1: 10, 2: 99}


def test_tx_changes_cdc_between_versions(spark, tmp_path):
    """Version-diff CDC: inserts/updates/deletes between any two
    versions, computed from the manifests' symmetric difference only —
    a carried-over file never contributes (and never gets read)."""
    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import tx_changes, tx_merge

    p = str(tmp_path / "t")
    os.makedirs(p)
    for lo in (0, 100):
        tx_append(
            spark.range(lo, lo + 100)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1),
            p,
        )
    # v2: merge updates key 150 and inserts key 999 (touches ONE file)
    tx_merge(
        spark,
        p,
        spark.createDataFrame([(150, -1), (999, -2)], "k long, v long"),
        "k",
    )
    ch = {
        r["k"]: r["change"] for r in tx_changes(spark, p, 1, 2, "k").collect()
    }
    assert ch == {150: "update", 999: "insert"}
    # overwrite → everything old deleted, new inserted
    tx_overwrite(
        spark.createDataFrame([(1, 1), (150, 5)], "k long, v long"), p
    )
    ch2 = {
        r["k"]: r["change"] for r in tx_changes(spark, p, 2, 3, "k").collect()
    }
    assert ch2[999] == "delete"
    assert ch2[1] == "update" and ch2[150] == "update"  # both exist in v2
    assert sum(1 for c in ch2.values() if c == "delete") == 199  # 201 - 2 survivors
    # same version → empty
    assert tx_changes(spark, p, 3, 3, "k").count() == 0


def test_cdc_drives_es_index_maintenance(spark, tmp_path):
    """tx_changes → write_bulk_cdc end-to-end: the transactional
    analogue of the reference's poll-and-reindex loop. After a merge
    (update + insert) and an overwrite-driven delete, the bulk spool
    must contain exactly the changed keys — updated docs carry their
    NEW content, deleted keys appear as bulk delete actions (which the
    reference's insert-only loop cannot express), untouched keys are
    absent."""
    import json as _json

    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.sources.es_sink import write_bulk_cdc
    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import (
        tx_changes,
        tx_merge,
        tx_overwrite,
        tx_read,
    )

    p = str(tmp_path / "t")
    os.makedirs(p)
    tx_append(
        spark.range(0, 50)
        .select(F.col("id").alias("k"), F.concat(F.lit("doc"), F.col("id")).alias("body"))
        .coalesce(1),
        p,
    )
    # v1: update k=7, insert k=999
    tx_merge(
        spark, p,
        spark.createDataFrame([(7, "EDITED"), (999, "NEW")], "k long, body string"),
        "k",
    )
    # v2: drop k=3 (overwrite without it)
    tx_overwrite(
        tx_read(spark, p).filter(F.col("k") != 3), p
    )

    spool = str(tmp_path / "spool")
    changes = tx_changes(spark, p, 0, 2, "k")
    write_bulk_cdc(
        changes, tx_read(spark, p), "movies", "k", spool_dir=spool
    )

    actions: dict[str, set] = {"index": set(), "delete": set()}
    docs: dict[str, dict] = {}
    pending = None
    lines = []
    for fn in sorted(os.listdir(spool)):
        with open(os.path.join(spool, fn), encoding="utf-8") as f:
            lines += [l for l in f.read().splitlines() if l]
    for line in lines:
        obj = _json.loads(line)
        if "index" in obj and set(obj) == {"index"}:
            pending = obj["index"]["_id"]
            actions["index"].add(pending)
        elif "delete" in obj and set(obj) == {"delete"}:
            actions["delete"].add(obj["delete"]["_id"])
        else:
            docs[pending] = obj
    # the overwrite rewrote every file, so key 7/999's docs re-deliver
    # alongside it — but 3 must be a delete and carry NO doc, and the
    # updated key's delivered body must be the new content
    assert actions["delete"] == {"3"}
    assert "3" not in docs
    assert {"7", "999"} <= actions["index"]
    assert docs["7"]["body"] == "EDITED"
    assert docs["999"]["body"] == "NEW"


def test_schema_evolution_additive_append(spark, tmp_path):
    """Append with a new nullable column: old files null-fill it, time
    travel sees the old schema, compaction preserves the evolved one."""
    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import (
        SchemaEvolutionError,
    )

    p = str(tmp_path / "t")
    os.makedirs(p)
    base = spark.range(0, 20).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    tx_overwrite(base, p)
    widened = spark.range(20, 25).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
        (F.col("id") * 1.5).alias("extra"),
    )
    tx_append(widened, p)

    full = tx_read(spark, p)
    assert full.columns == ["k", "val", "extra"]
    assert full.count() == 25
    assert full.filter(F.col("extra").isNull()).count() == 20  # old files
    assert full.filter(F.col("extra").isNotNull()).count() == 5
    # time travel reads v0 under v0's schema
    assert tx_read(spark, p, version=0).columns == ["k", "val"]

    # non-additive writes are rejected; overwrite resets
    with pytest.raises(SchemaEvolutionError):
        tx_append(base.select("k"), p)  # drops val+extra
    with pytest.raises(SchemaEvolutionError):
        tx_append(
            widened.withColumn("val", F.lit(1)), p  # retypes val
        )
    tx_overwrite(base.select("k"), p)
    assert tx_read(spark, p).columns == ["k"]

    # compaction carries the schema through
    tx_overwrite(base, p)
    tx_append(widened, p)
    tx_compact(spark, p, target_files=1)
    after = tx_read(spark, p)
    assert after.columns == ["k", "val", "extra"]
    assert after.filter(F.col("extra").isNull()).count() == 20


def test_schema_evolution_merge_and_cdc(spark, tmp_path):
    """tx_merge with a widened updates frame: survivors in touched
    files null-fill the new column, and tx_changes counts a value
    landing in the NEW column as an update (not invisible)."""
    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import (
        tx_changes,
        tx_merge,
    )

    p = str(tmp_path / "t")
    os.makedirs(p)
    base = spark.range(0, 10).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    tx_overwrite(base.repartition(1), p)
    upd = spark.range(3, 5).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),  # val unchanged
        F.lit(9.5).alias("extra"),
    )
    v1 = tx_merge(spark, p, upd, "k")
    full = tx_read(spark, p)
    assert full.columns == ["k", "val", "extra"]
    assert full.count() == 10
    assert full.filter(F.col("extra").isNotNull()).count() == 2
    ch = {r["k"]: r["change"] for r in tx_changes(spark, p, 0, v1, "k").collect()}
    assert ch == {3: "update", 4: "update"}, "new-column values are updates"


def _strip_manifest_schema(path):
    """Rewrite every manifest without its schema key — simulates a
    table created before schema recording existed."""
    import glob
    import json
    import os

    for f in glob.glob(os.path.join(path, "_txlog", "v*.json")):
        m = json.load(open(f))
        m.pop("schema", None)
        with open(f, "w") as fh:
            json.dump(m, fh)


def test_pre_schema_table_narrow_merge_rejected(spark, tmp_path):
    """r9 review fix: a merge/append NARROWER than a pre-schema table
    must raise, not record its own dtypes as the manifest schema and
    silently project the other columns away on every later read."""
    import pytest

    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import (
        SchemaEvolutionError,
        tx_append,
        tx_merge,
        tx_read,
    )

    p = str(tmp_path / "t")
    tx_append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, val string"), p
    )
    _strip_manifest_schema(p)
    narrow = spark.createDataFrame([(2,)], "k long")
    with pytest.raises(SchemaEvolutionError):
        tx_merge(spark, p, narrow, key="k")
    with pytest.raises(SchemaEvolutionError):
        tx_append(narrow, p)
    # equal-width writes still work and val survives end to end
    tx_merge(
        spark,
        p,
        spark.createDataFrame([(2, "B")], "k long, val string"),
        key="k",
    )
    got = {r["k"]: r["val"] for r in tx_read(spark, p).collect()}
    assert got == {1: "a", 2: "B"}


def test_doomed_append_writes_no_orphans(spark, tmp_path):
    """r9 review fix: schema validation now runs BEFORE data files are
    written, so a doomed append leaves nothing for vacuum to reap."""
    import os

    import pytest

    from djangoadmin_postgresql_2_elasticseach_spark.sources.txlog import (
        SchemaEvolutionError,
        tx_append,
    )

    p = str(tmp_path / "t")
    tx_append(spark.createDataFrame([(1, "a")], "k long, val string"), p)
    files_before = sorted(
        f for f in os.listdir(p) if f.endswith(".parquet")
    )
    with pytest.raises(SchemaEvolutionError):
        tx_append(spark.createDataFrame([(2,)], "k long"), p)  # drops val
    files_after = sorted(
        f for f in os.listdir(p) if f.endswith(".parquet")
    )
    assert files_before == files_after


def test_racing_schema_change_append_cleans_up_files(spark, tmp_path, monkeypatch):
    """ADVICE r10: the pre-write schema check is only a fast-fail — a
    CONCURRENT commit can retype a column between it and the retry
    loop's validation. When the loop validation raises, the append's
    already-written (never-referenced) data files must be removed, not
    left as retention-window orphans."""
    import os

    import pytest

    from djangoadmin_postgresql_2_elasticseach_spark.sources import txlog as T

    p = str(tmp_path / "t")
    T.tx_append(spark.createDataFrame([(1, "a")], "k long, val string"), p)

    real_write = T._write_data_files
    raced = []

    def write_then_lose_race(df, table_path):
        names = real_write(df, table_path)
        # the "concurrent" winner lands AFTER our pre-check and file
        # write but BEFORE our commit validation: retypes k to string.
        # One-shot flag: tx_overwrite itself goes through the patched
        # _write_data_files — without it the race re-races forever.
        if not raced:
            raced.append(True)
            T.tx_overwrite(
                spark.createDataFrame([("x", "a")], "k string, val string"),
                p,
            )
        return names

    monkeypatch.setattr(T, "_write_data_files", write_then_lose_race)
    with pytest.raises(T.SchemaEvolutionError):
        T.tx_append(spark.createDataFrame([(2, "b")], "k long, val string"), p)
    monkeypatch.undo()

    log = T.TxLog(p)
    live = set(log.snapshot(log.latest_version()))
    on_disk = {f for f in os.listdir(p) if f.endswith(".parquet")}
    # every parquet on disk is referenced by SOME manifest version
    # (v0 base append + v1 overwrite); the loser's files are gone
    all_referenced = set()
    for v in log.versions():
        all_referenced.update(log.snapshot(v))
    assert on_disk == all_referenced
    # and the table reads as the winner's state
    rows = T.tx_read(spark, p).collect()
    assert [(r["k"], r["val"]) for r in rows] == [("x", "a")]
    assert live == {f for f in log.snapshot(log.latest_version())}
