"""Sink/source edge behavior: bulk-sink retry/backoff (ST7), JDBC reader
option construction (S1/S3 — no live DB in this container), ES settings
bootstrap, and the dimension-edit stream (ST6 in streaming mode)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.sources.es_sink import (
    bootstrap_index_settings,
    write_bulk,
)
from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import jdbc_reader, load_movies
from tests import movies_fixtures


def test_bulk_sink_retries_with_backoff(spark, tmp_path):
    """Transport failing twice then succeeding ⇒ payload delivered once,
    3 attempts total (reference @backoff.on_exception, etl/main.py:141)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).coalesce(1)
    attempts_file = str(tmp_path / "attempts")
    delivered_file = str(tmp_path / "delivered")

    def flaky_transport(payload: str) -> None:
        n = 0
        if os.path.exists(attempts_file):
            with open(attempts_file) as f:
                n = int(f.read() or 0)
        with open(attempts_file, "w") as f:
            f.write(str(n + 1))
        if n < 2:
            raise ConnectionError("synthetic transport failure")
        with open(delivered_file, "a") as f:
            f.write(payload)

    write_bulk(
        df, index="t", id_field="id", transport=flaky_transport,
        max_retries=5, backoff_base=0.01,
    )
    with open(attempts_file) as f:
        assert int(f.read()) == 3
    with open(delivered_file) as f:
        lines = [l for l in f.read().splitlines() if l.strip()]
    assert len(lines) == 4  # 2 docs × (action + doc)


def test_bulk_sink_raises_after_max_retries(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "v"]).coalesce(1)

    def always_fail(payload: str) -> None:
        raise ConnectionError("down")

    with pytest.raises(Exception):
        write_bulk(
            df, index="t", id_field="id", transport=always_fail,
            max_retries=2, backoff_base=0.01,
        )


def test_jdbc_reader_builds_partitioned_options(spark):
    """S1/S3: the reader must carry url/dbtable/fetchsize and the
    partitioned-read bounds (no OFFSET loop). No live DB here — assert
    the reader's option map, the part Spark hands the JDBC source."""
    reader = jdbc_reader(
        spark,
        url="jdbc:postgresql://host/db",
        table_or_query="(SELECT * FROM content.film_work WHERE modified > ?) q",
        partition_column="id_hash",
        lower_bound=0,
        upper_bound=1 << 32,
        num_partitions=64,
        fetchsize=10_000,
    )
    # options are private on DataFrameReader; validate via failure mode —
    # loading must fail with a missing-JDBC-driver error (not an option
    # error), proving url/dbtable/partitioning made it through intact.
    with pytest.raises(Exception) as exc:
        reader.load()
    msg = str(exc.value)
    assert "driver" in msg.lower() or "jdbc" in msg.lower() or "postgresql" in msg.lower()


def test_bootstrap_index_settings_reads_reference_shape(tmp_path):
    p = str(tmp_path / "es.json")
    with open(p, "w") as f:
        f.write('{"settings": {"refresh_interval": "1s"}, "mappings": {"dynamic": "strict"}}')
    body = bootstrap_index_settings(p)
    assert body["mappings"]["dynamic"] == "strict"


def test_dimension_edit_stream_reemits_movies(spark, tmp_path):
    """ST6 streaming: a person edit arriving on the dimension stream
    re-emits exactly the affected films' docs."""
    from djangoadmin_postgresql_2_elasticseach_spark.streaming.stream import dimension_edit_stream

    fixture = str(tmp_path / "fix")
    movies_fixtures.build(fixture)
    tables_dir = str(tmp_path / "tables")
    os.makedirs(tables_dir)
    for name in "film_work genre person genre_film_work person_film_work".split():
        sub = os.path.join(tables_dir, name)
        os.makedirs(sub)
        shutil.copy(
            os.path.join(fixture, f"{name}.parquet"),
            os.path.join(sub, "part-000.parquet"),
        )

    got: list = []
    q = dimension_edit_stream(
        spark,
        tables_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink=lambda df, bid: got.extend(df.collect()),
        dimension="person",
        available_now=True,
    )
    q.awaitTermination(120)
    # initial drain: every person is "new" ⇒ all films with any person
    ids = {r["id"] for r in got}
    u = movies_fixtures._u
    assert u("6f", 5) in ids
    assert u("6f", 4) not in ids  # film with no persons is unaffected

    # append an edited person file → only their films re-emit
    got.clear()
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    edited = pa.table(
        {
            "id": [u("70", 1)],
            "full_name": ["Greg Camp Jr"],
            "created": pa.array([dt.datetime(2024, 1, 1)], pa.timestamp("us")),
            "modified": pa.array([dt.datetime(2024, 3, 1)], pa.timestamp("us")),
        }
    )
    pq.write_table(edited, os.path.join(tables_dir, "person", "part-001.parquet"))
    q2 = dimension_edit_stream(
        spark,
        tables_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink=lambda df, bid: got.extend(df.collect()),
        dimension="person",
        available_now=True,
    )
    q2.awaitTermination(120)
    ids2 = {r["id"] for r in got}
    # Greg Camp (person 1): acts in 1, 2, 5, 8; directs 7; writes on 6
    assert ids2 == {
        u("6f", 1), u("6f", 2), u("6f", 5), u("6f", 6), u("6f", 7), u("6f", 8)
    }


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from djangoadmin_postgresql_2_elasticseach_spark.sources.writers import compact_parquet

    path = str(tmp_path / "frag")
    # simulate micro-batch accumulation: 20 tiny appends
    for i in range(20):
        spark.range(i * 100, (i + 1) * 100).withColumnRenamed("id", "k") \
            .repartition(2).write.mode("append").parquet(path)
    before_rows = spark.read.parquet(path).count()
    n_before, n_after = compact_parquet(spark, path, target_file_mb=128)
    assert n_before >= 20 and n_after < n_before
    after = spark.read.parquet(path)
    assert after.count() == before_rows == 2000
    # values intact, not just counts
    assert after.agg({"k": "sum"}).collect()[0][0] == sum(range(2000))


def test_compact_parquet_preserves_partition_layout(spark, tmp_path):
    from djangoadmin_postgresql_2_elasticseach_spark.sources.writers import compact_parquet
    import os
    from pyspark.sql import functions as F

    path = str(tmp_path / "fragp")
    for i in range(6):
        (spark.range(i * 50, (i + 1) * 50).withColumnRenamed("id", "k")
         .withColumn("part", (F.col("k") % 3).cast("int"))
         .repartition(2).write.mode("append").partitionBy("part").parquet(path))
    n_before, n_after = compact_parquet(spark, path, target_file_mb=128, partition_col="part")
    assert n_after < n_before
    assert sorted(d for d in os.listdir(path) if d.startswith("part=")) == [
        "part=0", "part=1", "part=2"
    ]
    assert spark.read.parquet(path).count() == 300


def test_compact_parquet_preserves_string_partition_values(spark, tmp_path):
    """Numeric-looking STRING partition values ('0101', '007') must
    round-trip verbatim — partition-column type inference would rewrite
    them as integers (101, 7) and change the column type on disk."""
    from djangoadmin_postgresql_2_elasticseach_spark.sources.writers import compact_parquet
    import os
    from pyspark.sql import functions as F

    path = str(tmp_path / "fragz")
    df = spark.createDataFrame(
        [(1, "0101"), (2, "0101"), (3, "007")], "k long, part string"
    )
    for _ in range(3):
        df.write.mode("append").partitionBy("part").parquet(path)
    compact_parquet(spark, path, target_file_mb=128, partition_col="part")
    # the on-disk layout still carries the verbatim string values
    assert sorted(d for d in os.listdir(path) if d.startswith("part=")) == [
        "part=007", "part=0101"
    ]
    # an inference-off reader recovers them exactly (an inference-on
    # reader converts at READ time by its own choice — the fix is that
    # compaction no longer bakes that conversion into the layout)
    infer = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(infer)
    spark.conf.set(infer, "false")
    try:
        vals = {r["part"] for r in spark.read.parquet(path).collect()}
    finally:
        spark.conf.set(infer, prev)
    assert vals == {"0101", "007"}


def test_compact_parquet_recovers_stale_swap_dirs(spark, tmp_path):
    """Leftover ._compact_old/_tmp from a crashed prior call must not
    wedge every later compaction (os.rename to an existing dir fails)."""
    from djangoadmin_postgresql_2_elasticseach_spark.sources.writers import compact_parquet
    import os

    path = str(tmp_path / "fragc")
    for i in range(4):
        spark.range(i * 10, (i + 1) * 10).write.mode("append").parquet(path)
    # crash leftovers: garbage old + tmp dirs alongside a healthy path
    os.makedirs(path + "._compact_old/junk")
    os.makedirs(path + "._compact_tmp/junk")
    n_before, n_after = compact_parquet(spark, path)
    assert n_after <= n_before
    assert spark.read.parquet(path).count() == 40
    assert not os.path.exists(path + "._compact_old")
    assert not os.path.exists(path + "._compact_tmp")
    # crash mid-swap (path gone, old present) is restored from old
    os.rename(path, path + "._compact_old")
    n_before2, _ = compact_parquet(spark, path)
    assert spark.read.parquet(path).count() == 40


def test_jsonl_corpus_roundtrip_and_quarantine(spark, tmp_path):
    """JSONL corpus IO: declared schema (no inference), malformed lines
    land in quarantine as raw text instead of failing the read or
    silently dropping; clean rows round-trip through the gzip writer;
    a partitioned write lays out per-source directories."""
    import gzip
    import os

    from djangoadmin_postgresql_2_elasticseach_spark.sources.corpus_io import (
        read_jsonl_corpus,
        split_corrupt,
        write_jsonl_corpus,
    )

    src = tmp_path / "drop"
    src.mkdir()
    lines = [
        '{"doc_id": 1, "text": "alpha", "source": "web"}',
        '{"doc_id": 2, "text": "beta", "source": "books"}',
        'not json at all {{{',
        '{"doc_id": "NOT_A_NUMBER", "text": "gamma", "source": "web"}',
        '{"doc_id": 3, "text": "delta", "source": "web"}',
    ]
    with gzip.open(src / "part-000.jsonl.gz", "wt") as f:
        f.write("\n".join(lines))

    df = read_jsonl_corpus(
        spark, str(src), "doc_id long, text string, source string"
    )
    clean, bad = split_corrupt(df)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2, 3]
    assert clean.columns == ["doc_id", "text", "source"]
    raw = sorted(r["raw_line"] for r in bad.collect())
    assert len(raw) == 2 and any("NOT_A_NUMBER" in x for x in raw)

    out = str(tmp_path / "handoff")
    write_jsonl_corpus(clean, out, partition_col="source")
    assert sorted(d for d in os.listdir(out) if d.startswith("source=")) == [
        "source=books", "source=web"
    ]
    back = read_jsonl_corpus(spark, out + "/source=web", "doc_id long, text string")
    got, bad2 = split_corrupt(back)
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 3]
    assert bad2.count() == 0
    # the written files are actually gzip members
    files = [f for f in os.listdir(out + "/source=web") if f.endswith(".gz")]
    assert files


# ---------------------------------------------------------------------------
# events.ts physical-unit contract (round-3 regression: the driver switched
# testdata from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and the reader's
# hard-coded nanos assumption silently shifted every event to 1970).
# ---------------------------------------------------------------------------

def _write_events_fixture(dir_path: str, unit: str) -> None:
    """Write a tiny events.parquet with ts stored in the given unit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_705_276_800_000_000  # 2024-01-15 00:00:00 UTC in µs
    ts_us = [base_us - 1, base_us, base_us + 1, base_us + 3_600_000_000]
    mult = {"us": 1, "ns": 1000}[unit]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([t * mult for t in ts_us], pa.timestamp(unit)),
            "user_id": pa.array([10, 10, 11, 11], pa.int64()),
            "event_type": pa.array(["a", "b", "a", "b"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(dir_path, "events.parquet"))


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_ts_unit_contract(spark, tmp_path, unit):
    """load_table must yield identical µs timestamps whichever physical
    unit the driver writes, and the strict > checkpoint predicate must
    keep its exclusive semantics in both."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.relational import (
        incremental_events,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import (
        events_ts_unit,
        load_table,
    )

    d = str(tmp_path / unit)
    os.makedirs(d)
    _write_events_fixture(d, unit)
    assert events_ts_unit(d) == unit

    rows = load_table(spark, d, "events").orderBy("event_id").collect()
    assert [r.ts.year for r in rows] == [2024] * 4
    # µs values survive exactly in both paths
    assert rows[1].ts.isoformat() == "2024-01-15T00:00:00"
    assert rows[2].ts.microsecond == 1

    # strict >: the row AT the checkpoint is excluded, the +1µs row kept
    inc = incremental_events(spark, d, "2024-01-15 00:00:00")
    assert sorted(r.event_id for r in inc.collect()) == [3, 4]


def test_events_unit_probe_invalidates_on_rewrite(spark, tmp_path):
    """Regenerated testdata (same path, new mtime/unit) must re-probe —
    the exact shape of the round-3 silent breakage."""
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import (
        events_ts_unit,
    )

    d = str(tmp_path)
    _write_events_fixture(d, "ns")
    assert events_ts_unit(d) == "ns"
    os.utime(os.path.join(d, "events.parquet"))  # ensure mtime moves
    _write_events_fixture(d, "us")
    os.utime(os.path.join(d, "events.parquet"), ns=(1, 1))
    assert events_ts_unit(d) == "us"


def test_events_unit_probe_recurses_partitioned_layout(tmp_path):
    """ADVICE r4: a partition-subdirectory layout (events.parquet/
    p_bucket=.../part-*.parquet) must probe via recursive walk, not a
    top-level listing."""
    from djangoadmin_postgresql_2_elasticseach_spark.sources.readers import (
        events_ts_unit,
    )

    d = str(tmp_path)
    nested = tmp_path / "events.parquet" / "p_bucket=0"
    nested.mkdir(parents=True)
    # reuse the fixture writer into the nested dir, then move the file
    inner = str(tmp_path / "inner")
    os.makedirs(inner)
    _write_events_fixture(inner, "us")
    os.rename(
        os.path.join(inner, "events.parquet"),
        str(nested / "part-00000.parquet"),
    )
    assert events_ts_unit(d) == "us"


def test_tar_shards_roundtrip_bytes_and_meta(spark, tmp_path):
    """write → read reassembles every doc exactly (text bytes AND json
    metadata), shard assignment matches shard_of, and tar bytes are
    deterministic across input partitioning (fixed mtime/uid, sorted
    members)."""
    import hashlib
    import json

    from djangoadmin_postgresql_2_elasticseach_spark.sources.corpus_io import (
        read_tar_shards,
        write_tar_shards,
    )

    rows = [
        (i, f"text of doc {i} с юникодом\n", "en" if i % 2 else "ru", f"s{i % 3}")
        for i in range(1, 41)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_tar_shards(df, out1, n_shards=4, meta_cols=("lang", "source"))
    write_tar_shards(
        df.repartition(13), out2, n_shards=4, meta_cols=("lang", "source")
    )

    # byte-identical shards regardless of input partitioning
    for p in sorted(os.listdir(out1)):
        b1 = open(os.path.join(out1, p), "rb").read()
        b2 = open(os.path.join(out2, p), "rb").read()
        assert b1 == b2, p

    members = read_tar_shards(spark, out1).collect()
    got = {}
    for r in members:
        doc_id = int(r["member"].split(".")[0])
        got.setdefault(doc_id, {})[r["member"].split(".", 1)[1]] = (
            r["content"], r["shard"]
        )
    assert set(got) == {r[0] for r in rows}
    for i, text, lang, source in rows:
        content, shard = got[i]["txt"]
        assert content == text.encode("utf-8")
        meta, _ = got[i]["json"]
        assert json.loads(meta) == {"lang": lang, "source": source}
        want_shard = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 4
        assert shard == want_shard, i


def test_tar_shards_overwrite_removes_stale(spark, tmp_path):
    from djangoadmin_postgresql_2_elasticseach_spark.sources.corpus_io import (
        tar_shard_manifest,
        write_tar_shards,
    )

    big = spark.createDataFrame(
        [(i, "x " * 5) for i in range(1, 200)], "doc_id long, text string"
    )
    small = spark.createDataFrame([(7, "tiny")], "doc_id long, text string")
    out = str(tmp_path / "shards")
    write_tar_shards(big, out, n_shards=8)
    write_tar_shards(small, out, n_shards=8)
    rows = tar_shard_manifest(spark, out).collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 1
    assert rows[0]["n_bytes"] == len(b"tiny")


def test_tar_shards_string_ids_and_null_id_loud(spark, tmp_path):
    from djangoadmin_postgresql_2_elasticseach_spark.sources.corpus_io import (
        read_tar_shards,
        write_tar_shards,
    )

    # string keys (UUID-ish) work verbatim as member basenames
    sdf = spark.createDataFrame(
        [("doc-aa", "alpha"), ("doc-bb", "beta")], "doc_id string, text string"
    )
    out = str(tmp_path / "s")
    write_tar_shards(sdf, out, n_shards=2)
    back = {
        r["member"]: bytes(r["content"])
        for r in read_tar_shards(spark, out).collect()
        if r["member"].endswith(".txt")
    }
    assert back == {"doc-aa.txt": b"alpha", "doc-bb.txt": b"beta"}

    # a NULL id fails the job loudly instead of silently dropping data
    ndf = spark.createDataFrame(
        [(1, "ok"), (None, "lost")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        write_tar_shards(ndf, str(tmp_path / "n"), n_shards=1)
    # and the failed write leaves no committed shard behind
    left = os.listdir(str(tmp_path / "n"))
    assert not [f for f in left if f.endswith(".tar")]


def test_rollup_tick_incremental_equals_batch(spark, tmp_path):
    """Three maintenance ticks (including a late event for an already
    rolled-up day) must merge to exactly the one-shot batch rollup;
    empty delta is a no-op; checkpoint only advances on data."""
    import datetime as dt

    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.sources.state import JsonFileState
    from djangoadmin_postgresql_2_elasticseach_spark.streaming.incremental import rollup_tick

    def ev(i, day, hour, typ, val):
        return (i, dt.datetime(2024, 1, day, hour, 0), 7, typ, val)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    batch1 = spark.createDataFrame(
        [ev(1, 1, 9, "click", 1.5), ev(2, 1, 10, "view", 2.0), ev(3, 2, 9, "click", 3.0)],
        schema,
    )
    # tick 2 delivers day-3 data AND a late day-1 event (ts > ckpt is
    # what makes it a delta; its calendar day is already materialized)
    batch2 = spark.createDataFrame(
        [ev(4, 3, 9, "click", 4.0), ev(5, 3, 10, "click", 0.25)], schema
    )
    late = spark.createDataFrame([ev(6, 3, 11, "view", 9.0)], schema)

    path = str(tmp_path / "daily")
    state = JsonFileState(str(tmp_path / "state.json"))

    assert rollup_tick(spark, batch1, path, state) == 3
    ckpt1 = state.get_state("last_rollup_ts")
    assert rollup_tick(spark, batch1.unionByName(batch2), path, state) == 2
    assert state.get_state("last_rollup_ts") > ckpt1
    assert rollup_tick(spark, batch1, path, state) == 0  # nothing new
    assert rollup_tick(spark, late, path, state) == 1

    got = sorted(
        map(
            tuple,
            spark.read.parquet(path)
            .select(
                F.col("p_day").cast("string"),
                "event_type",
                "n_events",
                F.col("sum_value").cast("double"),
            )
            .collect(),
        )
    )
    everything = batch1.unionByName(batch2).unionByName(late)
    want = sorted(
        map(
            tuple,
            everything.groupBy(
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("p_day"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            .collect(),
        )
    )
    assert got == want


def test_upsert_by_key_merge_and_bucket_scoped_rewrite(spark, tmp_path):
    """Latest version wins; same-version re-delivery wins (idempotent
    retry); an upsert rewrites ONLY the buckets its keys hash into."""
    import os

    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.sources.writers import upsert_by_key

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, 0, f"v{i}") for i in range(100)], "id long, version long, val string"
    )
    assert upsert_by_key(spark, base, path, key="id", version_col="version", n_buckets=8) == 100

    def snapshot():
        out = {}
        for d in os.listdir(path):
            if d.startswith("p_bucket="):
                full = os.path.join(path, d)
                out[d] = sorted(os.listdir(full))
        return out

    before = snapshot()
    upd = spark.createDataFrame([(5, 1, "NEW")], "id long, version long, val string")
    assert upsert_by_key(spark, upd, path, key="id", version_col="version", n_buckets=8) == 1
    after = snapshot()
    changed = [d for d in before if before[d] != after.get(d)]
    assert len(changed) == 1  # exactly the bucket key 5 hashes into

    # same-version re-delivery: the incoming row must replace the stored one
    redeliver = spark.createDataFrame(
        [(5, 1, "NEWER")], "id long, version long, val string"
    )
    upsert_by_key(spark, redeliver, path, key="id", version_col="version", n_buckets=8)
    # stale lower version must NOT win
    stale = spark.createDataFrame([(5, 0, "OLD")], "id long, version long, val string")
    upsert_by_key(spark, stale, path, key="id", version_col="version", n_buckets=8)

    rows = {
        r["id"]: (r["version"], r["val"])
        for r in spark.read.parquet(path).select("id", "version", "val").collect()
    }
    assert len(rows) == 100
    assert rows[5] == (1, "NEWER")
    assert rows[6] == (0, "v6")


def test_upsert_by_key_rejects_bucket_count_drift(spark, tmp_path):
    """An upsert with a different n_buckets than the table layout would
    read the wrong partitions and duplicate keys — it must raise."""
    import pytest

    from djangoadmin_postgresql_2_elasticseach_spark.sources.writers import upsert_by_key

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 0, "a")], "id long, version long, val string")
    upsert_by_key(spark, df, path, key="id", version_col="version", n_buckets=8)
    with pytest.raises(ValueError, match="layout is"):
        upsert_by_key(spark, df, path, key="id", version_col="version", n_buckets=16)
    # key-type drift: same logical key, different integral type -> the
    # xxhash64 bucket differs, so the layout guard must refuse
    df_int = spark.createDataFrame([(1, 0, "a")], "id int, version long, val string")
    with pytest.raises(ValueError, match="layout is"):
        upsert_by_key(spark, df_int, path, key="id", version_col="version", n_buckets=8)


def test_rollup_tick_replay_after_lost_checkpoint_does_not_double_count(spark, tmp_path):
    """Crash-window simulation: the merge landed but the checkpoint
    commit was lost. Re-running the tick with the rolled-back
    checkpoint must SKIP the merge (the _merged_from marker matches)
    and just re-advance the checkpoint — totals unchanged."""
    import datetime as dt

    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.sources.state import (
        DATETIME_MIN,
        JsonFileState,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.streaming.incremental import rollup_tick

    events = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 9), 7, "click", 2.0),
         (2, dt.datetime(2024, 1, 1, 10), 7, "click", 3.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    path = str(tmp_path / "daily")
    state = JsonFileState(str(tmp_path / "s.json"))
    assert rollup_tick(spark, events, path, state) == 2
    committed = state.get_state("last_rollup_ts")

    # simulate the lost checkpoint commit
    state.set_state("last_rollup_ts", DATETIME_MIN)
    assert rollup_tick(spark, events, path, state) == 2  # counted, not re-merged
    assert state.get_state("last_rollup_ts") == committed

    row = spark.read.parquet(path).agg(
        F.sum("n_events").alias("n"), F.sum(F.col("sum_value").cast("double")).alias("s")
    ).first()
    assert row["n"] == 2 and row["s"] == 5.0  # NOT doubled


def test_hll_rollup_tick_equals_oneshot(spark, tmp_path):
    """Incremental HLL register maintenance: N ticks over a split
    stream produce EXACTLY the register table (and estimate) of the
    one-shot batch sketch; re-delivering an old delta is idempotent
    (max-merge) — no replay marker needed, unlike the additive rollup."""
    import datetime as dt

    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import hll_distinct
    from djangoadmin_postgresql_2_elasticseach_spark.sources.state import JsonFileState
    from djangoadmin_postgresql_2_elasticseach_spark.streaming.incremental import (
        hll_rollup_estimate,
        hll_rollup_tick,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
            i % 37,
            "t%d" % (i % 3),
        )
        for i in range(400)
    ]
    all_ev = spark.createDataFrame(rows, schema)
    first = all_ev.filter("event_id < 250")
    path = str(tmp_path / "regs")
    state = JsonFileState(str(tmp_path / "st.json"))

    assert hll_rollup_tick(spark, first, path, state) == 250
    assert hll_rollup_tick(spark, all_ev, path, state) == 150
    assert hll_rollup_tick(spark, all_ev, path, state) == 0  # empty delta no-op

    got = sorted(
        map(tuple, hll_rollup_estimate(spark, path).collect())
    )
    want = sorted(
        map(tuple, hll_distinct(all_ev, "user_id", ["event_type"]).collect())
    )
    assert got == want

    # replay idempotence: wipe the checkpoint and re-merge EVERYTHING —
    # registers must not change (max(a, a) = a)
    state.set_state("last_hll_rollup_ts", "1970-01-01 00:00:00")
    assert hll_rollup_tick(spark, all_ev, path, state) == 400
    again = sorted(map(tuple, hll_rollup_estimate(spark, path).collect()))
    assert again == want


def test_read_csv_corpus_quarantines_bad_rows(spark, tmp_path):
    """CSV ingestion: declared schema, malformed rows quarantined whole
    (wrong arity, unparseable types), clean rows typed correctly."""
    from djangoadmin_postgresql_2_elasticseach_spark.sources.corpus_io import (
        read_csv_corpus,
        split_corrupt,
    )

    p = tmp_path / "drop.csv"
    p.write_text(
        "doc_id,score,text\n"
        "1,0.5,alpha\n"
        "2,not_a_number,beta\n"      # type violation
        "3,0.25,\"quoted, comma\"\n"
        "4,0.75\n"                   # missing column
        "5,1.0,epsilon\n"
    )
    df = read_csv_corpus(
        spark, str(p), "doc_id long, score double, text string"
    )
    clean, bad = split_corrupt(df)
    rows = {r["doc_id"]: (r["score"], r["text"]) for r in clean.collect()}
    assert rows == {
        1: (0.5, "alpha"),
        3: (0.25, "quoted, comma"),
        5: (1.0, "epsilon"),
    }
    raw = sorted(r["raw_line"] for r in bad.collect())
    assert raw == ["2,not_a_number,beta", "4,0.75"]


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC round trip: schema-enforced read returns identical rows and
    the filter reaches the ORC scan as a pushed predicate (the same
    scan contract the parquet paths pin)."""
    from djangoadmin_postgresql_2_elasticseach_spark.plans.tuning import plan_string
    from djangoadmin_postgresql_2_elasticseach_spark.sources.corpus_io import (
        read_columnar,
        write_columnar,
    )

    p = str(tmp_path / "t.orc")
    df = spark.range(1000).selectExpr("id as k", "cast(id % 7 as string) s")
    write_columnar(df, p, fmt="orc")
    back = read_columnar(spark, p, "k long, s string", fmt="orc")
    assert back.count() == 1000
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    plan = plan_string(back.filter("k > 900"))
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,900)]" in plan or (
        "GreaterThan(k,900)" in plan
    ), plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported"):
        write_columnar(df, p, fmt="avro")
