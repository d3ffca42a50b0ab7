"""Watermarked tumbling-window aggregation: append-mode emission of
closed windows, late-data drop, and batch/stream equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.streaming.windows import (
    windowed_event_counts,
)


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )


def test_windowed_counts_batch_semantics(spark):
    rows = [
        (1, "2026-01-01 00:10:00", "click", 1.0),
        (2, "2026-01-01 00:40:00", "click", 2.0),
        (3, "2026-01-01 01:05:00", "click", 4.0),
        (4, "2026-01-01 00:20:00", "view", 8.0),
    ]
    out = windowed_event_counts(_events_df(spark, rows)).collect()
    by = {(str(r["window_start"]), r["event_type"]): r for r in out}
    assert by[("2026-01-01 00:00:00", "click")]["n_events"] == 2
    assert by[("2026-01-01 00:00:00", "click")]["sum_value"] == 3.0
    assert by[("2026-01-01 01:00:00", "click")]["n_events"] == 1
    assert by[("2026-01-01 00:00:00", "view")]["sum_value"] == 8.0


def test_windowed_stream_append_and_late_drop(spark, tmp_path):
    """File-stream in three micro-batches: batch 2 advances the
    watermark past hour-0 (closing + emitting that window in append
    mode); batch 3's hour-0 straggler is behind the watermark — its
    window already closed — so it is dropped, not re-emitted."""
    src = str(tmp_path / "ev")

    emitted: list = []

    def run_available(qname: str):
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        ).parquet(src)
        q = (
            windowed_event_counts(stream, watermark_delay="15 minutes")
            .writeStream.foreachBatch(
                lambda df, _bid: emitted.extend(df.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: hour-0 clicks + an 03:00 event → final watermark 02:45
    # (persisted in the checkpoint); hour-0 window is closed state
    _events_df(
        spark,
        [
            (1, "2026-01-01 00:10:00", "click", 1.0),
            (2, "2026-01-01 00:40:00", "click", 2.0),
            (3, "2026-01-01 03:00:00", "view", 4.0),
        ],
    ).coalesce(1).write.mode("append").parquet(src)
    run_available("win_run1")

    # run 2 (same checkpoint): a straggler behind the persisted
    # watermark — its window end (01:00) ≤ wm (02:45) → dropped; the
    # closed hour-0 window emits with the ORIGINAL two rows only
    _events_df(spark, [(4, "2026-01-01 00:50:00", "click", 8.0)]).coalesce(
        1
    ).write.mode("append").parquet(src)
    run_available("win_run2")

    out = emitted
    closed = {(str(r["window_start"]), r["event_type"]): r for r in out}
    key = ("2026-01-01 00:00:00", "click")
    # hour-0 click window closed by the batch-2 watermark; the late row
    # (event 4) was NOT included, file order decides it arrived after
    assert key in closed
    r = closed[key]
    assert (r["n_events"], r["sum_value"]) == (2, 3.0)
    # the 03:00 window is still open (watermark), so not emitted
    assert ("2026-01-01 03:00:00", "view") not in closed


def test_session_window_batch_semantics(spark):
    """Native session windows merge events within the gap; a >=gap idle
    period starts a new session (boundary differs from the batch
    gaps-and-islands operator by design — documented)."""
    from djangoadmin_postgresql_2_elasticseach_spark.streaming.windows import (
        session_event_counts,
    )

    rows = [
        (1, "2026-01-01 00:00:00", "click", 1.0),
        (2, "2026-01-01 00:20:00", "click", 2.0),  # within 30m → same session
        (3, "2026-01-01 01:10:00", "click", 4.0),  # 50m idle → new session
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select(
        F.lit(7).alias("user_id"),
        F.col("ts_s").cast("timestamp").alias("ts"),
        "value",
    )
    out = sorted(
        session_event_counts(df).collect(), key=lambda r: r["session_start"]
    )
    assert len(out) == 2
    assert out[0]["n_events"] == 2 and out[0]["sum_value"] == 3.0
    # session end extends gap past the last event
    assert str(out[0]["session_end"]) == "2026-01-01 00:50:00"
    assert out[1]["n_events"] == 1


def test_session_window_stream_append(spark, tmp_path):
    """Streaming: a watermark advance past session_end + gap closes and
    emits the session exactly once."""
    from djangoadmin_postgresql_2_elasticseach_spark.streaming.windows import (
        session_event_counts,
    )

    src = str(tmp_path / "sess_ev")
    emitted: list = []

    def run(qname):
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(src)
        q = (
            session_event_counts(stream)
            .writeStream.foreachBatch(lambda df, _b: emitted.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def write(rows):
        spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.mode("append").parquet(src)

    write([(7, "2026-01-01 00:00:00", 1.0), (7, "2026-01-01 00:10:00", 2.0)])
    run("r1")  # watermark ends below session end — nothing emitted yet
    write([(7, "2026-01-01 03:00:00", 4.0)])
    run("r2")  # wm 02:45 > 00:40 session end → first session closes
    closed = [r for r in emitted if r["n_events"] == 2]
    assert len(closed) == 1
    assert closed[0]["sum_value"] == 3.0
    assert str(closed[0]["session_start"]) == "2026-01-01 00:00:00"


def test_rollup_stream_microbatches_equal_batch(spark, tmp_path):
    """Two availableNow drains over a growing events dir must leave the
    rollup equal to the one-shot batch aggregate; the _last_batch_id
    marker advances and a replayed id would be skipped."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from djangoadmin_postgresql_2_elasticseach_spark.streaming.stream import rollup_stream

    src = str(tmp_path / "ev")
    rollup = str(tmp_path / "daily")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def ev(i, day, hour, typ, val):
        return (i, dt.datetime(2024, 1, day, hour, 0), 7, typ, val, "{}")

    def drain():
        q = rollup_stream(
            spark, src, rollup, str(tmp_path / "ckpt"), available_now=True
        )
        q.awaitTermination(120)

    b1 = spark.createDataFrame(
        [ev(1, 1, 9, "click", 1.5), ev(2, 1, 10, "view", 2.0), ev(3, 2, 9, "click", 3.0)],
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    drain()
    # batch 2: new day 3 plus a late event for the already-rolled day 1
    b2 = spark.createDataFrame(
        [ev(4, 3, 9, "click", 4.0), ev(5, 1, 23, "click", 0.25)], schema
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    drain()

    got = sorted(
        map(
            tuple,
            spark.read.parquet(rollup)
            .select(
                F.col("p_day").cast("string"),
                "event_type",
                "n_events",
                F.col("sum_value").cast("double"),
            )
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            b1.unionByName(b2)
            .groupBy(
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("p_day"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect(),
        )
    )
    assert got == want
    marker = os.path.join(rollup, "_last_batch_id")
    assert os.path.exists(marker)
    import json

    stored = json.load(open(marker))
    assert stored["batch_id"] >= 1
    assert stored["ckpt"] == os.path.realpath(str(tmp_path / "ckpt"))
