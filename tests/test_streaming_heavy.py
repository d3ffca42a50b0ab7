"""Streaming heavy hitters (streaming/heavy_hitters.py): cross-batch
CMS state, threshold crossing in a LATER batch, estimate parity with
the batch count-min over the union of delivered data."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write(spark, d: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, "event_type string, user_id long").coalesce(
        1
    ).write.mode("append").parquet(d)


def test_streaming_heavy_hitters_cross_batch(spark, tmp_path):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.sketches import (
        cms_estimate,
        cms_table,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.streaming.heavy_hitters import (
        streaming_heavy_hitters,
    )

    src = str(tmp_path / "ev")
    os.makedirs(src)
    # batch 1: user 7 at 60 events (below threshold), user 8 at 10
    b1 = [("click", 7)] * 60 + [("click", 8)] * 10 + [("view", 9)] * 150
    # batch 2: user 7 crosses (60+50 >= 100); user 8 stays cold
    b2 = [("click", 7)] * 50 + [("click", 8)] * 5
    _write(spark, src, b1)
    _write(spark, src, b2)

    stream = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    hh = streaming_heavy_hitters(stream, threshold=100, d=3, w=256)
    q = (
        hh.writeStream.format("memory")
        .queryName("hh_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from hh_out").collect()
    got = {(r["group"], r["user_id"]): r["est_count"] for r in out}
    # view/9 heavy in batch 1; click/7 crosses only once batch 2 lands
    assert ("view", 9) in got and got[("view", 9)] >= 150
    assert ("click", 7) in got and got[("click", 7)] >= 110
    assert ("click", 8) not in got
    # cumulative totals reported per group
    assert max(r["group_total"] for r in out if r["group"] == "click") == 125
    # estimate parity with the BATCH count-min over the union (same md5
    # windows, additive state → identical counters)
    union = spark.createDataFrame(b1 + b2, "event_type string, user_id long")
    for grp, uid in got:
        gdf = union.filter(F.col("event_type") == grp)
        batch_est = cms_estimate(
            cms_table(gdf, "user_id", d=3, w=256),
            gdf.select("user_id").distinct(),
            "user_id",
            d=3,
            w=256,
        ).collect()
        bmap = {r["user_id"]: r["est_count"] for r in batch_est}
        assert got[(grp, uid)] == bmap[uid], (grp, uid)
