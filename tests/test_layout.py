"""Z-order layout (operators/layout.py): Morton interleave correctness
against a pure-Python reference, rank-space skew resistance, and the
observable contract — a z-ordered write tightens per-file min/max stats
on EVERY z-column so range predicates can skip files. Engine-vs-DuckDB
value parity runs in test_oracle_parity (zorder_key_events)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from djangoadmin_postgresql_2_elasticseach_spark.operators.layout import (
    file_skipping_stats,
    morton_interleave,
    zorder_key,
    zorder_write,
)


def _morton_py(words: list[int], bits: int) -> int:
    n = len(words)
    key = 0
    for d, w in enumerate(words):
        for i in range(bits):
            key |= ((w >> i) & 1) << (i * n + d)
    return key


def test_morton_matches_python_reference(spark):
    rows = [(a, b, c) for a in (0, 1, 5, 255) for b in (0, 3, 200)
            for c in (0, 7, 101, 255)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = df.select(
        "a", "b", "c", morton_interleave(["a", "b", "c"], 8).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_py([r["a"], r["b"], r["c"]], 8)


def test_morton_locality_prefix_property(spark):
    """Morton keys of points in the same half of every dimension share
    the top bit-lane values — the property that makes range stats tight."""
    df = spark.createDataFrame(
        [(x, y) for x in range(256) for y in range(256) if (x + y) % 37 == 0],
        "x long, y long",
    )
    z = df.select(
        "x", "y", morton_interleave(["x", "y"], 8).alias("z")
    ).collect()
    for r in z:
        # top interleaved bits recover the quadrant: bit i of dim d sits
        # at position i*n + d, so with n=2 the x (d=0) top bit is 14 and
        # the y (d=1) top bit is 15
        assert ((r["z"] >> 14) & 1, (r["z"] >> 15) & 1) == (
            r["x"] >> 7, r["y"] >> 7,
        )


def test_bit_budget_guard(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="overflows"):
        morton_interleave(["a"] * 8, 8)  # 64 bits > 62


def test_rank_space_handles_skew(spark):
    """A dimension with 99% one value still spreads the OTHER values
    across the grid (ranking distincts, not raw values)."""
    rows = [(0, i) for i in range(990)] + [(k, 1000 + k) for k in range(1, 11)]
    df = spark.createDataFrame(rows, "hot long, uniq long")
    keyed = zorder_key(df, ["hot", "uniq"], bits=8)
    ranks = keyed.select("z_key").distinct().count()
    # 1000 distinct uniq values quantize onto the 256-bucket grid: the
    # uniq dimension still differentiates (~256 keys), the 99%-hot
    # dimension does not collapse them to a handful
    assert ranks > 200


def test_zorder_write_enables_multi_column_skipping(spark, tmp_path):
    """The end contract: after zorder_write on (x, y), a range predicate
    on EITHER column can skip most files by footer stats alone; a
    single-column-sorted layout only skips on its sort column."""
    n = 40_000
    df = spark.range(n).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 7919) % 200).alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "xsorted")
    zorder_write(df, zpath, ["x", "y"], bits=8, n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )
    # range predicate covering ~10% of each dimension's domain
    zx = file_skipping_stats(spark, zpath, "x", 10, 29)
    zy = file_skipping_stats(spark, zpath, "y", 10, 29)
    sx = file_skipping_stats(spark, spath, "x", 10, 29)
    sy = file_skipping_stats(spark, spath, "y", 10, 29)
    # x-sorted layout: perfect on x, (near-)useless on y
    assert sx["skippable"] >= sx["files"] - 3
    assert sy["skippable"] <= 2
    # z-ordered layout: skips on BOTH dimensions
    assert zx["skippable"] >= zx["files"] // 2, zx
    assert zy["skippable"] >= zy["files"] // 2, zy
    # and the data survives the round trip
    assert spark.read.parquet(zpath).count() == n


def test_compaction_plan_fill_bounds(spark):
    """Next-fit guarantee: every bin except possibly the last holds
    ≥ target/2... actually next-fit over a deterministic order fills
    each bin to at least `target - max_item` before opening the next
    (cum_before div target is contiguous), and no item ≥ target is
    binned."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.layout import (
        compaction_plan,
    )

    rows = [(f"f{i:03d}", (i * 37) % 190 + 10) for i in range(200)]
    inv = spark.createDataFrame(rows, "file string, bytes long")
    plan = compaction_plan(inv, ["file"], "bytes", 128).collect()
    binned = [r for r in plan if r["action"] == "compact"]
    kept = [r for r in plan if r["action"] == "keep"]
    assert all(r["bytes"] >= 128 and r["bin"] is None for r in kept)
    assert all(r["bytes"] < 128 and r["bin"] is not None for r in binned)
    assert len(binned) + len(kept) == 200
    # bins are contiguous 0..max and each full bin's weight lands in
    # (target - max_item, target + max_item): the sorted-fill invariant
    by_bin: dict[int, int] = {}
    for r in binned:
        by_bin[r["bin"]] = by_bin.get(r["bin"], 0) + r["bytes"]
    bins = sorted(by_bin)
    assert bins == list(range(len(bins)))
    max_item = max(r["bytes"] for r in binned)
    for b in bins[:-1]:
        assert 128 - max_item < by_bin[b] < 128 + max_item, (b, by_bin[b])


def test_plan_file_compaction_real_files(spark, tmp_path):
    """File-level inventory: many tiny parquet files plus one big file;
    the big file keeps, the tiny ones bin toward the byte target."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.layout import (
        plan_file_compaction,
    )

    small = str(tmp_path / "t")
    spark.range(2_000).repartition(20).write.mode("overwrite").parquet(small)
    big = spark.range(200_000).coalesce(1)
    big.write.mode("append").parquet(small)
    import os

    sizes = {
        f: os.path.getsize(os.path.join(small, f))
        for f in os.listdir(small)
        if f.endswith(".parquet")
    }
    target = max(sizes.values())  # only the biggest file is "healthy"
    plan = plan_file_compaction(spark, small, target).collect()
    assert len(plan) == len(sizes)
    kept = [r for r in plan if r["action"] == "keep"]
    assert len(kept) == 1 and kept[0]["bytes"] == target
    n_bins = len({r["bin"] for r in plan if r["action"] == "compact"})
    assert 1 <= n_bins < len(sizes) - 1  # actually coalesces files


def test_zorder_maintain_compacts_and_preserves_data(spark, tmp_path):
    """Maintenance pass: many small files coalesce into z-ordered bins,
    big files stay untouched, every row survives."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.layout import (
        zorder_maintain,
    )
    import os

    p = str(tmp_path / "t")
    small = spark.range(4_000).select(
        (F.col("id") % 100).alias("x"), ((F.col("id") * 31) % 100).alias("y")
    )
    small.repartition(24).write.mode("overwrite").parquet(p)
    spark.range(300_000).select(
        (F.col("id") % 100).alias("x"), ((F.col("id") * 31) % 100).alias("y")
    ).coalesce(1).write.mode("append").parquet(p)
    sizes = [
        os.path.getsize(os.path.join(p, f))
        for f in os.listdir(p)
        if f.endswith(".parquet")
    ]
    target = max(sizes)  # only the big file is healthy
    stats = zorder_maintain(spark, p, ["x", "y"], target)
    assert stats["files_before"] == 25
    assert stats["files_after"] == stats["bins_written"] + 1
    assert stats["files_after"] < stats["files_before"]
    got = spark.read.parquet(p)
    assert got.count() == 304_000
    # the row multiset is intact
    s = got.groupBy("x", "y").count().collect()
    assert sum(r["count"] for r in s) == 304_000


def test_zorder_maintain_crash_duplicates_at_most_one_bin(spark, tmp_path, monkeypatch):
    """ADVICE r10 crash contract: inputs are retired per bin right after
    its os.replace, so a crash mid-run duplicates AT MOST the one bin in
    flight — bins completed earlier are fully consistent (inputs gone),
    bins not yet reached are untouched. A resumed run converges."""
    import os

    import pytest

    from djangoadmin_postgresql_2_elasticseach_spark.operators import layout as L

    p = str(tmp_path / "t")
    small = spark.range(4_000).select(
        (F.col("id") % 100).alias("x"), ((F.col("id") * 31) % 100).alias("y")
    )
    small.repartition(24).write.mode("overwrite").parquet(p)
    n_rows = spark.read.parquet(p).count()

    real_replace = os.replace
    replaced = []

    def crash_after_first_bin(src, dst):
        if os.path.basename(dst).startswith("zc-") and replaced:
            raise RuntimeError("simulated crash before bin 2's rename")
        real_replace(src, dst)
        if os.path.basename(dst).startswith("zc-"):
            replaced.append(dst)

    # zorder_maintain imports os inside the function body, so patch the
    # global os module attribute itself
    monkeypatch.setattr("os.replace", crash_after_first_bin)
    # pick a target that forces >1 bin out of the 24 small files
    sizes = [
        os.path.getsize(os.path.join(p, f))
        for f in os.listdir(p)
        if f.endswith(".parquet")
    ]
    target = sum(sizes) // 3
    with pytest.raises(RuntimeError, match="simulated crash"):
        L.zorder_maintain(spark, p, ["x", "y"], target)
    monkeypatch.undo()

    # bin 1 landed AND its inputs were retired; everything else intact —
    # no duplicate rows anywhere, the crash lost nothing
    assert spark.read.parquet(p).count() == n_rows
    # a resumed maintenance run converges on the remaining small files
    stats = L.zorder_maintain(spark, p, ["x", "y"], target)
    assert stats["bins_written"] >= 1
    assert spark.read.parquet(p).count() == n_rows
