"""JSONL corpus interchange — the de-facto format LLM training corpora
arrive in (one JSON document per line, usually gzipped, usually from a
crawler or a vendor drop).

Same posture as readers.py: the schema is DECLARED, never inferred — at
100 TB an inference pass is a full extra read of the corpus, and a
vendor's malformed tail file must not silently retype a column for every
downstream consumer. Malformed lines are a fact of crawled data, so
reads run PERMISSIVE with a corrupt-record column and `split_corrupt`
quarantines them as data (count them, sample them, file the vendor
ticket) instead of failing the job (FAILFAST) or silently dropping rows
(DROPMALFORMED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Schema-enforced JSONL read. Returns the declared columns plus
    `corrupt_col`, which is NULL for clean rows and carries the raw line
    for malformed ones (bad JSON, or a type that contradicts the
    schema). Compressed inputs (.gz and other Hadoop codecs) decompress
    transparently; note gzip files are not splittable — one task per
    file, so corpora should arrive as many medium files, not one giant
    archive (that layout guidance is the scale lever here, not Spark
    config).
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if corrupt_col not in [f.name for f in schema.fields]:
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows without the corrupt column;
    quarantined rows as (raw_line) for counting/sampling/replay.

    The frame is CACHED here: Spark refuses queries that reference only
    the corrupt column of a raw json scan (the column exists only
    during parse — UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN),
    and both branches reading one materialization beats two passes over
    the files. For a 100 TB corpus, don't split-and-cache at all: write
    ONCE partitioned by the corruption flag
    (``df.withColumn("_bad", F.col(c).isNotNull())`` →
    ``write.partitionBy("_bad")``) and point downstream jobs at the
    clean directory."""
    df = df.cache()
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return clean, bad


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    partition_col: str | None = None,
) -> None:
    """Write a corpus as (compressed) JSONL — the hand-off format for
    tokenizer/training jobs outside Spark. Partitioning by a column
    (e.g. source, language, split) keeps downstream consumers reading
    only their slice by directory, the same pruning contract as the
    parquet writers."""
    writer = df.write.mode("overwrite").option("compression", compression)
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.json(path)


# ---------------------------------------------------------------------------
# WebDataset-style tar shards (the public convention for multimodal /
# text training corpora: tar archives of per-sample files sharing a
# basename, consumed sequentially by data loaders)
# ---------------------------------------------------------------------------

def shard_of(id_col, n_shards: int):
    """Deterministic content-independent shard assignment: first 8 hex
    chars of md5(id) mod n_shards. Stable across runs, partitioning,
    and appends (a doc's shard never depends on the rest of the corpus)
    — and exactly reproducible in SQL engines, so shard manifests are
    oracle-checkable."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    ).cast("int")


def write_tar_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: tuple[str, ...] = (),
) -> None:
    """Write the corpus as WebDataset-style tar shards:
    ``shard-NNNNNN.tar``, each member pair ``{id}.txt`` (UTF-8 text) +
    ``{id}.json`` (metadata) — the layout sequential training data
    loaders consume. Sample keys are the STRING form of ``id_col``
    (webdataset keys are strings; numeric ids zero-pad to 12 so member
    order matches numeric order), and a NULL id fails the job loudly —
    a silent skip would drop training data.

    Scale shape: rows hash-repartition on the shard id, so every
    shard's rows land complete in exactly one task, and each task
    STREAMS its rows into tar members one by one (no per-shard
    in-memory materialization — executor memory is bounded by one
    document, not one shard). A task may own several whole shards
    (hash collisions across shard ids); it writes each to its own
    file. Tar bytes are reproducible: fixed mtime/uid/gid, members
    ordered by the deterministic within-shard sort. Each shard is
    written to a task-attempt-unique temp name and atomically renamed
    on completion, so task retries / speculative duplicate attempts
    can never interleave writes into a half-written final file.

    Size shards via ``n_shards`` so each lands near the public ~1 GB
    webdataset convention: n_shards ≈ corpus_bytes / 1 GB.

    ``path`` must be storage every executor can write and the reader
    can list (shared FS / fuse mount); in local mode any directory
    works. The same applies to ``read_tar_shards``, whose file listing
    runs driver-side.
    """
    import glob
    import json as _json
    import os

    os.makedirs(path, exist_ok=True)
    # overwrite semantics: a re-run must not leave stale shards from a
    # previous (larger) corpus behind
    for old in glob.glob(os.path.join(path, "shard-*.tar")):
        os.remove(old)
    # string keys, zero-padded when numeric so member order == id order
    key = F.col(id_col).cast("string")
    if dict(df.dtypes).get(id_col) in ("bigint", "int", "smallint", "tinyint"):
        key = F.lpad(key, 12, "0")
    cols = [key.alias("_id"),
            F.col(text_col).alias("_text"),
            shard_of(id_col, n_shards).alias("_shard")]
    cols += [F.col(c) for c in meta_cols]
    rows = df.select(*cols).repartition(n_shards, "_shard") \
        .sortWithinPartitions("_shard", "_id")

    metas = list(meta_cols)

    def write_partition(it) -> None:
        import io as _io
        import tarfile

        from pyspark import TaskContext

        attempt = TaskContext.get().taskAttemptId()
        tf = None
        cur = None
        tmp = final = None

        def commit():
            tf.close()
            os.replace(tmp, final)  # atomic on POSIX — retries can't mix

        try:
            for r in it:
                if r["_id"] is None:
                    raise ValueError(
                        f"NULL {id_col} in write_tar_shards — every sample "
                        "needs a key; a silent skip would drop training data"
                    )
                if r["_shard"] != cur:
                    if tf is not None:
                        commit()
                    cur = r["_shard"]
                    final = os.path.join(path, f"shard-{cur:06d}.tar")
                    tmp = f"{final}.inprogress-{attempt}"
                    tf = tarfile.open(tmp, "w")
                payload = (r["_text"] or "").encode("utf-8")
                meta = _json.dumps(
                    {c: r[c] for c in metas}, sort_keys=True, default=str
                ).encode("utf-8")
                for ext, data in ((".txt", payload), (".json", meta)):
                    info = tarfile.TarInfo(name=f"{r['_id']}{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tf.addfile(info, _io.BytesIO(data))
            if tf is not None:
                commit()
                tf = None
        finally:
            if tf is not None:  # error path: drop the partial temp file
                tf.close()
                if tmp and os.path.exists(tmp):
                    os.remove(tmp)

    rows.foreachPartition(write_partition)


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read tar shards back as (shard, member, content binary) — one
    task per shard file, members streamed (never the whole tar in
    memory). The inverse of ``write_tar_shards``; join ``.txt`` /
    ``.json`` members on the basename to reassemble samples."""
    import os

    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        StructField as SF_,
        StructType as ST_,
    )

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".tar")
    )
    schema = ST_(
        [
            SF_("shard", IntegerType(), False),
            SF_("member", StringType(), False),
            SF_("content", BinaryType(), True),
        ]
    )
    paths = spark.createDataFrame(
        [(f,) for f in files], "shard_path string"
    ).repartition(max(1, len(files)))

    # flush a batch downstream once it holds this many payload bytes, so
    # executor memory is bounded per batch, not per shard (~1 GB tars)
    flush_bytes = 64 << 20

    def read_one(batches):
        import re
        import tarfile

        import pandas as pd

        for pdf in batches:
            for p in pdf["shard_path"]:
                m = re.search(r"shard-(\d+)\.tar$", p)
                shard = int(m.group(1)) if m else -1
                names, blobs, held = [], [], 0
                with tarfile.open(p, "r") as tf:
                    for info in tf:
                        if not info.isfile():
                            continue
                        names.append(info.name)
                        blobs.append(tf.extractfile(info).read())
                        held += info.size
                        if held >= flush_bytes:
                            yield pd.DataFrame(
                                {"shard": [shard] * len(names),
                                 "member": names, "content": blobs}
                            )
                            names, blobs, held = [], [], 0
                if names:
                    yield pd.DataFrame(
                        {"shard": [shard] * len(names),
                         "member": names, "content": blobs}
                    )

    return paths.mapInPandas(read_one, schema=schema)


def tar_shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Per-shard (shard, n_docs, n_bytes) from reading the shards back —
    n_docs counts ``.txt`` members, n_bytes sums their UTF-8 payload
    sizes. With the deterministic ``shard_of`` assignment this is
    exactly predictable from the source table, which makes the whole
    write → read round trip oracle-checkable."""
    members = read_tar_shards(spark, path)
    return (
        members.filter(F.col("member").endswith(".txt"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length("content")).alias("n_bytes"),
        )
        .orderBy("shard")
    )


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = CORRUPT_COL,
    header: bool = True,
    delimiter: str = ",",
    multiline_quotes: bool = False,
) -> DataFrame:
    """Schema-enforced CSV read with the same quarantine posture as
    ``read_jsonl_corpus`` (vendor drops are CSV as often as JSONL):
    declared schema, PERMISSIVE mode, malformed rows carried whole in
    ``corrupt_col`` — count them, sample them, file the ticket; never
    FAILFAST the 100 TB job, never silently DROPMALFORMED.

    ``multiline_quotes`` enables quoted newlines (RFC 4180 embedded
    line breaks) — leave it OFF unless the vendor actually emits them:
    multiline parsing makes each file unsplittable (one task per file),
    the same scale trade as gzip. ``split_corrupt`` works on the result
    unchanged.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if corrupt_col not in [f.name for f in schema.fields]:
        schema = StructType(
            list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("header", "true" if header else "false")
        .option("sep", delimiter)
        .option("multiLine", "true" if multiline_quotes else "false")
        .option("enforceSchema", "true")
        .csv(path)
    )


def write_columnar(
    df: DataFrame, path: str, fmt: str = "parquet", partition_by: list[str] | None = None
) -> None:
    """Columnar interchange writer: parquet (default) or ORC — both
    ship in Spark with footer statistics, predicate pushdown, and
    column pruning, so every scan-shape argument in this repo holds for
    either. ORC matters when the downstream warehouse (Hive/Trino
    deployments) is ORC-native; the engine treats the format as a sink
    property, never a semantic one."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format: {fmt}")
    w = df.write.mode("overwrite").format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_columnar(
    spark: SparkSession, path: str, schema: StructType | str, fmt: str = "parquet"
) -> DataFrame:
    """Schema-enforced columnar read (same declared-schema posture as
    every reader here — inference is a full extra pass at 100 TB)."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported columnar format: {fmt}")
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    return spark.read.schema(schema).format(fmt).load(path)
