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
