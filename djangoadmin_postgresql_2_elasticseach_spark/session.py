"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]``; the configs below are the ones that
matter identically on a 1000-executor cluster:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting) —
  at 100 TB the static ``spark.sql.shuffle.partitions`` can never be right
  for every stage, AQE re-plans from runtime statistics.
- Broadcast threshold left at default (10 MB) — the dimension tables of the
  reference's star schema (genre 26 rows, person 4k rows; testdata region/
  nation/supplier/part) are broadcast, so the fact-table joins are
  shuffle-free map-side joins.
- Arrow enabled for the few Pandas-UDF paths (similarity / multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "djangoadmin_postgresql_2_elasticseach_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def free_local_checkpoint(df, blocking: bool = False) -> None:
    """Release the block-manager storage behind a ``localCheckpoint()``-ed
    DataFrame.

    ``DataFrame.unpersist()`` only clears plans registered through
    ``persist()``/``cache()``; the RDD materialized by ``localCheckpoint``
    is cached directly at the RDD layer and stays in ``getRDDStorageInfo``
    after ``unpersist`` (verified empirically on this Spark 4.1.2).  The
    checkpointed Dataset's analyzed plan is a ``LogicalRDD`` wrapping
    exactly that RDD, so unpersist THAT.  Falls back to
    ``DataFrame.unpersist()`` when the JVM handle is unreachable (e.g.
    Spark Connect), where the context cleaner remains the backstop.

    Only call this on frames whose checkpoint is superseded/dead — the
    frame is unusable afterwards (its blocks are gone and the lineage was
    truncated).
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(blocking)
    except Exception:
        df.unpersist(blocking)
