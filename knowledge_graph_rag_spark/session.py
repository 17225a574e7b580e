"""SparkSession factory tuned for the KG-construction pipeline.

Single place where execution knobs live so tests, bench.py and the driver
entry all run the same configuration. Local-mode here, but every setting is
chosen to survive a multi-executor cluster at 100 TB:

- AQE on (runtime coalescing + skew-join splitting for hub entities)
- Arrow on (all UDF traffic is vectorized batches, SURVEY.md §2.11)
- shuffle partitions sized to cores locally; on a real cluster this is
  overridden by AQE's coalescing from an intentionally high initial number
- parquet pushdown left enabled (never disable filter/column pushdown)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "knowledge_graph_rag_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``cores`` — int N for local[N], "*" for all, None → $SPARK_GRAFT_CPUS
    or all cores. On a real cluster the master comes from spark-submit and
    this builder only contributes SQL conf.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Text-heavy pandas-UDF stages are CPU-bound per byte: a default
        # 128 MB split puts minutes of regex work in one task and caps
        # parallelism on compressed text corpora. 16 MB splits keep every
        # core busy; AQE re-coalesces downstream where splits are too fine.
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
