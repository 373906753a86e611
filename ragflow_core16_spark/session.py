"""SparkSession factory with the engine's tuned configuration.

Settings chosen for the 100 TB design point, all standard Spark knobs
(SURVEY.md §4.2): AQE on (coalescing + skew splitting), Arrow enabled for
every pandas UDF, small Arrow batches because page payloads are MBs not KBs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # pages are large rows: keep Arrow batches small so one batch of multi-MB
    # html payloads can't balloon executor memory (SURVEY.md §7.3 skew note)
    "spark.sql.execution.arrow.maxRecordsPerBatch": "64",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "8g"),
}


def spread(df, partitions: int | None = None):
    """Repartition a narrow input ahead of a Python (mapInPandas) stage.

    Small parquet inputs arrive as ONE scan partition (a 100 MB file is a
    single split under maxPartitionBytes), which would serialize the whole
    Arrow-UDF stage onto one core.  A round-robin repartition of the narrow
    (doc_id, text) projection costs one tiny shuffle and buys full-cluster
    parallelism for the Python stage.  At real scale the scan already has
    thousands of splits and callers see a no-op-cost reshuffle of ids only;
    use ``partitions=`` to pin an explicit width."""
    sc = df.sparkSession.sparkContext
    n = partitions or sc.defaultParallelism
    return df.repartition(n) if df.rdd.getNumPartitions() < n else df


def get_spark(master: str | None = None, app_name: str = "ragflow_core16_spark",
              extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (SparkSession.builder
               .master(master or f"local[{cpus}]")
               .appName(app_name))
    conf = {**DEFAULT_CONF, **(extra_conf or {})}
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
