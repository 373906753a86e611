"""Write-time bucketing: co-located joins for the recurring pipeline.

The extraction pipeline joins the same keys run after run — chunks ⋈
extracted on url/doc key for re-embedding, lineage ⋈ pages for resume,
band index ⋈ daily batch for incremental dedup.  A plain parquet join
shuffles BOTH sides every run; writing the stable side bucketed by the
join key (`bucketBy` + `saveAsTable`) pins a hash-partitioned layout in
the table metadata, so every later join with a same-bucketed table (or a
side Spark shuffles to match) skips the big side's Exchange entirely.
At 10^12 rows that is the difference between re-shuffling the corpus
daily and shuffling only the new batch.

Sorted buckets (`sortBy`) additionally skip the SortMergeJoin's per-task
sort.  Bucket count is a layout contract: both sides must agree (or be a
multiple under AQE) — pick it from target file sizes (total / ~256 MB),
not executor count, so the layout survives cluster resizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, path: str,
                   keys: list[str], num_buckets: int,
                   sort_cols: list[str] | None = None) -> None:
    """Materialize ``df`` as a bucketed (optionally bucket-sorted)
    parquet table registered in the session catalog at ``path``."""
    w = (df.write.format("parquet").mode("overwrite")
         .option("path", path)
         .bucketBy(num_buckets, keys[0], *keys[1:]))
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read back with bucket metadata intact (``spark.table``, not
    ``read.parquet`` — a raw path read loses the bucket spec and with it
    the shuffle elimination)."""
    return spark.table(table_name)
