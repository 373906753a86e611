"""Structured Streaming extraction tests: micro-batch drain, exactly-once
resume via checkpoint, windowed metrics."""

import time

from pyspark.sql import functions as F

from ragflow_core16_spark.datagen.pages import pages_df
from ragflow_core16_spark.streaming.extract_stream import (
    run_extract_stream, read_pages_stream, extract_stream,
    windowed_metrics_stream)


def _write_pages(spark, n, path, partitions=2, offset=0):
    df = pages_df(spark, n + offset, partitions=partitions)
    if offset:
        df = df.filter(F.xxhash64("url").isNotNull())  # no-op, keep lineage simple
    df.write.mode("overwrite").parquet(path)


class TestExtractStream:
    def test_drain_and_results(self, spark, tmp_path):
        inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
        pages_df(spark, 12, partitions=2).write.parquet(inp)
        q = run_extract_stream(spark, inp, out, ckpt)
        q.awaitTermination(120)
        res = spark.read.parquet(out)
        assert res.count() == 12
        assert res.filter(F.col("status") == "ok").count() > 0

    def test_checkpoint_resume_no_duplicates(self, spark, tmp_path):
        inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
        pages_df(spark, 8, partitions=1).write.parquet(inp)
        q = run_extract_stream(spark, inp, out, ckpt)
        q.awaitTermination(120)
        # second drop of new files into the landing zone
        pages_df(spark, 20, partitions=1).filter(
            F.split(F.col("url"), "/").getItem(4).cast("long") >= 8
        ).write.mode("append").parquet(inp)
        q2 = run_extract_stream(spark, inp, out, ckpt)
        q2.awaitTermination(120)
        res = spark.read.parquet(out)
        # exactly-once: 8 + 12 rows, no reprocessing of the first batch
        assert res.count() == 20
        assert res.select("url").distinct().count() == 20

    def test_windowed_metrics_plan(self, spark, tmp_path):
        inp = str(tmp_path / "in")
        pages_df(spark, 4, partitions=1).write.parquet(inp)
        stream = read_pages_stream(spark, inp)
        m = windowed_metrics_stream(extract_stream(stream))
        assert m.isStreaming
        q = (m.writeStream.format("memory").queryName("mstream")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        # append-mode window emits only after watermark passes; plan runs
        # without error is the assertion here
        spark.sql("select * from mstream").collect()
