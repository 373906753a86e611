"""Sketch-operator properties beyond oracle parity: mergeability — the
distributed-correctness property that lets partial sketches from any
partitioning of the input (executors, micro-batches, days) combine
losslessly."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestQuantileBucketsMerge:
    def test_split_partials_sum_to_full_sketch(self, spark):
        """DDSketch bucket counts from two disjoint halves, merged with
        SUM, must equal the single-pass sketch over the whole input."""
        from ragflow_core16_spark.operators.sketches import quantile_buckets
        e = spark.read.parquet(f"{SF}/events.parquet")
        full = quantile_buckets(e, "value", ["event_type"])
        a = quantile_buckets(e.filter("event_id % 2 = 0"), "value",
                             ["event_type"])
        b = quantile_buckets(e.filter("event_id % 2 = 1"), "value",
                             ["event_type"])
        merged = (a.unionByName(b)
                  .groupBy("event_type", "bucket_lo")
                  .agg(F.sum("cnt").alias("cnt")))
        key = ["event_type", "bucket_lo", "cnt"]
        got = sorted(tuple(r) for r in merged.select(*key).collect())
        want = sorted(tuple(r) for r in full.select(*key).collect())
        assert got == want

    def test_sketch_lower_bound_guarantee(self, spark):
        """Every sketch estimate must sit at or below its exact rank value
        and within the 1/8 relative-error band (bucket width 2^(e-3))."""
        import __spark_entry__ as E
        rows = E._registry()["quantile_sketch"][0](spark, SF).collect()
        assert rows, "no groups"
        for r in rows:
            for p in ("p50", "p90", "p99"):
                sk, ex = r[f"{p}_sketch"], r[f"{p}_exact"]
                assert sk <= ex, (p, sk, ex)
                # ex lies in the bucket [sk, sk + width) whose width is
                # 2^(e-3) ≤ sk/8 (exact buckets below the 4th octave)
                assert ex < sk + max(sk // 8, 1) + 1, (p, sk, ex)
