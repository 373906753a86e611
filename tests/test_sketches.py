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


class TestBloomFilter:
    def test_no_false_negatives_and_fp_rate(self, spark):
        """Every url actually in yesterday's set must probe TRUE (Bloom
        guarantee); false positives exist but stay under a loose bound
        for m=16384, k=4, n≈|docs|/2."""
        import __spark_entry__ as E
        rows = E._registry()["bloom_url_filter"][0](spark, SF).collect()
        assert rows, "no batch urls"
        seen = [r for r in rows if r["seen"]]
        assert seen and all(r["in_bloom"] for r in seen)
        probed_unseen = [r for r in rows if not r["seen"]]
        fps = sum(1 for r in probed_unseen if r["false_positive"])
        if probed_unseen:
            assert fps / len(probed_unseen) < 0.2

    def test_partial_blooms_merge_losslessly(self, spark):
        """bit_or of two half-corpus blooms equals the single-pass bloom:
        the word relation is the mergeable sketch state."""
        from ragflow_core16_spark.operators.sketches import (_bloom_url,
                                                             bloom_build)
        d = (spark.read.parquet(f"{SF}/documents.parquet")
             .select("doc_id", _bloom_url("doc_id").alias("url")))
        full = bloom_build(d)
        a = bloom_build(d.filter("doc_id % 2 = 0"))
        b = bloom_build(d.filter("doc_id % 2 = 1"))
        merged = (a.unionByName(b).groupBy("word")
                  .agg(F.expr("bit_or(bits)").alias("bits")))
        got = sorted(tuple(r) for r in merged.collect())
        want = sorted(tuple(r) for r in full.collect())
        assert got == want
