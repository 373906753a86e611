"""datagen/documents.py — the scale-evidence corpus generator."""

from pyspark.sql import functions as F


class TestDocumentsGenerator:
    def test_deterministic_across_partitioning(self, spark):
        """Rows are a pure function of (doc_id, seed): any partition
        count, any parallelism, same bytes."""
        from ragflow_core16_spark.datagen.documents import documents_df
        a = sorted(map(tuple, documents_df(spark, 2000).collect()))
        b = sorted(map(tuple, documents_df(spark, 2000)
                       .repartition(13).collect()))
        assert a == b

    def test_driver_grammar_shape(self, spark):
        from ragflow_core16_spark.datagen.documents import documents_df
        df = documents_df(spark, 2000)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("text").rlike(r"^[a-z ]+$"), 1)
                  .otherwise(0)).alias("clean"),
            F.sum(F.when(F.col("n_chars") == F.length("text"), 1)
                  .otherwise(0)).alias("nc"),
            F.countDistinct("lang").alias("langs"),
            F.countDistinct("source").alias("srcs")).collect()[0]
        assert row.n == 2000
        assert row.clean == 2000      # lowercase single-space words only
        assert row.nc == 2000
        assert row.langs == 5 and row.srcs == 20

    def test_engineered_duplicates_alternate_exact_and_near(self, spark):
        from ragflow_core16_spark.datagen.documents import (_DUP_MOD,
                                                            documents_df)
        df = documents_df(spark, 4000).select("doc_id", "text")
        texts = {r.doc_id: r.text for r in df.collect()}
        dup_ids = [i for i in texts if i % _DUP_MOD == 0 and i >= 1000]
        assert dup_ids
        exact = near = 0
        others = set(texts.values())
        for i in dup_ids:
            # each dup's source is an earlier doc in its window; exact
            # copies match some other text verbatim, near-dups differ in
            # ≤2 tokens from their source
            if list(texts.values()).count(texts[i]) > 1:
                exact += 1
            else:
                near += 1
        assert exact > 0 and near > 0

    def test_start_offset_continues_id_space(self, spark):
        from ragflow_core16_spark.datagen.documents import documents_df
        batch = documents_df(spark, 500, start=10_000)
        ids = [r.doc_id for r in batch.select("doc_id").collect()]
        assert min(ids) == 10_000 and max(ids) == 10_499
        # batch rows equal the same id range generated any other way
        wide = documents_df(spark, 10_500)
        tail = sorted(map(tuple,
                          wide.filter(F.col("doc_id") >= 10_000).collect()))
        assert tail == sorted(map(tuple, batch.collect()))
