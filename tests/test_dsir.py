"""DSIR data-selection operator: behavior, plan shape, and degenerate-
input regressions (single-token docs must contribute their unigram, not
crash the bigram expression)."""

import pandas as pd

from ragflow_core16_spark.operators.training import dsir_affinity

SF = "/root/testdata/sf0.001"


class TestDsir:
    def test_affinity_scores_spread_and_parity_threshold(self, spark):
        rows = dsir_affinity(spark, SF).collect()
        # target split excluded from the scored output
        assert all(r["doc_id"] % 97 != 0 for r in rows)
        ppm = [r["affinity_ppm"] for r in rows]
        assert len(set(ppm)) > 10, "score must discriminate between docs"
        for r in rows:
            assert r["dsir_keep"] == (r["affinity_ppm"] >= 1000000)
            assert r["sum_raw_cnt"] >= r["n_feats"]  # self-counts included

    def test_bucket_histogram_broadcasts(self, spark):
        df = dsir_affinity(spark, SF)
        simple = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"))
        # the 1024-row histogram and the 1-row totals join as broadcasts;
        # no sort-merge join of the corpus against them
        assert "BroadcastHashJoin" in simple
        assert "SortMergeJoin" not in simple
        assert "partial_sum" in simple

    def test_single_token_docs_survive(self, spark, tmp_path):
        # a doc with no spaces has size(w)==1; the bigram arm must be
        # empty, not an element_at out-of-bounds crash, and the unigram
        # feature must still count — matching the DuckDB oracle
        import duckdb
        import hashlib
        from ragflow_core16_spark.operators.training import \
            DSIR_AFFINITY_SQL
        pdf = pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": ["solo", "pair of words", "x", "spark query engine"],
            "lang": ["en"] * 4, "source": ["s"] * 4,
            "n_chars": [4, 13, 1, 18]})
        pdf.to_parquet(str(tmp_path / "documents.parquet"))
        out = dsir_affinity(spark, str(tmp_path)).orderBy("doc_id") \
            .toPandas()
        assert list(out["doc_id"]) == [1, 2, 3]     # doc 0 is the target
        assert out.loc[out.doc_id == 2, "n_feats"].iloc[0] == 1
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        oracle = con.execute(DSIR_AFFINITY_SQL).df()
        h = lambda d: hashlib.md5(
            d.astype(str).to_csv(index=False).encode()).hexdigest()
        assert h(out) == h(oracle)
