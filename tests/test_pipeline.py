"""Spark pipeline tests: extraction, chunk table, resume/lineage, oversize,
determinism across partitionings."""

import tempfile

import pytest
from pyspark.sql import functions as F

from ragflow_core16_spark.datagen.pages import pages_df, generate_page
from ragflow_core16_spark.operators.extract import (extract_pages,
                                                    chunks_table,
                                                    DOC_MAXIMUM_SIZE)
from ragflow_core16_spark.pipeline.run import run_extraction

N = 60  # small but covers malformed/encodings/tables statistically


@pytest.fixture(scope="module")
def extracted(spark):
    ext = extract_pages(pages_df(spark, N)).cache()
    ext.count()
    return ext


class TestDatagen:
    def test_deterministic_per_doc_id(self):
        a = generate_page(7)
        b = generate_page(7)
        assert a == b
        assert generate_page(8) != a

    def test_schema(self, spark):
        df = pages_df(spark, 5)
        assert [f.name for f in df.schema.fields] == [
            "url", "warc_ts", "html", "text", "lang"]

    def test_partition_independence(self, spark):
        a = sorted(pages_df(spark, 20, partitions=1)
                   .select("url", F.md5("html").alias("h")).collect())
        b = sorted(pages_df(spark, 20, partitions=7)
                   .select("url", F.md5("html").alias("h")).collect())
        assert a == b


class TestSkewedDatagen:
    def test_hot_block_is_contiguous_giant_host0(self, spark):
        from ragflow_core16_spark.datagen.pages import skewed_pages_df
        rows = (skewed_pages_df(spark, 500, partitions=4)
                .select("url", F.length("html").alias("b")).collect())
        by_id = {int(r["url"].rsplit("/", 1)[1]): r for r in rows}
        n_hot = 10  # 2% of 500
        hot = [by_id[i] for i in range(n_hot)]
        rest = [by_id[i] for i in range(n_hot, 500)]
        assert all(r["url"].startswith("https://host0000.") for r in hot)
        import statistics
        assert (statistics.mean(r["b"] for r in hot)
                > 5 * statistics.mean(r["b"] for r in rest))

    def test_deterministic_and_partition_independent(self, spark):
        from ragflow_core16_spark.datagen.pages import skewed_pages_df
        a = sorted(skewed_pages_df(spark, 60, partitions=1)
                   .select("url", F.md5("html").alias("h")).collect())
        b = sorted(skewed_pages_df(spark, 60, partitions=5)
                   .select("url", F.md5("html").alias("h")).collect())
        assert a == b

    def test_non_hot_docs_identical_to_pages_df(self, spark):
        # beyond the hot block the corpus is byte-identical to the
        # standard generator — the A/B isolates layout, not content
        from ragflow_core16_spark.datagen.pages import skewed_pages_df
        a = {r["url"]: r["h"] for r in
             skewed_pages_df(spark, 100, partitions=2)
             .select("url", F.md5("html").alias("h")).collect()}
        b = {r["url"]: r["h"] for r in
             pages_df(spark, 100, partitions=2)
             .select("url", F.md5("html").alias("h")).collect()}
        shared = {u for u in a if int(u.rsplit("/", 1)[1]) >= 2}
        assert shared and all(a[u] == b[u] for u in shared if u in b)


class TestExtract:
    def test_all_rows_accounted(self, spark, extracted):
        assert extracted.count() == N

    def test_no_crashes_on_malformed(self, extracted):
        # malformed pages must become rows (ok or error), never aborts
        statuses = {r["status"] for r in extracted.select("status").collect()}
        assert statuses <= {"ok", "error", "empty", "oversize"}

    def test_ok_rows_have_text_and_chunks(self, extracted):
        ok = extracted.filter(F.col("status") == "ok")
        bad = ok.filter(F.col("extracted_text").isNull() |
                        (F.col("n_chunks") == 0)).count()
        assert bad == 0

    def test_title_is_first_section(self, extracted):
        row = (extracted.filter(F.col("status") == "ok")
               .select("title", "extracted_text").first())
        assert row["extracted_text"].split("\n")[0] == row["title"]

    def test_chunk_ids_unique_per_doc(self, spark, extracted):
        ch = chunks_table(extracted)
        n = ch.count()
        nd = ch.select("url", "chunk_id").distinct().count()
        assert n == nd

    def test_chunk_text_roundtrip(self, extracted):
        # concatenated chunk text == extracted text (naive_merge loses no bytes)
        row = (extracted.filter((F.col("status") == "ok") & (F.col("n_chunks") > 1))
               .select("extracted_text", "chunks").first())
        joined = "".join(c["chunk_text"] for c in row["chunks"])
        # naive_merge concatenates sections without the \n separators
        assert joined == row["extracted_text"].replace("\n", "")

    def test_oversize_routed_jvm_side(self, spark):
        big = spark.createDataFrame(
            [("u1", None, bytearray(b"x" * 100), "en", "t")],
            "url string, warc_ts timestamp, html binary, lang string, text string")
        out = extract_pages(big, max_bytes=10)
        assert out.first()["status"] == "oversize"

    def test_empty_html(self, spark):
        df = spark.createDataFrame(
            [("u1", None, None, "en", None)],
            "url string, warc_ts timestamp, html binary, lang string, text string")
        assert extract_pages(df).first()["status"] == "empty"


class TestRunPipeline:
    def test_run_and_resume(self, spark, tmp_path):
        out = str(tmp_path / "out")
        pages = pages_df(spark, 30)
        s1 = run_extraction(spark, pages, out, run_id="r1")
        assert s1["rows"] == 30
        # resume over the same input: everything committed → nothing to do
        s2 = run_extraction(spark, pages, out, run_id="r2")
        assert s2["rows"] == 0
        # new pages appear → only the delta is processed
        pages2 = pages_df(spark, 40)
        s3 = run_extraction(spark, pages2, out, run_id="r3")
        assert s3["rows"] == 10
        # all tables present
        for t in ("extracted", "chunks", "metrics", "lineage"):
            assert spark.read.parquet(f"{out}/{t}").count() > 0
        # lineage covers all 40 urls exactly once
        lin = spark.read.parquet(f"{out}/lineage")
        assert lin.select("url").distinct().count() == 40
        assert lin.count() == 40

    def test_metrics_shape(self, spark, tmp_path):
        out = str(tmp_path / "m")
        run_extraction(spark, pages_df(spark, 10), out, run_id="r1")
        m = spark.read.parquet(f"{out}/metrics")
        cols = set(m.columns)
        assert {"run_id", "part_id", "n_rows", "n_ok", "n_error",
                "n_oversize", "bytes_in", "chunks_out"} <= cols
        agg = m.agg(F.sum("n_rows")).collect()[0][0]
        assert agg == 10
