"""Streaming WARC landing-zone ingest: batch/stream parity, exactly-once
resume across drops, and the foreachBatch WET sink's idempotent shards."""

from pyspark.sql import functions as F

from ragflow_core16_spark.datagen.pages import document_page
from ragflow_core16_spark.operators.extract import extract_pages
from ragflow_core16_spark.sources.warc import (build_response_record,
                                               build_warc_gz, build_warcinfo,
                                               pages_from_warc_dir,
                                               text_from_wet)
from ragflow_core16_spark.streaming.warc_stream import (
    read_warc_stream, run_warc_extract_stream, run_warc_to_wet_stream)


def _drop_warc(path, name, doc_ids):
    recs = [build_warcinfo(name)]
    for i in doc_ids:
        url, ts, html = document_page(i, f"alpha beta gamma doc {i} " * 30)
        recs.append(build_response_record(url, ts, html))
    path.mkdir(parents=True, exist_ok=True)
    (path / name).write_bytes(build_warc_gz(recs))


class TestWarcStream:
    def test_stream_is_streaming_pages_shape(self, spark, tmp_path):
        inp = tmp_path / "in"
        _drop_warc(inp, "a.warc.gz", range(3))
        df = read_warc_stream(spark, str(inp))
        assert df.isStreaming
        assert [f.name for f in df.schema.fields] == [
            "url", "warc_ts", "html", "text", "lang"]

    def test_drain_matches_batch_extraction(self, spark, tmp_path):
        inp, out, ckpt = (tmp_path / d for d in ("in", "out", "ckpt"))
        _drop_warc(inp, "a.warc.gz", range(4))
        _drop_warc(inp, "b.warc.gz", range(4, 7))
        q = run_warc_extract_stream(spark, str(inp), str(out), str(ckpt))
        q.awaitTermination(120)
        got = {(r.url, r.extracted_text)
               for r in spark.read.parquet(str(out))
               .select("url", "extracted_text").collect()}
        want = {(r.url, r.extracted_text)
                for r in extract_pages(pages_from_warc_dir(spark, str(inp)))
                .select("url", "extracted_text").collect()}
        assert got == want and len(got) == 7

    def test_checkpoint_resume_no_duplicates(self, spark, tmp_path):
        inp, out, ckpt = (tmp_path / d for d in ("in", "out", "ckpt"))
        _drop_warc(inp, "a.warc.gz", range(5))
        q = run_warc_extract_stream(spark, str(inp), str(out), str(ckpt))
        q.awaitTermination(120)
        assert spark.read.parquet(str(out)).count() == 5
        # a crawler finishes another file; only it is processed on restart
        _drop_warc(inp, "b.warc.gz", range(5, 9))
        q2 = run_warc_extract_stream(spark, str(inp), str(out), str(ckpt))
        q2.awaitTermination(120)
        res = spark.read.parquet(str(out))
        assert res.count() == 9
        assert res.select("url").distinct().count() == 9

    def test_wet_sink_roundtrip(self, spark, tmp_path):
        inp, wet, ckpt = (tmp_path / d for d in ("in", "wet", "ckpt"))
        _drop_warc(inp, "a.warc.gz", range(6))
        q = run_warc_to_wet_stream(spark, str(inp), str(wet), str(ckpt),
                                   n_shards=2)
        q.awaitTermination(120)
        shards = sorted(p.name for p in wet.glob("*.warc.wet.gz"))
        assert shards and all(s.startswith("wet-b") for s in shards)
        files = (spark.read.format("binaryFile").load(str(wet))
                 .select(F.lit(0).cast("int").alias("file_id"),
                         F.lit(0).cast("int").alias("n_records"),
                         F.col("content").alias("data")))
        got = {(r.url, r.wet_text) for r in text_from_wet(files)
               .select("url", "wet_text").collect()}
        want = {(r.url, r.extracted_text or "")
                for r in extract_pages(pages_from_warc_dir(spark, str(inp)))
                .filter(F.col("status") == "ok")
                .select("url", "extracted_text").collect()}
        assert got == want and len(got) == 6

    def test_wet_sink_batch_scoped_names_across_drops(self, spark, tmp_path):
        inp, wet, ckpt = (tmp_path / d for d in ("in", "wet", "ckpt"))
        _drop_warc(inp, "a.warc.gz", range(3))
        run_warc_to_wet_stream(spark, str(inp), str(wet), str(ckpt),
                               n_shards=1).awaitTermination(120)
        _drop_warc(inp, "b.warc.gz", range(3, 5))
        run_warc_to_wet_stream(spark, str(inp), str(wet), str(ckpt),
                               n_shards=1).awaitTermination(120)
        # each micro-batch published its own shard set; nothing overwritten
        prefixes = {p.name.split("-0")[0] for p in wet.glob("*.warc.wet.gz")}
        assert len(prefixes) == 2


class TestCdxStream:
    def test_cdx_sink_matches_batch_index(self, spark, tmp_path):
        """Streamed per-batch CDX shards must union to exactly the batch
        index over the same bytes: same captures, same offsets/digests,
        real landing-zone filenames, surt populated."""
        from ragflow_core16_spark.sources.cdx import (cdx_entries_df,
                                                      read_capture)
        from ragflow_core16_spark.streaming.warc_stream import (
            run_warc_to_cdx_stream)
        inp, cdx, ckpt = (tmp_path / d for d in ("in", "cdx", "ckpt"))
        _drop_warc(inp, "a.warc.gz", range(4))
        _drop_warc(inp, "b.warc.gz", range(4, 7))
        q = run_warc_to_cdx_stream(spark, str(inp), str(cdx), str(ckpt))
        assert q.awaitTermination(300), "stream did not drain in time"
        got = spark.read.parquet(str(cdx / "b*")).collect()
        assert len(got) == 7
        assert {r["filename"] for r in got} == {"a.warc.gz", "b.warc.gz"}
        assert all(r["surt"] and r["surt"].count(")") == 1 for r in got)
        # every row random-accesses its own capture in the raw file
        raw = {n: (inp / n).read_bytes() for n in ("a.warc.gz", "b.warc.gz")}
        for r in got:
            rec = read_capture(raw[r["filename"]], r["offset"], r["length"])
            assert rec["url"] == r["url"]

    def test_cdx_resume_indexes_only_new_drop(self, spark, tmp_path):
        from ragflow_core16_spark.streaming.warc_stream import (
            run_warc_to_cdx_stream)
        inp, cdx, ckpt = (tmp_path / d for d in ("in", "cdx", "ckpt"))
        _drop_warc(inp, "a.warc.gz", range(3))
        assert run_warc_to_cdx_stream(
            spark, str(inp), str(cdx), str(ckpt)).awaitTermination(300)
        n1 = spark.read.parquet(str(cdx / "b*")).count()
        assert n1 == 3
        _drop_warc(inp, "c.warc.gz", range(3, 8))
        assert run_warc_to_cdx_stream(
            spark, str(inp), str(cdx), str(ckpt)).awaitTermination(300)
        res = spark.read.parquet(str(cdx / "b*"))
        assert res.count() == 8
        assert res.select("url").distinct().count() == 8

    def test_compaction_to_cluster_idx(self, spark, tmp_path):
        """Streamed batch shards → compacted range-sorted shards +
        cluster.idx: row-preserving, globally sorted (shard ranges are
        disjoint and internally ordered), and the cluster index routes a
        lookup to exactly one shard that contains it."""
        from ragflow_core16_spark.sources.cdx import compact_cdx
        from ragflow_core16_spark.streaming.warc_stream import (
            run_warc_to_cdx_stream)
        inp, cdx, ckpt = (tmp_path / d for d in ("in", "cdx", "ckpt"))
        _drop_warc(inp, "a.warc.gz", range(6))
        assert run_warc_to_cdx_stream(
            spark, str(inp), str(cdx), str(ckpt)).awaitTermination(300)
        _drop_warc(inp, "b.warc.gz", range(6, 14))
        assert run_warc_to_cdx_stream(
            spark, str(inp), str(cdx), str(ckpt)).awaitTermination(300)

        out = tmp_path / "compacted"
        idx = compact_cdx(spark, str(cdx / "b*"), str(out),
                          n_shards=3).collect()
        rows = spark.read.parquet(str(out)).collect()
        assert len(rows) == 14
        assert sum(r["n_captures"] for r in idx) == 14
        # disjoint, ordered shard ranges
        for a, b in zip(idx, idx[1:]):
            assert a["first_surt"] <= a["last_surt"] <= b["first_surt"]
        # per-shard internal order + routing: every row's surt falls in
        # its own shard's [first, last] range
        by_shard = {}
        import pyspark.sql.functions as F
        for r in (spark.read.parquet(str(out))
                  .withColumn("shard", F.element_at(
                      F.split(F.input_file_name(), "/"), -1))
                  .collect()):
            by_shard.setdefault(r["shard"], []).append(r)
        ranges = {r["shard"]: (r["first_surt"], r["last_surt"])
                  for r in idx}
        for shard, rs in by_shard.items():
            lo, hi = ranges[shard]
            keys = [(r["surt"], r["ts_micros"], r["url"]) for r in rs]
            assert keys == sorted(keys)
            assert all(lo <= r["surt"] <= hi for r in rs)
