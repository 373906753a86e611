"""Native WARC container: writer/parser round trip and Spark source path."""

import gzip

import pandas as pd
import pytest

from ragflow_core16_spark.datagen.pages import document_page
from ragflow_core16_spark.sources.warc import (build_conversion_record,
                                               build_response_record,
                                               build_warc_gz, build_warcinfo,
                                               iter_warc_records,
                                               pages_from_warc,
                                               text_from_wet,
                                               warc_files_from_documents,
                                               warc_records_df,
                                               wet_files_from_extracted)

SF = "/root/testdata/sf0.001"


def _corpus(n=6):
    recs = [build_warcinfo("test.warc.gz")]
    pages = []
    for i in range(n):
        url, ts, html = document_page(i, "alpha beta gamma delta " * 40)
        pages.append((url, ts, html))
        recs.append(build_response_record(url, ts, html))
    return pages, recs


class TestRoundTrip:
    def test_gzip_members_roundtrip(self):
        pages, recs = _corpus()
        out = list(iter_warc_records(build_warc_gz(recs)))
        assert [r["type"] for r in out] == ["warcinfo"] + ["response"] * 6
        for (url, ts, html), r in zip(pages, out[1:]):
            assert r["url"] == url
            assert r["ts"] == ts                 # microsecond-exact
            assert r["payload"] == html          # byte-exact
            assert r["http_status"] == 200
            assert r["error"] is None

    def test_plain_uncompressed_warc(self):
        pages, recs = _corpus(3)
        out = list(iter_warc_records(b"".join(recs)))
        assert [r["type"] for r in out] == ["warcinfo"] + ["response"] * 3
        assert out[-1]["payload"] == pages[-1][2]

    def test_each_record_is_own_gzip_member(self):
        # Common Crawl convention: CDX offsets point at member starts
        _, recs = _corpus(2)
        data = build_warc_gz(recs)
        assert data.count(b"\x1f\x8b\x08") >= len(recs)
        # first member alone decompresses to the warcinfo record
        assert gzip.decompress(data).startswith(b"WARC/1.0\r\n")

    def test_binary_payload_survives(self):
        # non-utf8 bytes (gbk page, embedded NULs) must round-trip untouched
        payload = "中文页面内容。".encode("gbk") + b"\x00\xff\x1f\x8b"
        rec = build_response_record("https://x.example.com/1",
                                    pd.Timestamp("2024-06-01T12:00:00"),
                                    payload)
        out = list(iter_warc_records(build_warc_gz([rec])))
        assert out[0]["payload"] == payload

    def test_trailing_garbage_yields_error_not_crash(self):
        _, recs = _corpus(2)
        out = list(iter_warc_records(build_warc_gz(recs) + b"not a record"))
        assert [r["type"] for r in out[:-1]] == ["warcinfo", "response",
                                                 "response"]
        assert out[-1]["type"] == "error"

    def test_truncated_http_block_flagged(self):
        url, ts, html = document_page(0, "word " * 50)
        rec = build_response_record(url, ts, html)
        # chop 10 payload bytes but keep the WARC Content-Length header:
        # framing fails forward with an explicit error
        broken = rec[:-14]
        out = list(iter_warc_records(broken))
        assert out[0]["type"] == "response"
        assert out[0]["error"] == "http length mismatch"

    def test_non_response_records_typed(self):
        rec = build_warcinfo("x.warc.gz")
        out = list(iter_warc_records(rec))
        assert out[0]["type"] == "warcinfo"
        # non-response: the record block IS the payload (warc-fields here)
        assert out[0]["payload"].startswith(b"software: ")

    def test_conversion_record_roundtrip(self):
        ts = pd.Timestamp("2024-06-01T12:00:00.000123")
        text = "Title line\npara one.\n中文段落。"
        rec = build_conversion_record("https://x.example.com/9", ts, text)
        out = list(iter_warc_records(build_warc_gz([rec])))
        assert [r["type"] for r in out] == ["conversion"]
        assert out[0]["url"] == "https://x.example.com/9"
        assert out[0]["ts"] == ts
        assert out[0]["content_type"] == "text/plain"
        assert out[0]["payload"].decode("utf-8") == text


class TestSparkSource:
    def test_pages_from_warc_matches_pages_table(self, spark):
        """The WARC route must reproduce pages_from_documents byte-for-byte
        (url, warc_ts, html) — the north-rule invariant carrier."""
        from ragflow_core16_spark.datagen.pages import pages_from_documents
        files = warc_files_from_documents(spark, SF)
        got = {r["url"]: r for r in pages_from_warc(files).collect()}
        want = {r["url"]: r for r in
                pages_from_documents(spark, SF).collect()}
        assert set(got) == set(want)
        for url, w in want.items():
            g = got[url]
            assert bytes(g["html"]) == bytes(w["html"])
            assert g["warc_ts"] == w["warc_ts"]

    def test_record_counts_per_file(self, spark):
        files = warc_files_from_documents(spark, SF).collect()
        assert sum(f["n_records"] for f in files) == 500
        parsed = warc_records_df(
            warc_files_from_documents(spark, SF)).collect()
        assert len(parsed) == 500
        assert all(p["http_status"] == 200 for p in parsed)

    def test_wet_roundtrip_preserves_extracted_text(self, spark):
        """extract → WET write → WET parse must hand back the exact
        extracted_text and warc_ts of every ok page."""
        from ragflow_core16_spark.operators.extract import extract_pages
        ext = extract_pages(pages_from_warc(
            warc_files_from_documents(spark, SF)))
        want = {r["url"]: r for r in
                ext.select("url", "warc_ts", "extracted_text").collect()}
        wet = wet_files_from_extracted(ext)
        got = {r["url"]: r for r in text_from_wet(wet).collect()}
        assert set(got) == set(want)
        epoch = pd.Timestamp("2024-01-01")
        for url, w in want.items():
            g = got[url]
            assert g["wet_text"] == w["extracted_text"]
            micros = (pd.Timestamp(w["warc_ts"]) - epoch) \
                // pd.Timedelta(microseconds=1)
            assert g["ts_micros"] == micros

    def test_rec_seq_is_doc_id_order(self, spark):
        parsed = warc_records_df(
            warc_files_from_documents(spark, SF)).collect()
        by_file = {}
        for p in sorted(parsed, key=lambda p: (p["file_id"], p["rec_seq"])):
            doc_id = int(p["url"].rsplit("/", 1)[1])
            assert doc_id % 32 == p["file_id"]
            prev = by_file.get(p["file_id"], -1)
            assert doc_id > prev
            by_file[p["file_id"]] = doc_id


class TestFuzz:
    """A 10^12-page crawl WILL contain every corruption; the parser must
    never raise and never lose the records before the damage."""

    def test_random_truncation_never_raises(self):
        _, recs = _corpus(4)
        data = build_warc_gz(recs)
        import random
        rng = random.Random(1234)
        for _ in range(60):
            cut = rng.randrange(0, len(data))
            out = list(iter_warc_records(data[:cut]))
            # every yielded record is a complete dict with the full keys
            for r in out:
                assert set(r) == {"type", "url", "ts", "http_status",
                                  "content_type", "payload", "error",
                                  "profile", "refers_to_uri",
                                  "refers_to_date", "payload_digest"}

    def test_random_byte_flips_never_raise(self):
        _, recs = _corpus(3)
        data = bytearray(build_warc_gz(recs))
        import random
        rng = random.Random(99)
        for _ in range(60):
            mutated = bytearray(data)
            for _k in range(rng.randrange(1, 6)):
                mutated[rng.randrange(len(mutated))] = rng.randrange(256)
            out = list(iter_warc_records(bytes(mutated)))  # must not raise
            for r in out:
                assert r["type"] in ("warcinfo", "response", "conversion",
                                     "error") or isinstance(r["type"], str)

    def test_clean_prefix_survives_corrupt_tail(self):
        pages, recs = _corpus(5)
        data = build_warc_gz(recs)
        # corrupt only the LAST gzip member: all prior records must parse
        member_starts = []
        i = 0
        while True:
            j = data.find(b"\x1f\x8b\x08", i + 1)
            if j < 0:
                break
            member_starts.append(j)
            i = j
        corrupted = data[:member_starts[-1]] + b"\xff" * 16
        out = [r for r in iter_warc_records(corrupted)]
        ok = [r for r in out if r["type"] == "response" and r["error"] is None]
        assert len(ok) >= 4
        assert ok[0]["payload"] == pages[0][2]


class TestWatOutlinks:
    """WAT-style absolute-outlink harvest (operators/warc_e2e.py)."""

    def test_related_block_is_derivable_and_absolute(self):
        from ragflow_core16_spark.datagen.pages import (related_links_html,
                                                        _md5i)
        import re
        for doc_id in range(40):
            block = related_links_html(doc_id)
            nl = _md5i(f"42:nl:{doc_id}") % 4
            hrefs = re.findall(r'href="([^"]+)"', block)
            assert len(hrefs) == nl
            assert all(h.startswith("https://host") for h in hrefs)

    def test_related_block_does_not_change_extraction(self, spark):
        """The outlink block is boilerplate: readability must strip it, so
        extracted text ignores its presence entirely."""
        from ragflow_core16_spark.datagen.pages import document_page
        from ragflow_core16_spark.html.parser import html_sections
        import ragflow_core16_spark.datagen.pages as P
        # pick doc_ids with nl>0 so the block is actually present
        planted = [d for d in range(60) if P._md5i(f"42:nl:{d}") % 4 > 0]
        assert planted
        for doc_id in planted[:8]:
            _url, _ts, html = document_page(doc_id, "alpha beta gamma "
                                            "delta epsilon zeta eta theta")
            secs = html_sections(html)
            joined = "\n".join(s[0] if isinstance(s, tuple) else s
                               for s in secs)
            assert "related" not in joined

    def test_outlinks_jvm_only_no_extra_shuffle(self, spark):
        from ragflow_core16_spark.operators.warc_e2e import q_wat_outlinks
        df = q_wat_outlinks(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # one MapInPandas (page synthesis — at deployment the pages are a
        # table scan); link harvest itself adds no Exchange beyond the
        # presentation sort
        assert plan.count("Exchange") <= 1

    def test_host_outdegree_counts(self, spark):
        from ragflow_core16_spark.operators.warc_e2e import (
            q_host_outdegree, _outlinks)
        links = _outlinks(spark, "/root/testdata/sf0.001").collect()
        deg = {r["src_host"]: r for r in
               q_host_outdegree(spark, "/root/testdata/sf0.001").collect()}
        from collections import Counter
        per_host = Counter(r["src_host"] for r in links)
        assert per_host, "corpus must plant some absolute links"
        for host, n in per_host.items():
            assert deg[host]["n_links"] == n
            assert deg[host]["n_target_hosts"] == len(
                {r["target_host"] for r in links
                 if r["src_host"] == host})


class TestCdxIndex:
    """CDX(J) capture index: SURT keying, random access via (offset,
    length), and payload digests — the contract Common Crawl's cdx-*.gz
    files promise."""

    def test_surt_edge_cases(self, spark):
        from ragflow_core16_spark.sources.cdx import surt_expr
        cases = {
            "https://www.Example.COM:443/a/b?z=1&a=2": "com,example)/a/b?a=2&z=1",
            "http://Sub.Host.ORG:80/": "org,host,sub)/",
            "http://host.net:8080/p": "net,host:8080)/p",
            "https://host0163.example.com/wiki/0": "com,example,host0163)/wiki/0",
            "http://u:p@host.com/x": "com,host)/x",
            "https://host.cn": "cn,host)/",
            # scheme-aware default ports: the cross pairings name DISTINCT
            # origins and must keep the port
            "http://host.com:443/x": "com,host:443)/x",
            "https://host.com:80/x": "com,host:80)/x",
            # '?' inside a fragment is not a query
            "https://host.com/path#a?b=1": "com,host)/path",
            "https://host.com/p?z=1&a=2#frag?x=9": "com,host)/p?a=2&z=1",
        }
        import pyspark.sql.functions as F
        df = spark.createDataFrame([(u,) for u in cases], "url string")
        got = {r["url"]: r["surt"]
               for r in df.select("url",
                                  surt_expr(F.col("url")).alias("surt"))
                          .collect()}
        for u, want in cases.items():
            assert got[u] == want, (u, got[u], want)

    def test_random_access_and_digest(self, spark):
        """Every CDX row's (offset, length) must seek to a member that
        reparses to the SAME capture, and the recorded SHA1-B32 must match
        the payload found there — proven against the raw shard bytes."""
        from ragflow_core16_spark.sources.cdx import (cdx_entries_df,
                                                      read_capture, sha1_b32)
        files = warc_files_from_documents(spark, SF, n_files=4)
        raw = {r["file_id"]: bytes(r["data"]) for r in files.collect()}
        idx = cdx_entries_df(files).collect()
        n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
        assert len(idx) == n_docs  # one capture per document
        for row in idx:
            rec = read_capture(raw[row["file_id"]],
                               row["offset"], row["length"])
            assert rec["type"] == "response"
            assert rec["url"] == row["url"]
            assert len(rec["payload"]) == row["payload_len"]
            assert sha1_b32(rec["payload"]) == row["digest"]

    def test_offsets_cover_members_disjointly(self, spark):
        """Offsets must tile the shard: warcinfo member first, then each
        capture member adjacent to the previous (member-gzip convention —
        nothing hidden between records)."""
        from ragflow_core16_spark.sources.cdx import cdx_entries_df
        files = warc_files_from_documents(spark, SF, n_files=4)
        raw = {r["file_id"]: bytes(r["data"]) for r in files.collect()}
        idx = cdx_entries_df(files).collect()
        by_file = {}
        for r in idx:
            by_file.setdefault(r["file_id"], []).append(r)
        for fid, rows in by_file.items():
            rows.sort(key=lambda r: r["offset"])
            # first capture starts after the warcinfo member, not at 0
            assert rows[0]["offset"] > 0
            for a, b in zip(rows, rows[1:]):
                assert a["offset"] + a["length"] == b["offset"]
            last = rows[-1]
            assert last["offset"] + last["length"] == len(raw[fid])

    def test_surt_differential_fuzz(self, spark):
        """400 grammar-generated urls (schemes, www, ports incl. defaults,
        userinfo, multi-label hosts, queries in shuffled order, fragments):
        the JVM column expression and the pure-Python twin must agree on
        every one."""
        import random
        import pyspark.sql.functions as F
        from ragflow_core16_spark.sources.cdx import surt, surt_expr
        rng = random.Random(4242)
        urls = []
        for _ in range(400):
            scheme = rng.choice(["http", "https"])
            labels = [rng.choice(["Alpha", "beta", "c7", "www", "x-y"])
                      for _ in range(rng.randint(1, 3))]
            host = ".".join((["www"] if rng.random() < 0.3 else [])
                            + labels + [rng.choice(["com", "org", "net"])])
            port = rng.choice(["", "", ":80", ":443", ":8080", ":9"])
            user = rng.choice(["", "", "u@", "u:P-w@"])
            path = rng.choice(["", "/", "/A/b", "/x/y/z.html", "/p%20q"])
            q = ""
            if rng.random() < 0.5:
                parts = rng.sample(["z=1", "a=2", "m=x&n", "b="],
                                   rng.randint(1, 3))
                q = "?" + "&".join(parts)
            frag = rng.choice(["", "#Frag", "#a?b=1"])
            urls.append(f"{scheme}://{user}{host}{port}{path}{q}{frag}")
        got = {r["url"]: r["surt"] for r in
               spark.createDataFrame([(u,) for u in urls], "url string")
                    .select("url", surt_expr(F.col("url")).alias("surt"))
                    .collect()}
        for u in urls:
            assert got[u] == surt(u), (u, got[u], surt(u))


class TestRevisits:
    """WARC 1.1 §6.7.2 revisit records: round-trip, digest verification,
    and non-interference with the response-only read paths."""

    def test_revisit_record_roundtrip(self):
        from ragflow_core16_spark.sources.cdx import sha1_b32
        from ragflow_core16_spark.sources.warc import build_revisit_record
        url, ts, html = document_page(3, "alpha beta " * 50)
        rev = build_revisit_record(url, ts + pd.Timedelta(days=1), url, ts,
                                   sha1_b32(html))
        recs = list(iter_warc_records(build_warc_gz(
            [build_response_record(url, ts, html), rev])))
        assert [r["type"] for r in recs] == ["response", "revisit"]
        r = recs[1]
        assert r["url"] == url
        assert r["refers_to_uri"] == url
        assert r["payload_digest"] == f"sha1:{sha1_b32(html)}"
        assert "identical-payload-digest" in r["profile"]
        # the stored block is the HTTP headers only — no body
        assert r["payload"].startswith(b"HTTP/1.1 200 OK")
        assert b"alpha" not in r["payload"]
        # pointer date survives the header round trip
        from ragflow_core16_spark.sources.warc import _parse_warc_date
        assert _parse_warc_date(r["refers_to_date"]) == ts

    def test_resolution_verifies_digests_both_ways(self, spark):
        from ragflow_core16_spark.sources.warc import resolve_revisits
        files = warc_files_from_documents(spark, SF, revisits=True)
        rows = resolve_revisits(files).collect()
        assert rows, "corpus must contain revisits"
        ok = [r for r in rows if r["digest_match"]]
        bad = [r for r in rows if not r["digest_match"]]
        assert ok and bad, "both digest outcomes must be populated"
        for r in rows:
            assert r["ts_micros"] - r["orig_ts_micros"] == 86400 * 10**6

    def test_response_read_paths_unaffected(self, spark):
        base = warc_files_from_documents(spark, SF)
        with_rev = warc_files_from_documents(spark, SF, revisits=True)
        # pages_from_warc and warc_records_df see responses only, so the
        # revisit-bearing corpus yields identical rows
        assert pages_from_warc(with_rev).count() == \
            pages_from_warc(base).count()
        a = sorted((r["url"], r["rec_seq"]) for r in
                   warc_records_df(base).collect())
        b = sorted((r["url"], r["rec_seq"]) for r in
                   warc_records_df(with_rev).collect())
        assert a == b

    def test_orphan_revisit_surfaces_not_dropped(self, spark):
        from ragflow_core16_spark.sources.cdx import sha1_b32
        from ragflow_core16_spark.sources.warc import (build_revisit_record,
                                                       resolve_revisits)
        url, ts, html = document_page(5, "alpha beta " * 30)
        # revisit pointing at a response that is NOT in the shard set
        orphan = build_revisit_record(
            "https://gone.example.com/x", ts + pd.Timedelta(days=1),
            "https://gone.example.com/x", ts, sha1_b32(b"whatever"))
        good = build_revisit_record(url, ts + pd.Timedelta(days=1),
                                    url, ts, sha1_b32(html))
        data = build_warc_gz([build_warcinfo("t.warc.gz"),
                              build_response_record(url, ts, html),
                              good, orphan])
        files = spark.createDataFrame([(0, 3, bytearray(data))],
                                      "file_id int, n_records int,"
                                      " data binary")
        rows = {r["url"]: r for r in resolve_revisits(files).collect()}
        assert len(rows) == 2, "the orphan must surface, not vanish"
        assert rows[url]["orig_found"] and rows[url]["digest_match"]
        orph = rows["https://gone.example.com/x"]
        assert not orph["orig_found"] and not orph["digest_match"]

    def test_framing_error_records_surface_in_capture_census(self, spark):
        from ragflow_core16_spark.sources.warc import capture_records_df
        url, ts, html = document_page(7, "alpha beta " * 30)
        rec = build_response_record(url, ts, html)
        # truncate payload but keep the WARC Content-Length: framing error
        broken = rec[:-14]
        data = build_warc_gz([build_response_record(url, ts, html)]) + \
            gzip.compress(broken, mtime=0)
        files = spark.createDataFrame([(0, 2, bytearray(data))],
                                      "file_id int, n_records int,"
                                      " data binary")
        kinds = [r["kind"] for r in capture_records_df(files).collect()]
        assert kinds.count("response") == 1
        assert kinds.count("error") == 1, \
            "a framing-failed record must appear as kind='error'"
