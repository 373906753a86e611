"""Unit tests for the round-1 late templates: tag, email, paper,
presentation (reference rag/app/{tag,email,paper,presentation}.py)."""

from ragflow_core16_spark.chunkers.tag import (chunk_tag_csv, chunk_tag_txt,
                                               norm_tags)
from ragflow_core16_spark.chunkers.email_t import chunk_email, parse_eml
from ragflow_core16_spark.chunkers.paper import paper_merge
from ragflow_core16_spark.operators.pdf_extract import _presentation_garbage


# ------------------------------------------------------------------- tag
def test_tag_norm():
    # beAdoc rule (tag.py:31): strip, drop empties, "." → "_"
    assert norm_tags(" a.b , , c ") == ["a_b", "c"]


def test_tag_txt_tab_elected_on_tie():
    # every line has 1 tab and 1 comma → tab >= comma → tab wins (tag.py:68-72)
    txt = "alpha, beta\tt1,t2\ngamma, delta\tt3"
    res = chunk_tag_txt(txt)
    assert res == [("\nalpha, beta", ["t1", "t2"], 0),
                   ("\ngamma, delta", ["t3"], 1)]


def test_tag_txt_malformed_accumulates():
    # malformed lines prepend into the next well-formed line's content
    # (tag.py:79-83); content keeps the leading newlines
    txt = "no delimiter here\ncontent\tt1\nalso plain"
    res = chunk_tag_txt(txt)
    assert res == [("\nno delimiter here\ncontent", ["t1"], 1)]


def test_tag_txt_comma_elected():
    txt = "a,t1\nb,t2"
    assert chunk_tag_txt(txt) == [("\na", ["t1"], 0), ("\nb", ["t2"], 1)]


def test_tag_csv_quoted_commas():
    # csv path (tag.py:94-116): quoting protects embedded commas
    txt = '"a, b",t1\nplain junk\nc,"t2,t3"'
    res = chunk_tag_csv(txt)
    assert res[0] == ("\na, b", ["t1"], 0)
    assert res[1] == ("\nplain junk\nc", ["t2", "t3"], 2)


# ----------------------------------------------------------------- email
def _eml(plain: str, html: str) -> bytes:
    return ("From: a@example.com\r\n"
            "Subject: T\r\n"
            "MIME-Version: 1.0\r\n"
            'Content-Type: multipart/alternative; boundary="B"\r\n'
            "\r\n--B\r\n"
            "Content-Type: text/plain; charset=utf-8\r\n\r\n"
            f"{plain}\r\n--B\r\n"
            "Content-Type: text/html; charset=utf-8\r\n\r\n"
            f"{html}\r\n--B--\r\n").encode()


def test_parse_eml_streams():
    text_txt, html_txt = parse_eml(_eml("hello body", "<p>web body</p>"))
    # headers come first, as "Header: value" lines (email.py:58-60)
    assert text_txt[0] == "From: a@example.com"
    assert any("hello body" in t for t in text_txt)
    assert html_txt and "web body" in html_txt[0]


def test_chunk_email_merges_plain_and_html():
    cks = chunk_email(_eml("plain paragraph here",
                           "<html><body><article><p>html paragraph content "
                           "for the extractor</p></article></body></html>"))
    joined = "\n".join(cks)
    assert "plain paragraph here" in joined
    assert "html paragraph content" in joined
    assert "Subject: T" in joined


def test_chunk_email_plain_only():
    raw = ("From: x@y.z\r\nSubject: S\r\n"
           "Content-Type: text/plain; charset=utf-8\r\n\r\n"
           "just text\r\n").encode()
    cks = chunk_email(raw)
    assert cks and "just text" in cks[0]


# ----------------------------------------------------------------- paper
def test_paper_merge_groups_by_numbered_headings():
    secs = ["Title of Paper", "Abstract", "some abstract text",
            "1. Introduction", "intro para one", "intro para two",
            "2. Methods", "methods para", "3. Results", "results para"]
    cks = paper_merge(secs)
    # each numbered heading starts a new group; front matter is one group
    assert any(c.startswith("1. Introduction") for c in cks)
    assert any(c.startswith("2. Methods") for c in cks)
    intro = next(c for c in cks if c.startswith("1. Introduction"))
    assert "intro para one" in intro and "intro para two" in intro


def test_paper_merge_no_headings_single_group():
    secs = ["just text a", "just text b"]
    cks = paper_merge(secs)
    assert cks == ["just text a\njust text b"]


def test_paper_merge_squashes_runs_of_spaces():
    # paper.py:71-72 whitespace squash
    assert paper_merge(["a   b"]) == ["a b"]


# ---------------------------------------------------------- presentation
def test_presentation_garbage_rule():
    # presentation.py:57-62: numeric/punct-only or len<3 is garbage
    assert _presentation_garbage("12.5%")
    assert _presentation_garbage("3/4")
    assert _presentation_garbage("ab")
    assert not _presentation_garbage("Slide title")


class TestTrainingOps:
    def test_sequence_pack_conserves_tokens(self, spark):
        """Σ tok_in_seq per doc == the doc's token count; sequences fill to
        SEQ_LEN except each language stream's last."""
        from ragflow_core16_spark.operators.training import (SEQ_LEN,
                                                             sequence_pack)
        import pyspark.sql.functions as F
        df = sequence_pack(spark, "/root/testdata/sf0.001").cache()
        per_seq = (df.groupBy("lang", "seq_id")
                   .agg(F.sum("tok_in_seq").alias("fill"))
                   .collect())
        last = {}
        for r in per_seq:
            last[r.lang] = max(last.get(r.lang, -1), r.seq_id)
        for r in per_seq:
            if r.seq_id < last[r.lang]:
                assert r.fill == SEQ_LEN, (r.lang, r.seq_id, r.fill)
            else:
                assert 0 < r.fill <= SEQ_LEN
        df.unpersist()

    def test_dedup_clusters_cover_pairs(self, spark):
        """Every LSH pair must land in one cluster; cluster id is the min
        member."""
        from ragflow_core16_spark.operators.dedup import (dedup_clusters,
                                                          minhash_lsh_pairs)
        pairs = [(r.doc_a, r.doc_b) for r in
                 minhash_lsh_pairs(spark, "/root/testdata/sf0.001").collect()]
        clusters = {}
        for r in dedup_clusters(spark, "/root/testdata/sf0.001").collect():
            members = [int(x) for x in r.members.split(",")]
            assert r.cluster_id == min(members)
            assert r.size == len(members)
            for m in members:
                clusters[m] = r.cluster_id
        for a, b in pairs:
            assert clusters[a] == clusters[b]

    def test_stratified_sample_rates(self, spark):
        """Observed per-language keep rates track the configured rates."""
        from ragflow_core16_spark.operators.dedup import (SAMPLE_RATES,
                                                          stratified_sample)
        import pyspark.sql.functions as F
        spark_df = stratified_sample(spark, "/root/testdata/sf0.01")
        kept = {r.lang: r.cnt for r in
                spark_df.groupBy("lang").agg(F.count("*").alias("cnt"))
                .collect()}
        totals = {r.lang: r.cnt for r in
                  spark_df.sparkSession.read
                  .parquet("/root/testdata/sf0.01/documents.parquet")
                  .groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        for lang, total in totals.items():
            rate = SAMPLE_RATES.get(lang, 250) / 1000
            got = kept.get(lang, 0) / total
            assert abs(got - rate) < 0.25, (lang, got, rate)
