"""End-to-end HTML extraction queries with DuckDB oracles.

The flagship path (synthetic Common-Crawl pages → decode → readability →
html-text → sections → naive_merge chunks; reference
``deepdoc/parser/html_parser.py:30-50`` + ``rag/app/naive.py:435-476``) is
exercised over ``pages_from_documents``, whose every output-reaching choice
is md5-derived (``datagen/pages.py::doc_page_fields``).  That makes the
full pipeline output — url, title, per-chunk text and token counts —
relationally derivable from ``documents.parquet`` alone:

  * url / title words / paragraph widths: the DuckDB md5-int bridge
    ``('0x' || substr(md5(key),1,15))::BIGINT`` replays the generator;
  * paragraph text: window cumsum of md5 widths → word-range slices with
    comma injection at in-paragraph positions 5, 14, 23, …;
  * token counts: the shared piece-cost arithmetic (sql_shared.cost_sql)
    over word lengths, ``+1`` per comma piece and final period, with the
    ``,.``-fusion correction when the last word carries a comma;
  * chunk packing: the close-late recursive CTE (one section per
    iteration), identical to the TXT template oracle;
  * book template: the bullet scan finds no category on this corpus, so
    packing equals naive_merge; the per-chunk token RECOUNT fuses the last
    title word with the first body word (sections concatenate without a
    separator), a closed-form cost delta on chunk 0;
  * one template: sections join with ``\\n``; ``.\\n`` fuses into the period
    piece (no delta) and the single title→body newline costs +1.

Validated by the simulator workflow (FIXTURES.md §6): a Python twin using
only SQL-expressible ops matches the real pipeline on every sf0.01 and
sf0.1 document before transcription to SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import ordered as _ordered
from .sql_shared import cost_sql as _cost

_SEED = 42
_DELIM = "\n!?。；！？"

# must mirror datagen/pages.py::_EN_WORDS exactly (39 words)
_EN_WORDS_SQL = ("['the','quick','brown','fox','jumps','over','lazy','dog',"
                 "'data','spark','engine','query','market','report','supply',"
                 "'demand','price','index','growth','policy','analysis',"
                 "'model','system','value','stream','batch','table','column',"
                 "'filter','merge','sort','window','network','science',"
                 "'research','public','record','history','culture']")


def _md5i(key_expr: str) -> str:
    """DuckDB twin of datagen/pages.py::_md5i (60-bit md5 prefix)."""
    return f"('0x' || substr(md5({key_expr}), 1, 15))::BIGINT"


def _tune(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _pages(spark, sf_dir):
    from ..datagen.pages import pages_from_documents
    return pages_from_documents(spark, sf_dir, seed=_SEED)


def q_extract_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.extract import extract_pages
    _tune(spark)
    return (extract_pages(_pages(spark, sf_dir))
            .select("url", "lang", "status", "title", "n_sections",
                    "n_chunks", "n_tokens")
            .transform(_ordered("url")))


def q_extract_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.extract import chunks_table, extract_pages
    _tune(spark)
    return (chunks_table(extract_pages(_pages(spark, sf_dir)))
            .select("url", "chunk_seq", "chunk_text", "token_cnt")
            .transform(_ordered("url", "chunk_seq")))


def q_latest_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-crawl collapse then extraction: every url carries 1-3 captures
    (``captures_from_documents``); keep ONLY the newest before parsing.

    Plan shape at 10^12 pages: ``groupBy(url).agg(max_by(html, warc_ts))``
    is one keyed shuffle with map-side partial aggregation — each mapper
    forwards at most one candidate per url — and the EXPENSIVE stage (the
    Python extraction UDF) then runs on |urls| winners, not |captures|
    rows.  The window-function alternative (row_number over url ordered by
    warc_ts, filter rk=1) shuffles every capture AND sorts inside each
    partition before it can discard losers; max_by never materializes an
    ordering.  The oracle is the single-capture pages oracle plus the
    replayed capture count — byte parity proves no stale capture leaked
    through the collapse."""
    from ..datagen.pages import captures_from_documents
    from ..operators.extract import extract_pages
    _tune(spark)
    caps = captures_from_documents(spark, sf_dir, seed=_SEED)
    from pyspark.sql import functions as F
    latest = (caps.groupBy("url")
              .agg(F.max_by(F.struct("warc_ts", "html", "text", "lang"),
                            "warc_ts").alias("s"))
              .select("url", "s.warc_ts", "s.html", "s.text", "s.lang"))
    # the count branch prunes to (url) — on a real parquet/Iceberg source
    # this scan never reads the html column
    n_caps = (caps.groupBy("url")
              .agg(F.count(F.lit(1)).alias("n_captures")))
    ext = extract_pages(latest)
    return (ext.join(n_caps, "url")
            .select("url", F.col("n_captures").cast("integer")
                    .alias("n_captures"),
                    "lang", "status", "title", "n_sections", "n_chunks",
                    "n_tokens")
            .transform(_ordered("url")))


def q_extract_book(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.extract import extract_pages
    _tune(spark)
    return (extract_pages(_pages(spark, sf_dir), template="book")
            .select("url", "status", "n_chunks", "n_tokens")
            .transform(_ordered("url")))


def q_extract_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.extract import extract_pages
    _tune(spark)
    return (extract_pages(_pages(spark, sf_dir), template="one")
            .select("url", "status", "n_chunks", "n_tokens")
            .transform(_ordered("url")))


# --------------------------------------------------------------- oracles

# shared derivation: documents → (meta, title, sections, close-late pack)
_PREFIX = rf"""
WITH RECURSIVE sized AS (
  SELECT doc_id, lang,
         CASE WHEN length(trim(text)) > 0 THEN string_split(text, ' ')
              ELSE CAST([] AS VARCHAR[]) END AS l
  FROM documents),
docn AS (SELECT doc_id, lang, l, len(l) AS n FROM sized),
meta AS (
  SELECT doc_id, lang, n,
    'https://host' ||
      lpad(CAST({_md5i(f"'{_SEED}:url:' || doc_id")} % 500 AS VARCHAR),
           4, '0') ||
      '.example.' ||
      (['com','org','net','cn'])[
        CAST({_md5i(f"'{_SEED}:tld:' || doc_id")} % 4 AS INTEGER) + 1] ||
      '/' ||
      (['news','blog','docs','wiki'])[
        CAST({_md5i(f"'{_SEED}:sec:' || doc_id")} % 4 AS INTEGER) + 1] ||
      '/' || doc_id AS url,
    2 + {_md5i(f"'{_SEED}:ntw:' || doc_id")} % 4 AS ntw
  FROM docn),
titlew AS (
  SELECT m.doc_id, j,
         ({_EN_WORDS_SQL})[
           CAST({_md5i(f"'{_SEED}:tw:' || m.doc_id || ':' || j")} % 39
                AS INTEGER) + 1] AS w
  FROM meta m,
       LATERAL (SELECT unnest(generate_series(0, m.ntw - 1)) AS j) u),
title AS (
  SELECT doc_id,
         'Document ' || doc_id || ' ' ||
           string_agg(upper(substr(w, 1, 1)) || substr(w, 2), ' '
                      ORDER BY j) AS title,
         2 + CAST(ceil(length(CAST(doc_id AS VARCHAR)) / 3.0) AS BIGINT)
           + sum({_cost('length(w) + 1')}) AS tcost,
         arg_max(w, j) AS last_tw
  FROM titlew GROUP BY doc_id),
pidx AS (
  SELECT doc_id, p,
         25 + {_md5i(f"'{_SEED}:k:' || doc_id || ':' || p")} % 36 AS k
  FROM docn,
       LATERAL (SELECT unnest(generate_series(
                  0, CAST(ceil(n / 25.0) AS BIGINT))) AS p) u
  WHERE n > 0),
poff AS (
  SELECT doc_id, p, k,
         1 + coalesce(sum(k) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM pidx),
pkept AS (
  SELECT o.doc_id, o.p, o.s, least(o.k, d.n - o.s + 1) AS keff
  FROM poff o JOIN docn d ON d.doc_id = o.doc_id
  WHERE o.s <= d.n),
words AS (
  SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS wi FROM docn),
pwords AS (
  SELECT k.doc_id, k.p, w.wi - k.s AS j, w.w
  FROM pkept k JOIN words w
    ON w.doc_id = k.doc_id AND w.wi >= k.s AND w.wi < k.s + k.keff),
paras AS (
  SELECT doc_id, p,
    string_agg(w || CASE WHEN j >= 5 AND (j - 5) % 9 = 0 THEN ','
                         ELSE '' END, ' ' ORDER BY j) || '.' AS ptext,
    sum({_cost("length(w) + CASE WHEN j = 0 THEN 0 ELSE 1 END")})
      + CASE WHEN max(j) + 1 <= 5 THEN 0
             ELSE (max(j) + 1 - 6) // 9 + 1 END
      + 1
      - CASE WHEN max(j) + 1 > 5 AND (max(j) + 1 - 6) % 9 = 0 THEN 1
             ELSE 0 END AS pcost,
    arg_min(w, j) AS first_w
  FROM pwords GROUP BY doc_id, p),
paras_all AS (
  SELECT doc_id, p, ptext, pcost, first_w FROM paras
  UNION ALL
  SELECT doc_id, 0, 'empty document body.', 6, 'empty'
  FROM docn WHERE n = 0),
sections AS (
  SELECT doc_id, 0 AS sec, title AS stext, tcost AS scost FROM title
  UNION ALL
  SELECT doc_id, p + 1, ptext, pcost FROM paras_all),
pack AS (
  SELECT doc_id, sec, stext, scost, 0 AS chunk_seq, scost AS run
  FROM sections WHERE sec = 0
  UNION ALL
  SELECT s.doc_id, s.sec, s.stext, s.scost,
         CASE WHEN p.run > 128 THEN p.chunk_seq + 1 ELSE p.chunk_seq END,
         CASE WHEN p.run > 128 THEN s.scost ELSE p.run + s.scost END
  FROM pack p JOIN sections s
    ON s.doc_id = p.doc_id AND s.sec = p.sec + 1),
perdoc AS (
  SELECT doc_id, count(*) AS n_sections, sum(scost) AS tot,
         max(chunk_seq) + 1 AS n_chunks
  FROM pack GROUP BY doc_id)
"""

EXTRACT_PAGES_SQL = _PREFIX + """
SELECT m.url, m.lang, 'ok' AS status, t.title,
       CAST(d.n_sections AS INTEGER) AS n_sections,
       CAST(d.n_chunks AS INTEGER) AS n_chunks,
       CAST(d.tot AS INTEGER) AS n_tokens
FROM perdoc d
JOIN meta m USING (doc_id)
JOIN title t USING (doc_id)
ORDER BY m.url
"""

EXTRACT_CHUNKS_SQL = _PREFIX + """
, chunks AS (
  SELECT doc_id, chunk_seq,
         string_agg(stext, '' ORDER BY sec) AS chunk_text,
         sum(scost) AS token_cnt
  FROM pack GROUP BY doc_id, chunk_seq)
SELECT m.url, CAST(c.chunk_seq AS INTEGER) AS chunk_seq, c.chunk_text,
       CAST(c.token_cnt AS INTEGER) AS token_cnt
FROM chunks c JOIN meta m USING (doc_id)
ORDER BY m.url, c.chunk_seq
"""

# book: packing identical (no bullet category fires on this corpus); the
# per-chunk recount fuses '<space>LastTitleword' + 'firstbodyword' into one
# letter-run piece on chunk 0.
EXTRACT_BOOK_SQL = _PREFIX + f"""
, firstw AS (
  SELECT doc_id, arg_min(first_w, p) AS first_w FROM paras_all
  GROUP BY doc_id)
SELECT m.url, 'ok' AS status,
       CAST(d.n_chunks AS INTEGER) AS n_chunks,
       CAST(d.tot
            + {_cost('1 + length(t.last_tw) + length(f.first_w)')}
            - {_cost('1 + length(t.last_tw)')}
            - {_cost('length(f.first_w)')} AS INTEGER) AS n_tokens
FROM perdoc d
JOIN meta m USING (doc_id)
JOIN title t USING (doc_id)
JOIN firstw f USING (doc_id)
ORDER BY m.url
"""

# one: single '\n'-joined chunk; '.\n' fuses into the period piece, the one
# title→body newline is an extra 1-token piece.
EXTRACT_ONE_SQL = _PREFIX + """
SELECT m.url, 'ok' AS status, 1 AS n_chunks,
       CAST(d.tot + 1 AS INTEGER) AS n_tokens
FROM perdoc d JOIN meta m USING (doc_id)
ORDER BY m.url
"""

LATEST_CAPTURE_SQL = _PREFIX + f"""
SELECT m.url,
       CAST(1 + {_md5i(f"'{_SEED}:ncap:' || m.doc_id")} % 3 AS INTEGER)
         AS n_captures,
       m.lang, 'ok' AS status, t.title,
       CAST(d.n_sections AS INTEGER) AS n_sections,
       CAST(d.n_chunks AS INTEGER) AS n_chunks,
       CAST(d.tot AS INTEGER) AS n_tokens
FROM perdoc d
JOIN meta m USING (doc_id)
JOIN title t USING (doc_id)
ORDER BY m.url
"""

QUERIES = {
    "extract_pages_e2e": (q_extract_pages, EXTRACT_PAGES_SQL),
    "latest_capture_extract": (q_latest_capture, LATEST_CAPTURE_SQL),
    "extract_chunks_e2e": (q_extract_chunks, EXTRACT_CHUNKS_SQL),
    "extract_book_template": (q_extract_book, EXTRACT_BOOK_SQL),
    "extract_one_template": (q_extract_one, EXTRACT_ONE_SQL),
}
