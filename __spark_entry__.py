"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship extraction pipeline on sf0.001 synthetic pages.
``queries`` — every implemented operator (SURVEY.md §2 + training-data ops),
              one callable per name.
``oracle_sql`` — DuckDB-equivalent SQL for every SQL-expressible query;
              extraction/ANN entries are rows-only checked (non-SQL ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tune(spark: SparkSession) -> SparkSession:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize Common-Crawl-style pages from sf0.001 documents,
    run the full extraction pipeline (decode → boilerplate strip → sections
    → 128-token chunks), return per-page extraction results."""
    _tune(spark)
    from ragflow_core16_spark.datagen.pages import pages_from_documents
    from ragflow_core16_spark.operators.extract import extract_pages

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    ext = extract_pages(pages)
    return ext.select("url", "lang", "status", "title", "codec",
                      "n_sections", "n_chunks", "n_tokens", "bytes_in")


# ---------------------------------------------------------------------------
# pipeline (non-SQL) queries — rows-only checks
# ---------------------------------------------------------------------------

def _q_extract_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from ragflow_core16_spark.datagen.pages import pages_from_documents
    from ragflow_core16_spark.operators.extract import extract_pages
    pages = pages_from_documents(spark, sf_dir)
    return (extract_pages(pages)
            .select("url", "lang", "status", "title", "n_sections",
                    "n_chunks", "n_tokens", "bytes_in")
            .orderBy("url"))


def _q_extract_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from ragflow_core16_spark.datagen.pages import pages_from_documents
    from ragflow_core16_spark.operators.extract import extract_pages, chunks_table
    pages = pages_from_documents(spark, sf_dir)
    return (chunks_table(extract_pages(pages))
            .select("url", "chunk_id", "chunk_seq", "token_cnt")
            .orderBy("url", "chunk_seq"))


def _q_extract_book_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from ragflow_core16_spark.datagen.pages import pages_from_documents
    from ragflow_core16_spark.operators.extract import extract_pages
    pages = pages_from_documents(spark, sf_dir)
    return (extract_pages(pages, template="book")
            .select("url", "status", "n_chunks", "n_tokens")
            .orderBy("url"))


def _q_extract_one_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from ragflow_core16_spark.datagen.pages import pages_from_documents
    from ragflow_core16_spark.operators.extract import extract_pages
    pages = pages_from_documents(spark, sf_dir)
    return (extract_pages(pages, template="one")
            .select("url", "status", "n_chunks", "n_tokens")
            .orderBy("url"))


def _registry():
    from ragflow_core16_spark.operators import (dedup, embed, multimodal,
                                                office, pdf_extract,
                                                relational, retrieval,
                                                similarity, templates,
                                                textstats, training)
    reg: dict[str, tuple] = {}
    for mod in (textstats, dedup, similarity, retrieval, relational,
                templates, pdf_extract, multimodal, office, embed,
                training):
        for name, (fn, sql) in mod.QUERIES.items():
            reg[name] = (fn, sql)
    reg["extract_pages_e2e"] = (_q_extract_pages, None)
    reg["extract_chunks_e2e"] = (_q_extract_chunks, None)
    reg["extract_book_template"] = (_q_extract_book_template, None)
    reg["extract_one_template"] = (_q_extract_one_template, None)
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune(spark)
            return fn(spark, sf_dir)
        return run
    return {name: wrap(fn) for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (fn, sql) in _registry().items()
            if sql is not None}
