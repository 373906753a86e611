"""Spark-side chunk-template queries (rows-only driver checks — greedy
packing and regex table extraction are not SQL-expressible).

Each query exercises one chunk template end-to-end over deterministic inputs
derived from the driver tables:

  * txt/markdown/json — documents.text re-framed as that format;
  * qa — synthetic two-column Q&A built from document sentences;
  * table — per-user TSV blobs assembled from the events table (realistic:
    semi-structured blob → typed-row chunks).

All are one mapInPandas/applyInPandas pass after narrow column selects; the
only shuffle is the events groupBy(user_id).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType, StructField,
                               StructType)

CHUNKS_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("chunk_seq", IntegerType(), False),
    StructField("chunk_text", StringType(), False),
])


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _template_query(template_fn):
    def make(spark: SparkSession, sf_dir: str, to_text) -> DataFrame:
        d = _docs(spark, sf_dir).select("doc_id", "text", "lang")

        def run(batches):
            for pdf in batches:
                out = []
                for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"],
                                              pdf["lang"]):
                    body = to_text(int(doc_id), text or "")
                    try:
                        cks = template_fn(body)
                    except Exception:
                        cks = []
                    out.extend((int(doc_id), i, c)
                               for i, c in enumerate(cks) if c)
                yield pd.DataFrame(out, columns=["doc_id", "chunk_seq",
                                                 "chunk_text"])

        return (d.mapInPandas(run, CHUNKS_SCHEMA)
                .orderBy("doc_id", "chunk_seq"))
    return make


def txt_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..chunkers.templates import chunk_txt
    mk = _template_query(lambda t: chunk_txt(t, 128))
    # sentence-ify: every 12 words get a '. ' so the delimiter set has work
    def to_text(doc_id, text):
        words = text.split()
        return "\n".join(" ".join(words[i:i + 12]) + "."
                         for i in range(0, len(words), 12))
    return mk(spark, sf_dir, to_text)


def markdown_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..chunkers.templates import chunk_markdown

    def to_text(doc_id, text):
        words = text.split()
        paras = [" ".join(words[i:i + 20]) for i in range(0, len(words), 20)]
        md = [f"# Document {doc_id}"]
        for i, p in enumerate(paras):
            if i % 3 == 0 and i:
                md.append(f"## Part {i // 3}")
            md.append(p)
        # one deterministic pipe table per doc
        md.append("")
        md.append("| key | value |")
        md.append("| --- | --- |")
        md.append(f"| doc | {doc_id} |")
        md.append(f"| words | {len(words)} |")
        md.append("")
        return "\n".join(md)

    mk = _template_query(lambda t: chunk_markdown(t, 128))
    return mk(spark, sf_dir, to_text)


def json_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    from ..chunkers.templates import chunk_json

    def to_text(doc_id, text):
        words = text.split()
        obj = {
            "doc_id": doc_id,
            "meta": {"n_words": len(words), "lang": "x"},
            "paragraphs": [" ".join(words[i:i + 15])
                           for i in range(0, len(words), 15)],
        }
        return _json.dumps(obj, ensure_ascii=False)

    mk = _template_query(lambda t: chunk_json(t, 256))
    return mk(spark, sf_dir, to_text)


def qa_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..chunkers.templates import chunk_qa_text

    def to_text(doc_id, text):
        words = text.split()
        lines = []
        for i in range(0, min(len(words), 60), 12):
            q = "What about " + " ".join(words[i:i + 4]) + "?"
            a = " ".join(words[i + 4:i + 12]) or "nothing"
            lines.append(f"{q}\t{a}")
        return "\n".join(lines)

    mk = _template_query(lambda t: chunk_qa_text(t, "txt", "English"))
    return mk(spark, sf_dir, to_text)


def table_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → per-user TSV blob → table template → typed row chunks.
    groupBy(user_id) is the single shuffle; blob assembly + parsing are
    within-group (applyInPandas)."""
    from ..chunkers.templates import chunk_table_text
    e = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("user_id", "event_id", "ts", "event_type", "value")

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        uid = int(pdf["user_id"].iloc[0])
        lines = ["event_id\tevent_type\twhen\tvalue"]
        lines += [f"{r.event_id}\t{r.event_type}\t{r.ts}\t{round(r.value, 4)}"
                  for r in pdf.itertuples()]
        cks = chunk_table_text("\n".join(lines))
        return pd.DataFrame(
            [(uid, i, c) for i, c in enumerate(cks)],
            columns=["doc_id", "chunk_seq", "chunk_text"])

    return (e.groupBy("user_id").applyInPandas(per_user, CHUNKS_SCHEMA)
            .orderBy("doc_id", "chunk_seq"))


QUERIES = {
    "txt_template": (txt_template, None),
    "markdown_template": (markdown_template, None),
    "json_template": (json_template, None),
    "qa_template": (qa_template, None),
    "table_template": (table_template, None),
}
