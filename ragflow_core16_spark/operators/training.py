"""Training-data assembly operators (beyond the reference's own surface —
the ops a 100 TB pretraining pipeline runs after extraction/dedup).

``sequence_pack``: GPT-style sequence packing — concatenate the corpus in a
deterministic order and cut every SEQ_LEN tokens, documents spanning cut
points.  Fully relational: per-document token counts are a JVM columnar
``aggregate`` over the split-word array (the same piece arithmetic as
``textnorm/tokens.py`` on this corpus), the running offset is one window
cumsum per language stream, and the (document × covered-sequence) fan-out
is an ``explode(sequence(...))`` — no Python, no driver loop, one shuffle
for the window sort.  At 100 TB the language stream would be bucketed by
(lang, doc_id range) so the window never sees a single giant partition;
the cut arithmetic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SEQ_LEN = 512


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# per-document token count as a pure column expression: first word costs
# cost(len), subsequent words cost(len+1) — cost(p) = 1 if p<=5 else
# ceil(p/4.4)  (textnorm/tokens.py piece arithmetic, exact on this corpus)
_TOK_EXPR = """
aggregate(
  transform(split(text, ' '),
            (w, i) -> CASE WHEN (CASE WHEN i = 0 THEN length(w)
                                      ELSE length(w) + 1 END) <= 5 THEN 1L
                           ELSE CAST(ceil((CASE WHEN i = 0 THEN length(w)
                                                ELSE length(w) + 1 END)
                                          / 4.4D) AS LONG) END),
  0L, (a, x) -> a + x)
"""


def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """→ (lang, seq_id, doc_id, tok_in_seq): which training sequences each
    document contributes to, and how many of its tokens land in each."""
    d = (_docs(spark, sf_dir)
         .select("doc_id", "lang", F.expr(_TOK_EXPR).alias("tok")))
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    d = d.withColumn("cum", F.sum("tok").over(w))
    first_seq = F.floor((F.col("cum") - F.col("tok")) / SEQ_LEN)
    last_seq = F.floor((F.col("cum") - 1) / SEQ_LEN)
    d = (d.withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq))))
    contrib = (F.least(F.col("cum"), (F.col("seq_id") + 1) * SEQ_LEN)
               - F.greatest(F.col("cum") - F.col("tok"),
                            F.col("seq_id") * SEQ_LEN))
    return (d.select("lang", F.col("seq_id").cast("long").alias("seq_id"),
                     "doc_id", contrib.cast("long").alias("tok_in_seq"))
            .orderBy("lang", "seq_id", "doc_id"))


SEQUENCE_PACK_SQL = rf"""
WITH toklists AS (
  SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
costs AS (
  SELECT doc_id, lang,
         (SELECT sum(CASE WHEN (CASE WHEN i = 1 THEN length(l[i])
                                     ELSE length(l[i]) + 1 END) <= 5 THEN 1
                          ELSE CAST(ceil((CASE WHEN i = 1 THEN length(l[i])
                                               ELSE length(l[i]) + 1 END)
                                         / 4.4) AS BIGINT) END)
          FROM unnest(generate_series(1, len(l))) AS t(i)) AS tok
  FROM toklists),
cums AS (
  SELECT doc_id, lang, tok,
         sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM costs),
spans AS (
  SELECT lang, s AS seq_id, doc_id,
         least(cum, (s + 1) * {SEQ_LEN})
           - greatest(cum - tok, s * {SEQ_LEN}) AS tok_in_seq
  FROM cums,
       LATERAL (SELECT unnest(generate_series(
                  CAST((cum - tok) // {SEQ_LEN} AS BIGINT),
                  CAST((cum - 1) // {SEQ_LEN} AS BIGINT))) AS s) u)
SELECT lang, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       CAST(tok_in_seq AS BIGINT) AS tok_in_seq
FROM spans
ORDER BY lang, seq_id, doc_id
"""


QUERIES = {
    "sequence_pack": (sequence_pack, SEQUENCE_PACK_SQL),
}
