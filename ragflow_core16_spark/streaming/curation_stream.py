"""Structured Streaming twin of the day-2 index maintenance: a documents
landing zone drives the curation/dedup/retrieval snapshot tables through
the SAME delta merges as ``jobs/curate_job.py --incremental``.

A continuous ingest drops parquet files of new documents into a landing
directory; each micro-batch plays the role of a daily batch.  The sink
(``foreachBatch``) maintains a chain of corpus VERSIONS under a state
directory — every version's ``documents.parquet`` is built by
HARD-LINKING the previous version's part files plus the batch's files
(metadata-only snapshot composition, the single-filesystem analogue of
an Iceberg snapshot manifest: no document byte is ever copied), and the
snapshot tables for the new version come from
``pipeline.incremental.incremental_update`` — so the streamed state is
byte-comparable to a batch build over the same corpus by construction,
which the replay test asserts.

Exactly-once design (the ``run_warc_to_cdx_stream`` contract):
  * File discovery state is the stream checkpoint — a landing file joins
    exactly one micro-batch even across restarts.
  * Batch application is idempotent per batch_id: the batch's document
    copy is written once (skipped when its ``_SUCCESS`` exists — a
    rewrite would change mtimes and orphan the fingerprint-keyed
    tables), every table write goes through the atomic
    ``materialize`` (complete tables are never rebuilt), and a version
    is published by writing its ``_complete`` marker LAST, so a crash
    mid-apply replays into the identical end state.
  * ``LATEST`` (written by temp+rename) names the serving version; a
    query session points ``RAG_CURATION_DIR``-routed operators at it by
    reading the version's corpus dir like any sf_dir.
  * A micro-batch that RE-DELIVERS ids already in the corpus (a re-crawl
    feed) becomes an upsert day: the surviving previous rows are
    rewritten once into a compacted corpus (hard links cannot drop rows
    — a lakehouse format would take delete vectors instead) and the
    delta runs with ``allow_recrawl=True``, retiring the stale index
    rows.  On a replay after a mid-apply crash the compaction rewrite
    changes the version fingerprint, so the replay simply rebuilds under
    the fresh fingerprint and converges; the crashed attempt's tables
    are unreferenced garbage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: the documents-table schema (streaming file sources require it stated)
DOCUMENTS_SCHEMA = StructType([
    StructField("doc_id", LongType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField("source", StringType(), True),
    StructField("n_chars", LongType(), True),
])


def _link_tree(src_docs: str, dst_docs: str) -> None:
    """Hard-link every data file of ``src_docs`` into ``dst_docs`` —
    snapshot composition without copying bytes.  Links share mtime with
    the source file, so the composed corpus fingerprint is stable across
    replays.  Existing links are left alone (idempotent)."""
    os.makedirs(dst_docs, exist_ok=True)
    for name in os.listdir(src_docs):
        if name.startswith(("_", ".")):
            continue
        dst = os.path.join(dst_docs, name)
        if not os.path.exists(dst):
            os.link(os.path.join(src_docs, name), dst)


def _full_build(spark: SparkSession, sf_dir: str) -> None:
    from ..operators.dedup import materialize_dedup_index
    from ..operators.retrieval import materialize_retrieval_index
    from ..operators.training import materialize_decon_index
    from ..operators.webclean import materialize_web_decisions
    materialize_dedup_index(spark, sf_dir)
    materialize_web_decisions(spark, sf_dir)
    materialize_decon_index(spark, sf_dir)
    materialize_retrieval_index(spark, sf_dir)


def _apply_batch(spark: SparkSession, batch_df: DataFrame, batch_id: int,
                 state_dir: str) -> None:
    from ..pipeline.incremental import incremental_update
    from ..pipeline.snapshot_cache import read_table
    vdir = os.path.join(state_dir, "versions", f"v{batch_id:05d}")
    if os.path.exists(os.path.join(vdir, "_complete")):
        return  # replayed batch: already fully applied
    if batch_df.isEmpty():
        return
    # 1. the batch's own document copy (write once; a replay reuses it)
    bdocs = os.path.join(state_dir, "batches", f"b{batch_id:05d}",
                         "documents.parquet")
    if not os.path.exists(os.path.join(bdocs, "_SUCCESS")):
        batch_df.write.mode("overwrite").parquet(bdocs)
    bdir = os.path.dirname(bdocs)
    # 2. compose the new corpus version from the previous one + the batch
    prev = _latest_complete(state_dir, before=batch_id)
    vdocs = os.path.join(vdir, "documents.parquet")
    if prev is None:
        _link_tree(bdocs, vdocs)
        _full_build(spark, vdir)
    else:
        # a crawl feed may RE-DELIVER ids it crawled before; detect via
        # the previous version's per-doc stats (no document scan)
        prev_ids = read_table(spark, "doc_stats", prev).select("doc_id")
        batch_ids = (spark.read.parquet(bdocs).select("doc_id")
                     .join(prev_ids, "doc_id"))
        recrawl = not batch_ids.isEmpty()
        if recrawl:
            # upsert day: the new version's corpus must be COMPACTED
            # (old rows of re-delivered ids dropped), which a hard-link
            # composition cannot express — rewrite the surviving prev
            # rows once, then link the batch files in.  A lakehouse
            # format takes delete vectors instead; this is the plain-
            # parquet equivalent, paid only on re-delivery days.
            surv = (spark.read.parquet(
                        os.path.join(prev, "documents.parquet"))
                    .join(spark.read.parquet(bdocs).select("doc_id"),
                          "doc_id", "anti"))
            surv.write.mode("overwrite").parquet(vdocs)
            _link_tree(bdocs, vdocs)
            incremental_update(spark, prev, bdir, vdir,
                               allow_recrawl=True)
        else:
            _link_tree(bdocs, vdocs)
            _link_tree(os.path.join(prev, "documents.parquet"), vdocs)
            incremental_update(spark, prev, bdir, vdir)
    # 3. publish: marker LAST, then the serving pointer
    open(os.path.join(vdir, "_complete"), "w").close()
    tmp = os.path.join(state_dir, ".LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(vdir)
    os.replace(tmp, os.path.join(state_dir, "LATEST"))


def _latest_complete(state_dir: str, before: int) -> str | None:
    vroot = os.path.join(state_dir, "versions")
    if not os.path.isdir(vroot):
        return None
    done = [v for v in sorted(os.listdir(vroot))
            if v.startswith("v") and int(v[1:]) < before
            and os.path.exists(os.path.join(vroot, v, "_complete"))]
    return os.path.join(vroot, done[-1]) if done else None


def latest_version(state_dir: str) -> str | None:
    """The serving corpus-version dir (usable as an sf_dir), or None."""
    p = os.path.join(state_dir, "LATEST")
    if os.path.exists(p):
        return open(p).read().strip()
    return None


def run_curation_index_stream(spark: SparkSession, input_dir: str,
                              state_dir: str, checkpoint_dir: str,
                              once: bool = True,
                              max_files_per_trigger: int = 8):
    """Documents landing zone → versioned snapshot-table chain.  With
    ``once`` (availableNow) this drains the zone and stops — the cron
    shape; a live deployment runs it continuously."""
    docs = (spark.readStream
            .schema(DOCUMENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _apply_batch(spark, batch_df, batch_id, state_dir)

    writer = (docs.writeStream
              .foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
