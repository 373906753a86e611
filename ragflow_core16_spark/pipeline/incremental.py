"""Incremental snapshot maintenance — day-2 delta merges for the
materialized index tables.

A real deployment ingests daily deltas; rebuilding every snapshot table
from scratch because one batch of documents arrived would rescan the
whole corpus (at 100 TB: the entire ingest cost, daily).  This module
maintains the three index families whose math is incrementalizable
without touching day-1 document bytes:

  * **dedup index** — signatures and simhash fingerprints are per-doc
    (append batch rows); new candidate pairs come from the batch-bands ⋈
    merged-band-index bucket join (the ``incremental_dedup`` query's
    shape, applied at maintenance time); cluster labels re-propagate over
    the MERGED pair relation only (∝ collisions — a day-2 bridge doc can
    fuse two day-1 clusters, so labels are never appendable, but their
    recompute never reads documents).  The one place day-1 bytes are
    touched at all is the exact-verify of NEW pairs: the base scan is
    doc-id-pruned to the day-1 members of new candidate pairs (a pushed
    ``In`` filter over a collision-bounded id list — the plan-audited
    contract; CCNet-style pipelines re-fetch exactly this candidate set).
  * **curation decision table** — the locally-computable gates (Gopher,
    C4, robots, blocklist, meta-robots) are pure functions of one
    document, so day-1 gate columns are READ from the stored day-1
    decision table and batch gate columns are computed over the batch
    only.  The two CORPUS-GLOBAL verdicts are patched for all rows:
    ``dedup_kept`` recomposed from the merged label table, and ``clean``
    derived as one gram-key join of the merged decontamination postings
    (bench + train gram postings — the state that lets a day-2 eval doc
    contaminate, or a retired one un-contaminate, a day-1 document
    without re-gramming day-1 text).

Re-crawls: a batch doc_id already in the base is rejected by default;
``allow_recrawl=True`` turns the merge into retire-then-append — stale
rows for the re-crawled ids are anti-joined out of every stored
relation (including a re-crawled eval doc's old bench grams) and the
batch supplies the fresh versions.  All still without base document
scans beyond the candidate-pruned pair verify.
  * **retrieval index** — postings (tok, doc_id, tf) and per-doc lengths
    are per-doc relations: merge = append (df/idf derive downstream at
    query time, so no global statistic needs patching).

NOT delta-maintained (documented, not silent): ``substring_spans``
depends on the corpus-global duplicated-gram histogram (a new doc can
make a day-1 gram duplicated, creating spans inside day-1 docs), and the
trained artifacts (BPE merges, LMs, DSIR, boilerplate lexicon, GraphRAG,
RAPTOR, embeddings/ANN labels) are corpus-global fits — those rebuild
per snapshot; queries over the combined corpus fall back to their
compute paths until the next full index job.

Addressing: the combined corpus is a directory whose
``documents.parquet`` holds day-1 files plus the batch files (how a
parquet table grows — appended part files).  Merged tables are written
under the COMBINED corpus fingerprint, so every routed query serves them
with zero code changes; each table carries a ``_delta_lineage.json``
sidecar recording the (base fingerprint → batch fingerprint) chain.

Reference parity note: the reference's task executor re-indexes only
new/changed docs per run (rag/svr/task_executor.py polls a task queue;
ES upserts are per-chunk) — this module is that behavior for the
snapshot-table analogue.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshot_cache import (corpus_fingerprint, materialize, read_table,
                             table_path)

#: dedup-index kinds the delta path maintains, in dependency order
DEDUP_KINDS = ("minhash_sigwide", "dedup_pairs", "dedup_labels",
               "simhash_fp")
#: decontamination-index kinds (the corpus-global gate's state: the
#: eval-split benchmark gram set + the per-train-doc gram posting)
DECON_KINDS = ("decon_bench_grams", "decon_train_grams")
#: retrieval-index kinds the delta path maintains
RETRIEVAL_KINDS = ("term_postings", "doc_stats")


def _require_base(spark, kinds, base_dir) -> dict[str, DataFrame]:
    out = {}
    missing = []
    for kind in kinds:
        t = read_table(spark, kind, base_dir)
        if t is None:
            missing.append(kind)
        out[kind] = t
    if missing:
        raise ValueError(
            f"incremental update needs complete base tables for {base_dir}; "
            f"missing: {missing} (run the full curate/index job on the base "
            "snapshot first)")
    return out


# --------------------------------------------------------------- dedup index
def dedup_index_delta_frames(spark: SparkSession, base_dir: str,
                             batch_dir: str,
                             recrawl_ids: DataFrame | None = None
                             ) -> dict[str, DataFrame]:
    """The merged dedup-index relations as DataFrames (write-ready, also
    the plan-audit surface: only ``dedup_pairs`` may touch base document
    bytes, and only through the candidate-pruned pushed-filter scan).
    With ``recrawl_ids``, the re-crawled docs' stale signature /
    fingerprint / pair rows are retired from the stored side first —
    their fresh versions arrive with the batch, so new pairs (including
    re-derived ones for the re-crawls) come out of the same
    batch ⋈ merged bucket join."""
    from ..operators.dedup import (N_HASHES, _band_rel, _docs,
                                   _jaccard_exact_for, _lsh_est_for,
                                   _propagate_min_labels, _shingles_of,
                                   _signature_wide, _simhash_unordered)
    base = _require_base(spark, DEDUP_KINDS, base_dir)
    hcols = [f"h{s}" for s in range(N_HASHES)]

    # per-doc relations: pure appends (stale re-crawl rows retired)
    batch_sig = _signature_wide(spark, batch_dir)
    base_sig = _anti_ids(base["minhash_sigwide"].select("doc_id", *hcols),
                         recrawl_ids)
    merged_sig = base_sig.unionByName(batch_sig.select("doc_id", *hcols))
    merged_simhash = (_anti_ids(base["simhash_fp"]
                                .select("doc_id", "simhash"), recrawl_ids)
                      .unionByName(_simhash_unordered(spark, batch_dir)))

    # new candidate pairs: batch bands ⋈ merged band index — the a-side is
    # always a batch doc, so no (day1, day1) pair can arise and the union
    # with the stored day-1 pairs is disjoint by construction.
    # The batch band relation is EAGERLY checkpointed first: merged_sig
    # CONTAINS batch_sig as a union branch, so the bucket join would be a
    # partial self-join needing analyzer-side attribute deduplication; an
    # ExistingRDD side shares nothing and resolves unambiguously, and the
    # relation is tiny (4 rows per batch doc).
    bands_batch = _band_rel(batch_sig).localCheckpoint()
    raw = (bands_batch.alias("a")
           .join(_band_rel(merged_sig).alias("b"),
                 (F.col("a.band") == F.col("b.band")) &
                 (F.col("a.band_hash") == F.col("b.band_hash")) &
                 (F.col("a.doc_id") != F.col("b.doc_id"))))
    cand = (raw.select(
        F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
        F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"))
        .distinct().localCheckpoint())

    # day-1 members of new pairs: a collision-bounded id list (an anti
    # join against the batch ids, collected driver-side — same bounded
    # class as the engine's other scalar collects).  It prunes the ONLY
    # read of base document bytes in the whole delta build.
    batch_ids = _docs(spark, batch_dir).select("doc_id")
    cand_ids = (cand.select(F.col("doc_a").alias("doc_id"))
                .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
                .distinct())
    day1_ids = [r.doc_id for r in
                cand_ids.join(batch_ids, "doc_id", "anti").collect()]
    sh = _shingles_of(_docs(spark, batch_dir))
    if day1_ids:
        pruned_base = (spark.read
                       .parquet(f"{base_dir.rstrip('/')}/documents.parquet")
                       .select("doc_id", "text")
                       .filter(F.col("doc_id").isin(day1_ids)))
        sh = sh.unionByName(_shingles_of(pruned_base))
    new_pairs = (_lsh_est_for(merged_sig, cand)
                 .join(_jaccard_exact_for(cand, sh),
                       ["doc_a", "doc_b"], "left"))
    pair_cols = ["doc_a", "doc_b", "est_jaccard", "n_inter", "jaccard"]
    base_pairs = base["dedup_pairs"].select(*pair_cols)
    base_pairs = _anti_ids(_anti_ids(base_pairs, recrawl_ids, "doc_a"),
                           recrawl_ids, "doc_b")
    # re-canonicalize the column ORDER: a using-column join moves its key
    # to the front of the output, so the doc_b anti-join above leaves the
    # relation as (doc_b, doc_a, …) — values intact, schema reordered —
    # and the written parquet would silently transpose the pair columns
    # for every positional consumer
    merged_pairs = (base_pairs.unionByName(new_pairs.select(*pair_cols))
                    .select(*pair_cols))

    # labels: corpus-global — re-propagate over the merged pair relation
    # (∝ collisions; zero document reads)
    merged_labels = _propagate_min_labels(
        merged_pairs.select("doc_a", "doc_b"))

    return {"minhash_sigwide": merged_sig,
            "dedup_pairs": merged_pairs,
            "dedup_labels": merged_labels,
            "simhash_fp": merged_simhash}


def _anti_ids(df: DataFrame, recrawl_ids: DataFrame | None,
              col: str = "doc_id") -> DataFrame:
    """Retire a re-crawled doc's stale rows from a stored per-doc
    relation (no-op when the batch has no re-crawls)."""
    if recrawl_ids is None:
        return df
    return df.join(recrawl_ids.select(F.col("doc_id").alias(col)), col,
                   "anti")


# ------------------------------------------------------ decontamination index
def decon_delta_frames(spark: SparkSession, base_dir: str, batch_dir: str,
                       recrawl_ids: DataFrame | None = None
                       ) -> dict[str, DataFrame]:
    """Merged decontamination index: per-doc gram postings are appends of
    batch-only computations (the gram derivation is local); re-crawled
    docs' stale rows are retired from the stored side first — including
    a re-crawled EVAL doc's old bench grams, which is why the bench
    posting carries doc_id."""
    from ..operators.dedup import _docs
    from ..operators.training import _BENCH_MOD, decon_gram_rel
    base = _require_base(spark, DECON_KINDS, base_dir)
    bg = decon_gram_rel(_docs(spark, batch_dir))
    batch_bench = (bg.filter(F.col("doc_id") % _BENCH_MOD == 0)
                   .select("doc_id", "gram").distinct())
    batch_train = (bg.filter(F.col("doc_id") % _BENCH_MOD != 0)
                   .select("doc_id", "gram").distinct())
    return {"decon_bench_grams": _anti_ids(
                base["decon_bench_grams"].select("doc_id", "gram"),
                recrawl_ids).unionByName(batch_bench),
            "decon_train_grams": _anti_ids(
                base["decon_train_grams"].select("doc_id", "gram"),
                recrawl_ids).unionByName(batch_train)}


# ----------------------------------------------------------- decision table
def web_decisions_delta_frame(spark: SparkSession, base_dir: str,
                              batch_dir: str, combined_dir: str,
                              recrawl_ids: DataFrame | None = None
                              ) -> DataFrame:
    """The merged per-document decision table: stored day-1 gate columns
    (minus any re-crawled rows) ∪ batch-computed gate columns, with the
    two CORPUS-GLOBAL verdicts derived for every row from the combined
    index tables — ``dedup_kept`` from the merged labels (a day-2 bridge
    doc can flip a day-1 verdict) and ``clean`` as one gram-key join of
    the merged train posting against the merged bench gram set (a day-2
    eval doc's grams can contaminate a day-1 document; a re-crawled eval
    doc's retired grams can UN-contaminate one — both fall out of the
    same join, and day-1 text is never re-read).  The dedup + decon
    deltas must have written the combined tables first."""
    from ..operators.webclean import gate_columns_unordered
    base = _require_base(spark, ("web_decisions",), base_dir)
    labels = read_table(spark, "dedup_labels", combined_dir)
    bench_all = read_table(spark, "decon_bench_grams", combined_dir)
    train_all = read_table(spark, "decon_train_grams", combined_dir)
    if labels is None or bench_all is None or train_all is None:
        raise ValueError(
            "web_decisions delta needs the combined dedup_labels and "
            "decon_* tables — run the dedup and decon deltas first")
    gate_cols = ["doc_id", "gopher_pass", "c4_pass",
                 "allowed", "blocked", "indexable"]
    day1_gates = _anti_ids(base["web_decisions"].select(*gate_cols),
                           recrawl_ids)
    batch_gates = (gate_columns_unordered(spark, batch_dir)
                   .select(*gate_cols))
    gates = day1_gates.unionByName(batch_gates)
    # clean for EVERY row, from the index alone: contaminated iff the
    # doc's train grams intersect the merged bench gram set
    contaminated = (train_all.select("doc_id", "gram")
                    .join(bench_all.select("gram").distinct(), "gram")
                    .select("doc_id").distinct()
                    .withColumn("contam", F.lit(True)))
    lab = labels.select(F.col("node").alias("doc_id"),
                        F.col("label").alias("cl"))
    kept = F.col("doc_id") == F.coalesce(F.col("cl"), F.col("doc_id"))
    clean = ~F.coalesce(F.col("contam"), F.lit(False))
    ck = F.col("gopher_pass") & F.col("c4_pass") & F.col("dedup_kept") & \
        F.col("clean")
    return (gates.join(contaminated, "doc_id", "left")
            .withColumn("clean", clean)
            .join(lab, "doc_id", "left")
            .withColumn("dedup_kept", kept)
            .select("doc_id", "gopher_pass", "c4_pass", "dedup_kept",
                    "clean", ck.alias("corpus_keep"), "allowed", "blocked",
                    "indexable",
                    (ck & F.col("allowed") & ~F.col("blocked") &
                     F.col("indexable")).alias("web_keep")))


# ---------------------------------------------------------- retrieval index
def merge_postings(base_postings: DataFrame,
                   batch_postings: DataFrame) -> DataFrame:
    """Postings merge: (tok, doc_id, tf) partitions are disjoint across
    day-1 and the batch (tf is per-document), so the merge is a pure
    append — df/idf/dl-normalization derive from the merged relation at
    query time, which is why no global statistic needs patching."""
    cols = ["tok", "doc_id", "tf"]
    return base_postings.select(*cols).unionByName(
        batch_postings.select(*cols))


def retrieval_index_delta_frames(spark: SparkSession, base_dir: str,
                                 batch_dir: str,
                                 recrawl_ids: DataFrame | None = None
                                 ) -> dict[str, DataFrame]:
    from ..operators.retrieval import _dl_rel, _per_doc_tf
    base = _require_base(spark, RETRIEVAL_KINDS, base_dir)
    return {"term_postings": merge_postings(
                _anti_ids(base["term_postings"], recrawl_ids),
                _per_doc_tf(spark, batch_dir)),
            "doc_stats": (_anti_ids(base["doc_stats"]
                                    .select("doc_id", "dl"), recrawl_ids)
                          .unionByName(_dl_rel(spark, batch_dir)))}


# ------------------------------------------------------------- orchestration
def _write_lineage(path: str, base_dir: str, batch_dir: str,
                   combined_dir: str) -> None:
    with open(os.path.join(path, "_delta_lineage.json"), "w") as f:
        json.dump({"mode": "delta",
                   "base_fingerprint": corpus_fingerprint(base_dir),
                   "batch_fingerprint": corpus_fingerprint(batch_dir),
                   "combined_fingerprint": corpus_fingerprint(combined_dir)},
                  f)


def _recrawl_ids(spark, base_dir: str, batch_dir: str,
                 allow_recrawl: bool) -> DataFrame | None:
    """Batch doc_ids already present in the base snapshot, detected with
    one join against the stored per-doc stats (NO base document scan).
    Without ``allow_recrawl`` any overlap is an error — merging it
    blindly would double the doc in every table and silently diverge
    from the full recompute.  With it, the overlap set drives the
    retire-then-append upsert in every delta builder; returns None when
    the batch is genuinely disjoint (the appends stay pure)."""
    from ..operators.dedup import _docs
    base_ids = read_table(spark, "doc_stats", base_dir)
    if base_ids is None:
        raise ValueError(
            f"incremental update needs the base doc_stats table for "
            f"{base_dir} (run the full curate/index job first)")
    overlap = (_docs(spark, batch_dir).select("doc_id")
               .join(base_ids.select("doc_id"), "doc_id")
               .localCheckpoint())
    n = overlap.count()
    if n == 0:
        return None
    if not allow_recrawl:
        ids = sorted(r.doc_id for r in overlap.limit(5).collect())
        raise ValueError(
            f"batch doc_ids already exist in the base snapshot "
            f"(first few: {ids}): pass allow_recrawl=True to retire the "
            "stale rows and merge the new versions, or collapse "
            "re-crawls to one row per doc_id upstream (latest-capture "
            "semantics)")
    return overlap


def incremental_update(spark: SparkSession, base_dir: str, batch_dir: str,
                       combined_dir: str,
                       allow_recrawl: bool = False) -> dict[str, str]:
    """Run the full delta maintenance: merge the dedup index, then the
    decontamination index, then the decision table (it reads the merged
    labels + decon postings), then the retrieval index, writing each
    under the COMBINED corpus fingerprint (idempotent + atomic via
    ``materialize``).  Returns kind → table path.  An empty batch is a
    valid no-op day (tables under the combined fingerprint equal the
    base content).  A batch doc_id already present in the base is a
    RE-CRAWL: rejected by default, or — with ``allow_recrawl`` — handled
    as retire-then-append (the stored tables drop the stale rows, the
    batch supplies the new versions; ``combined_dir`` must hold the
    correspondingly compacted documents table)."""
    recrawl = _recrawl_ids(spark, base_dir, batch_dir, allow_recrawl)
    paths: dict[str, str] = {}
    dedup = dedup_index_delta_frames(spark, base_dir, batch_dir,
                                     recrawl_ids=recrawl)
    for kind in DEDUP_KINDS:
        paths[kind] = materialize(spark, kind, combined_dir,
                                  lambda k=kind: dedup[k])
    decon = decon_delta_frames(spark, base_dir, batch_dir,
                               recrawl_ids=recrawl)
    for kind in DECON_KINDS:
        paths[kind] = materialize(spark, kind, combined_dir,
                                  lambda k=kind: decon[k])
    paths["web_decisions"] = materialize(
        spark, "web_decisions", combined_dir,
        lambda: web_decisions_delta_frame(spark, base_dir, batch_dir,
                                          combined_dir,
                                          recrawl_ids=recrawl))
    retr = retrieval_index_delta_frames(spark, base_dir, batch_dir,
                                        recrawl_ids=recrawl)
    for kind in RETRIEVAL_KINDS:
        paths[kind] = materialize(spark, kind, combined_dir,
                                  lambda k=kind: retr[k])
    for p in paths.values():
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            _write_lineage(p, base_dir, batch_dir, combined_dir)
    return paths
