"""Per-corpus-snapshot materialized tables (the ingest-time index shape).

The reference builds its expensive derived artifacts ONCE at ingest —
the GraphRAG entity graph and community structure
(`graphrag/general/index.py`), the RAPTOR tree (`rag/raptor.py` via the
task executor), the curation verdicts — and every query reads the stored
result.  This module is that contract for the Spark engine: an explicit
``materialize(kind, ...)`` write per corpus snapshot, keyed by a
fingerprint of the backing documents files, with query operators scanning
the table when it exists and recomputing when it doesn't (so a fresh
session with no warehouse — the driver's oracle run — still exercises
the full compute path).

Staleness is structural, not temporal: the path embeds
(file name, size, mtime) of every file backing ``documents.parquet``, so
a regenerated fixture under an unchanged sf_dir misses the cache and a
crashed write (no ``_SUCCESS``) never serves.
"""

from __future__ import annotations

import hashlib
import os


def cache_root() -> str:
    return os.environ.get(
        "RAG_CURATION_DIR",
        os.path.join(os.getcwd(), "spark-warehouse", "curation"))


def corpus_fingerprint(sf_dir: str) -> str:
    tgt = os.path.join(sf_dir, "documents.parquet")
    parts = []
    if os.path.isdir(tgt):
        for name in sorted(os.listdir(tgt)):
            if name.startswith(("_", ".")):
                continue
            st = os.stat(os.path.join(tgt, name))
            parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(tgt):
        st = os.stat(tgt)
        parts.append(f"documents.parquet:{st.st_size}:{st.st_mtime_ns}")
    raw = os.path.abspath(sf_dir) + "|" + "|".join(parts)
    return hashlib.md5(raw.encode()).hexdigest()[:16]


def table_path(kind: str, sf_dir: str) -> str:
    return os.path.join(cache_root(), kind, corpus_fingerprint(sf_dir))


def read_table(spark, kind: str, sf_dir: str):
    """The written table for this (kind, corpus snapshot), or None if no
    COMPLETE table exists (the _SUCCESS marker is the certificate)."""
    path = table_path(kind, sf_dir)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return spark.read.parquet(path)
    return None


def materialize(spark, kind: str, sf_dir: str, build) -> str:
    """Write ``build()`` for this (kind, snapshot) if not already present
    (idempotent).  Returns the table path."""
    path = table_path(kind, sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build().write.mode("overwrite").parquet(path)
    return path
