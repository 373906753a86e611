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
(relative path, size, mtime) of EVERY file backing ``documents.parquet``
(recursively — a partitioned dataset's part files live in subdirectories
whose own mtime does not change on in-place rewrite), so a regenerated
fixture under an unchanged sf_dir misses the cache and a crashed write
(no ``_SUCCESS``) never serves.

Writes are atomic at the directory level: ``materialize`` builds into a
unique temp sibling and renames into place, so two concurrent writers
(a spark-submit job racing the bench session on the same corpus) never
interleave part files in one directory — the loser's rename simply
yields to the complete table the winner published.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid


def _default_root() -> str:
    """Stable warehouse anchor: the directory containing the package
    (the repo / deploy root), NOT os.getcwd() — a cwd-relative default
    leaks persistent tables into whatever directory a job was launched
    from and silently misses the cache from any other cwd (ADVICE r4).
    A zip deploy (--py-files) strips the ``.zip`` member path so the
    warehouse lands next to the archive."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    while here.endswith(".zip") or ".zip" + os.sep in here + os.sep:
        here = os.path.dirname(here)
        if here in ("", os.sep):
            here = os.getcwd()
            break
    return os.path.join(here, "spark-warehouse", "curation")


def cache_root() -> str:
    return os.environ.get("RAG_CURATION_DIR", _default_root())


def corpus_fingerprint(sf_dir: str) -> str:
    tgt = os.path.join(sf_dir, "documents.parquet")
    parts = []
    if os.path.isdir(tgt):
        for dirpath, dirnames, filenames in sorted(os.walk(tgt)):
            dirnames.sort()
            for name in sorted(filenames):
                if name.startswith(("_", ".")):
                    continue
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, tgt)
                st = os.stat(full)
                parts.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
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


def atomic_write(df, path: str) -> None:
    """Write ``df`` as parquet to ``path`` via a unique temp sibling +
    rename: concurrent writers each build in isolation and the publish is
    one directory move, so a reader (keyed on _SUCCESS inside the final
    path) never observes interleaved part files from two jobs.  If a
    complete table appeared while we were building, ours is discarded —
    both builds are per-snapshot deterministic, so either is correct."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(tmp)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        shutil.rmtree(tmp, ignore_errors=True)
        return
    # tear down a PARTIAL directory (crashed writer, no certificate) so
    # the rename can land; losing a race here just re-raises into the
    # winner's complete table on the next check
    if os.path.exists(path):
        shutil.rmtree(path, ignore_errors=True)
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise


def materialize(spark, kind: str, sf_dir: str, build) -> str:
    """Write ``build()`` for this (kind, snapshot) if not already present
    (idempotent, atomic — see ``atomic_write``).  Returns the table
    path."""
    path = table_path(kind, sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        atomic_write(build(), path)
    return path
