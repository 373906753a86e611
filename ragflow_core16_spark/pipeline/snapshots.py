"""Snapshot-versioned parquet tables: the Iceberg commit protocol in
stdlib + parquet (the Iceberg jars are not shipped in this sandbox; the
LAYOUT and the atomicity argument are the published spec's, re-expressed).

Layout::

    table/
      data/<commit-uuid>/part-*.parquet   immutable data files
      _snapshots/v00001.json              manifest: full file list + meta

The COMMIT is the publication of the version manifest via ``os.link`` of
a fully-written, fsynced temp file — one atomic syscall that both CLAIMS
the version number (link fails with EEXIST if another writer got there
first) and PUBLISHES the complete manifest (a published manifest can
never be half-written).  Everything before it — the data files — is
invisible to readers, so a crash at any earlier point leaves the table
exactly at its previous snapshot; orphan data dirs are garbage, not
corruption (``vacuum`` removes them).  A writer that loses the claim
re-reads the new latest manifest and retries on the next version
(optimistic concurrency, Iceberg's commit loop).  Readers resolve
latest-manifest → explicit file list, so a concurrent commit can never
give them a torn view: snapshot isolation.

Why this matters for the extraction pipeline: ``run.py``'s resume rule is
"lineage lands last"; a snapshot table generalizes it — data + lineage
become ONE atomic commit, and a resumed run reads the last committed
snapshot (never a half-written append) while time travel keeps every
prior corpus state addressable for reproducing a training-data cut.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_RE = re.compile(r"^v(\d{5})\.json$")


class CommitConflict(RuntimeError):
    """Another writer claimed the version and retries were exhausted."""


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._snap_dir = os.path.join(self.path, "_snapshots")
        os.makedirs(self._snap_dir, exist_ok=True)

    # ------------------------------------------------------------ reads
    def current_version(self) -> int:
        """Largest published manifest.  Publication is atomic (hard link
        of a complete file), so the max over a directory listing is a
        consistent commit point — no separate pointer file to get stuck
        between 'claimed' and 'current'."""
        vs = [int(m.group(1)) for m in
              (_MANIFEST_RE.match(n) for n in os.listdir(self._snap_dir))
              if m]
        return max(vs, default=0)

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {"version": 0, "files": [], "ts": 0.0, "op": "empty",
                    "parent": None, "n_files": 0}
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def read(self, version: int | None = None) -> DataFrame:
        m = self.manifest(version)
        if not m["files"]:
            raise ValueError(f"{self.path}: empty table at version "
                             f"{m['version']}")
        return self.spark.read.parquet(*m["files"])

    def versions(self) -> list[dict]:
        out = []
        for v in range(1, self.current_version() + 1):
            m = self.manifest(v)
            out.append({k: m[k] for k in ("version", "ts", "op", "parent",
                                          "n_files")})
        return out

    def as_of(self, ts: float) -> int:
        """Latest version committed at or before ``ts`` (time travel)."""
        best = 0
        for v in range(1, self.current_version() + 1):
            if self.manifest(v)["ts"] <= ts:
                best = v
        return best

    # ----------------------------------------------------------- writes
    def commit_append(self, df: DataFrame, retries: int = 10) -> int:
        """Append ``df`` as one atomic snapshot; returns the new version."""
        files = self._write_data(df)
        return self._commit(lambda parent: parent["files"] + files,
                            "append", retries)

    def commit_overwrite(self, df: DataFrame, retries: int = 10) -> int:
        files = self._write_data(df)
        return self._commit(lambda parent: files, "overwrite", retries)

    def compact(self, retries: int = 10) -> int:
        """Rewrite the current file set into a fresh, coalesced one —
        same rows, fewer files; prior snapshots stay readable because
        their manifests still pin the old (immutable) files."""
        files = self._write_data(self.read().coalesce(1))
        return self._commit(lambda parent: files, "compact", retries)

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Delete data files unreachable from the kept trailing versions;
        returns the removed paths.  Manifests are never deleted, so
        history metadata stays auditable after data expiry."""
        cur = self.current_version()
        keep: set[str] = set()
        for v in range(max(1, cur - keep_versions + 1), cur + 1):
            keep.update(self.manifest(v)["files"])
        removed = []
        data_root = os.path.join(self.path, "data")
        commit_dirs = (os.listdir(data_root)
                       if os.path.isdir(data_root) else [])
        for commit_dir in commit_dirs:
            d = os.path.join(data_root, commit_dir)
            for name in os.listdir(d):
                p = os.path.join(d, name)
                if p.endswith(".parquet") and p not in keep:
                    os.remove(p)
                    removed.append(p)
            if not any(n.endswith(".parquet") for n in os.listdir(d)):
                for name in os.listdir(d):       # _SUCCESS, .crc leftovers
                    os.remove(os.path.join(d, name))
                os.rmdir(d)
        return removed

    # --------------------------------------------------------- internals
    def _manifest_path(self, v: int) -> str:
        return os.path.join(self._snap_dir, f"v{v:05d}.json")

    def _write_data(self, df: DataFrame) -> list[str]:
        d = os.path.join(self.path, "data", uuid.uuid4().hex)
        df.write.parquet(d)
        return sorted(os.path.join(d, f) for f in os.listdir(d)
                      if f.endswith(".parquet"))

    def _commit(self, files_fn, op: str, retries: int) -> int:
        for _ in range(retries):
            parent_v = self.current_version()
            parent = self.manifest(parent_v)
            v = parent_v + 1
            files = files_fn(parent)
            manifest = {"version": v, "parent": parent_v or None,
                        "op": op, "ts": time.time(),
                        "files": files, "n_files": len(files)}
            tmp = os.path.join(self._snap_dir,
                               f".tmp.{uuid.uuid4().hex}.json")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, self._manifest_path(v))   # atomic claim+publish
                return v
            except FileExistsError:
                continue  # lost the race — recompute against new parent
            finally:
                os.unlink(tmp)
        raise CommitConflict(f"{self.path}: lost {retries} commit races")
