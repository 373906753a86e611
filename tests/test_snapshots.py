"""Snapshot table (pipeline/snapshots.py): commit atomicity, snapshot
isolation, time travel, compaction, vacuum, and the crash/race cases the
manifest-link protocol exists for."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from ragflow_core16_spark.pipeline.snapshots import (CommitConflict,
                                                     SnapshotTable)

SF = "/root/testdata/sf0.001"


def _docs(spark, lo, hi):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .filter(f"doc_id >= {lo} AND doc_id < {hi}")
            .select("doc_id", "lang"))


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


class TestSnapshotTable:
    def test_append_read_and_time_travel(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path / "t"))
        v1 = t.commit_append(_docs(spark, 0, 10))
        ts_between = time.time()
        v2 = t.commit_append(_docs(spark, 10, 25))
        assert (v1, v2) == (1, 2)
        assert _ids(t.read()) == list(range(25))
        assert _ids(t.read(version=1)) == list(range(10))
        assert t.as_of(ts_between) == 1
        assert t.as_of(time.time()) == 2
        ops = [v["op"] for v in t.versions()]
        assert ops == ["append", "append"]

    def test_crash_before_publish_leaves_prior_snapshot(self, spark,
                                                        tmp_path):
        """Data files on disk but no manifest = nothing happened."""
        t = SnapshotTable(spark, str(tmp_path / "t"))
        t.commit_append(_docs(spark, 0, 10))
        # simulate a writer that died after writing data, before publish
        t._write_data(_docs(spark, 10, 20))
        assert t.current_version() == 1
        assert _ids(t.read()) == list(range(10))
        # and the orphan bytes are reclaimable
        removed = t.vacuum()
        assert removed, "orphan data files should be deleted"
        assert _ids(t.read()) == list(range(10))

    def test_version_claim_race_retries_on_next_version(self, spark,
                                                        tmp_path):
        """A pre-claimed version number forces the optimistic retry path:
        the commit lands on the NEXT version and includes the claimant's
        files in its parent chain."""
        t = SnapshotTable(spark, str(tmp_path / "t"))
        t.commit_append(_docs(spark, 0, 5))
        # rival claims v2 first (complete manifest, as the protocol makes
        # inevitable: publication is atomic)
        rival_files = t._write_data(_docs(spark, 5, 8))
        rival = {"version": 2, "parent": 1, "op": "append",
                 "ts": time.time(),
                 "files": t.manifest(1)["files"] + rival_files,
                 "n_files": None}
        with open(t._manifest_path(2), "w") as f:
            json.dump(rival, f)
        v = t.commit_append(_docs(spark, 8, 12))
        assert v == 3
        assert _ids(t.read()) == list(range(12))  # rival's rows included

    def test_pre_published_version_just_advances_parent(self, spark,
                                                        tmp_path):
        """A version published before the committer reads the table is not
        a conflict — the retry loop re-reads and lands after it."""
        t = SnapshotTable(spark, str(tmp_path / "t"))
        t.commit_append(_docs(spark, 0, 3))
        files = t._write_data(_docs(spark, 3, 6))
        with open(t._manifest_path(2), "w") as f:
            json.dump({"version": 2, "parent": 1, "op": "append",
                       "ts": time.time(),
                       "files": t.manifest(1)["files"] + files,
                       "n_files": None}, f)
        assert t.commit_append(_docs(spark, 6, 9)) == 3

    def test_exhausted_retries_raise(self, spark, tmp_path,
                                     monkeypatch):
        """A rival that wins the claim between the committer's table read
        and its link, every time, exhausts the retries (the only way to
        lose under the listdir protocol — pinned here by freezing the
        committer's view of the current version)."""
        t = SnapshotTable(spark, str(tmp_path / "t"))
        t.commit_append(_docs(spark, 0, 3))
        files = t._write_data(_docs(spark, 3, 6))
        with open(t._manifest_path(2), "w") as f:
            json.dump({"version": 2, "parent": 1, "op": "append",
                       "ts": time.time(), "files": files,
                       "n_files": len(files)}, f)
        monkeypatch.setattr(t, "current_version", lambda: 1)
        with pytest.raises(CommitConflict):
            t._commit(lambda parent: parent["files"], "append", retries=3)

    def test_compact_preserves_rows_and_history(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path / "t"))
        for lo in range(0, 40, 10):
            t.commit_append(_docs(spark, lo, lo + 10))
        before = t.manifest()["n_files"]
        h0 = (t.read().agg(F.expr("bit_xor(xxhash64(doc_id, lang))"))
              .collect()[0][0])
        v = t.compact()
        assert t.manifest(v)["n_files"] < before
        h1 = (t.read().agg(F.expr("bit_xor(xxhash64(doc_id, lang))"))
              .collect()[0][0])
        assert h0 == h1
        # pre-compaction snapshot still readable (its files are immutable)
        assert _ids(t.read(version=2)) == list(range(20))

    def test_vacuum_expires_old_data_not_history(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path / "t"))
        t.commit_append(_docs(spark, 0, 10))
        t.commit_overwrite(_docs(spark, 10, 20))
        removed = t.vacuum(keep_versions=1)
        assert removed  # v1's files are unreachable from v2
        assert _ids(t.read()) == list(range(10, 20))
        assert len(t.versions()) == 2  # manifests stay auditable
        with pytest.raises(Exception):
            t.read(version=1).collect()  # its data is gone

    def test_overwrite_then_resume_pattern(self, spark, tmp_path):
        """The run.py resume rule on snapshot footing: a rerun anti-joins
        against the LAST COMMITTED snapshot, so work lost before a commit
        is redone and work after a commit is skipped."""
        t = SnapshotTable(spark, str(tmp_path / "t"))
        all_docs = _docs(spark, 0, 30)
        t.commit_append(all_docs.filter("doc_id < 12"))
        todo = all_docs.join(t.read().select("doc_id"), "doc_id",
                             "left_anti")
        assert _ids(todo) == list(range(12, 30))
        t.commit_append(todo)
        assert _ids(t.read()) == list(range(30))


class TestSnapshottedRun:
    def test_run_resume_and_chunk_view(self, spark, tmp_path):
        """run_extraction_snapshotted: commit is the resume marker; a
        second run extracts only uncommitted pages; the flat chunk view
        derives from the committed array column."""
        from ragflow_core16_spark.datagen.pages import pages_from_documents
        from ragflow_core16_spark.operators.extract import chunks_table
        from ragflow_core16_spark.pipeline.run import (
            run_extraction_snapshotted)
        from ragflow_core16_spark.pipeline.snapshots import SnapshotTable

        tdir = str(tmp_path / "extracted")
        pages = pages_from_documents(spark, SF).cache()
        n_all = pages.count()
        half = pages.limit(n_all // 2)

        s1 = run_extraction_snapshotted(spark, half, tdir, run_id="r1")
        assert s1["rows"] == n_all // 2 and s1["version"] == 1

        # crash simulation: data written, never committed — invisible
        t = SnapshotTable(spark, tdir)
        t._write_data(half.limit(5))
        assert t.current_version() == 1

        s2 = run_extraction_snapshotted(spark, pages, tdir, run_id="r2")
        assert s2["rows"] == n_all - n_all // 2   # only the missing pages
        assert s2["version"] == 2
        assert t.read().count() == n_all
        assert t.read().select("url").distinct().count() == n_all

        # rerun over the full input: nothing left to do
        s3 = run_extraction_snapshotted(spark, pages, tdir, run_id="r3")
        assert s3["rows"] == 0

        chunks = chunks_table(t.read())
        assert chunks.count() > 0
        assert chunks.filter("chunk_id IS NULL").count() == 0
        pages.unpersist()
