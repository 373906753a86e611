"""No-Spark control: per-process docs/s of the pure-Python extraction
loop at 1 vs N concurrent processes pinned to disjoint cores.

The process ladder is derived from the host (``os.cpu_count()``), so the
control runs unchanged on smaller VMs — rungs that exceed the available
cores are skipped rather than crashing taskset.  Paths come from the
same env vars the bench uses (``SPARK_GRAFT_SF_DIR``)."""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

WORKER = r'''
import sys, time, os
sys.path.insert(0, %(repo)r)
from ragflow_core16_spark.datagen.pages import document_page
from ragflow_core16_spark.operators.extract import _extract_one
import duckdb
rows = duckdb.sql("SELECT doc_id, text FROM read_parquet('%(sf)s/documents.parquet') ORDER BY doc_id").fetchall()
pages = [document_page(int(d), t) for d, t in rows]
# warm
for u, ts, h in pages[:50]:
    _extract_one(u, ts, h, "en", 128, "\n", defer_ids=True)
t0 = time.time(); n = 0
while time.time() - t0 < 20:
    for u, ts, h in pages:
        _extract_one(u, ts, h, "en", 128, "\n", defer_ids=True)
    n += len(pages)
print(n / (time.time() - t0))
''' % {"repo": REPO, "sf": SF_DIR}


def run(n_procs):
    procs = []
    for i in range(n_procs):
        p = subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", WORKER],
            stdout=subprocess.PIPE, text=True)
        procs.append(p)
    rates = []
    for p in procs:
        out = p.communicate()[0].strip().splitlines()
        if p.returncode != 0 or not out:
            raise RuntimeError(
                f"control worker failed (rc={p.returncode}); "
                f"stdout={out!r}")
        rates.append(float(out[-1]))
    return rates


def main():
    ncpu = os.cpu_count() or 1
    ladder = sorted({1, min(8, ncpu), min(16, ncpu), ncpu})
    for n in ladder:
        r = run(n)
        print(json.dumps({
            "procs": n, "per_proc_mean": sum(r) / n,
            "min": min(r), "max": max(r), "sum": sum(r)}))


if __name__ == "__main__":
    main()
