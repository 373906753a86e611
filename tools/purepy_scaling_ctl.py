"""No-Spark control: per-process docs/s of the pure-Python extraction
loop at 1 vs N concurrent processes pinned to disjoint cores."""
import sys, os, time, subprocess, json
sys.path.insert(0, "/root/repo")

WORKER = r'''
import sys, time, os
sys.path.insert(0, "/root/repo")
from ragflow_core16_spark.datagen.pages import document_page
from ragflow_core16_spark.operators.extract import _extract_one
import duckdb
rows = duckdb.sql("SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.1/documents.parquet') ORDER BY doc_id").fetchall()
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
'''

def run(n_procs):
    procs = []
    for i in range(n_procs):
        p = subprocess.Popen(["taskset", "-c", str(i), sys.executable, "-c", WORKER],
                             stdout=subprocess.PIPE, text=True)
        procs.append(p)
    rates = [float(p.communicate()[0].strip().splitlines()[-1]) for p in procs]
    return rates

r1 = run(1)
print(json.dumps({"procs": 1, "per_proc": r1, "sum": sum(r1)}))
r32 = run(32)
print(json.dumps({"procs": 32, "per_proc_mean": sum(r32)/32, "min": min(r32), "max": max(r32), "sum": sum(r32)}))
r8 = run(8)
print(json.dumps({"procs": 8, "per_proc_mean": sum(r8)/8, "sum": sum(r8)}))
r16 = run(16)
print(json.dumps({"procs": 16, "per_proc_mean": sum(r16)/16, "sum": sum(r16)}))
