#!/usr/bin/env python
"""spark-submit entrypoint for the extraction pipeline.

Deployment (north-rule run mode):

    zip -r ragflow_core16_spark.zip ragflow_core16_spark
    spark-submit --py-files ragflow_core16_spark.zip \
        jobs/extract_job.py \
        --input  <pages parquet dir | iceberg table> \
        --output <warehouse dir for extracted/chunks/metrics/lineage> \
        [--lang en] [--chunk-tokens 128] [--no-resume] [--run-id r42]

The script takes master/executor topology from the spark-submit command
line (no hardcoded master); on a cluster the same invocation runs at N and
4N executors for the scaling protocol (BASELINE.md §3).  Reruns resume from
the committed lineage manifest unless --no-resume is given.

Prints ONE JSON line with the run summary (rows, ok/error, bytes, chunks,
wall seconds, docs/sec).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="pages → extracted+chunks")
    ap.add_argument("--input", required=True,
                    help="pages source: parquet path, or iceberg:<table>")
    ap.add_argument("--output", required=True,
                    help="output warehouse dir (extracted/ chunks/ metrics/ lineage/)")
    ap.add_argument("--lang", default=None,
                    help="optional lang filter (e.g. en)")
    ap.add_argument("--chunk-tokens", type=int, default=128)
    ap.add_argument("--delimiter", default="\n!?。；！？")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--snapshot-table", action="store_true",
                    help="commit through the snapshot table protocol "
                         "(atomic manifest commits, time travel) instead "
                         "of the append+lineage layout")
    ap.add_argument("--target-partition-mb", type=int, default=64)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.appName("ragflow_core16_spark.extract")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())

    from ragflow_core16_spark.pipeline.run import (run_extraction,
                                                   run_extraction_snapshotted)

    if args.input.startswith("iceberg:"):
        pages = spark.read.table(args.input[len("iceberg:"):])
    else:
        pages = spark.read.parquet(args.input)
    if args.lang:
        pages = pages.filter(F.col("lang") == args.lang)

    runner = (run_extraction_snapshotted if args.snapshot_table
              else run_extraction)
    summary = runner(
        spark, pages, args.output,
        run_id=args.run_id,
        resume=not args.no_resume,
        chunk_token_num=args.chunk_tokens,
        delimiter=args.delimiter,
        target_partition_bytes=args.target_partition_mb * 1024 * 1024)
    summary["docs_per_sec"] = round(
        summary["rows"] / summary["wall_sec"], 1) if summary["wall_sec"] else 0.0
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
