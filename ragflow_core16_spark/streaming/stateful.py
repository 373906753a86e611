"""Custom stateful streaming operator: per-host crawl sessions.

``applyInPandasWithState`` is the Spark surface for operators the built-in
windowed aggregations can't express — here a *gap-closed session* per web
host: state accumulates (pages, bytes, first/last event time) while a host
keeps appearing in the crawl stream, and the session row is emitted when
the event-time watermark passes ``last_ts + gap`` (EventTimeTimeout).

The reference has no streaming surface (its ingestion is a Redis queue
consumer, ``rag/svr/task_executor.py:172-210``); this operator is part of
the engine's streaming capability layer next to the watermarked metrics
rollup (``extract_stream.py``).  At scale the state store is per-host —
bounded by |hosts|, not |pages| — and a hot host costs one state row, not
one task.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = ("host string, n_pages long, total_bytes long, "
                  "first_ts timestamp, last_ts timestamp")
STATE_SCHEMA = ("n_pages long, total_bytes long, first_ts timestamp, "
                "last_ts timestamp")


def _session_fn(gap_ms: int):
    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: Any) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, b, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame([{
                "host": key[0], "n_pages": n, "total_bytes": b,
                "first_ts": first_ts, "last_ts": last_ts,
            }])
            return
        n, b, first_ts, last_ts = (state.get if state.exists
                                   else (0, 0, None, None))
        for pdf in pdfs:
            if pdf.empty:
                continue
            n += len(pdf)
            b += int(pdf["nbytes"].sum())
            lo = pdf["warc_ts"].min()
            hi = pdf["warc_ts"].max()
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        state.update((n, b, first_ts, last_ts))
        # close the session when the watermark passes last_ts + gap
        state.setTimeoutTimestamp(int(last_ts.timestamp() * 1000) + gap_ms)
        yield pd.DataFrame([], columns=["host", "n_pages", "total_bytes",
                                        "first_ts", "last_ts"])
    return fn


def host_session_stream(pages_stream: DataFrame,
                        gap: str = "30 minutes",
                        watermark: str = "1 minute") -> DataFrame:
    """pages readStream → gap-closed per-host session rows."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    gap_ms = _parse_duration_ms(gap)
    df = (pages_stream
          .withColumn("host",
                      F.regexp_extract("url", r"^[a-z]+://([^/]+)/", 1))
          .withColumn("nbytes", F.length("html").cast("long"))
          .withWatermark("warc_ts", watermark)
          .select("host", "warc_ts", "nbytes"))
    return (df.groupBy("host")
            .applyInPandasWithState(_session_fn(gap_ms),
                                    SESSION_SCHEMA, STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))


def _parse_duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1000, "seconds": 1000,
            "minute": 60_000, "minutes": 60_000,
            "hour": 3_600_000, "hours": 3_600_000}[unit]
    return int(n) * mult
