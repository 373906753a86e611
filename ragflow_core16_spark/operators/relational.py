"""Classical relational operators over the driver's TPC-H-ish tables.

SURVEY.md §2.10: the reference has no SQL engine — its equivalents are
groupBy-aggs, top-k, broadcast joins.  These queries demonstrate the engine's
relational surface (Catalyst-native, zero Python), with explicit
physical-plan intent noted per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- tpch q1
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→hash-agg; partial agg map-side, one
    shuffle on the (tiny) group key; predicate pushed to parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)        AS sum_qty,
       round(sum(l_extendedprice), 2)   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4)        AS avg_qty,
       count(*)                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------ revenue by nation
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join: lineitem ⋈ orders (shuffle on orderkey) ⋈ customer ⋈
    nation (both broadcast — dims are tiny).  The F.broadcast hints make the
    intended physical plan explicit; AQE would pick it anyway at this size."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    c, n = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.countDistinct("o_orderkey").alias("n_orders"))
            .orderBy(F.desc("revenue"), "n_name"))


REVENUE_BY_NATION_SQL = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY revenue DESC, n.n_name
"""


# ------------------------------------------------------- top-k per group
def top_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window row_number ≤ 3 per lang by (n_chars desc, doc_id) — rank
    shuffle on lang only; deterministic tiebreak."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("lang", "doc_id", "n_chars", "rk")
            .orderBy("lang", "rk"))


TOP_DOCS_SQL = """
SELECT lang, doc_id, n_chars, rk FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents) WHERE rk <= 3 ORDER BY lang, rk
"""


# --------------------------------------------------------- events window
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed agg per event_type (streaming-equivalent
    batch query; in Structured Streaming the same expr runs under a
    watermark — see streaming/)."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .orderBy("hour", "event_type"))


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


# ------------------------------------------------------------ sessionize
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min): lag + cumulative-sum window —
    the canonical stateful-batch pattern; one shuffle on user_id."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = e.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = marked.withColumn(
        "session_seq",
        F.sum("new_sess").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "session_seq")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"))
            .orderBy("user_id", "session_seq"))


SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts,
    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM marked)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY user_id, session_seq ORDER BY user_id, session_seq
"""


# ----------------------------------------------------- events json props
def events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + agg (table-template type coercion analogue,
    rag/app/table.py:97-127 — typed field from semi-structured input)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (e.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("k"), 4).alias("avg_k"),
                 F.max("k").alias("max_k"))
            .orderBy("event_type"))


EVENTS_PROPS_SQL = """
SELECT event_type, count(*) AS n,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# -------------------------------------------------- set ops / distinct
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style semi join + distinct count (TPC-H Q4 shape)."""
    o, li = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    has_line = li.select("l_orderkey").distinct()
    return (o.join(has_line, o.o_orderkey == has_line.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ------------------------------------------------------------ as-of join
def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every event matched to the latest purchase (ts' ≤ ts)
    by the same user — the time-series join Spark has no native operator
    for.  Implemented with the SCALABLE pattern: union the reference
    stream under a side tag and take a running ``last(..., ignorenulls)``
    window per user ordered by (ts, side) — ONE shuffle keyed on
    user_id, bounded per-user state, no range join and no per-row probe.
    A naive inequality join would be a quadratic range join; the window
    form is what survives 10^12 events.  Oracle: DuckDB's native ASOF
    JOIN (identical ≤ semantics, self-match included)."""
    e = _t(spark, sf_dir, "events")
    left = e.select("event_id", "user_id", "event_type", "ts",
                    F.lit(None).cast("long").alias("ref_id"),
                    F.lit(None).cast("timestamp_ntz").alias("ref_ts"),
                    F.lit(1).alias("side"))
    right = (e.filter(F.col("event_type") == "purchase")
             .select(F.lit(None).cast("long").alias("event_id"),
                     "user_id",
                     F.lit(None).cast("string").alias("event_type"), "ts",
                     F.col("event_id").alias("ref_id"),
                     F.col("ts").alias("ref_ts"),
                     F.lit(0).alias("side")))
    w = (Window.partitionBy("user_id").orderBy("ts", "side")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (left.unionByName(right)
            .withColumn("asof_ref", F.last("ref_id", ignorenulls=True)
                        .over(w))
            .withColumn("asof_ts", F.last("ref_ts", ignorenulls=True)
                        .over(w))
            .filter(F.col("side") == 1)
            .select("event_id", "user_id", "event_type",
                    F.col("asof_ref").alias("ref_event_id"),
                    F.expr("timestampdiff(MICROSECOND, asof_ts, ts)")
                    .alias("gap_us"))
            .orderBy("event_id"))


EVENTS_ASOF_SQL = """
SELECT e.event_id, e.user_id, e.event_type,
       r.event_id AS ref_event_id,
       epoch_us(e.ts) - epoch_us(r.ts) AS gap_us
FROM events e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON e.user_id = r.user_id AND e.ts >= r.ts
ORDER BY e.event_id
"""


# ---------------------------------------------------------------- rollup
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (event_type × hour-of-day hierarchy with
    subtotals and a grand total) — multi-level aggs in one pass; value
    sums as exact integer cents so the oracle stays float-free."""
    e = _t(spark, sf_dir, "events")
    cents = F.sum(F.round(F.col("value") * 100).cast("bigint"))
    return (e.withColumn("hh", F.hour("ts").cast("int"))
            .rollup("event_type", "hh")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 cents.alias("value_cents"))
            .orderBy(F.asc_nulls_first("event_type"),
                     F.asc_nulls_first("hh")))


EVENTS_ROLLUP_SQL = """
SELECT event_type, CAST(hour(ts) AS INTEGER) AS hh,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
GROUP BY ROLLUP (event_type, hh)
ORDER BY event_type NULLS FIRST, hh NULLS FIRST
"""


# ------------------------------------------------------------- set ops
def purchasers_never_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (EXCEPT ∘ INTERSECT): users with a high-value
    purchase who also clicked, minus users who hit a severe (value > 90)
    error.  Distinct set semantics compile to aggregate/anti-join shapes
    — one hash family keyed on user_id."""
    e = _t(spark, sf_dir, "events")
    purch = (e.filter((F.col("event_type") == "purchase")
                      & (F.col("value") > 50)).select("user_id"))
    click = e.filter(F.col("event_type") == "click").select("user_id")
    sev = (e.filter((F.col("event_type") == "error")
                    & (F.col("value") > 90)).select("user_id"))
    return (purch.intersect(click).exceptAll(sev.distinct())
            .orderBy("user_id"))


PURCHASERS_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 50
INTERSECT
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 90
ORDER BY user_id
"""


# ------------------------------------------------------- bounded range join
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded time-band self-join (the interval/range join Spark has no
    native operator for): for every event, count events by OTHER users
    within ±60 s.  Scale pattern: quantize time into 60 s buckets, explode
    the LEFT side to its 3 candidate buckets, equi-join on the bucket, then
    apply the exact band predicate — the shuffle is keyed on the bucket, so
    candidate volume is (events per 3 minutes), never |events|².  A naive
    theta-join would be a cartesian at 10^12 rows.  Oracle: DuckDB's native
    inequality join (it plans an IEJoin) over the same band."""
    e = _t(spark, sf_dir, "events")
    w_us = 60_000_000  # band half-width in microseconds
    us_of = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    left = (e.select("event_id", "user_id", us_of("ts").alias("us"))
            .withColumn("probe", F.explode(F.array(
                (F.col("us") / w_us).cast("bigint") - 1,
                (F.col("us") / w_us).cast("bigint"),
                (F.col("us") / w_us).cast("bigint") + 1))))
    right = e.select(F.col("event_id").alias("r_id"),
                     F.col("user_id").alias("r_user"),
                     us_of("ts").alias("r_us")) \
             .withColumn("bucket", (F.col("r_us") / w_us).cast("bigint"))
    hits = (left.join(right, left.probe == right.bucket)
            .filter((F.col("r_user") != F.col("user_id"))
                    & (F.abs(F.col("r_us") - F.col("us")) <= w_us))
            .groupBy("event_id")
            .agg(F.count(F.lit(1)).alias("n")))
    return (e.select("event_id").join(hits, "event_id", "left")
            .select("event_id",
                    F.coalesce("n", F.lit(0)).alias("n_concurrent"))
            .orderBy("event_id"))


RANGE_JOIN_SQL = """
SELECT e.event_id, count(r.event_id) AS n_concurrent
FROM events e LEFT JOIN events r
  ON r.user_id != e.user_id
 AND abs(epoch_us(r.ts) - epoch_us(e.ts)) <= 60000000
GROUP BY e.event_id ORDER BY e.event_id
"""


# ------------------------------------------- correlated scalar subquery
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated scalar subquery): lineitems whose
    quantity is below 20% of the per-part average.  Decorrelated into a
    per-part aggregate + equi-join — ONE shuffle family keyed on partkey,
    map-side partial agg.  The comparison ``qty < 0.2 * avg(qty)`` is done
    in exact integer form (``5·qty·cnt < sum_qty`` — quantities are
    integral) so Spark and the oracle agree at the boundary regardless of
    float summation order."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = (li.groupBy("l_partkey")
                .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sq"),
                     F.count(F.lit(1)).alias("cnt")))
    j = li.join(per_part, "l_partkey")
    small = j.filter(F.col("l_quantity").cast("bigint") * 5 * F.col("cnt")
                     < F.col("sq"))
    return small.agg(
        F.count(F.lit(1)).alias("n_small"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .alias("revenue_cents"))


SMALL_QTY_SQL = """
WITH pp AS (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey)
SELECT count(*) AS n_small,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l JOIN pp ON l.l_partkey = pp.l_partkey
WHERE CAST(l.l_quantity AS BIGINT) * 5 * pp.cnt < pp.sq
"""


# -------------------------------------------------------------- anti join
def customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left ANTI join (TPC-H Q22 shape): customers that never placed a
    high-value (>300k) order, aggregated per market segment.  The anti
    side is filtered BEFORE the distinct-key projection — predicate
    pushdown shrinks it at the scan, and the join shuffles only keys."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    big = (o.filter(F.col("o_totalprice") > 300000)
           .select(F.col("o_custkey").alias("c_custkey")).distinct())
    return (c.join(big, "c_custkey", "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
                 .alias("acctbal_cents"))
            .orderBy("c_mktsegment"))


CUSTOMERS_NO_ORDERS_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS acctbal_cents
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ------------------------------------------------------------------ pivot
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (event_type → columns) of hourly counts.  The explicit value
    list keeps the plan a single groupBy with conditional aggregates — no
    extra pass to discover the pivot domain (which at 10^12 rows would be
    its own shuffle)."""
    e = _t(spark, sf_dir, "events")
    return (e.withColumn("hh", F.hour("ts").cast("int"))
            .groupBy("hh").pivot("event_type", _EVENT_TYPES).count()
            .na.fill(0, _EVENT_TYPES)
            .orderBy("hh"))


EVENTS_PIVOT_SQL = """
SELECT CAST(hour(ts) AS INTEGER) AS hh,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY 1 ORDER BY hh
"""


# ------------------------------------------------------ exact percentiles
def lang_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed percentiles per group via rank arithmetic: the
    p-th percentile of n_chars is the element at row_number
    ``floor((n-1)·p) + 1`` in the per-lang sort — two window passes, one
    shuffle on lang.  No approx-percentile sketch: the selection index is
    integer arithmetic, so the oracle agrees exactly."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = (d.select("lang", "n_chars", "doc_id")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1))
                          .over(Window.partitionBy("lang"))))
    idx50 = (F.col("n") - 1) * 1 / 2
    idx90 = (F.col("n") - 1) * 9 / 10
    return (ranked.groupBy("lang")
            .agg(F.max("n").alias("n_docs"),
                 F.max(F.when(F.col("rn") == F.floor(idx50).cast("bigint") + 1,
                              F.col("n_chars"))).alias("p50"),
                 F.max(F.when(F.col("rn") == F.floor(idx90).cast("bigint") + 1,
                              F.col("n_chars"))).alias("p90"))
            .orderBy("lang"))


LANG_PERCENTILES_SQL = """
WITH ranked AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
SELECT lang, max(n) AS n_docs,
       max(CASE WHEN rn = CAST(floor((n - 1) * 1 / 2) AS BIGINT) + 1
                THEN n_chars END) AS p50,
       max(CASE WHEN rn = CAST(floor((n - 1) * 9 / 10) AS BIGINT) + 1
                THEN n_chars END) AS p90
FROM ranked GROUP BY lang ORDER BY lang
"""


# ----------------------------------------------------- salted aggregation
N_SALT = 16


def salted_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for skewed group keys: ``documents``
    has only a handful of ``source`` values, so a naive groupBy(source)
    funnels the whole corpus into that many reducers.  Stage 1 aggregates
    on (source, doc_id % 16) — 16-way fan-out of every hot key — stage 2
    collapses the 16 partials.  Both stages partial-agg map-side; the
    extra shuffle carries ≤ 16 rows per key.  This is the explicit form
    of what AQE skew-join splitting does for joins, applied to
    aggregation.  Oracle: the plain one-stage groupBy (semantically
    identical by associativity of sum/count)."""
    d = _t(spark, sf_dir, "documents")
    stage1 = (d.withColumn("salt", (F.col("doc_id") % N_SALT).cast("int"))
              .groupBy("source", "salt")
              .agg(F.count(F.lit(1)).alias("pn"),
                   F.sum(F.col("n_chars").cast("bigint")).alias("pchars")))
    return (stage1.groupBy("source")
            .agg(F.sum("pn").alias("n_docs"),
                 F.sum("pchars").alias("total_chars"))
            .orderBy("source"))


SALTED_SOURCE_AGG_SQL = """
SELECT source, count(*) AS n_docs,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------- outer join + histogram
def order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer distribution by order count.  LEFT OUTER
    join with an extra join-side predicate (priority filter belongs in the
    join condition, NOT a post-filter — a WHERE would turn the outer join
    inner), then two cascaded aggs.  Shuffles: one on custkey for the join
    + first agg, one tiny one on c_count; both partial-agg map-side.  At
    10^12 orders the first agg keys on the join key, so AQE coalesces the
    same exchange for join and agg."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    joined = c.join(
        o, (c.c_custkey == o.o_custkey) &
           (o.o_orderpriority != "1-URGENT"), "left_outer")
    counts = (joined.groupBy("c_custkey")
              .agg(F.count("o_orderkey").alias("c_count")))
    return (counts.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


ORDER_COUNT_HISTOGRAM_SQL = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# ------------------------------------------- agg-filtered semi join back
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    joined back to order + customer detail.  The HAVING-filtered agg is
    tiny (top ~1% of orders), so the join back to orders is a BROADCAST of
    the filtered keys — the scan side never shuffles on orderkey twice.
    Customer dim is broadcast too."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
           .filter(F.col("total_qty") > 250))
    return (o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .select("c_name", "o_orderkey", "o_orderdate",
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    "total_qty")
            .orderBy(F.desc("total_qty"), "o_orderkey"))


LARGE_ORDERS_SQL = """
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice, b.total_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(sum(l_quantity), 2) > 250) b
JOIN orders o   ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY b.total_qty DESC, o.o_orderkey
"""


# ------------------------------------------------- disjunctive pushdown
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across both join sides.
    Catalyst does NOT factor a disjunction into per-side conjuncts, so the
    hull of each side's bands (l_quantity ∈ [1,30]; p_size ∈ [1,35],
    brand ∈ {1,2,3}) is pushed manually — semantics-preserving weakening
    that reaches the parquet scans as PushedFilters and shrinks the
    broadcast part dim before the join.  The exact OR lands as the branch
    CASE post-join.  Per-branch revenue keeps the result multi-row (and
    each branch's sum small enough for stable rounding)."""
    li, p = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    li = li.filter(F.col("l_quantity").between(1, 30))
    p = p.filter(F.col("p_size").between(1, 35) &
                 F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (F.when((F.col("p_brand") == "Brand#1") &
                     F.col("p_size").between(1, 15) &
                     F.col("l_quantity").between(1, 11), "b1")
              .when((F.col("p_brand") == "Brand#2") &
                    F.col("p_size").between(1, 25) &
                    F.col("l_quantity").between(10, 20), "b2")
              .when((F.col("p_brand") == "Brand#3") &
                    F.col("p_size").between(1, 35) &
                    F.col("l_quantity").between(20, 30), "b3"))
    return (j.withColumn("branch", branch)
            .filter(F.col("branch").isNotNull())
            .groupBy("branch")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy("branch"))


DISJUNCTIVE_REVENUE_SQL = """
SELECT branch, count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM (
  SELECT l.l_extendedprice, l.l_discount,
         CASE
           WHEN p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
                AND l.l_quantity BETWEEN 1 AND 11 THEN 'b1'
           WHEN p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
                AND l.l_quantity BETWEEN 10 AND 20 THEN 'b2'
           WHEN p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
                AND l.l_quantity BETWEEN 20 AND 30 THEN 'b3'
         END AS branch
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
WHERE branch IS NOT NULL
GROUP BY branch ORDER BY branch
"""


# ----------------------------------------------- scalar-subquery-on-agg
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum revenue inside a
    date window.  The per-supplier agg is computed ONCE and reused for
    both the max (a 1-row broadcast) and the equality filter.  The agg is
    cached — the CREATE VIEW revenue0 analogue — because Catalyst plans
    the self-referencing subquery as two full lineitem scans otherwise
    (exchange reuse does not cross the max-vs-join branch split); the
    cached relation is ≤ |suppliers| rows.  Revenue compared at full
    double precision (identical per-supplier partial sums both engines),
    rounded only for display."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (li.filter((F.col("l_shipdate") >= F.lit("1996-01-01")) &
                     (F.col("l_shipdate") < F.lit("1996-04-01")))
           .groupBy("l_suppkey")
           .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("total_revenue"))
           .cache())
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (rev.join(F.broadcast(mx),
                     rev.total_revenue == mx.mx)
            .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
            .select("s_suppkey", "s_name",
                    F.round("total_revenue", 2).alias("total_revenue"))
            .orderBy("s_suppkey"))


TOP_SUPPLIER_SQL = """
WITH revenue0 AS (
  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 2) AS total_revenue
FROM revenue0 r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue0)
ORDER BY s.s_suppkey
"""


# ------------------------------------- distinct-agg after excluding join
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each (brand, type)
    — with an excluded-supplier anti join.  The exclusion list (negative
    acctbal) is tiny → broadcast LEFT ANTI; the distinct count shuffles on
    the (brand, type, suppkey) triple once, then a cheap second agg —
    Spark plans count(DISTINCT) as exactly that two-phase expand."""
    li, p = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (li.join(F.broadcast(bad),
                    li.l_suppkey == bad.s_suppkey, "left_anti")
            .join(F.broadcast(p.filter(F.col("p_size") <= 25)),
                  li.l_partkey == p.p_partkey)
            .groupBy("p_brand", "p_type")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type"))


SUPPLIER_PART_VARIETY_SQL = """
SELECT p.p_brand, p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size <= 25
WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
"""


QUERIES = {
    "pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "revenue_by_nation": (revenue_by_nation, REVENUE_BY_NATION_SQL),
    "top_docs_per_lang": (top_docs_per_lang, TOP_DOCS_SQL),
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "sessionize": (sessionize, SESSIONIZE_SQL),
    "events_props": (events_props, EVENTS_PROPS_SQL),
    "order_priority_counts": (order_priority_counts, ORDER_PRIORITY_SQL),
    "events_asof_purchase": (events_asof_purchase, EVENTS_ASOF_SQL),
    "events_rollup": (events_rollup, EVENTS_ROLLUP_SQL),
    "purchasers_never_error": (purchasers_never_error, PURCHASERS_SQL),
    "range_join_events": (range_join_events, RANGE_JOIN_SQL),
    "small_quantity_revenue": (small_quantity_revenue, SMALL_QTY_SQL),
    "customers_no_orders": (customers_no_orders, CUSTOMERS_NO_ORDERS_SQL),
    "events_pivot": (events_pivot, EVENTS_PIVOT_SQL),
    "lang_percentiles": (lang_percentiles, LANG_PERCENTILES_SQL),
    "salted_source_agg": (salted_source_agg, SALTED_SOURCE_AGG_SQL),
    "order_count_histogram": (order_count_histogram,
                              ORDER_COUNT_HISTOGRAM_SQL),
    "large_orders": (large_orders, LARGE_ORDERS_SQL),
    "disjunctive_revenue": (disjunctive_revenue, DISJUNCTIVE_REVENUE_SQL),
    "top_supplier_revenue": (top_supplier_revenue, TOP_SUPPLIER_SQL),
    "supplier_part_variety": (supplier_part_variety,
                              SUPPLIER_PART_VARIETY_SQL),
}
