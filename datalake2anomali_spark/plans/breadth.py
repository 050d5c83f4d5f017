"""Relational breadth: windows, set ops, rollup, pivot, scalar functions,
sessionization (SURVEY §2.5-§2.7 generalizations + build-plan step 3).

The reference only has top-1-by-recency (O1), union-all (O2) and scalar
date/JSON functions (S1-S7); these queries generalize each into the full
relational surface a Spark engine exposes, each with a DuckDB oracle.

Determinism rules (same as everywhere): double aggregates go through
fixed-point ``dsum``; window frames order by a unique tiebreaker; timestamps
leave the plan as formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.exact import DSUM_SQL, dsum
from ..io.tables import load_table

# -- topk_per_group: O1 generalized (row_number over partitioned window) ------


def topk_per_group(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
    )


TOPK_SQL = """
SELECT o_orderpriority, rn, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""

# -- distinct_set_ops: INTERSECT / EXCEPT / DISTINCT --------------------------


def distinct_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def buyers(year: int) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == year)
            .select(F.col("o_custkey").alias("custkey"))
            .distinct()
        )

    return buyers(1997).intersect(buyers(1998)).exceptAll(buyers(1995))


SET_OPS_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
INTERSECT
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
"""

# -- grouped_rollup: hierarchical aggregation ---------------------------------


def grouped_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity", 2).alias("qty"),
        )
        .select("l_returnflag", "l_linestatus", "n", "qty")
    )


ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {DSUM_SQL('l_quantity', 2)} AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

# -- cube: all grouping-set combinations over two dims ------------------------


def cube_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping sets in one
    pass (rollup's sibling — §2.5 grouping-set family).  ``gid`` is the
    grouping-ID bitmask so all-NULL subtotal rows are distinguishable
    from genuine NULL groups without relying on the fixture's
    non-nullness; DuckDB's GROUPING() bits replay it."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity", 2).alias("qty"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "qty")
    )


CUBE_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n, {DSUM_SQL('l_quantity', 2)} AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

# -- rank-function family + group-wise exact quantiles ------------------------


def window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full rank-function surface over one window: row_number, rank,
    dense_rank, ntile, percent_rank, cume_dist, lag, lead — each with
    identical ANSI semantics in DuckDB.  percent_rank/cume_dist are
    int/int divisions of exact counts (correctly-rounded, deterministic
    cross-engine); the unique (price, orderkey) tiebreak keeps every
    function's output stable under any partitioning."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 13 == 0  # keep the row set bench-sized
    )
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        F.lag("o_orderkey").over(w).alias("prev_key"),
        F.lead("o_orderkey").over(w).alias("next_key"),
    )


WINDOW_RANK_SQL = """
SELECT o_orderpriority, o_orderkey,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rk,
       DENSE_RANK() OVER w AS drk,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cum_dist,
       LAG(o_orderkey) OVER w AS prev_key,
       LEAD(o_orderkey) OVER w AS next_key
FROM orders
WHERE o_orderkey % 13 = 0
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


GROUP_QS = (0.5, 0.95)


def groupwise_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group order statistics (p50/p95 of value per event_type,
    ``quantile_disc`` rank convention) via ONE ranked window — the
    group-keyed complement of the global ``exact_quantiles`` refinement
    (per-group sort is fine when groups are many and individually
    bounded; the refinement is for the single global order).  Values pass
    through the 2-decimal snap so both engines pick identical rows."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    snapped = e.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("s")
    )
    w = W.partitionBy("event_type").orderBy("s")
    ranked = snapped.select(
        "event_type",
        "s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            W.partitionBy("event_type").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n"),
    )
    picks = [
        ranked.filter(
            F.col("rn")
            == F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("n")).cast("long"))
        ).select(
            "event_type", F.lit(q).alias("q"), F.col("s").alias("value_scaled")
        )
        for q in GROUP_QS
    ]
    out = picks[0]
    for pdf in picks[1:]:
        out = out.unionByName(pdf)
    return out.orderBy("event_type", "q")


GROUPWISE_Q_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS s FROM events
  WHERE value IS NOT NULL
), ranked AS (
  SELECT event_type, s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY s) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
)
SELECT event_type, q.q, s AS value_scaled
FROM ranked
CROSS JOIN (VALUES {", ".join(f"(CAST({q} AS DOUBLE))" for q in GROUP_QS)}) q(q)
WHERE rn = GREATEST(1, CAST(CEIL(q.q * n) AS BIGINT))
ORDER BY event_type, q.q
"""


#: (q, exact decimal numerator q·10⁶) for the interpolated variant
GROUP_CONT_QS = (0.25, 0.5, 0.95)


def groupwise_percentile_cont_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group exact INTERPOLATED percentiles of value per event_type
    (``functions/selection.py: groupwise_percentile_cont``) — completes
    the selection family: global disc + cont and per-group disc existed;
    this is the per-group cont a per-dataset SLA report needs (VERDICT
    r6 #7).  The oracle replays the identical integer bracketing and
    fixed-point remainder, so the hash match pins the interpolation
    arithmetic, not a float approximation."""
    from datalake2anomali_spark.functions.selection import (
        groupwise_percentile_cont,
    )

    e = load_table(spark, sf_dir, "events")
    return groupwise_percentile_cont(
        e, ["event_type"], "value", list(GROUP_CONT_QS)
    ).orderBy("event_type", "q")


GROUPWISE_CONT_SQL = f"""
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS s FROM events
  WHERE value IS NOT NULL
), ranked AS (
  SELECT event_type, s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY s) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
), marked AS (
  SELECT event_type, q.q, s, rn,
         (q.p * (n - 1)) // 1000000 + 1 AS r_lo,
         LEAST((q.p * (n - 1)) // 1000000 + 2, n) AS r_hi,
         (q.p * (n - 1)) % 1000000 AS frac
  FROM ranked
  CROSS JOIN (VALUES {", ".join(f"(CAST({q} AS DOUBLE), CAST({round(q * 1_000_000)} AS BIGINT))" for q in GROUP_CONT_QS)}) q(q, p)
  WHERE rn = (q.p * (n - 1)) // 1000000 + 1
     OR rn = LEAST((q.p * (n - 1)) // 1000000 + 2, n)
), agg AS (
  SELECT event_type, q,
         MAX(CASE WHEN rn = r_lo THEN s END) AS lo_scaled,
         MAX(CASE WHEN rn = r_hi THEN s END) AS hi_scaled,
         MAX(frac) AS frac_num
  FROM marked GROUP BY 1, 2
)
SELECT event_type, q, lo_scaled, hi_scaled, frac_num,
       frac_num * (hi_scaled - lo_scaled) AS interp_rem
FROM agg
ORDER BY event_type, q
"""


# -- pivot: orderstatus × orderpriority contingency ---------------------------


def status_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .na.fill(0, ["O", "F", "P"])
        .select("o_orderpriority", F.col("O").alias("n_open"), F.col("F").alias("n_filled"), F.col("P").alias("n_partial"))
    )


PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
FROM orders GROUP BY o_orderpriority
"""

# -- scalar_datetime_json: S1/S2/S6/S7 over events ----------------------------


def scalar_datetime_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type").isin("purchase", "signup"))
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH").alias("hr"),
            F.date_format(
                F.col("ts") + F.make_interval(hours=F.lit(6)), "yyyy-MM-dd HH:mm:ss"
            ).alias("ts_plus_6h"),
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            F.dayofmonth("ts").alias("dom"),
            F.month("ts").alias("mon"),
            "event_type",
        )
    )


SCALAR_SQL = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H') AS hr,
       strftime(ts + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S') AS ts_plus_6h,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CAST(day(ts) AS INTEGER) AS dom,
       CAST(month(ts) AS INTEGER) AS mon,
       event_type
FROM events
WHERE event_type IN ('purchase', 'signup')
"""

# -- running_window: cumulative per-key ordered aggregation -------------------


def running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        o.withColumn("running_cents", F.sum(cents).over(w))
        .select(
            "o_custkey",
            "o_orderkey",
            (F.col("running_cents").cast("double") / 100).alias("running_total"),
        )
    )


RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
       AS running_total
FROM orders WHERE o_custkey % 50 = 0
"""

# -- sessionize: gap-based sessionization via lag + cumulative sum ------------


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization (streaming twin lives in streaming/windows.py).

    Classic lag+cumsum: a new session starts when the gap to the previous
    event of the same user exceeds the threshold.  Two window passes over the
    same (user_id, ts) partitioning — Spark reuses one sort+shuffle for both.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000  # compare in µs: no sub-second truncation
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = e.withColumn("sess_idx", F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "sess_idx")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.max("sess_idx").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
    )


SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
  FROM marked
),
per_session AS (
  SELECT user_id, sess_idx, COUNT(*) AS n_events
  FROM sessions GROUP BY user_id, sess_idx
)
SELECT user_id,
       CAST(MAX(sess_idx) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       MAX(n_events) AS max_session_events
FROM per_session GROUP BY user_id
"""

# -- string_funcs: S5-style string surface over part --------------------------


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%widget%"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").alias("name_len"),
            F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.regexp_extract("p_brand", "([0-9]+)", 1).cast("int").alias("brand_num"),
            F.substring("p_type", 1, 3).alias("type_prefix"),
        )
    )


STRING_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS INTEGER) AS name_len,
       split_part(p_name, ' ', 1) AS first_word,
       p_brand || '|' || p_type AS brand_type,
       CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INTEGER) AS brand_num,
       substring(p_type, 1, 3) AS type_prefix
FROM part WHERE p_name LIKE '%widget%'
"""

# -- region_rollup_join: multi-hop dim join + per-region stats ----------------


def region_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum(cents).cast("double") / F.count(F.lit(1)) / 100).alias("avg_acctbal"),
            F.countDistinct("n_name").alias("n_nations"),
        )
    )


REGION_STATS_SQL = """
SELECT r_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / COUNT(*) / 100 AS avg_acctbal,
       COUNT(DISTINCT n_name) AS n_nations
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

def sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch aggregates vs exact anchors (functions/sketches.py).

    HLL++ distinct counts and quantile-summary percentiles per event_type,
    bound-checked in-query against the exact values; the oracle recomputes
    the exact anchors and pins the bound booleans TRUE (derived-check
    scheme, see plans/llm_queries.py).
    """
    from ..functions.sketches import sketch_summary

    e = load_table(spark, sf_dir, "events")
    return sketch_summary(e, key="event_type", id_col="user_id", value_col="value")


SKETCH_STATS_SQL = """
SELECT event_type,
       CAST(COUNT(value) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_exact,
       TRUE AS hll_ok,
       TRUE AS p50_ok,
       TRUE AS p95_ok
FROM events
GROUP BY event_type
"""


QUERIES = {
    "sketch_stats": sketch_stats,
    "topk_per_group": topk_per_group,
    "distinct_set_ops": distinct_set_ops,
    "grouped_rollup": grouped_rollup,
    "cube_stats": cube_stats,
    "window_rank_funcs": window_rank_funcs,
    "groupwise_quantiles": groupwise_quantiles,
    "groupwise_percentile_cont": groupwise_percentile_cont_events,
    "status_priority_pivot": status_priority_pivot,
    "scalar_datetime_json": scalar_datetime_json,
    "running_window": running_window,
    "sessionize": sessionize,
    "string_funcs": string_funcs,
    "region_customer_stats": region_customer_stats,
}

ORACLES = {
    "sketch_stats": SKETCH_STATS_SQL,
    "topk_per_group": TOPK_SQL,
    "distinct_set_ops": SET_OPS_SQL,
    "grouped_rollup": ROLLUP_SQL,
    "cube_stats": CUBE_SQL,
    "window_rank_funcs": WINDOW_RANK_SQL,
    "groupwise_quantiles": GROUPWISE_Q_SQL,
    "groupwise_percentile_cont": GROUPWISE_CONT_SQL,
    "status_priority_pivot": PIVOT_SQL,
    "scalar_datetime_json": SCALAR_SQL,
    "running_window": RUNNING_SQL,
    "sessionize": SESSIONIZE_SQL,
    "string_funcs": STRING_SQL,
    "region_customer_stats": REGION_STATS_SQL,
}
