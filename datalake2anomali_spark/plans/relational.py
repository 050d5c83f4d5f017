"""Relational breadth queries over the driver's TPC-H-ish star schema.

The reference connector's local dataflow is a map-only pipeline (SURVEY §3
EP-A); these queries prove the *generalized* relational capability the engine
exposes on top of it — multi-way equi joins, grouped aggregation, sort/limit —
exactly the shapes a 100-TB analytics workload is made of.

Scale design notes (local[32] correctness ≠ the goal; the plan shape is):

- Dimension joins (region, nation, supplier) are explicitly ``F.broadcast`` —
  at any scale those sides stay KB-MB, so the fact table never shuffles for
  them.  ``customer ⋈ orders`` and ``orders ⋈ lineitem`` are left to
  Catalyst/AQE: at small SF they auto-broadcast; at 100 TB AQE picks
  sort-merge with skew splitting, which is correct.
- Filters are expressed on base columns before joins so Catalyst pushes them
  into the parquet scan (``PushedFilters`` in ``explain``), and only the
  referenced columns are read (``ReadSchema``).
- Aggregates use :mod:`..functions.exact` fixed-point sums: deterministic
  across partitioning *and* exact (integer-cents semantics), so results are
  reproducible on 1 partition or 10 000.

Every query aliases its output columns identically to its oracle SQL twin
(driver hash-compares by sorted column name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DAVG_SQL, DSUM_SQL, davg, dsum
from ..io.tables import load_table

# -- q1_pricing_summary: scan + filter + 8-agg groupBy (TPC-H Q1 shape) -------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 4).alias("sum_charge"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {DSUM_SQL('l_quantity', 2)} AS sum_qty,
       {DSUM_SQL('l_extendedprice', 2)} AS sum_base_price,
       {DSUM_SQL('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
       {DSUM_SQL('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 4)} AS sum_charge,
       {DAVG_SQL('l_quantity', 2)} AS avg_qty,
       {DAVG_SQL('l_extendedprice', 2)} AS avg_price,
       {DAVG_SQL('l_discount', 2)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# -- q3_shipping_priority: 3-way join + agg + deterministic top-10 ------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = "1998-03-15"
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(cutoff))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(cutoff))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       {DSUM_SQL('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

# -- q5_local_supplier: 6-way join, broadcast dims, agg + sort (flagship) -----


def q5_local_supplier(spark: SparkSession, sf_dir: str, region: str = "EUROPE") -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = f"""
SELECT n_name,
       {DSUM_SQL('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""

# -- q7_volume_shipping: two-nation trade flow (TPC-H Q7 shape) ---------------

Q7_NATIONS = ("NATION_1", "NATION_2")
Q7_YEARS = (1999, 2000)


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between two nations, by (supplier nation,
    customer nation, ship year) — a 6-table snowflake where BOTH nation
    roles join the same dimension.  The nation dim broadcasts twice under
    different aliases; the OR-of-two-direction filter sits on the joined
    pair so Catalyst can push each leg; the fact tables meet in AQE's
    choice of join.  Fixed-point revenue keeps the hash exact."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate").isin(*Q7_YEARS)
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    a, b = Q7_NATIONS
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(su, li["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(n1), su["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(rev, 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {DSUM_SQL("l_extendedprice * (1 - l_discount)", 4)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE year(l_shipdate) IN {Q7_YEARS}
  AND ((n1.n_name = '{Q7_NATIONS[0]}' AND n2.n_name = '{Q7_NATIONS[1]}')
    OR (n1.n_name = '{Q7_NATIONS[1]}' AND n2.n_name = '{Q7_NATIONS[0]}'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# -- q8_market_share: conditional-share snowflake (TPC-H Q8 shape) ------------

Q8_REGION = "EUROPE"
Q8_NATION = "NATION_3"
Q8_TYPE = "PROMO"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part revenue sold to one
    region's customers, per order year — the conditional-aggregate-ratio
    shape (CASE inside SUM).  Share ships as one double division of two
    exact scaled-long sums (identical operands both engines → identical
    IEEE quotient), keeping the hash comparison strict."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    vol = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    j = (
        li.join(F.broadcast(part.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(su, li["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(n_c), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(n_s), su["s_nationkey"] == F.col("sn_key"))
        .join(
            F.broadcast(r.select("r_regionkey")),
            F.col("cr_key") == F.col("r_regionkey"),
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(F.lit(0))
    )
    den = F.sum(vol)
    return (
        j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            num.alias("_num"),
            den.alias("_den"),
        )
        .select(
            "o_year",
            (F.col("_num").cast("double") / F.col("_den").cast("double")).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
WITH j AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS vol,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN vol ELSE 0 END) AS DOUBLE)
         / CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM j
GROUP BY 1
ORDER BY 1
"""


# -- q9_product_profit: per-nation-year profit (TPC-H Q9 shape) ---------------

Q9_NAME_FRAGMENT = "red"


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on parts whose name contains a fragment,
    by (supplier nation, order year).  The testdata has no ``partsupp``
    table, so supply cost is proxied as ``0.6 · p_retailprice`` — the
    shape is what matters: a substring filter on the part dim that
    CANNOT be pushed as a range predicate (contains, not prefix), two
    broadcast dims (part pre-filtered, nation), the orders/lineitem fact
    join left to AQE, and a two-key rollup.  Reference parity: none —
    extension (TPC-H family: Q1/Q3/Q5/Q7/Q8 + this).
    """
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(Q9_NAME_FRAGMENT))
        .select("p_partkey", "p_retailprice")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation")
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(su, li["l_suppkey"] == su["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), su["s_nationkey"] == F.col("nk"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(dsum(amount, 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {DSUM_SQL("l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity", 4)} AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_NAME_FRAGMENT}%'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


QUERIES = {
    "q9_product_profit": q9_product_profit,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
}

ORACLES = {
    "q9_product_profit": Q9_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
}
