"""Driver-registered data-quality + reconciliation queries.

``data_quality_audit`` compiles a 5-constraint suite to one aggregate scan
plus one FK anti-join (``operators/quality.py: audit``); the oracle is the
naive one-subquery-per-constraint UNION ALL — a hash match proves the
single-scan compilation.  ``table_diff`` reconciles two derived snapshots
of ``orders`` via one null-safe full-outer join; the oracle is an
independent FULL OUTER JOIN + IS DISTINCT FROM formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.operators import quality


def lineitem_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style batch gate over lineitem: completeness, composite-key
    uniqueness, range, accepted values, and orders referential integrity —
    one scan + one anti-join, one row per constraint."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return quality.audit(
        li,
        checks=[
            quality.non_null("l_returnflag"),
            quality.unique("l_orderkey", "l_linenumber"),
            quality.in_range("l_quantity", 1, 50),
            quality.accepted("l_returnflag", "R", "A", "N"),
        ],
        foreign_keys=[("l_orderkey", orders, "o_orderkey")],
    )


AUDIT_SQL = """
WITH agg AS (
  SELECT COUNT(*) AS total,
         COUNT(l_returnflag) AS nn,
         COUNT(DISTINCT (l_orderkey, l_linenumber)) AS uniq,
         SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
                  THEN 1 ELSE 0 END) AS rng,
         SUM(CASE WHEN l_returnflag IN ('R','A','N') THEN 0 ELSE 1 END) AS acc
  FROM lineitem
), fk AS (
  SELECT COUNT(*) AS orphans
  FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT 'non_null:l_returnflag' AS check_name, CAST(nn AS BIGINT) AS observed,
       CAST(total AS BIGINT) AS expected, nn = total AS passed FROM agg
UNION ALL
SELECT 'unique:l_orderkey,l_linenumber', CAST(uniq AS BIGINT),
       CAST(total AS BIGINT), uniq = total FROM agg
UNION ALL
SELECT 'in_range:l_quantity:[1,50]', CAST(rng AS BIGINT),
       CAST(0 AS BIGINT), rng = 0 FROM agg
UNION ALL
SELECT 'accepted:l_returnflag', CAST(acc AS BIGINT),
       CAST(0 AS BIGINT), acc = 0 FROM agg
UNION ALL
SELECT 'foreign_key:l_orderkey', CAST(orphans AS BIGINT),
       CAST(0 AS BIGINT), orphans = 0 FROM fk
"""


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two deterministic derived snapshots of orders: 'old' is missing the
    keys ≡5 (mod 97) that arrive later; 'new' drops keys ≡3 (mod 89),
    bumps o_totalprice on ≡7 (mod 101) and rewrites o_orderpriority on
    ≡11 (mod 103)."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    old = orders.filter(k % 97 != 5)
    new = orders.filter(k % 89 != 3).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.when(k % 101 == 7, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
        F.when(k % 103 == 11, F.lit("X-DIFF"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    return old, new


def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style reconciliation of the two derived orders snapshots
    (``operators/quality.py: snapshot_diff``): added/removed/changed keys
    with per-row changed-column lists, one full-outer shuffle."""
    old, new = _snapshots(spark, sf_dir)
    return quality.snapshot_diff(old, new, keys=["o_orderkey"])


DIFF_SQL = """
WITH old AS (
  SELECT * FROM orders WHERE o_orderkey % 97 <> 5
), new AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 101 = 7 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate,
         CASE WHEN o_orderkey % 103 = 11 THEN 'X-DIFF'
              ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % 89 <> 3
), j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_custkey      IS DISTINCT FROM n.o_custkey
                OR o.o_orderstatus  IS DISTINCT FROM n.o_orderstatus
                OR o.o_totalprice   IS DISTINCT FROM n.o_totalprice
                OR o.o_orderdate    IS DISTINCT FROM n.o_orderdate
                OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
              THEN 'changed' END AS change_type,
         CASE WHEN o.o_orderkey IS NULL OR n.o_orderkey IS NULL THEN ''
              ELSE concat_ws(',',
                CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey THEN 'o_custkey' END,
                CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 'o_orderstatus' END,
                CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'o_totalprice' END,
                CASE WHEN o.o_orderdate IS DISTINCT FROM n.o_orderdate THEN 'o_orderdate' END,
                CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority THEN 'o_orderpriority' END)
         END AS changed_cols
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey, change_type, changed_cols FROM j WHERE change_type IS NOT NULL
"""


def fuzzy_customer_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over customer names
    (``operators/fuzzy.py: fuzzy_self_join``): every pair within edit
    distance 1, found by complete FastSS deletion-neighborhood blocking —
    the exhaustive-cross-join oracle hash-matching proves the blocked plan
    loses no pair."""
    from datalake2anomali_spark.operators.fuzzy import fuzzy_self_join

    return fuzzy_self_join(
        load_table(spark, sf_dir, "customer"), "c_custkey", "c_name"
    )


FUZZY_SQL = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS text_a, b.c_name AS text_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def fuzzy_part_match2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-2 entity resolution over document-prefix strings + planted
    misspellings (``operators/fuzzy.py: fuzzy_self_join_d2``): Pass-Join
    segment-pigeonhole blocking (one of 3 segments must appear verbatim
    within ±2 positions) plus the short-string band block — the
    exhaustive-cross-join oracle hash-matching proves the blocked plan
    loses no pair at radius 2, exactly the contract the k=1
    ``fuzzy_match`` row certifies for radius 1.

    The corpus is each document's 30-char text prefix (diverse,
    natural-text-shaped keys) plus one-edit clones of every 3rd document
    and two-edit clones of every 5th, so the result exercises
    dist ∈ {0, 1, 2} — planted pairs and organic collisions both.
    """
    from datalake2anomali_spark.operators.fuzzy import fuzzy_self_join

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr("substring(text, 1, 30)").alias("prefix")
    )
    base = d.select(F.col("doc_id").alias("id"), F.col("prefix").alias("txt"))
    one = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("id"),
        F.concat(F.lit("x"), F.expr("substring(prefix, 2)")).alias("txt"),
    )
    two = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("id"),
        F.concat(F.lit("xy"), F.expr("substring(prefix, 3)")).alias("txt"),
    )
    corpus = base.unionByName(one).unionByName(two)
    return fuzzy_self_join(corpus, "id", "txt", max_distance=2)


FUZZY2_SQL = """
WITH d AS (
  SELECT doc_id, substring(text, 1, 30) AS prefix FROM documents
), corpus AS (
  SELECT doc_id AS id, prefix AS txt FROM d
  UNION ALL
  SELECT doc_id + 10000000, 'x' || substring(prefix, 2) FROM d
  WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 20000000, 'xy' || substring(prefix, 3) FROM d
  WHERE doc_id % 5 = 0
)
SELECT a.id AS id_a, b.id AS id_b, a.txt AS text_a, b.txt AS text_b,
       CAST(levenshtein(a.txt, b.txt) AS INT) AS dist
FROM corpus a JOIN corpus b ON a.id < b.id
WHERE levenshtein(a.txt, b.txt) <= 2
"""


def setsim_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set similarity join (``operators/setsim.py``): all
    document pairs whose word-TRIGRAM-set Jaccard ≥ 0.8, found by
    AllPairs/PPJoin prefix filtering — rarest-token prefixes make the
    candidate equi-join complete with zero recall cap, the exact
    counterpart of the MinHash row.  Word trigrams, not words: this
    corpus's tiny vocabulary makes 1-gram sets near-identical across
    documents (quadratic result) and even bigrams too hot (~400 distinct
    over 5.7k docs) — trigrams restore the rarity prefix filtering
    feeds on; same low-entropy lesson as the fuzzy fixtures.  Clones of
    every 7th
    document (mutated head) guarantee true positives; the exhaustive
    cross-join oracle proves completeness.
    """
    from datalake2anomali_spark.operators.setsim import jaccard_self_join

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    clones = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("xx yy "), F.expr("substring(text, 7)")).alias("text"),
    )
    corpus = d.unionByName(clones)
    out = jaccard_self_join(corpus, "doc_id", "text", threshold=0.8, shingle=3)
    return out.select(
        "id_a",
        "id_b",
        F.col("inter").cast("long").alias("inter"),
        F.col("uni").cast("long").alias("uni"),
        "jaccard",
    )


SETSIM_SQL = r"""
WITH corpus AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, 'xx yy ' || substring(text, 7) FROM documents
  WHERE doc_id % 7 = 0
), w AS (
  SELECT id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM corpus
), t AS (
  SELECT id,
         list_distinct(list_transform(range(1, len(ws) - 1),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS toks
  FROM w WHERE len(ws) >= 3
), s AS (SELECT id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
       CAST(a.n + b.n - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS uni,
       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         / (a.n + b.n - len(list_intersect(a.toks, b.toks))) AS jaccard
FROM s a JOIN s b ON a.id < b.id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (a.n + b.n - len(list_intersect(a.toks, b.toks))) >= 0.8
"""


K_ANON_K = 5


def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity gate over customer quasi-identifiers (nation, market
    segment, account-balance kilo-bucket) — the pre-release privacy audit
    (``operators/quality.py: k_anonymity``): one row reporting class
    count, violating classes, rows at re-identification risk, and the
    smallest class.  The balance bucket makes violations real (exact
    balances would make every row unique; coarse buckets model the
    generalization step of an anonymization pipeline)."""
    from datalake2anomali_spark.operators.quality import k_anonymity

    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_k"),
    )
    return k_anonymity(c, ["c_nationkey", "c_mktsegment", "bal_k"], K_ANON_K)


K_ANON_SQL = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_k,
         COUNT(*) AS n
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN n < {K_ANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_classes,
       CAST(SUM(CASE WHEN n < {K_ANON_K} THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       CAST(MIN(n) AS BIGINT) AS min_class_size
FROM classes
"""


QUERIES = {
    "data_quality_audit": lineitem_audit,
    "table_diff": orders_snapshot_diff,
    "fuzzy_match": fuzzy_customer_match,
    "fuzzy_match2": fuzzy_part_match2,
    "setsim_join": setsim_documents,
    "k_anonymity": customer_k_anonymity,
}

ORACLES = {
    "data_quality_audit": AUDIT_SQL,
    "table_diff": DIFF_SQL,
    "fuzzy_match": FUZZY_SQL,
    "fuzzy_match2": FUZZY2_SQL,
    "setsim_join": SETSIM_SQL,
    "k_anonymity": K_ANON_SQL,
}
