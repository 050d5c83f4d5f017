"""Deterministic IOC-shaped inputs derived from the driver's tables.

The driver's DuckDB oracle can only see the ten pre-registered parquet views,
so the IOC pipeline's correctness gate works like this: derive bulk-search
rows (raw positional JSON arrays, exactly the reference's scan shape —
``/root/reference/src/Datalake2Anomali.py:327-343``) from ``customer`` with
pure deterministic column expressions that both Spark and DuckDB evaluate
identically, then run the REAL pipeline operators over them.  The oracle SQL
(in ``plans/ioc_queries.py``) repeats the same derivation as a CTE and the
same relational semantics in ANSI SQL, so a hash match verifies the whole
EP-A chain end-to-end.

Edge cases baked in (FIXTURES.md checklist):
- unknown atom types (``cve``/``asn``) → F2 discard
- ``file`` atoms with NULL md5 → F3 discard
- rows with absent tags element (arity-4), JSON-null tags, and real tags
- every 10th atom emitted under TWO query specs → O2 union-all, no dedup
- spec with NULL query_hash → F1 reject
- itype: spec override / default / both map levels
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .specs import QuerySpec, specs_df
from ..io.tables import load_table

# The four configured query specs; the last is invalid (F1 reject).
DERIVED_SPECS = [
    QuerySpec("qh-0", "dataset_alpha", "medium", {"domain": "custom_dom_itype", "md5": "custom_md5_itype"}),
    QuerySpec("qh-1", "dataset_beta", "high", None),
    QuerySpec("qh-2", "dataset_gamma", "low", {"srcip": "custom_ip_itype"}),
    QuerySpec(None, "dataset_bad", "low", None),
]

ATOM_TYPES = ["fqdn", "domain", "ip", "url", "email", "file", "cve", "asn"]


def derived_specs_df(spark: SparkSession) -> DataFrame:
    return specs_df(spark, DERIVED_SPECS)


def derive_bulk_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → (query_hash, raw JSON positional row).

    Every expression is a deterministic per-row string/arith op (identical
    IEEE/semantics in DuckDB), so both engines produce byte-identical raw
    rows.  Shape: ``[atom_type, atom_value, md5|null, [s1,s2,s3], tags?]``
    with the tags element absent when k%4==0.
    """
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    ks = k.cast("string")

    atype = ATOM_TYPES[-1]
    atype_col = F.lit(ATOM_TYPES[7])
    expr = None
    for i, t in enumerate(ATOM_TYPES[:-1]):
        cond = (k % 8) == i
        expr = F.when(cond, F.lit(t)) if expr is None else expr.when(cond, F.lit(t))
    atype_col = expr.otherwise(F.lit(atype))

    md5v = F.when(((k % 8) == 5) & ((k % 3) != 0), F.md5(F.concat(F.lit("h"), ks)))
    s1 = (k % 101).cast("string")
    s2 = ((k * 7) % 101).cast("string")
    s3 = ((k * 13) % 101).cast("string")
    tagsj = (
        F.when((k % 4) == 0, F.lit(None).cast("string"))
        .when((k % 4) == 1, F.lit("null"))
        .otherwise(
            F.concat(
                F.lit('["tag-'),
                (k % 5).cast("string"),
                F.lit('","seg-'),
                F.lower(F.col("c_mktsegment")),
                F.lit('"]'),
            )
        )
    )
    raw = F.concat(
        F.lit('["'),
        atype_col,
        F.lit('","atom-'),
        ks,
        F.lit('",'),
        F.coalesce(F.concat(F.lit('"'), md5v, F.lit('"')), F.lit("null")),
        F.lit(",["),
        s1,
        F.lit(","),
        s2,
        F.lit(","),
        s3,
        F.lit("]"),
        F.coalesce(F.concat(F.lit(","), tagsj), F.lit("")),
        F.lit("]"),
    )
    base = c.select(F.concat(F.lit("qh-"), (k % 3).cast("string")).alias("query_hash"), raw.alias("raw"), k.alias("k"))
    dup = c.filter((k % 10) == 0).select(
        F.concat(F.lit("qh-"), ((k + 1) % 3).cast("string")).alias("query_hash"),
        raw.alias("raw"),
        k.alias("k"),
    )
    return base.unionByName(dup).drop("k")


def derive_advisories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → WorldWatch-shaped advisories (SURVEY SRC4/FIXTURES B4)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.filter((k % 7) == 0).select(
        k.alias("id"),
        F.concat(F.lit("adv-"), k.cast("string")).alias("title"),
        F.col("o_orderdate").alias("timestamp_updated"),
        F.array(F.concat(F.lit("topic-"), (k % 4).cast("string"))).alias("tags"),
        F.concat(F.lit("<html>adv-"), k.cast("string"), F.lit("</html>")).alias("html"),
    )


def derive_existing_tipreports(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → sink-state tipreports (FIXTURES B5).

    Every 14th orderkey has a matching ``world_watch_{id}`` tag (UPDATE
    branch); every 11th is a noise row with unrelated tags (must not match).
    """
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    # modified_ts sits 2 years behind the order date so the incremental
    # cursor (max over sink state) lands mid-range and the "newer than
    # watermark" query keeps a non-trivial subset.
    shifted = F.col("o_orderdate") - F.expr("INTERVAL 2 YEARS")
    matched = o.filter((k % 14) == 0).select(
        (k + 1000000).alias("id"),
        F.array(
            F.lit("unrelated"),
            F.concat(F.lit("world_watch_"), k.cast("string")),
        ).alias("tags"),
        shifted.alias("modified_ts"),
    )
    noise = o.filter((k % 11) == 0).select(
        (k + 2000000).alias("id"),
        F.array(F.lit("other_tag")).alias("tags"),
        shifted.alias("modified_ts"),
    )
    return matched.unionByName(noise)
