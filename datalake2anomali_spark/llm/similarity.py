"""Embedding similarity search: exact cosine top-k + LSH-bucketed ANN.

- ``cosine_topk`` is the exact baseline: query set broadcast against the
  corpus, dot/norms computed with a fixed-order fold over the vector arrays
  (deterministic, engine-independent), window rank per query.  At 100 TB the
  broadcast side is the (small) query set, the corpus scan stays partitioned
  and shuffle only happens for the per-query top-k (AQE-coalesced).
- ``ann_hyperplane_topk`` is the scale path: b random-hyperplane sign bits
  (planes generated once from a fixed seed, shipped as literals — no Python
  at eval time) bucket the corpus; each query only scores its own bucket.
  Approximation quality is pinned against the exact baseline in tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Fixed-order fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact brute-force top-k neighbors for each query vector.

    ``queries``: (query_id, query_vec); ``embeddings``: (vec_id, embedding).
    Similarity is rounded before ranking so ordering is stable across
    engines; ties break on vec_id.
    """
    joined = embeddings.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = F.round(cosine_sim(F.col("embedding"), F.col("query_vec")), round_digits)
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "sim")
    )


def hyperplane_planes(dim: int = 64, n_planes: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed, generated driver-side)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: the sign-bit string of the plane projections.

    Planes are embedded as array literals, so the projection is a codegen'd
    fold per plane — no Python, no shuffle; the bucket id is computable at
    scan time for both corpus and queries.
    """
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(x)) for x in p])
        proj = _dot(vec, plane)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _table_buckets(vec: Column, planes: list[list[float]], n_tables: int, bits: int) -> Column:
    """array<struct<table,bucket>> — one LSH bucket per hash table."""
    entries = []
    for t in range(n_tables):
        table_planes = planes[t * bits : (t + 1) * bits]
        entries.append(
            F.struct(
                F.lit(t).alias("table"), bucket_col(vec, table_planes).alias("bucket")
            )
        )
    return F.array(*entries)


def embedding_neardup_exact(
    embeddings: DataFrame, threshold: float = 0.95, round_digits: int = 6
) -> DataFrame:
    """All vector pairs with cosine similarity ≥ threshold (exact O(n²)).

    This is the small-corpus baseline / oracle twin; at 100 TB use
    ``embedding_neardup_lsh`` — the exact form exists so the approximate one
    has something to be measured against.  The self-join is a cross product
    restricted by ``id1 < id2``; Spark executes it as BroadcastNestedLoop
    when one side fits, which is exactly the regime where exact is viable.
    """
    a = embeddings.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("e1"))
    b = embeddings.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("e2"))
    sim = F.round(cosine_sim(F.col("e1"), F.col("e2")), round_digits)
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def embedding_neardup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 8,
    bits_per_table: int = 8,
    dim: int = 64,
    seed: int = 42,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding near-dup at scale: LSH-bucketed candidates + exact verify.

    High-cosine pairs collide in a table with probability (1-θ/π)^bits —
    for θ ≈ 18° (cos 0.95) and 8 bits that is ≈ 0.43 per table, ≈ 0.99
    across 8 tables.  Candidate generation is a self-equi-join on
    (table, bucket) — shuffle keyed by bucket, no cross product — then the
    exact cosine runs only on candidates.  False positives are removed by
    the verify step; false negatives bounded by the table count.
    """
    planes = hyperplane_planes(dim, n_tables * bits_per_table, seed)
    bucketed = embeddings.select(
        "vec_id",
        "embedding",
        F.explode(
            _table_buckets(F.col("embedding"), planes, n_tables, bits_per_table)
        ).alias("tb"),
    ).select("vec_id", "embedding", "tb.table", "tb.bucket")
    a = bucketed.select(
        "table", "bucket", F.col("vec_id").alias("id1"), F.col("embedding").alias("e1")
    )
    b = bucketed.select(
        "table", "bucket", F.col("vec_id").alias("id2"), F.col("embedding").alias("e2")
    )
    cands = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "e1", "e2")
        .distinct()
    )
    sim = F.round(cosine_sim(F.col("e1"), F.col("e2")), round_digits)
    return (
        cands.withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def ann_hyperplane_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 8,
    bits_per_table: int = 4,
    dim: int = 64,
    seed: int = 42,
    round_digits: int = 6,
) -> DataFrame:
    """ANN top-k via multi-table hyperplane LSH.

    Single-probe LSH recalls poorly when true neighbors sit at modest cosine
    similarity (P[same bucket] = (1-θ/π)^bits), so we use the standard L-table
    construction: candidates = union over L independent tables, then exact
    ranking on candidates only.  Candidate generation is an equi-join on
    (table, bucket) — never a cross product — and the per-corpus-row work is
    L×bits plane projections, all codegen'd.  Recall/cost tune via
    (n_tables, bits_per_table); the exact twin is ``cosine_topk``.
    """
    planes = hyperplane_planes(dim, n_tables * bits_per_table, seed)
    corpus_b = embeddings.select(
        "vec_id",
        "embedding",
        F.explode(_table_buckets(F.col("embedding"), planes, n_tables, bits_per_table)).alias("tb"),
    ).select("vec_id", "embedding", "tb.table", "tb.bucket")
    queries_b = queries.select(
        "query_id",
        "query_vec",
        F.explode(_table_buckets(F.col("query_vec"), planes, n_tables, bits_per_table)).alias("tb"),
    ).select("query_id", "query_vec", "tb.table", "tb.bucket")
    cands = (
        corpus_b.join(F.broadcast(queries_b), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "query_vec", "vec_id", "embedding")
        .distinct()
    )
    sim = F.round(cosine_sim(F.col("embedding"), F.col("query_vec")), round_digits)
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cands.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "sim")
    )
