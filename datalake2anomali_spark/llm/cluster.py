"""Distributed embedding clustering (spherical k-means) — the SemDeDup /
domain-discovery step of a training-data pipeline: cluster the corpus's
embeddings, then dedup/curate within clusters.

Relation to :func:`..llm.similarity.ivf_train_centroids`: the IVF trainer
fits a *coarse quantizer* from a bounded sample entirely driver-side —
right for an index, where centroid quality barely matters.  This module is
the full-corpus variant: every point participates in every Lloyd round, so
the result is the actual k-means fixed point the curation literature
assumes, while the driver only ever holds k×dim floats.

Scale design (per iteration, on a 1000-executor cluster):

- **Assignment is one map-only pass**: centroids ship to executors inside
  the Arrow UDF closure (k×dim ≈ KBs), each batch does one GEMM; no join,
  no shuffle.
- **Centroid update is one aggregation with map-side combine**: posexplode
  to (cluster, dim_pos, val) then groupBy(cluster, pos) — partial sums
  collapse each task's contribution to ≤ k×dim rows before the exchange,
  so the shuffle moves O(partitions × k × dim) rows regardless of corpus
  size.  The per-cluster inertia rides in the same aggregate (summed on
  the pos==0 stripe only) so each round is exactly ONE job over the data.
- **Driver state is k×dim** (the centroids) — never rows.

The reference has no clustering surface at all (it is an IOC connector,
``/root/reference/src/Datalake2Anomali.py``); this operator belongs to the
driver-mandated training-pipeline extension set (SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import ivf_train_centroids


def kmeans_assign_col(vec: Column, centroids: np.ndarray) -> Column:
    """``struct<cluster:int, sim:double>`` — nearest centroid by cosine and
    the attained similarity, one GEMM per Arrow batch."""
    Cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def f(v: pd.Series) -> pd.DataFrame:
        E = np.stack(v.to_numpy()).astype(np.float64)
        E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
        S = E @ Cn.T
        a = S.argmax(axis=1)
        return pd.DataFrame(
            {"cluster": a.astype(np.int32), "sim": S[np.arange(len(a)), a]}
        )

    return F.pandas_udf(f, "cluster int, sim double")(vec)


def embedding_kmeans(
    embeddings: DataFrame,
    k: int = 8,
    n_iters: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray, list[float]]:
    """Full-corpus spherical k-means.

    Init = the bounded-sample trainer (deterministic hash-sample, one Lloyd
    round driver-side); refinement = ``n_iters`` distributed rounds as in
    the module docstring.  Returns ``(assignments, centroids, inertias)``:
    assignments ``(id, cluster, sim)``, final unit-norm centroids, and the
    per-round total inertia ``Σ (1 - cos)`` — non-increasing by Lloyd's
    argument (assignment maximizes cos given centroids; the renormalized
    mean maximizes Σ cos given assignment), which callers can assert.

    Empty clusters keep their previous centroid (the FAISS convention).
    The source frame is scanned once per round — callers looping many
    rounds over a non-parquet source should persist it first; for parquet
    the pruned 2-column scan is cheaper than caching the corpus.
    """
    src = embeddings.select(id_col, vec_col)
    C = ivf_train_centroids(
        embeddings.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
        ),
        n_cells=k,
        n_iters=1,
        seed=seed,
    )
    k = len(C)  # trainer clamps k to its sample size
    dim = C.shape[1]
    inertias: list[float] = []
    for _ in range(n_iters):
        rows = (
            src.select(
                kmeans_assign_col(F.col(vec_col), C).alias("a"),
                F.posexplode(vec_col).alias("pos", "val"),
            )
            .groupBy(F.col("a.cluster").alias("cluster"), "pos")
            .agg(
                F.sum("val").alias("s"),
                F.count(F.lit(1)).alias("n"),
                # global stats ride the pos==0 stripe so inertia costs no
                # second pass: each point contributes its sim exactly once
                F.sum(F.when(F.col("pos") == 0, F.col("a.sim"))).alias("sim0"),
            )
            .collect()
        )
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        sim_sum = 0.0
        for r in rows:
            sums[r.cluster, r.pos] = r.s
            if r.pos == 0:
                counts[r.cluster] = r.n
                sim_sum += r.sim0 or 0.0
        inertias.append(float(counts.sum() - sim_sum))
        nonempty = counts > 0
        C = C.copy()
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    assignments = src.select(
        id_col,
        kmeans_assign_col(F.col(vec_col), C).alias("a"),
    ).select(id_col, F.col("a.cluster").alias("cluster"), F.col("a.sim").alias("sim"))
    return assignments, C, inertias
