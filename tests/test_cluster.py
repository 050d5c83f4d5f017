"""Distributed spherical k-means (llm/cluster.py)."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def two_blob_embeddings(spark):
    # two well-separated unit directions with small deterministic jitter
    rng = np.random.RandomState(7)
    dim = 16
    a = np.zeros(dim); a[0] = 1.0
    b = np.zeros(dim); b[1] = 1.0
    rows = []
    for i in range(60):
        base = a if i < 30 else b
        v = base + 0.05 * rng.randn(dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separates_blobs_and_inertia_monotone(two_blob_embeddings):
    from datalake2anomali_spark.llm.cluster import embedding_kmeans

    asg, C, inertias = embedding_kmeans(two_blob_embeddings, k=2, n_iters=4)
    rows = asg.collect()
    assert len(rows) == 60
    by_cluster: dict[int, set[int]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
        assert 0.0 <= r.sim <= 1.0 + 1e-9
    # exactly the two planted blobs, perfectly separated
    assert sorted(len(v) for v in by_cluster.values()) == [30, 30]
    assert any(v == set(range(30)) for v in by_cluster.values())
    # Lloyd objective never increases
    eps = 1e-9 * max(abs(v) for v in inertias)
    assert all(b <= a + eps for a, b in zip(inertias, inertias[1:]))
    # centroids are unit-norm and near the planted directions
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)
    assert sorted(np.argmax(np.abs(C), axis=1).tolist()) == [0, 1]


def test_kmeans_clamps_k_to_corpus(spark):
    from datalake2anomali_spark.llm.cluster import embedding_kmeans

    tiny = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    asg, C, _ = embedding_kmeans(tiny, k=8, n_iters=2)
    assert len(C) <= 2
    assert asg.count() == 2
