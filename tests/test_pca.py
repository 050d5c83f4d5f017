"""Distributed PCA (llm/pca.py) vs a single-node numpy reference, plus
the ANN-preprocessing property the operator exists for."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.tables import load_table
from datalake2anomali_spark.llm.pca import pca_project, pca_train, second_moments


def _vectors(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    return (
        [r["vec_id"] for r in rows],
        np.asarray([r["embedding"] for r in rows], dtype="float64"),
    )


def test_moments_match_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").repartition(7)
    _, x = _vectors(spark, sf_dir)
    n, s, ss = second_moments(emb)
    assert n == x.shape[0]
    assert np.allclose(s, x.sum(axis=0), rtol=1e-9)
    assert np.allclose(ss, x.T @ x, rtol=1e-9)


def test_pca_matches_numpy_reference(spark, sf_dir):
    """Components span the same subspace and order as numpy PCA on the
    collected matrix; projections agree."""
    emb = load_table(spark, sf_dir, "embeddings").repartition(5)
    _, x = _vectors(spark, sf_dir)
    k = 8
    model = pca_train(emb, k)

    mean_ref = x.mean(axis=0)
    cov_ref = np.cov(x, rowvar=False, bias=True)
    evals_ref, evecs_ref = np.linalg.eigh(cov_ref)
    order = np.argsort(evals_ref)[::-1][:k]
    comps_ref = evecs_ref[:, order].T
    assert np.allclose(model["mean"], mean_ref, atol=1e-8)
    assert np.allclose(
        model["explained_variance"], evals_ref[order], rtol=1e-6
    )
    got = np.asarray(model["components"])
    # sign-insensitive per-component comparison (reference signs are
    # arbitrary; the model's are canonicalized)
    for i in range(k):
        dot = abs(float(got[i] @ comps_ref[i]))
        assert dot == pytest.approx(1.0, abs=1e-6)
    # canonical sign invariant: largest-|coordinate| positive
    for row in got:
        assert row[int(np.argmax(np.abs(row)))] > 0

    proj = {
        r["vec_id"]: np.asarray(r["pca"])
        for r in pca_project(emb, model).select("vec_id", "pca").collect()
    }
    ids, _ = _vectors(spark, sf_dir)
    want = (x - mean_ref) @ got.T
    for i, vid in enumerate(ids):
        assert np.allclose(proj[vid], want[i], atol=1e-4)


def test_whitening_unit_variance(spark, sf_dir):
    """Whitened components have ~unit variance on the real corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_train(emb, 16)
    w = pca_project(emb, model, whiten=True)
    mat = np.asarray(
        [r["pca"] for r in w.select("pca").collect()], dtype="float64"
    )
    var = mat.var(axis=0)
    assert np.allclose(var, 1.0, atol=1e-3)


def test_low_rank_data_keeps_ann_neighborhoods(spark):
    """On data whose signal lives in a low-dim subspace (the case PCA
    truncation exists for — the sf embeddings are near-isotropic, where
    truncation rightly loses neighbors), projecting to the signal rank
    preserves cosine top-k almost exactly."""
    rng = np.random.default_rng(7)
    d, r, n = 64, 6, 400
    basis = rng.standard_normal((r, d))
    x = rng.standard_normal((n, r)) @ basis + 0.01 * rng.standard_normal((n, d))
    emb = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).repartition(6)
    # float32 storage round-trip: compare against what Spark holds
    x32 = np.asarray(
        [
            row["embedding"]
            for row in emb.orderBy("vec_id").select("embedding").collect()
        ],
        dtype="float64",
    )
    model = pca_train(emb, r)
    # the r components capture essentially all variance
    ev = np.asarray(model["explained_variance"])
    total_var = x32.var(axis=0).sum()
    assert ev.sum() / total_var >= 0.999
    p = np.asarray(
        [
            row["pca"]
            for row in pca_project(emb, model)
            .orderBy("vec_id")
            .select("pca")
            .collect()
        ],
        dtype="float64",
    )

    def topk(m, q, k=10):
        normed = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = normed @ normed[q]
        sims[q] = -np.inf
        return set(np.argsort(-sims)[:k])

    hits = total = 0
    for q in range(0, n, 20):
        exact = topk(x32, q)
        approx = topk(p, q)
        hits += len(exact & approx)
        total += len(exact)
    # the residual noise in the 58 dropped dims still perturbs near-ties,
    # so demand "almost all", not "all": ≥0.9 recall@10
    assert hits / total >= 0.9


def test_null_vectors_skipped_and_errors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    with_null = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 10 == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    n, _, _ = second_moments(with_null)
    assert n == emb.count() - emb.filter(F.col("vec_id") % 10 == 0).count()
    model = pca_train(with_null, 4)
    out = pca_project(with_null, model).filter(
        F.col("vec_id") % 10 == 0
    ).select("pca").collect()
    assert all(r["pca"] is None for r in out)  # NULLs pass through
    with pytest.raises(ValueError, match="k must be"):
        pca_train(emb, 0)
    with pytest.raises(ValueError, match="no vectors"):
        pca_train(emb.filter(F.lit(False)), 2)
