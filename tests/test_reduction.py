"""PCA fit/project invariants — the no-oracle pins for ann_pca_topk."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from recdb_postgresql_spark.operators import reduction
from recdb_postgresql_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _toy(spark, n=300, d=8, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: variance concentrated in the first two axes
    scales = np.array([10.0, 5.0] + [0.5] * (d - 2))
    x = rng.normal(size=(n, d)) * scales + rng.normal(size=d)
    rows = [(i, x[i].tolist()) for i in range(n)]
    return (spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
            x)


def test_pca_components_orthonormal_and_variance_desc(spark):
    df, _ = _toy(spark)
    mean, comps, var = reduction.pca_fit(df, k=4)
    assert comps.shape == (4, 8)
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-8)
    assert all(var[i] >= var[i + 1] for i in range(3))
    # the dominant axes are recovered: component 0 is ~e0, 1 is ~e1
    assert abs(comps[0][0]) > 0.99 and abs(comps[1][1]) > 0.99


def test_pca_matches_numpy_reference(spark):
    df, x = _toy(spark)
    mean, comps, var = reduction.pca_fit(df, k=3)
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
    np.testing.assert_allclose(var, evals, rtol=1e-8)
    # projection reproduces numpy's, given the same components
    proj = {r.vec_id: np.asarray(r.pvec)
            for r in reduction.pca_project(df, mean, comps).collect()}
    ref = (x - x.mean(axis=0)) @ comps.T
    for i in range(0, 300, 37):
        np.testing.assert_allclose(proj[i], ref[i], atol=1e-9)


def test_pca_sign_convention_stable_across_partitioning(spark):
    df, _ = _toy(spark)
    _, c1, _ = reduction.pca_fit(df.repartition(13), k=3)
    _, c2, _ = reduction.pca_fit(df.repartition(2), k=3)
    # well-separated spectrum -> identical components either way
    np.testing.assert_allclose(c1, c2, atol=1e-6)


def test_pca_preserves_planted_near_duplicates(spark):
    """The dedup property the reduced space must keep: vectors that
    are near-identical in full space (the planted cos >= 0.95 pairs)
    stay near-identical after projection — a near-dup pass over pvec
    still finds them. (Full-space NEIGHBORHOOD recall is data-
    dependent: this testdata's spectrum is nearly flat, the documented
    worst case for variance-ranked truncation, so the invariant
    pinned here is pair preservation, which holds for ANY linear
    projection of near-equal vectors.)"""
    emb = load_table(spark, SF, "embeddings")
    base = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.limit(20).collect()}
    rng = np.random.default_rng(3)
    rows = [(int(i), v.tolist()) for i, v in base.items()]
    planted = []
    for i, v in base.items():
        dup = v + rng.normal(scale=0.02 * np.linalg.norm(v) / 8,
                             size=v.shape)
        rows.append((int(i) + 100000, dup.tolist()))
        planted.append((int(i), int(i) + 100000))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mean, comps, _ = reduction.pca_fit(df, k=16)
    proj = {r.vec_id: np.asarray(r.pvec) for r in
            reduction.pca_project(df, mean, comps).collect()}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    red = [cos(proj[a], proj[b]) for a, b in planted]
    assert min(red) >= 0.8


def test_pca_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        reduction.pca_fit(df, k=2)


def test_procrustes_recovers_planted_rotation(spark):
    """new = old @ Q^T for a planted orthogonal Q: the fit must
    recover R with new @ R == old (residual ~ float eps), and R must
    be orthogonal."""
    import numpy as np
    from recdb_postgresql_spark.operators.reduction import (
        apply_rotation, procrustes_fit)

    rng = np.random.RandomState(11)
    d, n = 8, 300
    q, _ = np.linalg.qr(rng.randn(d, d))       # planted rotation
    xo = rng.randn(n, d)
    xn = xo @ q.T
    old = spark.createDataFrame(
        [(i, xo[i].tolist()) for i in range(n)], ["vec_id", "embedding"])
    new = spark.createDataFrame(
        [(i, xn[i].tolist()) for i in range(n)], ["vec_id", "embedding"])
    r = procrustes_fit(old, new)
    assert np.allclose(r @ r.T, np.eye(d), atol=1e-9)      # orthogonal
    assert np.allclose(xn @ r, xo, atol=1e-8)              # aligned
    # distributed application matches
    aligned = {row["vec_id"]: np.array(row["aligned"]) for row in
               apply_rotation(new, r).collect()}
    assert np.allclose(aligned[0], xo[0], atol=1e-8)


def test_procrustes_reduces_residual_under_noise(spark):
    import numpy as np
    from recdb_postgresql_spark.operators.reduction import procrustes_fit

    rng = np.random.RandomState(3)
    d, n = 6, 200
    q, _ = np.linalg.qr(rng.randn(d, d))
    xo = rng.randn(n, d)
    xn = xo @ q.T + rng.randn(n, d) * 0.05      # noisy re-embed
    old = spark.createDataFrame(
        [(i, xo[i].tolist()) for i in range(n)], ["vec_id", "embedding"])
    new = spark.createDataFrame(
        [(i, xn[i].tolist()) for i in range(n)], ["vec_id", "embedding"])
    r = procrustes_fit(old, new)
    before = np.linalg.norm(xn - xo)
    after = np.linalg.norm(xn @ r - xo)
    assert after < 0.2 * before                 # alignment dominates
