"""Dimensionality reduction for embedding columns.

An embedding pipeline's ANN cost is linear in dimension; projecting
64/768-dim vectors to a compact PCA subspace before IVF/LSH is the
standard recall-for-throughput lever (and the uncompressed twin of the
SQ8 quantizer in ``operators.similarity``). Built Spark-first:

- the covariance fit is ONE Arrow mapInPandas pass emitting per-batch
  partial moments (n, sum, X^T X) — d x d matrices, independent of row
  count — reduced on the driver and eigendecomposed there (a d x d
  symmetric eigh is microseconds for any realistic d; the DATA never
  leaves executors);
- projection is a map-side Arrow matmul with the broadcast component
  matrix — no shuffle at all.

Sign convention: each component's largest-|coordinate| entry is made
positive, so the decomposition is reproducible run-to-run (eigh is
defined up to sign). Not SQL-expressible (eigendecomposition), so the
operator is pinned by pytest invariants (orthonormality, descending
explained variance, projection recall) instead of a DuckDB oracle.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(emb: DataFrame, k: int,
            vec_col: str = "embedding") -> Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
    """Fit a k-component PCA. Returns (mean[d], components[k, d],
    explained_variance[k]) as small driver-side arrays — model
    metadata, like KMeans centroids; the input rows never leave the
    executors (only d x d partials do)."""
    def partials(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            x = np.array(list(pdf["v"]), dtype=np.float64)
            yield pd.DataFrame({
                "n": [float(len(x))],
                "s": [x.sum(axis=0).tolist()],
                "g": [(x.T @ x).ravel().tolist()],
            })

    rows = (emb.select(F.col(vec_col).alias("v"))
            .mapInPandas(partials, schema="n double, s array<double>, "
                                          "g array<double>")
            .collect())
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                   # (k, d)
    # sign convention: largest-|coordinate| entry positive
    flips = np.sign(comps[np.arange(len(comps)),
                          np.abs(comps).argmax(axis=1)])
    comps = comps * np.where(flips == 0, 1.0, flips)[:, None]
    return mean, comps, np.maximum(evals[order], 0.0)


def pca_project(emb: DataFrame, mean: np.ndarray, components: np.ndarray,
                id_col: str = "vec_id", vec_col: str = "embedding",
                out_col: str = "pvec") -> DataFrame:
    """(id, out_col): map-side Arrow projection (X - mean) @ W^T with
    the broadcast component matrix — zero shuffle; feed the result to
    any ANN operator in ``operators.similarity``."""
    mu = np.asarray(mean, dtype=np.float64)
    w = np.asarray(components, dtype=np.float64)

    def project(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            x = np.array(list(pdf["v"]), dtype=np.float64)
            p = (x - mu) @ w.T
            yield pd.DataFrame({"id": pdf["id"],
                                "p": list(p)})

    return (emb.select(F.col(id_col).alias("id"),
                       F.col(vec_col).alias("v"))
            .mapInPandas(project, schema="id long, p array<double>")
            .select(F.col("id").alias(id_col),
                    F.col("p").alias(out_col)))


def procrustes_fit(old: DataFrame, new: DataFrame,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> np.ndarray:
    """Orthogonal Procrustes alignment between two embedding VERSIONS
    of the same ids: the rotation R (d_new x d_old) minimizing
    ||X_new @ R - X_old||_F over orthogonal matrices — the standard
    migration move when an embedding model is upgraded and the old
    ANN index / stored neighbors must stay comparable during the
    transition (Schönemann 1966: R = U V^T from the SVD of
    X_new^T X_old).

    Scale shape: exactly the ``pca_fit`` pattern — the paired join
    feeds ONE Arrow mapInPandas pass emitting per-batch d_new x d_old
    cross-moment partials; only those matrices reach the driver for
    the SVD (microseconds at any realistic d). Vectors never leave
    executors. Not SQL-expressible (SVD), so pinned by pytest
    invariants: orthogonality, planted-rotation recovery, and
    residual reduction on overlapping ids."""
    paired = (old.select(F.col(id_col).alias("i"),
                         F.col(vec_col).alias("xo"))
              .join(new.select(F.col(id_col).alias("i"),
                               F.col(vec_col).alias("xn")), "i"))

    def partials(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            xo = np.array(list(pdf["xo"]), dtype=np.float64)
            xn = np.array(list(pdf["xn"]), dtype=np.float64)
            yield pd.DataFrame({"m": [(xn.T @ xo).ravel().tolist()],
                                "dn": [float(xn.shape[1])]})

    rows = (paired.select("xo", "xn")
            .mapInPandas(partials, schema="m array<double>, dn double")
            .collect())
    if not rows:
        raise ValueError("procrustes_fit: no overlapping ids")
    d_new = int(rows[0]["dn"])
    m = np.sum([np.asarray(r["m"]) for r in rows], axis=0)
    m = m.reshape(d_new, -1)
    u, _, vt = np.linalg.svd(m)
    return u @ vt                                # (d_new, d_old)


def apply_rotation(emb: DataFrame, rotation: np.ndarray,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   out_col: str = "aligned") -> DataFrame:
    """Map-side Arrow matmul with the broadcast rotation — the
    ``pca_project`` shape; no shuffle at all."""
    r = np.asarray(rotation, dtype=np.float64)

    def project(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            x = np.array(list(pdf["v"]), dtype=np.float64)
            y = x @ r
            yield pd.DataFrame({"id": pdf["id"],
                                "out": [row.tolist() for row in y]})

    return (emb.select(F.col(id_col).alias("id"),
                       F.col(vec_col).alias("v"))
            .mapInPandas(project, schema="id long, out array<double>")
            .withColumnRenamed("id", id_col)
            .withColumnRenamed("out", out_col))
