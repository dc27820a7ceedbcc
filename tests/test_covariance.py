"""Exact moment sums / covariance (ops/covariance.py): parity vs an
independent arbitrary-precision reference, partitioning invariance, and
a planted-correlation sanity check."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ccnerx_ray.ops.covariance import (covariance_from_moments,
                                       embedding_moment_sums)


def _ref_moments(vecs):
    """Python-int reference: own micro rounding, exact products."""
    X = [[int(np.sign(x) * np.floor(abs(x * 1e6) + 0.5)) for x in v]
         for v in vecs]
    d = len(X[0])
    out = {}
    for i in range(1, d + 1):
        for j in range(i, d + 1):
            out[(i, j)] = sum(r[i - 1] * r[j - 1] for r in X)
        out[(i, 0)] = sum(r[i - 1] for r in X)
    out[(0, 0)] = len(X)
    return out


def _run(ray_session, vecs, parts=1):
    import ray.data

    ds = ray.data.from_items([{"embedding": list(map(float, v))}
                              for v in vecs])
    if parts > 1:
        ds = ds.repartition(parts)
    df = embedding_moment_sums(ds).to_pandas()
    return {(int(a), int(b)): int(c)
            for a, b, c in zip(df.dim_i, df.dim_j, df.s)}


def test_matches_independent_reference(ray_session):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 5)) * 2.5
    assert _run(ray_session, vecs) == _ref_moments(vecs)


def test_partitioning_invariance(ray_session):
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(30, 4))
    assert _run(ray_session, vecs) == _run(ray_session, vecs, parts=7)


def test_covariance_recovers_planted_correlation(ray_session):
    rng = np.random.default_rng(5)
    z = rng.normal(size=400)
    vecs = np.stack([z, z + rng.normal(size=400) * 0.01,
                     rng.normal(size=400)], axis=1)
    df = pd.DataFrame([{"dim_i": a, "dim_j": b, "s": c} for
                       (a, b), c in _run(ray_session, vecs).items()])
    C = covariance_from_moments(df) / 1e12       # micro² → unit²
    assert C.shape == (3, 3)
    r01 = C[0, 1] / np.sqrt(C[0, 0] * C[1, 1])
    r02 = abs(C[0, 2]) / np.sqrt(C[0, 0] * C[2, 2])
    assert r01 > 0.99 and r02 < 0.2
    # numpy's own covariance agrees to micro precision
    ref = np.cov(vecs.T, bias=True)
    assert np.allclose(C, ref, atol=1e-4)


# ------------------------------------------------------------------- PCA
def test_pca_matches_numpy_reference(ray_session):
    import ray.data

    from ccnerx_ray.ops.cluster import _micro
    from ccnerx_ray.ops.covariance import pca_components, pca_project

    rng = np.random.default_rng(17)
    # planted dominant direction: component 1 must recover it
    u = rng.normal(size=6)
    u /= np.linalg.norm(u)
    X = rng.normal(size=(80, 6)) * 0.1 + np.outer(
        rng.normal(size=80) * 3.0, u)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": list(map(float, X[i]))}
         for i in range(len(X))]).repartition(5)
    comps, mean, var = pca_components(ds, n_components=3)
    M = _micro(X).astype(np.float64)
    C = np.cov(M, rowvar=False, bias=True)
    w, U = np.linalg.eigh(C)
    # eigenvalues match numpy's on the same micro data (descending)
    np.testing.assert_allclose(var, w[::-1][:3], rtol=1e-9)
    # top component recovers the planted direction (sign-free)
    assert abs(comps[:, 0] @ u) > 0.99
    # orthonormal
    np.testing.assert_allclose(comps.T @ comps, np.eye(3), atol=1e-12)
    # deterministic sign convention: largest-|entry| coordinate positive
    for c in range(3):
        j = int(np.argmax(np.abs(comps[:, c])))
        assert comps[j, c] > 0
    # projection equals the direct computation, any partitioning
    got = (pca_project(ds, comps, mean).to_pandas()
           .sort_values(["vec_id", "comp"]).reset_index(drop=True))
    Z = (M - mean) @ comps
    np.testing.assert_array_equal(
        got["z"].to_numpy().reshape(len(X), 3), Z)
    with pytest.raises(ValueError, match="n_components"):
        pca_components(ds, n_components=7)
