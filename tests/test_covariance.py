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
