"""SemDeDup (ops/dedup.py:semantic_dedup): exact-integer kmeans cluster
assignment + within-cluster min-id cosine keeper.

The reference implementation here is INDEPENDENT: its own micro
rounding, its own Lloyd loop over plain Python ints, its own O(n²)
pairwise cosine — none of the library's kernels."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ccnerx_ray.ops.dedup import semantic_dedup


def _ref_micro(v):
    return [int(np.sign(x) * np.floor(abs(x * 1e6) + 0.5)) for x in v]


def _ref_semantic_dedup(ids, vecs, k, n_iter, threshold):
    """Driver reference: exact-int Lloyd (init = k smallest ids,
    trunc-div updates, argmin ties to lowest cluster), one final
    assignment round, then the smaller-id within-cluster cosine rule."""
    order = np.argsort(ids)
    ids = [int(ids[i]) for i in order]
    X = [_ref_micro(vecs[i]) for i in order]
    C = [list(X[i]) for i in range(k)]           # k smallest ids lead

    def assign(x):
        best, bd = 0, None
        for c in range(len(C)):
            d = sum((xi - ci) ** 2 for xi, ci in zip(x, C[c]))
            if bd is None or d < bd:
                best, bd = c, d
        return best

    for _ in range(n_iter):
        a = [assign(x) for x in X]
        for c in range(k):
            members = [X[i] for i in range(len(X)) if a[i] == c]
            if members:
                s = [sum(col) for col in zip(*members)]
                n = len(members)
                C[c] = [int(np.sign(v) * (abs(v) // n)) for v in s]
    final = [assign(x) for x in X]
    V = np.asarray(vecs, dtype=np.float64)[order]
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    kept = []
    for i in range(len(ids)):
        dup = any(final[j] == final[i] and ids[j] < ids[i]
                  and float(V[j] @ V[i]) >= threshold
                  for j in range(len(ids)))
        kept.append(0 if dup else 1)
    return pd.DataFrame({"vec_id": ids, "cluster": final, "kept": kept})


def _fixture(n=60, dim=6, seed=3):
    """Three planted blobs + exact duplicate vectors inside each blob."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, dim)) * 3.0
    ids, vecs = [], []
    for i in range(n):
        c = i % 3
        v = centers[c] + rng.normal(size=dim) * 0.4
        if i >= n - 9:                     # exact dups of earlier points
            v = np.asarray(vecs[i - 9], dtype=np.float64)
        ids.append(i)
        vecs.append([float(x) for x in v])
    return ids, vecs


def _run(ray_session, ids, vecs, npartitions=1, **kw):
    import ray.data

    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": v} for i, v in zip(ids, vecs)])
    if npartitions > 1:
        ds = ds.repartition(npartitions)
    return (semantic_dedup(ds, **kw).to_pandas()
            .sort_values("vec_id").reset_index(drop=True)
            .astype({"vec_id": "int64", "cluster": "int64",
                     "kept": "int64"}))


def test_matches_independent_reference(ray_session):
    ids, vecs = _fixture()
    got = _run(ray_session, ids, vecs, k=4, n_iter=3, threshold=0.8)
    ref = (_ref_semantic_dedup(ids, vecs, k=4, n_iter=3, threshold=0.8)
           .astype({"vec_id": "int64", "cluster": "int64",
                    "kept": "int64"}))
    pd.testing.assert_frame_equal(got, ref)
    assert (got["kept"] == 0).sum() >= 9   # the planted dups all drop


def test_partitioning_invariance(ray_session):
    ids, vecs = _fixture(n=45, seed=11)
    one = _run(ray_session, ids, vecs, k=3, n_iter=2, threshold=0.8)
    many = _run(ray_session, ids, vecs, npartitions=7, k=3, n_iter=2,
                threshold=0.8)
    pd.testing.assert_frame_equal(one, many)


def test_min_id_keeper_on_identical_vectors(ray_session):
    # five copies of one vector + one orthogonal singleton
    vecs = [[1.0, 0.0]] * 5 + [[0.0, 1.0]]
    got = _run(ray_session, list(range(6)), vecs, k=2, n_iter=2,
               threshold=0.95)
    assert got.loc[got.vec_id == 0, "kept"].item() == 1
    assert (got.loc[got.vec_id.isin([1, 2, 3, 4]), "kept"] == 0).all()
    assert got.loc[got.vec_id == 5, "kept"].item() == 1


def test_all_distinct_all_kept(ray_session):
    rng = np.random.default_rng(5)
    vecs = [list(map(float, v)) for v in rng.normal(size=(12, 4)) * 2]
    got = _run(ray_session, list(range(12)), vecs, k=3, n_iter=2,
               threshold=0.9999)
    assert (got["kept"] == 1).all()
    assert len(got) == 12


def test_max_cluster_guard(ray_session):
    vecs = [[1.0, 0.0]] * 8
    with pytest.raises((ValueError, Exception)):
        _run(ray_session, list(range(8)), vecs, k=1, n_iter=1,
             threshold=0.9, max_cluster=4)


def test_cross_cluster_dups_survive(ray_session):
    # identical vectors would land in one cluster; near-identical points
    # split across clusters must BOTH be kept (within-cluster rule only)
    vecs = [[3.0, 0.0], [2.9, 0.1], [-3.0, 0.0], [-2.9, -0.1]]
    got = _run(ray_session, [0, 1, 2, 3], vecs, k=2, n_iter=2,
               threshold=0.5)
    # k-means with init = two smallest ids (both right-side points)
    # still separates the blobs after updates
    assert got.groupby("cluster").size().min() >= 1
    left = got[got.vec_id.isin([2, 3])]
    if left["cluster"].nunique() == 1 and \
            left["cluster"].iloc[0] != got.loc[got.vec_id == 0,
                                               "cluster"].iloc[0]:
        assert left.loc[left.vec_id == 2, "kept"].item() == 1
