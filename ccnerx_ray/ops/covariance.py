"""Exact distributed second-moment (Gram/covariance) sums over an
embedding column — the primitive behind PCA, whitening and feature
diagnostics at corpus scale. One scan; each batch contributes a
``d(d+1)/2 + d + 1``-row integer partial (upper-triangle products, per-dim
sums, row count) and the reduce is a plain keyed sum — no matrix ever
crosses the shuffle, no driver materialization of the corpus.

Exactness ledger: vectors micro-ize under the proven kmeans contract
(``round(x·10⁶)`` half-away-from-zero — ``ops/cluster.py:_micro``, the
same ``pts`` CTE in SQL); products accumulate in NATIVE int64 matmul
(numpy integer matmul is exact in-range: |x| ≤ ~2·10⁶ micro ⇒ per-batch
Σ ≤ 4096·4·10¹² ≈ 1.6·10¹⁶ ≪ 2⁶³, and the corpus total stays int64-safe
to ~10⁶ rows at unit scale — past that swap the partials to the
arbitrary-precision string carry ``ops/profile.py:key_skew`` uses for
Σc², documented not silent). Emitted rows are ints only, so the whole
moment table value-hashes.

Output long form (1-based dims): ``(dim_i, dim_j, s)`` with
``dim_j ≥ dim_i ≥ 1`` carrying ``Σ x_i·x_j``; ``(dim_i, 0)`` carrying
``Σ x_i``; ``(0, 0)`` carrying the row count. Covariance derives as
``s_ij/n − (s_i/n)(s_j/n)`` (float, driver-side, d×d — tiny)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ccnerx_ray.functions.grouping import grouped_reduce
from ccnerx_ray.ops.cluster import _micro


def embedding_moment_sums(ds, vec_col: str = "embedding",
                          num_buckets: int = 8):
    """→ reduced ``(dim_i, dim_j, s)`` integer moment table (see module
    docstring for the layout and exactness ledger)."""

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"dim_i": pa.array([], pa.int64()),
                             "dim_j": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        flat = batch.column(vec_col).combine_chunks()
        V = flat.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64)
        Xm = _micro(V).reshape(n, -1)
        d = Xm.shape[1]
        G = Xm.T @ Xm                         # exact int64 matmul
        iu = np.triu_indices(d)
        sums = Xm.sum(axis=0)
        dim_i = np.concatenate([iu[0] + 1,
                                np.arange(1, d + 1, dtype=np.int64),
                                [0]])
        dim_j = np.concatenate([iu[1] + 1,
                                np.zeros(d, dtype=np.int64), [0]])
        s = np.concatenate([G[iu], sums, [n]])
        return pa.table({"dim_i": pa.array(dim_i.astype(np.int64)),
                         "dim_j": pa.array(dim_j.astype(np.int64)),
                         "s": pa.array(s.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_reduce(parts, ["dim_i", "dim_j"], {"s": "sum"},
                          num_buckets=num_buckets,
                          out_dtypes={"dim_i": "int64", "dim_j": "int64",
                                      "s": "int64"})


def covariance_from_moments(moments_df) -> np.ndarray:
    """Driver-side d×d covariance from the reduced moment table (a
    pandas frame of the :func:`embedding_moment_sums` output —
    ``d(d+1)/2 + d + 1`` rows, tiny). Population covariance
    ``E[xy] − E[x]E[y]`` in micro² units."""
    rows = {(int(a), int(b)): int(c) for a, b, c in
            zip(moments_df["dim_i"], moments_df["dim_j"],
                moments_df["s"])}
    n = rows[(0, 0)]
    d = max(i for i, j in rows if j == 0 and i > 0)
    mu = np.array([rows[(i, 0)] / n for i in range(1, d + 1)])
    C = np.zeros((d, d))
    for i in range(1, d + 1):
        for j in range(i, d + 1):
            c = rows[(i, j)] / n - mu[i - 1] * mu[j - 1]
            C[i - 1, j - 1] = C[j - 1, i - 1] = c
    return C


def pca_components(ds, n_components: int = 4,
                   vec_col: str = "embedding", num_buckets: int = 8):
    """PCA from the distributed moment table: ONE corpus scan
    (:func:`embedding_moment_sums` — integer partials, keyed-sum
    reduce), then a driver-side eigendecomposition of the tiny d×d
    covariance. Returns ``(components, mean_micro, explained_var)``:
    ``components`` is d×p (orthonormal, eigenvalue-descending, sign
    fixed so each component's largest-|entry| coordinate is positive —
    eigenvectors are sign-ambiguous, the convention makes runs
    reproducible), ``mean_micro`` the per-dim mean in micro units,
    ``explained_var`` the top-p eigenvalues (micro² units). The corpus
    is never materialized; everything past the moment reduce is d×d."""
    moments = embedding_moment_sums(ds, vec_col=vec_col,
                                    num_buckets=num_buckets).to_pandas()
    C = covariance_from_moments(moments)
    d = C.shape[0]
    if not 1 <= n_components <= d:
        raise ValueError(f"n_components must be in [1, {d}], "
                         f"got {n_components}")
    rows = {(int(a), int(b)): int(c) for a, b, c in
            zip(moments["dim_i"], moments["dim_j"], moments["s"])}
    n = rows[(0, 0)]
    mean = np.array([rows[(i, 0)] / n for i in range(1, d + 1)])
    w, U = np.linalg.eigh(C)                 # ascending eigenvalues
    order = np.argsort(w)[::-1][:n_components]
    comps = U[:, order].copy()
    for c in range(comps.shape[1]):
        jmax = int(np.argmax(np.abs(comps[:, c])))
        if comps[jmax, c] < 0:
            comps[:, c] = -comps[:, c]
    return comps, mean, w[order]


def pca_project(ds, components: np.ndarray, mean_micro: np.ndarray, *,
                vec_col: str = "embedding", id_col: str = "vec_id"):
    """Project the embedding column onto fitted PCA components → long
    form ``(vec_id, comp, z)`` (1-based comp, float64 scores in micro
    units). A PURE MAP — the d×p component matrix rides the closure;
    no shuffle, no state, no driver corpus materialization. Fit with
    :func:`pca_components` (one scan), project with this (one scan):
    the classic two-pass PCA at corpus scale."""
    comps = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean_micro, dtype=np.float64)
    d, p = comps.shape

    def project(batch: pa.Table) -> pa.Table:
        V = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in batch.column(vec_col).to_pylist()])
        if batch.num_rows == 0:
            V = V.reshape(0, d)
        if V.ndim != 2 or V.shape[1] != d:
            raise ValueError(
                f"embedding width {V.shape[1:]} != fitted d {d}")
        Z = (_micro(V).astype(np.float64) - mu) @ comps
        ids = batch.column(id_col).combine_chunks()
        n = len(V)
        return pa.table({
            id_col: pa.array(np.repeat(
                ids.to_numpy(zero_copy_only=False), p)),
            "comp": pa.array(np.tile(np.arange(1, p + 1), n), pa.int64()),
            "z": pa.array(Z.reshape(-1), pa.float64()),
        })

    return ds.map_batches(project, batch_format="pyarrow")
