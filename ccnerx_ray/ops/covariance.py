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
