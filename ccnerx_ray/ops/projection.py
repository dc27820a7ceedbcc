"""Signed random projection (Johnson–Lindenstrauss, Achlioptas ±1
variant) — the dimensionality-reduction leg that runs BEFORE ANN /
clustering / dedup at corpus scale: a d_in-dim embedding column maps to
d_out ≪ d_in dims through a fixed ±1 sign matrix, preserving pairwise
distances to 1±ε with d_out = O(log n / ε²) (Achlioptas 2003: the
database-friendly ±1 projection needs no Gaussian sampling). At 100 TB
this is the difference between shipping 64-float vectors and 16-int
codes into every downstream shuffle.

Determinism ledger: inputs micro-ize under the proven kmeans contract
(``ops/cluster.py:_micro`` — ``round(x·10⁶)`` half away from zero, the
``pts`` CTE in SQL); the sign matrix derives entry-wise from sha256
(``s[i,j] = +1`` iff the 60-bit prefix of ``sha256(salt:i:j)`` is even
— 1-based dims, mirrored exactly in DuckDB); the projection is a
NATIVE int64 matmul, exact in-range (|x| ≤ ~2·10⁶ micro × d_in ≤ 4096
⇒ |y| ≤ ~10¹⁰ ≪ 2⁶³). Emitted values are ints only, so the projected
table value-hashes.

Scale shape: a PURE MAP — the (d_in × d_out) sign matrix is rebuilt
lazily once per task (d_in·d_out sha256 calls, thousands not millions,
~1 ms — cheaper than shipping it); no shuffle, no state, no driver
corpus materialization. Output is the repo's long-form integer convention
(``vec_id, dim, y`` with 1-based dims, the ``embedding_cov`` shape)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ccnerx_ray.ops.cluster import _micro


def rp_sign_matrix(d_in: int, d_out: int, salt: str = "rp") -> np.ndarray:
    """Deterministic ±1 sign matrix: entry (i, j) — 1-BASED, matching
    the SQL ``generate_series(1, d)`` mirror — is +1 iff the first 60
    bits of ``sha256(f"{salt}:{i}:{j}")`` are even."""
    if d_in < 1 or d_out < 1:
        raise ValueError(f"dims must be >= 1, got ({d_in}, {d_out})")
    S = np.empty((d_in, d_out), dtype=np.int64)
    for i in range(1, d_in + 1):
        for j in range(1, d_out + 1):
            h = int.from_bytes(
                hashlib.sha256(f"{salt}:{i}:{j}".encode()).digest()[:8],
                "big") >> 4
            S[i - 1, j - 1] = 1 if h % 2 == 0 else -1
    return S


def rp_project(ds, *, d_out: int = 16, d_in: int | None = None,
               salt: str = "rp",
               vec_col: str = "embedding", id_col: str = "vec_id"):
    """Project ``ds[vec_col]`` (list<float>, fixed width) to ``d_out``
    integer components → long-form ``(vec_id, dim, y)`` with
    ``y[j] = Σᵢ micro(x)[i] · s[i, j]`` (see module header). Pass
    ``d_in`` to PIN the input width — any deviating vector raises.
    With ``d_in=None`` the width is read from each task's first batch
    and later batches of that task must match; blocks land on
    independent tasks, so an unpinned ragged DATASET can silently
    project different rows at different widths — pin ``d_in`` whenever
    the input schema isn't already width-enforced."""

    state = {"S": None, "d_in": d_in}

    def project(batch: pa.Table) -> pa.Table:
        V = np.asarray(
            [np.asarray(v, dtype=np.float64)
             for v in batch.column(vec_col).to_pylist()])
        ids = batch.column(id_col)
        if V.ndim != 2:
            raise ValueError("ragged embedding widths in one batch")
        if state["d_in"] is not None and V.shape[1] != state["d_in"]:
            raise ValueError(
                f"embedding width {V.shape[1]} != pinned d_in "
                f"{state['d_in']}")
        if state["S"] is None:
            state["S"] = rp_sign_matrix(V.shape[1], d_out, salt)
            state["d_in"] = V.shape[1]
        Y = _micro(V) @ state["S"]          # exact int64 matmul in-range
        n = len(V)
        ids_rep = np.repeat(np.asarray(ids.to_pylist(), dtype=object),
                            d_out)
        return pa.table({
            id_col: pa.array(ids_rep.tolist(), type=ids.type),
            "dim": pa.array(np.tile(np.arange(1, d_out + 1), n),
                            pa.int64()),
            "y": pa.array(Y.reshape(-1), pa.int64()),
        })

    return ds.map_batches(project, batch_format="pyarrow")
