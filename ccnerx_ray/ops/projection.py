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


def rp_knn(ds, queries: np.ndarray, query_ids: list[int] | None = None,
           *, k: int = 10, m: int = 50, d_out: int = 16,
           salt: str = "rp", vec_col: str = "embedding",
           id_col: str = "vec_id"):
    """Two-stage ANN with random projection as the cheap stage — the
    JL counterpart of ``ops/rag.py:rag_rerank``'s quantized stage 1:
    candidate generation ranks the corpus by the EXACT-integer dot of
    d_out-dim projected vectors (16 ints shipped per row instead of 64
    floats), cutting to ``m`` candidates per query; stage 2 re-ranks
    ONLY those candidates by true cosine (the ``knn_bruteforce``
    normalized-dot contract) to the final ``k`` →
    ``(query_id, vec_id, rank)``.

    Scale shape: two corpus scans (projected scoring with per-block
    lossless top-m partials merged per query, then one vectorized pass
    that extracts candidate embeddings); everything past stage 1 is
    ≤ |queries|·m rows BY CONSTRUCTION, so the driver-side rerank is
    bounded the way ``rag_rerank``'s is. Exactness: stage-1 dots are
    native int64 matmuls (|pdot| ≤ d_out·(d_in·maxmicro)² — checked
    per batch, raises past 2⁶²; ~3·10¹⁷ for 64-dim unit-scale
    embeddings); candidate recall vs exact top-k is the two-stage
    trade-off, identical in both engines, so the result value-hashes."""
    import pandas as pd
    import ray

    from ccnerx_ray.ops.similarity import _matrix, _normalize

    if m < k:
        raise ValueError(f"m={m} candidates < k={k} results")
    Q = np.asarray(queries, dtype=np.float64)
    if Q.ndim != 2:
        raise ValueError("queries must be a 2-D matrix")
    qids = list(query_ids) if query_ids is not None else list(range(len(Q)))
    d_in = Q.shape[1]
    S = rp_sign_matrix(d_in, d_out, salt)
    Qp = _micro(Q) @ S                                  # (nq, d_out)
    q_ref = ray.put((Qp, qids))

    def local_topm(batch: pa.Table) -> pa.Table:
        Qpm, qids_ = ray.get(q_ref)
        ids = batch.column(id_col).combine_chunks().to_numpy().astype(
            np.int64)
        V = _matrix(batch, vec_col)
        if V.shape[1] != d_in:
            raise ValueError(
                f"embedding width {V.shape[1]} != query width {d_in}")
        Yp = _micro(V) @ S                              # (B, d_out)
        lim = (max(1, int(np.abs(Yp).max(initial=0)))
               * max(1, int(np.abs(Qpm).max(initial=0))) * d_out)
        if lim >= (1 << 62):
            raise OverflowError(
                "projected dot may exceed int64 — re-scale inputs or "
                "reduce d_out (module-header ledger)")
        sims = Qpm @ Yp.T                               # exact int64
        oq, ov, od = [], [], []
        mm = min(m, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = np.lexsort((ids, -row))[:mm]          # desc, id asc
            oq.extend([qids_[qi]] * len(idx))
            ov.extend(ids[idx].tolist())
            od.extend(row[idx].tolist())
        return pa.table({"query_id": pa.array(oq, pa.int64()),
                         "vec_id": pa.array(ov, pa.int64()),
                         "pdot": pa.array(od, pa.int64())})

    def merge_topm(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pdot", "vec_id"],
                          ascending=[False, True]).head(m)
        return g[["query_id", "vec_id"]]

    cand = (ds.map_batches(local_topm, batch_format="pyarrow")
            .groupby("query_id").map_groups(merge_topm,
                                            batch_format="pandas"))
    cand_rows = cand.take_all()        # ≤ nq·m rows BY CONSTRUCTION
    cand_by_q = {qid: np.sort(np.array(
        [r["vec_id"] for r in cand_rows if r["query_id"] == qid],
        dtype=np.int64)) for qid in qids}
    all_cand = np.unique(np.array(
        [r["vec_id"] for r in cand_rows], dtype=np.int64))
    cand_ref = ray.put(all_cand)

    def extract(batch: pa.Table) -> pa.Table:
        want = ray.get(cand_ref)
        ids = batch.column(id_col).combine_chunks().to_numpy().astype(
            np.int64)
        hit = np.isin(ids, want)
        if not hit.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             vec_col: pa.array(
                                 [], pa.list_(pa.float64()))})
        sub = batch.take(pa.array(np.nonzero(hit)[0]))
        V = _matrix(sub, vec_col)
        return pa.table({
            id_col: pa.array(ids[hit], pa.int64()),
            vec_col: pa.array([list(map(float, r)) for r in V],
                              pa.list_(pa.float64()))})

    emb_rows = ds.map_batches(extract,
                              batch_format="pyarrow").take_all()
    # ≤ |union of candidates| rows — the bounded stage boundary
    cid = np.array([r[id_col] for r in emb_rows], dtype=np.int64)
    CV = (np.stack([np.asarray(r[vec_col], dtype=np.float64)
                    for r in emb_rows])
          if emb_rows else np.zeros((0, d_in)))
    CVn = _normalize(CV) if len(CV) else CV
    Qn = _normalize(Q)
    out_q, out_v, out_r = [], [], []
    for qi, qid in enumerate(qids):
        mine = np.isin(cid, cand_by_q[qid])
        ids_q = cid[mine]
        sims = Qn[qi] @ CVn[mine].T if mine.any() else np.array([])
        idx = np.lexsort((ids_q, -sims))[:k]            # desc, id asc
        out_q.extend([qid] * len(idx))
        out_v.extend(ids_q[idx].tolist())
        out_r.extend(range(1, len(idx) + 1))
    return pd.DataFrame({"query_id": np.array(out_q, np.int64),
                         "vec_id": np.array(out_v, np.int64),
                         "rank": np.array(out_r, np.int64)})
