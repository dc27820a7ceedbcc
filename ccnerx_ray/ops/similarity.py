"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k is the exactness baseline: the (small) query
matrix is broadcast once via ``ray.put``; every batch computes a numpy
matmul against it and emits its LOCAL top-k per query; a final
``groupby(query_id)`` merges local top-ks into the global top-k — the
classic partial-topk-then-merge shape, so the shuffle carries only
``n_queries × k × n_blocks`` rows, never the corpus.

The scale path is :func:`ivf_knn`: vectors are bucketed to seeded
centroids (IVF coarse quantizer); a query searches only its ``nprobe``
nearest buckets.

Outputs carry integer ``(query_id, vec_id, rank)`` plus float ``cosine``;
rank uses a deterministic tie-break (higher cosine first, then smaller
vec_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def knn_bruteforce(ds, queries: np.ndarray, query_ids: list[int] | None = None,
                   k: int = 10, vec_col: str = "embedding",
                   id_col: str = "vec_id"):
    """Exact cosine top-k: → ``(query_id, vec_id, rank, cosine)``."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(Q)))
    q_ref = ray.put(Q)

    def local_topk(batch: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        V = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                 for v in batch.column(vec_col).to_pylist()]))
        sims = Qm @ V.T                       # [nq, B]
        oq, ov, oc = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # deterministic local top-k: score desc, id asc
            idx = np.lexsort((ids, -row))[:kk]
            for j in idx:
                oq.append(qids[qi])
                ov.append(int(ids[j]))
                oc.append(float(row[j]))
        return pa.table({"query_id": pa.array(oq, pa.int64()),
                         "vec_id": pa.array(ov, pa.int64()),
                         "cosine": pa.array(oc, pa.float64())})

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = g.index + 1
        return g[["query_id", "vec_id", "rank", "cosine"]]

    local = ds.map_batches(local_topk, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(merge_topk,
                                                batch_format="pandas")


def kmeans_centroids(ds, vec_col: str = "embedding", n_centroids: int = 16,
                     n_iter: int = 5, sample_limit: int = 4096,
                     seed: int = 11) -> np.ndarray:
    """Driver-side seeded mini k-means over a bounded sample (the IVF
    coarse quantizer; the sample is the only materialized data)."""
    sample = ds.select_columns([vec_col]).limit(sample_limit).take_all()
    X = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                             for r in sample]))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(C.shape[0]):
            pts = X[assign == c]
            if len(pts):
                C[c] = pts.mean(axis=0)
        C = _normalize(C)
    return C


def ivf_knn(ds, queries: np.ndarray, query_ids: list[int] | None = None,
            k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id",
            n_centroids: int = 16, nprobe: int = 4, seed: int = 11):
    """IVF-style ANN: assign every vector to its nearest centroid bucket,
    search only the ``nprobe`` closest buckets per query. Approximate —
    recall grows with nprobe (== n_centroids gives exact)."""
    import ray

    C = kmeans_centroids(ds, vec_col, n_centroids, seed=seed)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(Q)))
    # buckets each query probes
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]          # [nq, nprobe]
    probe_sets = [set(map(int, row)) for row in probe]
    c_ref, q_ref = ray.put(C), ray.put((Q, qids, probe_sets))

    def local_topk(batch: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        Qm, qid_list, probes = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        V = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                 for v in batch.column(vec_col).to_pylist()]))
        assign = np.argmax(V @ Cm.T, axis=1)
        sims = Qm @ V.T
        oq, ov, oc = [], [], []
        for qi in range(Qm.shape[0]):
            mask = np.fromiter((int(a) in probes[qi] for a in assign),
                               dtype=bool, count=len(assign))
            if not mask.any():
                continue
            row = np.where(mask, sims[qi], -np.inf)
            kk = min(k, int(mask.sum()))
            idx = np.lexsort((ids, -row))[:kk]
            for j in idx:
                oq.append(qid_list[qi])
                ov.append(int(ids[j]))
                oc.append(float(row[j]))
        return pa.table({"query_id": pa.array(oq, pa.int64()),
                         "vec_id": pa.array(ov, pa.int64()),
                         "cosine": pa.array(oc, pa.float64())})

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = g.index + 1
        return g[["query_id", "vec_id", "rank", "cosine"]]

    local = ds.map_batches(local_topk, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(merge_topk,
                                                batch_format="pandas")


def group_centroids(ds, group_col: str = "label",
                    vec_col: str = "embedding"):
    """Mergeable per-group vector aggregate: for each group, the count
    and the element-wise sum of its embedding vectors in exact integer
    MICRO units (centroid ≈ sum_micro / (n · 1e6), left to the consumer
    so the emitted column stays an exact integer for the value-hash
    oracle).

    Integer convention: each component is rounded to micro units PER
    VALUE (half-away-from-zero, DuckDB ``round`` semantics) and summed
    as int64 — an order-free aggregate, immune to the float-summation
    association-order drift that round-at-the-end measurably hits (see
    ``ops/profile.py`` ``sum_micro``). The oracle mirrors it:
    ``sum(CAST(round(val*1e6) AS BIGINT))``.

    Shape: per-batch PARTIAL sums (a pandas groupby over a numpy matrix —
    one row per (group, batch), never one per vector) → tiny final merge
    on the group key. The shuffle carries ``n_groups × n_blocks`` partial
    rows of ``dim`` int64s; the corpus never moves. Output is long-form
    ``(label, dim, n, sum_micro)`` — ``n_groups × dim`` rows.

    Used for: class centroids (diversity sampling, dataset cartography),
    IVF coarse-quantizer refinement, per-source embedding drift checks.
    Assumes group cardinality ≪ corpus size (true for labels/sources);
    extreme-cardinality grouping belongs to ``coarse_grouped``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch.column(group_col).to_pylist())
        flat = batch.column(vec_col).combine_chunks()
        V = flat.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = V.size // max(1, batch.num_rows)
        V = V.reshape(batch.num_rows, dim)
        # micro-round per VALUE (half-away-from-zero = DuckDB round), then
        # sum int64: bit-exact under any association order
        Vm = (np.sign(V) * np.floor(np.abs(V * 1e6) + 0.5)).astype(np.int64)
        df = pd.DataFrame(Vm)
        df["_g"] = labels
        agg = df.groupby("_g", sort=False).agg(["sum", "size"])
        sums = agg.xs("sum", axis=1, level=1).to_numpy().astype(np.int64)
        ns = agg.xs("size", axis=1, level=1).to_numpy()[:, 0]
        return pa.table({
            group_col: pa.array(agg.index.to_numpy(), pa.int64()),
            "n": pa.array(ns.astype(np.int64), pa.int64()),
            "vsum": pa.array(list(sums), pa.list_(pa.int64())),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(g["vsum"].to_numpy()).astype(np.int64)
        total = M.sum(axis=0)
        n = int(g["n"].sum())
        dim = total.size
        return pd.DataFrame({
            group_col: np.full(dim, g[group_col].iloc[0], dtype=np.int64),
            "dim": np.arange(1, dim + 1, dtype=np.int64),
            "n": np.full(dim, n, dtype=np.int64),
            "sum_micro": total,
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(group_col).map_groups(merge, batch_format="pandas")
