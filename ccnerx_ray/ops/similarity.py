"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k is the exactness baseline: the (small) query
matrix is broadcast once via ``ray.put``; every batch computes a numpy
matmul against it and emits its LOCAL top-k per query; a final
``groupby(query_id)`` merges local top-ks into the global top-k — the
classic partial-topk-then-merge shape, so the shuffle carries only
``n_queries × k × n_blocks`` rows, never the corpus.

The scale path is the centroid-partitioned IVF store
(:func:`ivf_build_store` / :func:`ivf_knn_store`): vectors are routed
ONCE to their nearest seeded centroid and written as partitioned Parquet
(``shard=<list_id>/``); a probe reads ONLY the ``nprobe`` partitions its
queries route to — a partition-pruned ``read_parquet`` — so at corpus
scale the index saves IO, not just compute. :func:`ivf_knn` is the
store-less single-pass variant (same routing, but it must still scan
every vector; kept as the ad-hoc/no-materialization path and as the
machinery oracle via ``nprobe = n_centroids``).

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


def _matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    """Arrow ``list<float>`` column → float64 [n, dim] matrix via a flat
    buffer copy (no per-row Python loop; all rows share one dim)."""
    flat = batch.column(vec_col).combine_chunks()
    V = flat.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = V.size // max(1, batch.num_rows)
    return V.reshape(batch.num_rows, dim)


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
        ids = batch.column(id_col).combine_chunks().to_numpy().astype(np.int64)
        V = _normalize(_matrix(batch, vec_col))
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
    # buckets each query probes, as a [nq, n_centroids] bool membership
    # matrix — the per-batch mask is then one fancy-index, no Python loop
    probe = np.argsort(-(Q @ C.T), axis=1, kind="stable")[:, :nprobe]
    allowed = np.zeros((len(Q), C.shape[0]), dtype=bool)
    allowed[np.arange(len(Q))[:, None], probe] = True
    c_ref, q_ref = ray.put(C), ray.put((Q, qids, allowed))

    def local_topk(batch: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        Qm, qid_list, allow = ray.get(q_ref)
        ids = batch.column(id_col).combine_chunks().to_numpy().astype(np.int64)
        V = _normalize(_matrix(batch, vec_col))
        assign = np.argmax(V @ Cm.T, axis=1)
        sims = np.where(allow[:, assign], Qm @ V.T, -np.inf)
        oq, ov, oc = [], [], []
        for qi in range(Qm.shape[0]):
            row = sims[qi]
            n_ok = int(np.isfinite(row).sum())
            if not n_ok:
                continue
            idx = np.lexsort((ids, -row))[:min(k, n_ok)]
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


def ivf_build_store(ds, store_dir: str, vec_col: str = "embedding",
                    id_col: str = "vec_id", n_centroids: int = 16,
                    n_iter: int = 5, sample_limit: int = 4096,
                    seed: int = 11) -> dict:
    """Route every vector ONCE to its nearest seeded centroid and write a
    centroid-partitioned Parquet store (``shard=<list_id>/``), so probes
    become partition-pruned reads instead of corpus scans.

    This is the scale form of the reference's candidate similarity search
    (``CC/loaders/utils/label_counter.py:56-68`` ranks candidates against
    the full in-memory matrix — fine for its label vocab, fatal at 10^12
    rows): at 100 TB an ANN index must skip *IO*, and the only way Ray
    Data skips IO is partition pruning at ``read_parquet``.

    Layout: ``shard`` is the hive partition column (one directory per
    inverted list); ``list_id`` is ALSO kept as a regular data column so
    probe-side masking never depends on hive-path parsing. The coarse
    quantizer (the centroid matrix) and a build lineage ledger
    (rows/bytes per list) land next to the data as
    ``_ivf_centroids.npz`` / ``_lineage/build.json``.

    One corpus scan total: assignment is one [B, dim] @ [dim, C] matmul
    per batch inside ``map_batches`` and the write streams out sharded —
    nothing corpus-scale is materialized or shuffled (the hive write
    splits blocks by partition value; no all-to-all exchange)."""
    import glob
    import json
    import os

    import ray

    C = kmeans_centroids(ds, vec_col, n_centroids, n_iter=n_iter,
                         sample_limit=sample_limit, seed=seed)
    c_ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        Cm = ray.get(c_ref)
        a = np.argmax(_normalize(_matrix(batch, vec_col)) @ Cm.T, axis=1)
        a = a.astype(np.int64)
        batch = batch.append_column("list_id", pa.array(a, pa.int64()))
        return batch.append_column("shard", pa.array(a, pa.int64()))

    t0 = __import__("time").time()
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        store_dir, partition_cols=["shard"])
    np.savez(os.path.join(store_dir, "_ivf_centroids.npz"), C=C)

    lists = {}
    total_bytes = 0
    for d in sorted(glob.glob(os.path.join(store_dir, "shard=*"))):
        files = glob.glob(os.path.join(d, "*.parquet"))
        nbytes = sum(os.path.getsize(f) for f in files)
        total_bytes += nbytes
        lists[os.path.basename(d).split("=", 1)[1]] = {
            "files": len(files), "bytes": nbytes}
    summary = {"n_centroids": int(C.shape[0]), "dim": int(C.shape[1]),
               "seed": seed, "wall_s": __import__("time").time() - t0,
               "total_bytes": total_bytes, "lists": lists}
    os.makedirs(os.path.join(store_dir, "_lineage"), exist_ok=True)
    with open(os.path.join(store_dir, "_lineage", "build.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    return summary


def ivf_knn_store(store_dir: str, queries: np.ndarray,
                  query_ids: list[int] | None = None, k: int = 10,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  nprobe: int = 4):
    """Probe an :func:`ivf_build_store` store: read ONLY the union of the
    ``nprobe`` partitions the queries route to (partition-pruned
    ``read_parquet`` over explicit ``shard=<i>`` directories — unprobed
    bytes never leave storage), mask each batch to each query's own
    probed lists via the stored ``list_id`` column (no re-assignment
    matmul), emit per-batch local top-k and merge per query.

    Every probe appends a lineage record to ``_lineage/probe.json``
    carrying ``bytes_probed`` vs the store's ``bytes_total`` — the
    resumability/metrics ledger the north rule asks for, and the direct
    evidence that the index prunes the scan."""
    import json
    import os

    import ray
    import ray.data

    C = np.load(os.path.join(store_dir, "_ivf_centroids.npz"))["C"]
    with open(os.path.join(store_dir, "_lineage", "build.json")) as f:
        build = json.load(f)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(Q)))

    nprobe = min(nprobe, C.shape[0])
    probe = np.argsort(-(Q @ C.T), axis=1, kind="stable")[:, :nprobe]
    allowed = np.zeros((len(Q), C.shape[0]), dtype=bool)
    allowed[np.arange(len(Q))[:, None], probe] = True
    probed = sorted({int(x) for x in probe.ravel()})
    # explicit file list per probed list — pyarrow wants files when given
    # a path LIST, and an explicit list is the clearest pruning evidence
    import glob as _glob
    paths = [f for i in probed
             for f in sorted(_glob.glob(
                 os.path.join(store_dir, f"shard={i}", "*.parquet")))]

    bytes_probed = sum(build["lists"].get(str(i), {}).get("bytes", 0)
                       for i in probed)
    rec = {"nprobe": int(nprobe), "probed_lists": probed,
           "bytes_probed": bytes_probed,
           "bytes_total": build["total_bytes"],
           "read_fraction": (bytes_probed / build["total_bytes"]
                             if build["total_bytes"] else 1.0)}
    with open(os.path.join(store_dir, "_lineage", "probe.json"), "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)

    ds = ray.data.read_parquet(paths, columns=[id_col, vec_col, "list_id"])
    q_ref = ray.put((Q, qids, allowed))

    def local_topk(batch: pa.Table) -> pa.Table:
        Qm, qid_list, allow = ray.get(q_ref)
        ids = batch.column(id_col).combine_chunks().to_numpy().astype(np.int64)
        lists = batch.column("list_id").combine_chunks().to_numpy()
        V = _normalize(_matrix(batch, vec_col))
        sims = np.where(allow[:, lists], Qm @ V.T, -np.inf)
        oq, ov, oc = [], [], []
        for qi in range(Qm.shape[0]):
            row = sims[qi]
            n_ok = int(np.isfinite(row).sum())
            if not n_ok:
                continue
            idx = np.lexsort((ids, -row))[:min(k, n_ok)]
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
