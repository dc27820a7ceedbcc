"""Scalar quantization (SQ8) for embedding columns — the compression leg
of vector search at corpus scale.

At 100 TB the embedding table is usually the single largest artifact a
training-data pipeline carries (10^12 rows × 64-1024 float32 dims); the
standard fix (FAISS ``SQ8``, ScaNN's scalar path) is to store 1-byte
codes instead of 4-byte floats and rank candidates by the quantized
inner product. This module re-expresses that loop Ray-Data-first AND in
arithmetic that value-hashes against a SQL oracle:

* **Global symmetric scale**: ``amax = max(|x|)`` over every component —
  a pure max aggregate (no arithmetic, so float32 exactness survives),
  one corpus scan of blocks-scale partials.
* **Codes**: ``code = floor(x * 127.0 / amax)`` per component, an int in
  [-127, 127]. Two IEEE-754 double roundings, both mirrored exactly by
  DuckDB's ``floor(CAST(v AS DOUBLE) * 127.0 / amax)`` — multiply THEN
  divide, same association order on both sides.
* **Scoring**: the quantized inner product ``Σ code_q · code_v`` is an
  EXACT int64 (|dot| ≤ 127²·dim), so top-k under (qdot desc, vec_id asc)
  is deterministic and the whole quantize→score→rank loop is
  oracle-paired — unlike reconstruct-and-dot (ADC), whose float sums are
  association-order-dependent.

Scale shape: the scoring pass is the partial-topk-then-merge of
``ops/similarity.py:knn_bruteforce`` (the shuffle carries n_queries × k
× n_blocks rows, never the corpus); the store build is one scan writing
hive ``shard=`` partitions of ``list<int8>`` codes (4× smaller logical
width than float32 — the ledger records measured bytes), and probes read
codes only — the float table never leaves storage.

Reference anchor: the reference ranks label candidates against a full
in-memory float matrix (``CC/loaders/utils/label_counter.py:56-68``);
this is that ranking with the memory footprint a 10^12-row corpus
forces.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ccnerx_ray.ops.similarity import _matrix


def corpus_amax(ds, vec_col: str = "embedding") -> float:
    """Exact global ``max(|component|)`` in one scan: per-batch partial
    maxima (one row per block) → ``Dataset.max``. Max of float values
    involves no arithmetic, so the result is bit-identical to SQL's
    ``max(abs(v))`` over the same column."""

    def partial(batch: pa.Table) -> pa.Table:
        V = _matrix(batch, vec_col)
        m = float(np.abs(V).max()) if V.size else 0.0
        return pa.table({"amax": pa.array([m], pa.float64())})

    out = ds.map_batches(partial, batch_format="pyarrow").max("amax")
    return float(out) if out is not None else 0.0


def sq8_codes(V: np.ndarray, amax: float) -> np.ndarray:
    """``floor(V * 127.0 / amax)`` as int64 (all-zero when ``amax == 0``).
    ``V`` must be float64 (float32 inputs convert exactly); the two
    double roundings here are the SAME two the SQL mirror performs."""
    if amax == 0.0:
        return np.zeros(V.shape, dtype=np.int64)
    return np.floor(V * 127.0 / amax).astype(np.int64)


def _merge_topk_frame(k: int):
    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["qdot", "vec_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = g.index + 1
        return g[["query_id", "vec_id", "rank", "qdot"]]
    return merge_topk


def _local_topk_stage(q_ref, k: int, id_col: str, codes_of_batch):
    """Shared per-batch local-topk: integer code matmul + deterministic
    (score desc, id asc) cut, emitting at most k rows per query per
    block."""
    import ray

    def local_topk(batch: pa.Table) -> pa.Table:
        Qc, qids = ray.get(q_ref)
        ids = batch.column(id_col).combine_chunks().to_numpy().astype(
            np.int64)
        Vc = codes_of_batch(batch)
        # float64 matmul rides BLAS and stays EXACT: |code| ≤ 127, so
        # every partial sum is an integer < 127²·dim ≪ 2^53
        sims = (Qc.astype(np.float64)
                @ Vc.astype(np.float64).T).astype(np.int64)  # [nq, B]
        oq, ov, od = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = np.lexsort((ids, -row))[:kk]
            for j in idx:
                oq.append(qids[qi])
                ov.append(int(ids[j]))
                od.append(int(row[j]))
        return pa.table({"query_id": pa.array(oq, pa.int64()),
                         "vec_id": pa.array(ov, pa.int64()),
                         "qdot": pa.array(od, pa.int64())})

    return local_topk


def sq_knn(ds, queries: np.ndarray, query_ids: list[int] | None = None,
           k: int = 10, vec_col: str = "embedding",
           id_col: str = "vec_id", amax: float | None = None):
    """Quantized top-k: SQ8-encode corpus and queries under the corpus's
    own global scale and rank by the exact-integer quantized inner
    product → ``(query_id, vec_id, rank, qdot)``.

    Two scans (amax + score) when ``amax`` is not supplied; the scoring
    scan is one int64 matmul per batch with a per-block local top-k, so
    the merge shuffle carries n_queries × k × n_blocks rows."""
    import ray

    if amax is None:
        amax = corpus_amax(ds, vec_col)
    Q = np.asarray(queries, dtype=np.float64)
    qids = list(query_ids) if query_ids is not None else list(range(len(Q)))
    q_ref = ray.put((sq8_codes(Q, amax), qids))

    def codes_of_batch(batch: pa.Table) -> np.ndarray:
        return sq8_codes(_matrix(batch, vec_col), amax)

    local = ds.map_batches(_local_topk_stage(q_ref, k, id_col,
                                             codes_of_batch),
                           batch_format="pyarrow")
    return local.groupby("query_id").map_groups(_merge_topk_frame(k),
                                                batch_format="pandas")


def sq_build_store(ds, store_dir: str, vec_col: str = "embedding",
                   id_col: str = "vec_id", num_shards: int = 8) -> dict:
    """Encode the corpus once and write a sharded Parquet code store:
    ``(vec_id, code list<int8>)`` under hive ``shard=<vec_id % S>/``
    partitions (id-derived routing — the build is a PURE MAP, and any
    shard is independently rebuildable/resumable). The scale (``amax``)
    and measured byte counts land in ``_lineage/build.json``; probes
    read 1-byte codes instead of 4-byte floats, which is where the 4×
    IO cut comes from at corpus scale."""
    import time

    if os.path.isdir(store_dir) and glob.glob(
            os.path.join(store_dir, "shard=*")):
        raise FileExistsError(
            f"{store_dir} already holds a code store (append would "
            "double-count; build into a fresh dir)")
    amax = corpus_amax(ds, vec_col)
    t0 = time.time()
    dims: list[int] = []

    def encode(batch: pa.Table) -> pa.Table:
        V = _matrix(batch, vec_col)
        C = sq8_codes(V, amax).astype(np.int8)
        ids = batch.column(id_col).combine_chunks().to_numpy().astype(
            np.int64)
        codes = pa.FixedSizeListArray.from_arrays(
            pa.array(C.ravel(), pa.int8()), C.shape[1] if C.size else 0)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "code": codes.cast(pa.list_(pa.int8())),
            "shard": pa.array(ids % num_shards, pa.int64()),
        })

    enc = ds.map_batches(encode, batch_format="pyarrow")
    enc.write_parquet(store_dir, partition_cols=["shard"])

    rows = 0
    dim = 0
    code_bytes = 0
    for f in glob.glob(os.path.join(store_dir, "shard=*", "*.parquet")):
        code_bytes += os.path.getsize(f)
        import pyarrow.parquet as pq
        md = pq.ParquetFile(f)
        rows += md.metadata.num_rows
        if md.metadata.num_rows and not dim:
            t = md.read_row_group(0, columns=["code"])
            dim = len(t.column("code")[0])
    summary = {"amax": amax, "rows": rows, "dim": dim,
               "num_shards": num_shards,
               "code_bytes": code_bytes,
               "code_logical_bytes": rows * dim,
               "raw_vec_logical_bytes": rows * dim * 4,
               "wall_s": time.time() - t0}
    os.makedirs(os.path.join(store_dir, "_lineage"), exist_ok=True)
    with open(os.path.join(store_dir, "_lineage", "build.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    return summary


def sq_knn_store(store_dir: str, queries: np.ndarray,
                 query_ids: list[int] | None = None, k: int = 10,
                 id_col: str = "vec_id"):
    """Probe a :func:`sq_build_store` store: queries quantize under the
    STORED scale, scoring reads only the 1-byte code column (the float
    table never loads), and the result is bit-identical to
    :func:`sq_knn` over the original vectors — pinned by test and by the
    registered query sharing ``sq_knn``'s oracle."""
    import ray
    import ray.data

    with open(os.path.join(store_dir, "_lineage", "build.json")) as f:
        build = json.load(f)
    amax = float(build["amax"])
    Q = np.asarray(queries, dtype=np.float64)
    qids = list(query_ids) if query_ids is not None else list(range(len(Q)))
    q_ref = ray.put((sq8_codes(Q, amax), qids))

    paths = sorted(glob.glob(os.path.join(store_dir, "shard=*",
                                          "*.parquet")))
    ds = ray.data.read_parquet(paths, columns=[id_col, "code"])

    def codes_of_batch(batch: pa.Table) -> np.ndarray:
        flat = batch.column("code").combine_chunks()
        C = flat.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        dim = C.size // max(1, batch.num_rows)
        return C.reshape(batch.num_rows, dim)

    local = ds.map_batches(_local_topk_stage(q_ref, k, id_col,
                                             codes_of_batch),
                           batch_format="pyarrow")
    return local.groupby("query_id").map_groups(_merge_topk_frame(k),
                                                batch_format="pandas")
