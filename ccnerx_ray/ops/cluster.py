"""Distributed Lloyd k-means over an embedding Dataset — EXACT integer
arithmetic, oracle-checkable per iteration.

Like :mod:`ops/graph` (integer PageRank), the blocker for oracle-checking
an iterative float algorithm is association-order drift. This k-means is
defined entirely on integers:

* every embedding component is rounded to MICRO units per value
  (half-away-from-zero == DuckDB ``round``), once, up front;
* assignment = argmin of the integer squared L2 distance, ties to the
  LOWEST cluster index (== SQL ``row_number() OVER (ORDER BY dist,
  cluster)``);
* update = truncating integer division ``sum // count`` toward zero
  (== DuckDB ``//``); an empty cluster keeps its previous centroid.

Every step is an order-free integer sum, an argmin over per-row values,
or a truncating division — bit-identical under any partitioning and
expressible in SQL (iterations unroll into chained CTEs).

Distributed shape (the part that matters at 100 TB): the corpus is
micro-ized ONCE and materialized as ``(id, fixed_size_list<int64>)``;
each iteration is one scan — per-batch numpy assignment against the
broadcast k×d centroid matrix, per-batch PARTIAL cluster sums
(``np.add.at``), then an ADAPTIVE merge of the ``≤ k×d``-rows-per-block
partials: summed on the driver while ``blocks × k×d`` is bounded (one
map-only pass per iteration), reduced through a coarse grouped shuffle
beyond that (only ``≤ k×d`` rows reach the driver). Integer addition is
order-free, so the merge site cannot change results; the corpus never
shuffles either way.

Initial centroids are the k rows with the SMALLEST ids (deterministic
and SQL-expressible): per-batch partial top-k, bounded driver merge.

No reference counterpart; first-class training-data operator (corpus
clustering for diversity sampling / dataset cartography — the
distributed big sibling of the driver-side IVF quantizer in
``ops/similarity.py:kmeans_centroids``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ccnerx_ray.functions.grouping import grouped_reduce


def _micro(V: np.ndarray) -> np.ndarray:
    """Per-value micro rounding, half away from zero (DuckDB round)."""
    return (np.sign(V) * np.floor(np.abs(V * 1e6) + 0.5)).astype(np.int64)


def _trunc_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Integer division truncating toward zero (DuckDB ``//``; numpy's
    ``//`` floors toward -inf, which differs on negative sums)."""
    return (np.sign(s) * (np.abs(s) // n)).astype(np.int64)


def kmeans_lloyd_int(ds, k: int = 8, n_iter: int = 3,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     num_buckets: int = 64,
                     driver_merge_rows_max: int = 2_000_000):
    """Exact integer Lloyd k-means. Returns a k×dim long-form Dataset
    ``(cluster, dim, c_micro, n_points)``: the centroid components after
    ``n_iter`` updates and the size of the membership that produced the
    final update (0 for a cluster that was empty in the last round and
    therefore kept its previous centroid).

    Per-iteration merge is adaptive: the shuffle input is ≤ blocks × k×d
    partial rows, so while that bound sits under
    ``driver_merge_rows_max`` the iteration is ONE map-only pass whose
    per-block partials sum on the driver (integer addition — order-free,
    bit-identical to the grouped path). Beyond the bound (100-TB regime:
    ~1.6M blocks × k×d rows is tens of GB) the partials reduce through
    the coarse ``grouped_reduce`` shuffle instead, so only ≤ k×d rows
    ever reach the driver."""
    import ray
    import ray.data

    def to_micro(batch: pa.Table) -> pa.Table:
        flat = batch.column(vec_col).combine_chunks()
        V = flat.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = V.size // max(1, batch.num_rows)
        Vm = _micro(V)
        return pa.table({
            id_col: batch.column(id_col),
            "xm": pa.FixedSizeListArray.from_arrays(
                pa.array(Vm, pa.int64()), dim),
        })

    pts = (ds.select_columns([id_col, vec_col])
             .map_batches(to_micro, batch_format="pyarrow")
             .materialize())                 # one corpus pass, reused n_iter×

    def _mat(batch: pa.Table) -> np.ndarray:
        col = batch.column("xm").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(batch.num_rows, -1).astype(np.int64)

    # --- initial centroids: k smallest ids (partial top-k per batch) ---
    def partial_smallest(batch: pa.Table) -> pa.Table:
        idv = batch.column(id_col).to_numpy()
        order = np.argsort(idv)[:k]
        return pa.table({
            id_col: pa.array(idv[order], pa.int64()),
            "xm": batch.column("xm").combine_chunks().take(
                pa.array(order, pa.int64())),
        })

    cand = pts.map_batches(partial_smallest,
                           batch_format="pyarrow").take_all()  # ≤ k×blocks
    cand.sort(key=lambda r: r[id_col])
    C = np.stack([np.asarray(r["xm"], dtype=np.int64) for r in cand[:k]])
    kk, dim = C.shape

    # path decision is metadata-only: pts is materialized, block count
    # is known, and each block contributes ≤ k×dim partial rows.
    driver_merge = (pts.num_blocks() * kk * dim) <= driver_merge_rows_max

    counts_last = np.zeros(kk, dtype=np.int64)
    for _ in range(n_iter):
        c_ref = ray.put(C)

        def partial_sums(batch: pa.Table) -> pa.Table:
            Cm = ray.get(c_ref)
            X = _mat(batch)
            # argmin of |x-c|^2 == argmin of (|c|^2 - 2 x.c): the |x|^2
            # term is constant per row, and the arithmetic is exact
            # integer, so ties (-> lowest cluster, argmin picks first)
            # are byte-identical to the full-distance form — without the
            # n×k×d subtraction temp the einsum form materialized.
            cn = np.einsum("kd,kd->k", Cm, Cm)
            assign = (cn[None, :] - 2 * (X @ Cm.T)).argmin(axis=1)
            sums = np.zeros_like(Cm)
            np.add.at(sums, assign, X)
            counts = np.bincount(assign, minlength=Cm.shape[0])
            present = np.nonzero(counts)[0]
            d = Cm.shape[1]
            return pa.table({
                "cluster": pa.array(np.repeat(present, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                        len(present)), pa.int64()),
                "s": pa.array(sums[present].reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(counts[present], d), pa.int64()),
            })

        partials = pts.map_batches(partial_sums, batch_format="pyarrow")
        if driver_merge:
            # one map-only pass; per-block partials (≤ blocks × k×d rows,
            # under the bound by construction) sum on the driver.
            tbls = [t for t in ray.get(partials.to_arrow_refs())
                    if t.num_rows]
            t = pa.concat_tables(tbls)
            cl_a = t.column("cluster").to_numpy()
            dm_a = t.column("dim").to_numpy()
            s_a = t.column("s").to_numpy()
            n_a = t.column("n").to_numpy()
        else:
            # ≤ k×dim keys and per-BLOCK combiner output as shuffle
            # input: a handful of reducers covers any corpus scale
            # (reduce rows = blocks × keys), while 64 mostly-empty
            # partitions paid a task launch each, three times per run.
            merged = grouped_reduce(
                partials, ["cluster", "dim"], {"s": "sum", "n": "sum"},
                num_buckets=min(4, num_buckets),
                out_dtypes={"cluster": "int64", "dim": "int64",
                            "s": "int64", "n": "int64"},
                pre_combine=True)
            tbls = [t for t in ray.get(merged.to_arrow_refs())
                    if t.num_rows]                 # ≤ k×dim rows — tiny
            t = pa.concat_tables(tbls)
            cl_a = np.asarray(t.column("cluster").to_numpy(
                zero_copy_only=False), dtype=np.int64)
            dm_a = np.asarray(t.column("dim").to_numpy(
                zero_copy_only=False), dtype=np.int64)
            s_a = np.asarray(t.column("s").to_numpy(
                zero_copy_only=False), dtype=np.int64)
            n_a = np.asarray(t.column("n").to_numpy(
                zero_copy_only=False), dtype=np.int64)
        # identical update for both paths: key-aggregate (the driver
        # path carries one partial row per block per present key; the
        # grouped path already reduced to unique keys — np.add.at
        # handles both, integer addition is order-free)
        idx = cl_a * dim + (dm_a - 1)
        S = np.zeros(kk * dim, dtype=np.int64)
        N = np.zeros(kk * dim, dtype=np.int64)
        np.add.at(S, idx, s_a)
        np.add.at(N, idx, n_a)
        newC = C.copy().reshape(-1)
        nz = N > 0
        newC[nz] = _trunc_div(S[nz], N[nz])
        C = newC.reshape(kk, dim)
        counts_last = N.reshape(kk, dim)[:, 0].copy()

    out = pa.table({
        "cluster": pa.array(np.repeat(np.arange(kk, dtype=np.int64), dim)),
        "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), kk)),
        "c_micro": pa.array(C.reshape(-1), pa.int64()),
        "n_points": pa.array(np.repeat(counts_last, dim), pa.int64()),
    })
    return ray.data.from_arrow(out)


def kmeans_cte_chain(k: int, n_iter: int, dim: int,
                     table: str = "embeddings",
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> str:
    """The WITH-chain shared by :func:`kmeans_oracle_sql` and the
    SemDeDup oracle: ``pts``/``init``/``c0`` then ``d{t}``/``a{t}``/
    ``u{t}``/``c{t}`` per unrolled iteration, ending after
    ``c{n_iter}`` with NO trailing SELECT so callers can append further
    CTEs (e.g. one more assignment round under the final centroids)."""
    parts = [f"""
WITH pts AS (
  SELECT {id_col} AS vid,
         unnest([{{'dim': i,
                   'x': CAST(round(CAST({vec_col}[i] AS DOUBLE)
                                   * 1000000) AS BIGINT)}}
                 for i in range(1, {dim + 1})], recursive := true)
  FROM {table}
),
init AS (
  SELECT vid, row_number() OVER (ORDER BY vid) - 1 AS cluster
  FROM (SELECT {id_col} AS vid FROM {table} ORDER BY {id_col} LIMIT {k})
),
c0 AS (
  SELECT i.cluster, p.dim, p.x AS c, CAST(0 AS BIGINT) AS n
  FROM init i JOIN pts p USING (vid)
)"""]
    for t in range(1, n_iter + 1):
        parts.append(f""",
d{t} AS (
  SELECT p.vid, c.cluster, SUM((p.x - c.c) * (p.x - c.c)) AS dist
  FROM pts p JOIN c{t - 1} c USING (dim) GROUP BY p.vid, c.cluster
),
a{t} AS (
  SELECT vid, cluster FROM (
    SELECT vid, cluster,
           row_number() OVER (PARTITION BY vid
                              ORDER BY dist, cluster) AS rn
    FROM d{t}) WHERE rn = 1
),
u{t} AS (
  SELECT a.cluster, p.dim, CAST(SUM(p.x) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM a{t} a JOIN pts p USING (vid) GROUP BY a.cluster, p.dim
),
c{t} AS (
  SELECT c.cluster, c.dim,
         CASE WHEN u.s IS NULL THEN c.c
              ELSE CAST(u.s // u.n AS BIGINT) END AS c,
         COALESCE(u.n, 0) AS n
  FROM c{t - 1} c LEFT JOIN u{t} u USING (cluster, dim)
)""")
    return "".join(parts)


def kmeans_oracle_sql(k: int, n_iter: int, dim: int,
                      table: str = "embeddings",
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> str:
    """DuckDB oracle for :func:`kmeans_lloyd_int`: identical integer
    arithmetic with iterations unrolled into chained CTEs. DuckDB ``//``
    truncates toward zero and ``round`` is half-away-from-zero — both
    mirrored exactly by the numpy implementation."""
    return kmeans_cte_chain(k, n_iter, dim, table, vec_col, id_col) + f"""
SELECT cluster, dim, c AS c_micro, n AS n_points FROM c{n_iter}"""


def centroid_matrix(cent_ds) -> np.ndarray:
    """Collect a :func:`kmeans_lloyd_int` result (k×dim LONG-form rows —
    tiny by construction) into the (k, dim) int64 micro-unit matrix."""
    rows = cent_ds.take_all()
    kk = 1 + max(r["cluster"] for r in rows)
    dim = max(r["dim"] for r in rows)          # dims are 1-based
    C = np.zeros((kk, dim), dtype=np.int64)
    for r in rows:
        C[r["cluster"], r["dim"] - 1] = r["c_micro"]
    return C


def assign_clusters(ds, centroids: np.ndarray,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    keep_vec: bool = False):
    """ONE exact-integer assignment pass under FIXED centroids (micro
    units, shape (k, dim)): per batch micro-ize the vectors, squared-L2
    against all k centroids in int64, argmin with ties broken toward the
    LOWEST cluster index — np.argmin's first-minimum IS the oracle's
    ``row_number() OVER (ORDER BY dist, cluster)``. A pure map: no
    shuffle, no state; the k×dim centroid matrix rides the task closure
    (k≤10⁴ × dim≤10³ is a few MB — broadcast once per worker, never per
    batch). Overflow ledger: |x|,|c| ≤ ~2e6 micro ⇒ per-dim diff² ≤
    1.6e13, × dim ≤ 10³ ⇒ ≤ 1.6e16 ≪ 2⁶³."""
    C = np.ascontiguousarray(centroids, dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols: dict = {id_col: batch.column(id_col)}
        if n == 0:
            cols["cluster"] = pa.array([], pa.int64())
            if keep_vec:
                cols[vec_col] = batch.column(vec_col)
            return pa.table(cols)
        flat = batch.column(vec_col).combine_chunks()
        V = flat.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        Vm = _micro(V).reshape(n, -1)
        d2 = ((Vm[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cols["cluster"] = pa.array(np.argmin(d2, axis=1).astype(np.int64),
                                   pa.int64())
        if keep_vec:
            cols[vec_col] = batch.column(vec_col)
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")
