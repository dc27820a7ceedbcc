"""Third wave of oracle-checked queries — each adds an operator family the
first two waves don't cover:

* tie-aware RANK() window via distributed threshold top-k (not row_number:
  ties share a rank, and the tie-safe per-batch partial keeps every row
  that can still make the global cut);
* ordered string aggregation (string_agg, the K8 label-merge shape
  generalized to SQL semantics);
* list-column UNNEST/flatten with per-ordinal stats (the embedding table's
  list<float> exploded without ever leaving vectorized numpy);
* Levenshtein fuzzy self-join (blocked candidates + pair-vectorized DP,
  matching DuckDB's levenshtein() exactly);
* an oracle-paired HyperLogLog register sketch (the distributed max-merge
  is checked value-for-value against a pure-SQL reimplementation, so the
  approximate-distinct machinery itself is hash-exact even though the
  estimate is approximate by construction).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ccnerx_ray.functions.grouping import coarse_grouped, grouped_reduce
from ccnerx_ray.queries.relational import _read


def _half_away(x: np.ndarray) -> np.ndarray:
    """DuckDB round(): half away from zero (np.round is half-to-even)."""
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


# ------------------------------------------------------- RANK() window
def q_orders_rank_in_month(sf_dir: str):
    """Tie-aware RANK() <= 5 per month over a bucketed price.

    Distributed shape: a per-batch partial keeps, for each month seen in
    the batch, only rows whose bucket is >= the batch-month's 5th-largest
    bucket (multiset order) — a row it drops has >= 5 strictly-greater
    rows in its own batch, so its global rank can only be worse and the
    filter is lossless. The survivors (k·months rows per batch, not
    input-scale) shuffle once on month; pandas rank(method="min")
    finalizes. Rows strictly greater than any survivor are themselves
    survivors, so the final rank equals the full-group rank."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice",
                                  "o_orderdate"])

    def prep(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        ym = pc.cast(pc.add(pc.multiply(pc.year(d), 100), pc.month(d)),
                     pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100.0),
            round_mode="half_towards_infinity"), pa.int64())
        bucket = pc.cast(pc.floor(pc.divide(pc.cast(cents, pa.float64()),
                                            1_000_000.0)), pa.int64())
        t = pa.table({"ym": ym, "o_orderkey": batch.column("o_orderkey"),
                      "price_bucket": bucket})
        # tie-safe partial top-k: keep bucket >= 5th largest per ym —
        # fully vectorized (sort desc, cumcount, threshold at position 4;
        # groups smaller than 5 keep everything)
        df = (t.to_pandas()
               .sort_values(["ym", "price_bucket"],
                            ascending=[True, False], kind="mergesort"))
        pos = df.groupby("ym", sort=False).cumcount()
        thresh = df.loc[pos == 4].set_index("ym")["price_bucket"]
        tvals = df["ym"].map(thresh)
        keep = tvals.isna() | (df["price_bucket"] >= tvals)
        return pa.Table.from_pandas(df[keep], preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for ym, grp in g.groupby("ym", sort=False):
            thresh = grp["price_bucket"].nlargest(5).min()
            grp = grp[grp["price_bucket"] >= thresh].copy()
            grp["rank"] = (grp["price_bucket"]
                           .rank(method="min", ascending=False)
                           .astype("int64"))
            out.append(grp[grp["rank"] <= 5])
        return pd.concat(out, ignore_index=True) if out else g.iloc[:0]

    kept = ds.map_batches(prep, batch_format="pyarrow")
    return coarse_grouped(kept, ["ym"], final, num_buckets=256,
                          out_dtypes={"ym": "int64", "o_orderkey": "int64",
                                      "price_bucket": "int64",
                                      "rank": "int64"})


ORACLE_ORDERS_RANK_IN_MONTH = """
SELECT ym, o_orderkey, price_bucket, CAST(rank AS BIGINT) AS rank FROM (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) // 1000000 AS price_bucket,
         rank() OVER (
           PARTITION BY year(o_orderdate) * 100 + month(o_orderdate)
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) // 1000000
                    DESC) AS rank
  FROM orders) WHERE rank <= 5
"""


# -------------------------------------------------- ordered string_agg
def q_nations_concat(sf_dir: str):
    """string_agg(n_name, ',' ORDER BY n_name) per region — ordered string
    aggregation. Grouped shuffle carries the 25-row nation table; region
    names resolve through a broadcast dict (5 rows)."""
    region = {r["r_regionkey"]: r["r_name"]
              for r in _read(sf_dir, "region").take_all()}
    nation = _read(sf_dir, "nation", ["n_regionkey", "n_name"])

    def local(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values("n_name")
                .groupby("n_regionkey", sort=False)["n_name"]
                .agg([("nations", ",".join), ("n_nations", "size")])
                .reset_index())
        out["r_name"] = out["n_regionkey"].map(region)
        out["n_nations"] = out["n_nations"].astype("int64")
        return out[["r_name", "nations", "n_nations"]]

    return coarse_grouped(nation, ["n_regionkey"], local, num_buckets=16,
                          out_dtypes={"r_name": "string",
                                      "nations": "string",
                                      "n_nations": "int64"})


ORACLE_NATIONS_CONCAT = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
       count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ------------------------------------------------- UNNEST / flatten
def q_embedding_dim_stats(sf_dir: str):
    """Explode the list<float> embedding column to (ordinal, value) and
    aggregate per ordinal — without materializing exploded rows: each
    batch stacks to a (rows × dim) numpy matrix, rounds to integer micro
    units per value (order-free sums, the repo-wide float contract), and
    emits ONE row per dimension; the shuffle carries dim-scale partials."""
    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        lists = batch.column("embedding").to_pylist()
        if not lists:
            return pa.table({"ord": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sum_micro": pa.array([], pa.int64()),
                             "min_micro": pa.array([], pa.int64()),
                             "max_micro": pa.array([], pa.int64())})
        arr = np.asarray(lists, dtype=np.float64)
        micro = _half_away(arr * 1e6)
        d = arr.shape[1]
        return pa.table({
            "ord": pa.array(np.arange(1, d + 1), pa.int64()),
            "n": pa.array(np.full(d, arr.shape[0]), pa.int64()),
            "sum_micro": pa.array(micro.sum(axis=0), pa.int64()),
            "min_micro": pa.array(micro.min(axis=0), pa.int64()),
            "max_micro": pa.array(micro.max(axis=0), pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_reduce(partials, ["ord"],
                          {"n": "sum", "sum_micro": "sum",
                           "min_micro": "min", "max_micro": "max"},
                          num_buckets=64,
                          out_dtypes={"ord": "int64", "n": "int64",
                                      "sum_micro": "int64",
                                      "min_micro": "int64",
                                      "max_micro": "int64"})


ORACLE_EMBEDDING_DIM_STATS = """
SELECT CAST(ord AS BIGINT) AS ord, count(*) AS n,
       CAST(sum(CAST(round(val * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro,
       min(CAST(round(val * 1000000) AS BIGINT)) AS min_micro,
       max(CAST(round(val * 1000000) AS BIGINT)) AS max_micro
FROM (SELECT generate_subscripts(embedding, 1) AS ord,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings)
GROUP BY ord
"""


# --------------------------------------------- Levenshtein fuzzy join
def q_similar_part_names(sf_dir: str):
    """Fuzzy self-join: same-brand part pairs with edit distance <= 2.
    Blocking on brand exactly covers the equality predicate; the length
    band inside each group is lossless (distance >= |Δlen|)."""
    from ccnerx_ray.ops.fuzzy import fuzzy_name_pairs
    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_name"])
    return fuzzy_name_pairs(ds, "p_brand", "p_partkey", "p_name",
                            max_dist=2)


ORACLE_SIMILAR_PART_NAMES = """
SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


# ------------------------------------------- HyperLogLog register sketch
_HLL_P = 8                       # 2^8 = 256 registers
_HLL_REST_BITS = 52              # 60-bit sha prefix − 8 index bits


def _hll_partial(batch: pa.Table) -> pa.Table:
    """Per-batch HLL partial: distinct keys → 60-bit sha256 prefix →
    (register idx = top 8 bits, rho = 1-based position of the first set
    bit in the low 52, 53 if none) → per-register max. Emits <= 256 rows
    per batch regardless of input size; register max-merge is associative,
    so the downstream reduce carries register-scale rows only."""
    keys = set(batch.column("o_custkey").to_pylist())
    regs: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.sha256(str(k).encode()).hexdigest()[:15], 16)
        idx = h >> _HLL_REST_BITS
        rest = h & ((1 << _HLL_REST_BITS) - 1)
        rho = (_HLL_REST_BITS + 1 - rest.bit_length()) if rest \
            else (_HLL_REST_BITS + 1)
        if rho > regs.get(idx, 0):
            regs[idx] = rho
    idxs = sorted(regs)
    return pa.table({"idx": pa.array(idxs, pa.int64()),
                     "rho": pa.array([regs[i] for i in idxs], pa.int64())})


def q_hll_custkey(sf_dir: str):
    """HyperLogLog sketch of distinct order customers, exposed as its
    register table (idx, max rho) so the distributed sketch is exactly
    oracle-checkable; the cardinality estimate is derived from these
    registers (tested in pytest against the exact distinct count)."""
    ds = _read(sf_dir, "orders", ["o_custkey"])
    partials = ds.map_batches(_hll_partial, batch_format="pyarrow")
    return grouped_reduce(partials, ["idx"], {"rho": "max"},
                          num_buckets=32,
                          out_dtypes={"idx": "int64", "rho": "int64"})


def hll_estimate(registers: dict[int, int], p: int = _HLL_P) -> float:
    """Flajolet HLL estimate (with small-range linear counting) from a
    sparse register table; absent registers are zero."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    zsum = (m - len(registers)) * 1.0 + sum(2.0 ** -r
                                            for r in registers.values())
    est = alpha * m * m / zsum
    zeros = m - len(registers)
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


ORACLE_HLL_CUSTKEY = """
SELECT CAST(h >> 52 AS BIGINT) AS idx,
       CAST(max(CASE WHEN p = 0 THEN 53 ELSE p END) AS BIGINT) AS rho
FROM (
  SELECT h, strpos(lpad(bin(h & ((1::UBIGINT << 52) - 1)), 52, '0'),
                   '1') AS p
  FROM (SELECT DISTINCT
          ('0x' || substr(sha256(CAST(o_custkey AS VARCHAR)), 1, 15))
            ::UBIGINT AS h
        FROM orders))
GROUP BY idx
"""


def q_hll_users_by_type(sf_dir: str):
    """PER-GROUP HLL (``ops/sketches.py:hll_group_registers``): one
    mergeable register sketch per event_type over user_id — segment
    distinct counts without an all-to-all over raw keys. Same sha256
    register contract as `hll_custkey`, so the whole grouped register
    table is hash-exact; per-group estimates are derived from these
    registers (pytest-pinned within tolerance of the exact counts)."""
    from ccnerx_ray.ops.sketches import hll_group_registers

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_group_registers(ds, "event_type", "user_id", p=8)


ORACLE_HLL_USERS_BY_TYPE = """
SELECT event_type, CAST(h >> 52 AS BIGINT) AS idx,
       CAST(max(CASE WHEN p = 0 THEN 53 ELSE p END) AS BIGINT) AS rho
FROM (
  SELECT event_type, h,
         strpos(lpad(bin(h & ((1::UBIGINT << 52) - 1)), 52, '0'),
                '1') AS p
  FROM (SELECT DISTINCT event_type,
          ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 15))
            ::UBIGINT AS h
        FROM events))
GROUP BY event_type, idx
"""


# --------------------------------------------- connected components
def q_graph_components(sf_dir: str):
    """Exact connected components over a sparse part–supplier co-purchase
    graph. The filter (quantity-1 lineitems, every 4th part) is chosen so
    the graph FRACTURES — 18 components at sf0.01, 297 at sf0.1 —
    while keeping one giant deep component (~30% of nodes), so the query
    exercises both many-component output and multi-round convergence.
    The missing piece of the dedup family: near-dup PAIRS
    (minhash/jaccard/simhash) become dup GROUPS by running exactly this
    operator over the pair list."""
    import ray.data

    from ccnerx_ray.ops.graph import connected_components

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"])

    def to_edges(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.less(batch.column("l_quantity"), 2),
                       pc.equal(pc.bit_wise_and(
                           batch.column("l_partkey"), 3), 0))
        batch = batch.filter(mask)
        p = pc.binary_join_element_wise(
            "p", pc.cast(batch.column("l_partkey"), pa.string()), "")
        s = pc.binary_join_element_wise(
            "s", pc.cast(batch.column("l_suppkey"), pa.string()), "")
        return pa.table({"u": p, "v": s})

    # NO dedup shuffle: min-label propagation (and the block-local
    # contraction preamble) is idempotent under duplicate edges, so the
    # raw filtered edge stream feeds connected_components directly —
    # the all-to-all the dedup paid bought nothing here
    return connected_components(ds.map_batches(to_edges,
                                               batch_format="pyarrow"))


def _components_oracle() -> str:
    from ccnerx_ray.ops.graph import components_oracle_sql
    return components_oracle_sql(
        "SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS u, "
        "'s' || CAST(l_suppkey AS VARCHAR) AS v FROM lineitem "
        "WHERE l_quantity < 2 AND l_partkey % 4 = 0")


RELATIONAL3_QUERIES = {
    "orders_rank_in_month": q_orders_rank_in_month,
    "nations_concat": q_nations_concat,
    "embedding_dim_stats": q_embedding_dim_stats,
    "similar_part_names": q_similar_part_names,
    "hll_custkey": q_hll_custkey,
    "hll_users_by_type": q_hll_users_by_type,
    "graph_components": q_graph_components,
}

RELATIONAL3_ORACLE = {
    "orders_rank_in_month": ORACLE_ORDERS_RANK_IN_MONTH,
    "nations_concat": ORACLE_NATIONS_CONCAT,
    "embedding_dim_stats": ORACLE_EMBEDDING_DIM_STATS,
    "similar_part_names": ORACLE_SIMILAR_PART_NAMES,
    "hll_custkey": ORACLE_HLL_CUSTKEY,
    "hll_users_by_type": ORACLE_HLL_USERS_BY_TYPE,
    "graph_components": _components_oracle(),
}


def q_component_sizes(sf_dir: str):
    """Component-size distribution over the co-purchase graph —
    ``(size, n_components)`` — the one-look fragmentation profile a
    dedup/clustering report carries next to ``kg_degree_dist``'s hub
    profile: how many near-dup groups exist at each size, and how giant
    the giant component is. Composes the proven
    ``connected_components`` with two node-scale keyed counts."""
    from ccnerx_ray.functions.grouping import grouped_reduce

    labels = q_graph_components(sf_dir)

    def ones(col_in: str, col_out: str):
        def fn(batch: pa.Table) -> pa.Table:
            import numpy as np
            return pa.table({
                col_in: batch.column(col_in),
                col_out: pa.array(np.ones(batch.num_rows,
                                          dtype=np.int64))})
        return fn

    sizes = grouped_reduce(
        labels.map_batches(ones("component", "size"),
                           batch_format="pyarrow"),
        ["component"], {"size": "sum"}, num_buckets=16,
        out_dtypes={"component": "string", "size": "int64"},
        pre_combine=True)
    return grouped_reduce(
        sizes.map_batches(ones("size", "n_components"),
                          batch_format="pyarrow"),
        ["size"], {"n_components": "sum"}, num_buckets=8,
        out_dtypes={"size": "int64", "n_components": "int64"},
        pre_combine=True)


def _component_sizes_oracle() -> str:
    return (f"WITH comp AS ({_components_oracle()}),\n"
            "sz AS (SELECT component, CAST(count(*) AS BIGINT) AS size\n"
            "       FROM comp GROUP BY component)\n"
            "SELECT size, CAST(count(*) AS BIGINT) AS n_components\n"
            "FROM sz GROUP BY size")


RELATIONAL3_QUERIES["component_sizes"] = q_component_sizes
RELATIONAL3_ORACLE["component_sizes"] = _component_sizes_oracle()
