"""Unit/property tests for the third query wave: pair-vectorized
Levenshtein, the HLL register sketch + estimate, and the tie-aware rank
partial. (The full queries are parity-tested against their DuckDB oracles
by test_oracle_parity.py via the registry.)"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ccnerx_ray.ops.fuzzy import batched_levenshtein
from ccnerx_ray.queries.relational3 import _hll_partial, hll_estimate


def _lev_ref(a: str, b: str) -> int:
    """Textbook single-pair DP, the conformance reference."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(st.lists(st.tuples(st.text(max_size=12), st.text(max_size=12)),
                min_size=1, max_size=20))
@settings(max_examples=60, deadline=None)
def test_batched_levenshtein_matches_reference(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = batched_levenshtein(a, b)
    want = np.array([_lev_ref(x, y) for x, y in pairs], dtype=np.int64)
    assert (got == want).all()


def test_batched_levenshtein_empty_and_known():
    assert list(batched_levenshtein([], [])) == []
    got = batched_levenshtein(["kitten", "", "abc", "same"],
                              ["sitting", "ab", "abc", "same"])
    assert list(got) == [3, 2, 0, 0]


def test_hll_partial_and_estimate_accuracy():
    """Register max-merge of per-batch partials == single-pass registers,
    and the estimate lands within 3σ (σ = 1.04/√m ≈ 6.5% at m=256)."""
    import pyarrow as pa

    keys = np.arange(10_000, dtype=np.int64)
    whole = _hll_partial(pa.table({"o_custkey": pa.array(keys)}))
    merged: dict[int, int] = {}
    for lo in range(0, len(keys), 1_000):
        part = _hll_partial(
            pa.table({"o_custkey": pa.array(keys[lo:lo + 1_000])}))
        for i, r in zip(part["idx"].to_pylist(), part["rho"].to_pylist()):
            merged[i] = max(merged.get(i, 0), r)
    single = dict(zip(whole["idx"].to_pylist(), whole["rho"].to_pylist()))
    assert merged == single

    est = hll_estimate(single)
    assert abs(est - 10_000) / 10_000 < 3 * 1.04 / np.sqrt(256)


def test_rank_partial_is_lossless(ray_session):
    """Forcing tiny batches (many partials) must not change the rank
    query's output: the per-batch threshold filter is a pure superset of
    the global top-5-with-ties per month."""
    import pandas as pd
    import ray.data

    from ccnerx_ray.queries.relational3 import q_orders_rank_in_month

    full = q_orders_rank_in_month("/root/testdata/sf0.001").to_pandas()
    # Re-run with the read fragmented into many small blocks.  The query
    # binds `_read` at import via `from ...relational import _read`, so we
    # must patch the *relational3* module binding — patching the relational
    # module's attribute leaves the query calling the original.
    import ccnerx_ray.queries.relational3 as rel3
    orig = rel3._read
    seen_blocks = []

    def fragmented(sf_dir, table, columns=None):
        ds = orig(sf_dir, table, columns).repartition(37).materialize()
        seen_blocks.append(ds.num_blocks())
        return ds

    rel3._read = fragmented
    try:
        frag = q_orders_rank_in_month("/root/testdata/sf0.001").to_pandas()
    finally:
        rel3._read = orig
    # guard against the patch silently not being exercised again
    assert seen_blocks and all(b == 37 for b in seen_blocks)

    key = ["ym", "o_orderkey"]
    a = full.sort_values(key).reset_index(drop=True)
    b = frag.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_rank_query_has_ties(ray_session):
    """The bucketing must actually produce tied ranks somewhere — otherwise
    the query degenerates to row_number and stops covering RANK semantics."""
    from ccnerx_ray.queries.relational3 import q_orders_rank_in_month
    df = q_orders_rank_in_month("/root/testdata/sf0.01").to_pandas()
    dup = df.groupby(["ym", "rank"]).size()
    assert (dup > 1).any()


def test_connected_components_path_graph(ray_session):
    """A 33-node path is the pointer-jumping stress case: plain min-label
    propagation needs ~32 rounds (graph diameter); path doubling must
    finish well inside the operator's max_rounds and still hit the exact
    fixpoint — every node labels to the path's minimum id."""
    import ray.data

    from ccnerx_ray.ops.graph import connected_components

    n = 33
    edges = ray.data.from_items(
        [{"u": f"x{i:03d}", "v": f"x{i + 1:03d}"} for i in range(n - 1)])
    got = {r["node"]: r["component"]
           for r in connected_components(edges).take_all()}
    assert got == {f"x{i:03d}": "x000" for i in range(n)}


def test_components_oracle_depth_reaches_true_fixpoint():
    """Regression for the r5 sf0.1 sweep catch: the ORACLE's unrolled
    pointer-jumping rounds converge far slower than the old '~2**rounds
    diameter' claim (the min must still travel along edges; the sf0.1
    giant co-purchase component needed 22 rounds where the default was
    14, leaving 6 label groups unmerged — the Ray side, which runs to
    its exact convergence check, was right). Pin the default-depth
    oracle against an independent union-find ground truth on the sf0.01
    fixture, so a future depth regression fails here before any sweep."""
    import duckdb

    from ccnerx_ray.queries.relational3 import _components_oracle

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    got = con.sql(_components_oracle()).df()
    edges = con.sql(
        "SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS u, "
        "'s' || CAST(l_suppkey AS VARCHAR) AS v FROM lineitem "
        "WHERE l_quantity < 2 AND l_partkey % 4 = 0").df()
    con.close()

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(edges.u, edges.v):
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    truth = {n: find(n) for n in parent}
    assert {r.node: r.component for r in got.itertuples()} == truth


def test_connected_components_frontier_mode_exact(ray_session):
    """Force the frontier (active-set) rounds — broadcast the changed
    set, deref fresh pointees — from round 2 onward and require the SAME
    exact fixpoint as wide rounds: a path (deep, frontier keeps moving)
    plus many 2-cliques (settle at init, so the frontier is a small
    fraction of the graph and the ratio gate actually flips)."""
    import ray.data

    from ccnerx_ray.ops.graph import connected_components

    n = 25
    rows = [{"u": f"p{i:03d}", "v": f"p{i + 1:03d}"} for i in range(n - 1)]
    rows += [{"u": f"c{j:04d}a", "v": f"c{j:04d}b"} for j in range(400)]
    edges = ray.data.from_items(rows)
    got = {r["node"]: r["component"]
           for r in connected_components(
               edges, frontier_node_ratio=1).take_all()}
    want = {f"p{i:03d}": "p000" for i in range(n)}
    for j in range(400):
        want[f"c{j:04d}a"] = f"c{j:04d}a"
        want[f"c{j:04d}b"] = f"c{j:04d}a"
    assert got == want


def test_connected_components_int_keys_multi(ray_session):
    """Integer node ids (dtype derived from the edge column — an empty
    shuffle bucket must emit int64-typed empties) across two components
    plus an isolated self-loop node."""
    import ray.data

    from ccnerx_ray.ops.graph import connected_components

    edges = ray.data.from_items(
        [{"u": 5, "v": 2}, {"u": 2, "v": 9}, {"u": 7, "v": 11},
         {"u": 40, "v": 40}])
    got = {r["node"]: r["component"]
           for r in connected_components(edges).take_all()}
    assert got == {2: 2, 5: 2, 9: 2, 7: 7, 11: 7, 40: 40}


def test_connected_components_fold_stall_falls_back(ray_session):
    """When the recursive star-forest fold STALLS (remainder never fits
    one fold block — forced via fold_block_bytes=1), the operator must
    fall through to the pointer-jumping rounds over the partially
    contracted stars and still reach the exact fixpoint. Pins the 100-TB
    fallback path the default threshold hides at toy scale."""
    import ray.data

    from ccnerx_ray.ops.graph import connected_components

    # a path crossing many blocks plus an isolated pair: worst case for
    # per-block contraction, so the distributed rounds must do real work
    items = [{"u": i, "v": i + 1} for i in range(200)]
    items.append({"u": 900, "v": 901})
    edges = ray.data.from_items(items).repartition(16)
    got = {r["node"]: r["component"]
           for r in connected_components(
               edges, fold_block_bytes=1).take_all()}
    want = {i: 0 for i in range(201)}
    want.update({900: 900, 901: 900})
    assert got == want
