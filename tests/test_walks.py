"""ops/walks.py: deterministic random walks, multi-source BFS hop
distances, common-neighbor link prediction. Each op is pinned against an
independent pure-python reference on a micro graph (the reference
re-derives adjacency and the sha256 choice key itself — no shared code),
plus partitioning-invariance and hub/empty/int-key edge cases."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pytest

from ccnerx_ray.ops.walks import (bfs_distances, common_neighbor_pairs,
                                  random_walks)

EDGES = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("d", "e"),
         ("e", "f"), ("b", "f"), ("g", "h")]


def _edges_ds(rows, parallelism=1):
    import ray.data
    t = pa.table({"u": [r[0] for r in rows], "v": [r[1] for r in rows]})
    ds = ray.data.from_arrow(t)
    return ds.repartition(parallelism) if parallelism > 1 else ds


def _adj(rows):
    adj: dict = {}
    for u, v in rows:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


def _ref_walks(rows, length, salt="walk"):
    adj = _adj(rows)

    def key(wid, t, n):
        return (hashlib.sha256(
            f"{salt}:{wid}:{t}:{n}".encode()).hexdigest()[:15] + str(n))

    out = []
    for start in sorted(adj):
        cur = start
        out.append((start, 0, start))
        for t in range(1, length + 1):
            cur = min(adj[cur], key=lambda n: key(start, t, n))
            out.append((start, t, cur))
    return sorted(out)


def _ref_bfs(rows, seeds, max_depth):
    adj = _adj(rows)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, max_depth + 1):
        nxt = set()
        for node in frontier:
            for n in adj.get(node, ()):
                if n not in dist:
                    dist[n] = d
                    nxt.add(n)
        frontier = nxt
    return sorted(dist.items())


def _ref_cn(rows, top_n):
    adj = _adj(rows)
    edges = {tuple(sorted(e)) for e in rows}
    from collections import Counter
    cn: Counter = Counter()
    for m, ns in adj.items():
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                cn[(ns[i], ns[j])] += 1
    cand = [(x, y, c) for (x, y), c in cn.items()
            if (x, y) not in edges]
    cand.sort(key=lambda r: (-r[2], r[0], r[1]))
    return cand[:top_n]


def test_walks_match_reference(ray_session):
    got = random_walks(_edges_ds(EDGES), length=4).to_pandas()
    assert sorted(map(tuple, got.itertuples(index=False))) == \
        _ref_walks(EDGES, 4)


def test_walks_partitioning_invariance(ray_session):
    a = random_walks(_edges_ds(EDGES, 1), length=3).to_pandas()
    b = random_walks(_edges_ds(EDGES * 2, 5), length=3).to_pandas()
    key = ["walk_id", "step"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


def test_walks_never_dead_end_and_stay_adjacent(ray_session):
    got = random_walks(_edges_ds(EDGES), length=5).to_pandas()
    adj = _adj(EDGES)
    n_nodes = len(adj)
    assert len(got) == n_nodes * 6          # every walk runs full length
    bywalk = got.sort_values("step").groupby("walk_id")["node"]
    for wid, nodes in bywalk:
        seq = nodes.tolist()
        assert seq[0] == wid
        for a, b in zip(seq, seq[1:]):
            assert b in adj[a]


def test_walks_int_keys(ray_session):
    rows = [(1, 2), (2, 3), (1, 3), (3, 4)]
    got = random_walks(_edges_ds(rows), length=3).to_pandas()
    assert got["node"].dtype == "int64" and got["walk_id"].dtype == "int64"
    assert sorted(map(tuple, got.itertuples(index=False))) == \
        _ref_walks(rows, 3)


def test_walks_empty(ray_session):
    import ray.data
    empty = ray.data.from_arrow(pa.table(
        {"u": pa.array([], pa.string()), "v": pa.array([], pa.string())}))
    got = random_walks(empty, length=3)
    assert got.count() == 0
    assert set(got.schema().names) == {"walk_id", "step", "node"}


def test_bfs_matches_reference(ray_session):
    import ray.data
    seeds = ["a", "g"]
    got = bfs_distances(
        _edges_ds(EDGES),
        ray.data.from_arrow(pa.table({"entity": seeds})),
        max_depth=3).to_pandas()
    assert sorted(map(tuple, got.itertuples(index=False))) == \
        _ref_bfs(EDGES, seeds, 3)


def test_bfs_early_stop_and_unreachable(ray_session):
    import ray.data
    # component {g,h} unreachable from a; frontier empties before depth 9
    got = bfs_distances(
        _edges_ds(EDGES),
        ray.data.from_arrow(pa.table({"entity": ["a"]})),
        max_depth=9).to_pandas()
    d = dict(zip(got.entity, got.dist))
    assert "g" not in d and "h" not in d
    assert d == dict(_ref_bfs(EDGES, ["a"], 9))


def test_bfs_seed_not_in_graph(ray_session):
    import ray.data
    got = bfs_distances(
        _edges_ds(EDGES),
        ray.data.from_arrow(pa.table({"entity": ["zzz"]})),
        max_depth=2).to_pandas()
    # set semantics match the SQL anchor: the seed appears at dist 0
    assert sorted(map(tuple, got.itertuples(index=False))) == [("zzz", 0)]


def test_bfs_partitioning_invariance(ray_session):
    import ray.data
    seeds = ray.data.from_arrow(pa.table({"entity": ["a", "a", "g"]}))
    a = bfs_distances(_edges_ds(EDGES, 1), seeds, max_depth=3).to_pandas()
    b = bfs_distances(_edges_ds(EDGES * 3, 6), seeds,
                      max_depth=3).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("entity").reset_index(drop=True),
        b.sort_values("entity").reset_index(drop=True))


def test_cn_matches_reference(ray_session):
    got = common_neighbor_pairs(_edges_ds(EDGES), top_n=25).to_pandas()
    assert list(map(tuple, got.itertuples(index=False))) == \
        _ref_cn(EDGES, 25)


def test_cn_top_n_cut_deterministic(ray_session):
    full = _ref_cn(EDGES, 100)
    assert len(full) > 2
    got = common_neighbor_pairs(_edges_ds(EDGES), top_n=2).to_pandas()
    assert list(map(tuple, got.itertuples(index=False))) == full[:2]


def test_cn_hub_cap_bounds_wedges(ray_session):
    # planted star: hub h connected to 40 spokes → exact wedges C(40,2);
    # max_degree=5 keeps only C(5,2) per the explicit-truncation contract
    rows = [("h", f"s{i:02d}") for i in range(40)]
    exact = common_neighbor_pairs(_edges_ds(rows), top_n=1000).to_pandas()
    assert len(exact) == 40 * 39 // 2
    capped = common_neighbor_pairs(_edges_ds(rows), top_n=1000,
                                   max_degree=5).to_pandas()
    assert len(capped) == 5 * 4 // 2
    # the kept pairs are among the smallest spoke ids (deterministic cut)
    assert set(capped["x"]).union(capped["y"]) <= {f"s{i:02d}"
                                                   for i in range(5)}


def test_cn_empty(ray_session):
    import ray.data
    empty = ray.data.from_arrow(pa.table(
        {"u": pa.array([], pa.string()), "v": pa.array([], pa.string())}))
    got = common_neighbor_pairs(empty, top_n=5)
    assert got.count() == 0


@pytest.mark.parametrize("dup", [1, 3])
def test_cn_duplicate_edges_ignored(ray_session, dup):
    a = common_neighbor_pairs(_edges_ds(EDGES * dup), top_n=25).to_pandas()
    assert list(map(tuple, a.itertuples(index=False))) == _ref_cn(EDGES, 25)


def _ref_skipgram(rows, length, window):
    from collections import Counter
    walks = _ref_walks(rows, length)
    bywalk: dict = {}
    for wid, step, node in walks:
        bywalk.setdefault(wid, {})[step] = node
    cnt: Counter = Counter()
    for wid, steps in bywalk.items():
        for i, a in steps.items():
            for j, b in steps.items():
                if i != j and abs(i - j) <= window:
                    cnt[(a, b)] += 1
    return sorted((c, x, n) for (c, x), n in cnt.items())


def test_skipgram_matches_reference(ray_session):
    from ccnerx_ray.ops.walks import skipgram_pairs
    w = random_walks(_edges_ds(EDGES), length=4)
    got = skipgram_pairs(w, window=2).to_pandas()
    assert sorted(map(tuple, got.itertuples(index=False))) == \
        _ref_skipgram(EDGES, 4, 2)


def test_skipgram_partitioning_invariance(ray_session):
    from ccnerx_ray.ops.walks import skipgram_pairs
    a = skipgram_pairs(random_walks(_edges_ds(EDGES, 1), length=3),
                       window=2).to_pandas()
    b = skipgram_pairs(
        random_walks(_edges_ds(EDGES * 2, 5), length=3).repartition(7),
        window=2).to_pandas()
    key = ["center", "context"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


def test_skipgram_window_one_is_adjacent_transitions(ray_session):
    from ccnerx_ray.ops.walks import skipgram_pairs
    w = random_walks(_edges_ds(EDGES), length=4)
    got = skipgram_pairs(w, window=1).to_pandas()
    # window-1 totals = 2 pairs per step transition = 2·L per walk
    n_nodes = len(_adj(EDGES))
    assert got["n_pairs"].sum() == 2 * 4 * n_nodes
    assert got.equals(got.drop_duplicates(["center", "context"]))
