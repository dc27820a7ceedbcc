"""Unit tests for the fourth-wave operator families (argmax row, mode,
triangle count); oracle parity is covered by jobs/sweep.py."""

import numpy as np
import pyarrow as pa


def test_grouped_argextreme_combiner_lossless(ray_session):
    """Per-batch pre-reduction must not change winners: force tiny blocks
    so every key spans many batches, and check against a driver argmax."""
    import pandas as pd
    import ray.data

    from ccnerx_ray.functions.grouping import grouped_argextreme

    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "val": rng.integers(0, 50, n),       # many ties per key
        "tie": np.arange(n, dtype=np.int64),  # unique tiebreak
    })
    ds = ray.data.from_pandas(df).repartition(23)
    got = grouped_argextreme(
        ds, ["k"], ["val", "tie"], [False, True], num_buckets=8,
        out_dtypes={"k": "int64", "val": "int64", "tie": "int64"}
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = (df.sort_values(["val", "tie"], ascending=[False, True])
              .drop_duplicates(subset=["k"])
              .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "val", "tie"]],
                                  want[["k", "val", "tie"]])


def test_triangle_count_known_graphs(ray_session):
    """K4 has 4 triangles; adding a pendant edge adds none; a 4-cycle has
    none. Exercises degree-ordered orientation incl. ties."""
    import ray.data

    from ccnerx_ray.ops.graph import triangle_count

    k4 = [{"u": a, "v": b} for a, b in
          [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]]
    assert triangle_count(ray.data.from_items(k4)) == 4
    assert triangle_count(
        ray.data.from_items(k4 + [{"u": 4, "v": 9}])) == 4
    cyc = [{"u": a, "v": b} for a, b in [(1, 2), (2, 3), (3, 4), (1, 4)]]
    assert triangle_count(ray.data.from_items(cyc)) == 0
    # duplicate-edge tolerance (lets callers skip the upstream dedup
    # all-to-all): tripling every K4 edge changes nothing — multigraph
    # degrees still orient consistently, wedge adjacency dedupes
    assert triangle_count(ray.data.from_items(k4 * 3)) == 4


def test_two_hop_counts_known_graph(ray_session):
    """Path 1-2-3-4 plus chord 1-3, worked by hand: distance-2 sets are
    {4} for 1, {4} for 2, {} for 3, {1,2} for 4. Duplicate input edges
    must not change the DISTINCT-neighbor counts."""
    import ray.data

    from ccnerx_ray.ops.graph import two_hop_counts

    es = [{"u": a, "v": b} for a, b in [(1, 2), (2, 3), (3, 4), (1, 3)]]
    want = {1: (2, 1), 2: (2, 1), 3: (3, 0), 4: (1, 2)}
    for edges in (es, es * 2):
        out = two_hop_counts(ray.data.from_items(edges)).to_pandas()
        got = {int(r.entity): (int(r.n_neighbors), int(r.n_two_hop))
               for r in out.itertuples()}
        assert got == want

    # degenerate inputs: a single edge has no 2-hop pairs; an EMPTY edge
    # set returns an empty typed frame instead of crashing on the
    # schema-less materialization
    import pandas as pd
    one = two_hop_counts(ray.data.from_items(es[:1])).to_pandas()
    assert {int(r.entity): (int(r.n_neighbors), int(r.n_two_hop))
            for r in one.itertuples()} == {1: (1, 0), 2: (1, 0)}
    empty = ray.data.from_pandas(pd.DataFrame(
        {"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")}))
    assert len(two_hop_counts(empty).to_pandas()) == 0

    # max_degree hub cap: a star 0-(1..5) has n_two_hop = 4 for every
    # leaf (exact); capping the middle's wedge sources at 3 keeps only
    # leaves {1,2,3} as sources, so capped counts are a LOWER bound and
    # uncapped leaves drop to 0 — approximation is explicit, not silent
    star = [{"u": 0, "v": i} for i in range(1, 6)]
    exact = {int(r.entity): int(r.n_two_hop)
             for r in two_hop_counts(
                 ray.data.from_items(star)).to_pandas().itertuples()}
    assert exact == {0: 0, 1: 4, 2: 4, 3: 4, 4: 4, 5: 4}
    capped = {int(r.entity): int(r.n_two_hop)
              for r in two_hop_counts(
                  ray.data.from_items(star),
                  max_degree=3).to_pandas().itertuples()}
    assert capped == {0: 0, 1: 2, 2: 2, 3: 2, 4: 0, 5: 0}
    assert all(capped[k] <= exact[k] for k in exact)


def test_two_hop_hub_cap_bounds_wedge_volume(ray_session):
    """VERDICT r4 #6 hub-skew evidence: a planted hub of degree 20,000
    (the 'one entity in >=10% of docs' regime) with ``max_degree=64``
    keeps the wedge stage at C(64,2) = 2,016 candidate pairs instead of
    C(20k,2) ≈ 2·10⁸ — volume and truncation both recorded in the run
    metrics that feed lineage — and the capped result is the documented
    deterministic lower bound (the 64 smallest-id leaves)."""
    import ray.data

    from ccnerx_ray.ops.graph import two_hop_counts
    from ccnerx_ray.state import metrics

    HUB_DEG, CAP = 20_000, 64
    star = ray.data.range(HUB_DEG).map_batches(
        lambda b: {"u": [0] * len(b["id"]), "v": (b["id"] + 1).tolist()},
        batch_format="numpy")

    metrics.reset()
    out = two_hop_counts(star, max_degree=CAP).to_pandas()
    got = dict(zip(out.entity.astype(int), out.n_two_hop.astype(int)))

    # kept sources = the CAP smallest leaf ids (1..64), each seeing the
    # other 63; every truncated leaf reports 0 — a lower bound, explicit
    assert got[0] == 0
    assert all(got[i] == CAP - 1 for i in range(1, CAP + 1))
    assert all(got[i] == 0 for i in (CAP + 1, CAP + 2, HUB_DEG))

    snap = metrics.snapshot()
    assert snap.get("two_hop_wedges_truncated", 0) >= HUB_DEG - CAP
    wedges = snap.get("two_hop_wedge_pairs", 0)
    assert 0 < wedges <= CAP * (CAP - 1) // 2, \
        f"wedge volume {wedges} not bounded by C({CAP},2)"
    metrics.reset()


def test_two_hop_pair_key_collision_and_empty_dtype(ray_session):
    """ADVICE r4 regressions. (a) String node ids containing the old '|'
    delimiter: path a|b — c — a with direct edge ('a','b|c') used to
    collide pair ('a|b','c') with that edge's key and wrongly anti-join
    the genuine distance-2 pair away. (b) An EMPTY int-keyed edge set
    must return an int64 entity column (same schema as non-empty runs),
    not a hard-coded string."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ccnerx_ray.ops.graph import encode_pair_key, two_hop_counts

    # encode_pair_key is injective on the ambiguous family
    k1 = encode_pair_key(pa.array(["a|b"]), pa.array(["c"]))
    k2 = encode_pair_key(pa.array(["a"]), pa.array(["b|c"]))
    assert k1.to_pylist() != k2.to_pylist()

    # wedge middle 'c': neighbors {'a|b', 'a'} → candidate 2-hop pair
    # ('a', 'a|b') — distinct from every direct edge, must survive
    es = [{"u": "a|b", "v": "c"}, {"u": "a", "v": "c"},
          {"u": "a", "v": "b|c"}]
    out = two_hop_counts(ray.data.from_items(es)).to_pandas()
    got = {r.entity: int(r.n_two_hop) for r in out.itertuples()}
    assert got["a|b"] == 1 and got["a"] == 1

    empty = ray.data.from_pandas(pd.DataFrame(
        {"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")}))
    res = two_hop_counts(empty)
    sch = res.schema()
    assert pa.types.is_integer(
        dict(zip(sch.names, sch.types))["entity"])


def test_user_retention_hand_worked(ray_session):
    import ray.data
    import pandas as pd

    from ccnerx_ray.queries.relational4 import q_user_retention

    WK = 604_800_000_000  # µs per epoch-week

    def ts(week, off_us=1):
        return pd.Timestamp(week * WK + off_us, unit="us")

    # user 1: weeks 100,101,103 · user 2: weeks 100,101 · user 3: week 101
    rows = [(1, ts(100)), (1, ts(100, 5)), (1, ts(101)), (1, ts(103)),
            (2, ts(100)), (2, ts(101)), (3, ts(101))]
    ds = ray.data.from_items(
        [{"user_id": u, "ts": t} for u, t in rows]).repartition(3)

    # replicate q_user_retention's stages over this fixture dataset
    # (the query function itself reads from an sf dir)
    import pyarrow as pa
    from ccnerx_ray.functions.grouping import (drop_duplicate_rows,
                                               grouped_reduce)
    from ccnerx_ray.ops import join as joinmod

    def to_weeks(batch):
        us = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({"user_id": batch.column("user_id").to_numpy(
            zero_copy_only=False), "wk": us // WK}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = drop_duplicate_rows(
        ds.map_batches(to_weeks, batch_format="pyarrow"),
        ["user_id", "wk"], num_buckets=8).materialize()
    cohort = grouped_reduce(pairs, ["user_id"], {"wk": "min"},
                            num_buckets=8,
                            out_dtypes={"user_id": "int64",
                                        "wk": "int64"})
    cohort = cohort.map_batches(
        lambda b: b.rename_columns(["user_id", "cohort_week"]),
        batch_format="pyarrow")
    j = joinmod.adaptive_join(pairs, cohort, on="user_id").to_pandas()
    j["week_offset"] = j["wk"] - j["cohort_week"]
    got = (j.groupby(["cohort_week", "week_offset"]).size()
           .rename("n_users").reset_index()
           .sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))
    want = pd.DataFrame({
        "cohort_week": [100, 100, 100, 101],
        "week_offset": [0, 1, 3, 0],
        "n_users": [2, 2, 1, 1],
    })
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))
