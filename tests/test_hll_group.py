"""Per-group HLL (``ops/sketches.py:hll_group_registers``): register
parity vs a brute-force reference, estimate accuracy vs exact distinct,
partitioning invariance, and the int-keyed empty-batch schema."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from ccnerx_ray.ops.sketches import hll_estimate_sparse, hll_group_registers


def _ref_registers(rows, p=8):
    regs = {}
    for g, k in set(rows):
        h = int(hashlib.sha256(str(k).encode()).hexdigest()[:15], 16)
        idx = h >> (60 - p)
        rest = h & ((1 << (60 - p)) - 1)
        rho = (60 - p) + 1 - rest.bit_length() if rest else (60 - p) + 1
        key = (g, idx)
        if rho > regs.get(key, 0):
            regs[key] = rho
    return (pd.DataFrame([(g, i, r) for (g, i), r in regs.items()],
                         columns=["g", "idx", "rho"])
            .sort_values(["g", "idx"]).reset_index(drop=True))


def _rows(n=3000, groups=("click", "view", "buy")):
    import numpy as np

    rng = np.random.default_rng(9)
    return [(groups[int(rng.integers(len(groups)))],
             int(rng.integers(0, 700))) for _ in range(n)]


def test_grouped_registers_match_reference(ray_session):
    import ray.data

    rows = _rows()
    ds = ray.data.from_items([{"g": g, "k": k} for g, k in rows])
    got = (hll_group_registers(ds, "g", "k", p=8).to_pandas()
           .sort_values(["g", "idx"]).reset_index(drop=True))
    want = _ref_registers(rows)
    pd.testing.assert_frame_equal(
        got, want.astype({"idx": "int64", "rho": "int64"}))


def test_estimates_near_exact(ray_session):
    import ray.data

    rows = _rows(n=6000)
    ds = ray.data.from_items([{"g": g, "k": k} for g, k in rows])
    regs = hll_group_registers(ds, "g", "k", p=8).to_pandas()
    exact = pd.DataFrame(set(rows), columns=["g", "k"]).groupby(
        "g")["k"].nunique()
    for g, sub in regs.groupby("g"):
        est = hll_estimate_sparse(dict(zip(sub["idx"], sub["rho"])), p=8)
        # p=8 → ~6.5% std error; allow 3 sigma
        assert abs(est - exact[g]) / exact[g] < 0.2, (g, est, exact[g])


def test_partitioning_invariance(ray_session):
    import ray.data

    rows = _rows(n=1500)
    frames = []
    for parts in (1, 8):
        ds = ray.data.from_items(
            [{"g": g, "k": k} for g, k in rows]).repartition(parts)
        frames.append(hll_group_registers(ds, "g", "k", p=8).to_pandas()
                      .sort_values(["g", "idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_int_group_keys(ray_session):
    import ray.data

    ds = ray.data.from_items([{"g": i % 3, "k": i} for i in range(200)])
    out = hll_group_registers(ds, "g", "k", p=8).to_pandas()
    assert set(out["g"].unique()) == {0, 1, 2}
    assert out["g"].dtype.kind == "i"
