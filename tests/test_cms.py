"""Count-Min sketch (ops/sketches.py:cms_registers / cms_estimate):
register parity vs an independent reference, the classic ≥-true-count
guarantee, merge/partitioning invariance, and degenerate inputs."""
from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from ccnerx_ray.ops.sketches import cms_estimate, cms_registers


def _ref_registers(keys, depth, width):
    """Independent reference: plain dict-of-Counters, per-occurrence."""
    regs: Counter = Counter()
    for k in keys:
        for r in range(depth):
            h = int(hashlib.sha256(f"{r}:{k}".encode())
                    .hexdigest()[:15], 16)
            regs[(r, h % width)] += 1
    return regs


def _collect(ds) -> dict:
    df = ds.to_pandas()
    return {(int(a), int(b)): int(c)
            for a, b, c in zip(df["row"], df["idx"], df["cnt"])}


def _docs_ds(ray_session, texts, parts=1):
    import ray.data

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    return ds.repartition(parts) if parts > 1 else ds


TEXTS = ["the cat sat on the mat", "the dog ate the cat food",
         "mat and cat and dog", "", "   ", "solo"]
ALL_TOKENS = [w for t in TEXTS for w in t.split()]


def test_registers_match_independent_reference(ray_session):
    got = _collect(cms_registers(_docs_ds(ray_session, TEXTS), "text",
                                 depth=3, width=32, tokenize=True))
    want = dict(_ref_registers(ALL_TOKENS, 3, 32))
    assert got == want


def test_partitioning_invariance(ray_session):
    one = _collect(cms_registers(_docs_ds(ray_session, TEXTS), "text",
                                 depth=4, width=64, tokenize=True))
    many = _collect(cms_registers(_docs_ds(ray_session, TEXTS, parts=5),
                                  "text", depth=4, width=64,
                                  tokenize=True))
    assert one == many


def test_estimate_upper_bounds_truth(ray_session):
    regs = _collect(cms_registers(_docs_ds(ray_session, TEXTS), "text",
                                  depth=4, width=512, tokenize=True))
    truth = Counter(ALL_TOKENS)
    est = cms_estimate(regs, list(truth), depth=4, width=512)
    for k, c in truth.items():
        assert est[k] >= c                       # never underestimates
    # wide sketch over a tiny vocab: collisions are unlikely in EVERY
    # row, so the min is exact here
    assert est["the"] == truth["the"]
    assert est["solo"] == 1
    # an absent key estimates 0 (all four counters empty at width 512
    # would be a 4-way collision against 14 tokens — accept <= 1)
    assert est.get("absent-token", 0) <= 1


def test_whole_value_mode_and_weights(ray_session):
    import ray.data

    ds = ray.data.from_items([{"k": v} for v in
                              ["a", "a", "b", None, "a"]])
    regs = _collect(cms_registers(ds, "k", depth=2, width=16))
    want = dict(_ref_registers(["a", "a", "b", "", "a"], 2, 16))
    assert regs == want


def test_guards():
    # the guard fires before the dataset is touched
    with pytest.raises(ValueError):
        cms_registers(None, "text", depth=0)
    with pytest.raises(ValueError):
        cms_registers(None, "text", width=0)
