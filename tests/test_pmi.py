"""PMI phrase mining (ops/pmi.py): independent Counter-based reference,
planted-collocation recovery, support floor, partitioning invariance."""
from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from ccnerx_ray.ops.pmi import pmi_top_pairs, token_pair_counts


def _ref_pmi(texts, top_n, min_count):
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = t.split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    rows = [(x, y, c, uni[x], uni[y]) for (x, y), c in bi.items()
            if c >= min_count]
    rows.sort(key=lambda r: (-(r[2] / (r[3] * r[4])), r[0], r[1]))
    return pd.DataFrame(rows[:top_n],
                        columns=["tok_x", "tok_y", "c_xy", "c_x", "c_y"])


def _ds(ray_session, texts, parts=1):
    import ray.data

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    return ds.repartition(parts) if parts > 1 else ds


def _corpus(seed=7, n=40):
    rng = np.random.default_rng(seed)
    vocab = ["data", "stream", "block", "shard", "merge", "scan"]
    texts = []
    for i in range(n):
        toks = list(rng.choice(vocab, size=int(rng.integers(6, 20))))
        if i % 3 == 0:                       # planted collocation
            j = int(rng.integers(0, len(toks) - 1))
            toks[j:j + 2] = ["new", "york"]
        texts.append(" ".join(toks))
    return texts


def test_matches_independent_reference(ray_session):
    texts = _corpus()
    got = (pmi_top_pairs(_ds(ray_session, texts), top_n=10, min_count=2)
           .to_pandas().reset_index(drop=True))
    want = _ref_pmi(texts, 10, 2)
    pd.testing.assert_frame_equal(
        got.astype({"c_xy": "int64", "c_x": "int64", "c_y": "int64"}),
        want.astype({"c_xy": "int64", "c_x": "int64", "c_y": "int64"}))


def test_planted_collocation_ranks_first(ray_session):
    texts = _corpus()
    got = pmi_top_pairs(_ds(ray_session, texts), top_n=5,
                        min_count=3).to_pandas()
    assert (got.iloc[0].tok_x, got.iloc[0].tok_y) == ("new", "york")


def test_partitioning_invariance(ray_session):
    texts = _corpus(seed=11)
    a = (pmi_top_pairs(_ds(ray_session, texts), top_n=8, min_count=2)
         .to_pandas().reset_index(drop=True))
    b = (pmi_top_pairs(_ds(ray_session, texts, parts=7), top_n=8,
                       min_count=2).to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_support_floor_and_counts(ray_session):
    texts = ["a b a b a b", "c d"]
    got = pmi_top_pairs(_ds(ray_session, texts), top_n=10,
                        min_count=2).to_pandas()
    # only (a,b) and (b,a) clear the floor; (c,d) has count 1
    pairs = set(zip(got.tok_x, got.tok_y))
    assert pairs == {("a", "b"), ("b", "a")}
    ab = got[(got.tok_x == "a") & (got.tok_y == "b")].iloc[0]
    assert (ab.c_xy, ab.c_x, ab.c_y) == (3, 3, 3)


def test_pair_counts_reduce(ray_session):
    texts = ["x y x", "y x"]
    df = (token_pair_counts(_ds(ray_session, texts, parts=3))
          .to_pandas())
    uni = {r.x: r.c for r in df[df.kind == 0].itertuples()}
    bi = {(r.x, r.y): r.c for r in df[df.kind == 1].itertuples()}
    assert uni == {"x": 3, "y": 2}
    assert bi == {("x", "y"): 1, ("y", "x"): 2}


def test_min_count_guard(ray_session):
    with pytest.raises(ValueError):
        pmi_top_pairs(None, min_count=0)
