"""Corpus drift (``ops/drift.py``): hand-worked gain arithmetic vs an
independent Counter/bit_length reference (which re-derives the hash
splits with its own sha256 code), the OOV branch, the top-n cut, and
partitioning invariance."""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd
import pytest

from ccnerx_ray.ops.drift import split_drift, split_token_counts


def _pm(doc_id, salt="split"):
    d = hashlib.sha256(f"{salt}:{doc_id}".encode()).digest()
    return (int.from_bytes(d[:8], "big") >> 4) % 1000


def _reference(docs, bounds, split_a, split_b, top_n):
    """Independent driver-side reference implementation."""
    def split_of(doc_id):
        pm = _pm(doc_id)
        for name, hi in bounds:
            if pm < hi:
                return name
        raise AssertionError

    ca, cb = Counter(), Counter()
    for d in docs:
        s = split_of(d["doc_id"])
        toks = d["text"].split()
        if s == split_a:
            ca.update(toks)
        elif s == split_b:
            cb.update(toks)
    na, nb = sum(ca.values()), sum(cb.values())
    rows = []
    for t in set(ca) | set(cb):
        bits_a = (na.bit_length() - ca[t].bit_length() if ca[t]
                  else na.bit_length())
        bits_b = (nb.bit_length() - cb[t].bit_length() if cb[t]
                  else nb.bit_length())
        rows.append((t, ca[t], cb[t], bits_a, bits_b,
                     ca[t] * (bits_b - bits_a)))
    df = pd.DataFrame(rows, columns=["token", "c_a", "c_b", "bits_a",
                                     "bits_b", "gain_bits"])
    return (df.sort_values(["gain_bits", "token"],
                           ascending=[False, True])
            .head(top_n).reset_index(drop=True))


BOUNDS = (("a", 500), ("b", 1000))


def _docs():
    # ~half the ids land in each split under the 500-pm bound; 'drifty'
    # is concentrated in whichever slice doc 0 joins, 'common' is
    # everywhere, 'rare' appears once (exercises the OOV c=0 branch in
    # the OTHER slice)
    out = []
    for i in range(40):
        words = ["common"] * 3
        if _pm(i) < 500:
            words += ["drifty"] * 4
        if i == 7:
            words += ["rare"]
        out.append({"doc_id": i, "text": " ".join(words)})
    return out


def test_split_token_counts_vs_counter(ray_session):
    import ray.data

    docs = _docs()
    got = (split_token_counts(ray.data.from_items(docs), bounds_pm=BOUNDS,
                              split_a="a", split_b="b")
           .to_pandas().sort_values("token").reset_index(drop=True))
    ca, cb = Counter(), Counter()
    for d in docs:
        (ca if _pm(d["doc_id"]) < 500 else cb).update(d["text"].split())
    want = (pd.DataFrame(
        [(t, ca[t], cb[t]) for t in set(ca) | set(cb)],
        columns=["token", "c_a", "c_b"])
        .sort_values("token").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want.astype(
        {"c_a": "int64", "c_b": "int64"}))


@pytest.mark.parametrize("top_n", [3, 100])
def test_split_drift_vs_reference(ray_session, top_n):
    import ray.data

    docs = _docs()
    got = (split_drift(ray.data.from_items(docs), bounds_pm=BOUNDS,
                       split_a="a", split_b="b", top_n=top_n)
           .to_pandas().reset_index(drop=True))
    want = _reference(docs, BOUNDS, "a", "b", top_n)
    pd.testing.assert_frame_equal(
        got, want.astype({c: "int64" for c in
                          ["c_a", "c_b", "bits_a", "bits_b",
                           "gain_bits"]}))
    assert len(got) == min(top_n, 3)  # vocab: common / drifty / rare
    # the concentrated token tops the ranking with a positive gap
    assert got.iloc[0]["token"] == "drifty"
    assert got.iloc[0]["gain_bits"] > 0
    # OOV branch really fired: some token absent from one slice
    assert ((got["c_a"] == 0) | (got["c_b"] == 0)).any()


def test_split_drift_partitioning_invariance(ray_session):
    import ray.data

    docs = _docs()
    frames = []
    for parts in (1, 7):
        ds = ray.data.from_items(docs).repartition(parts)
        frames.append(split_drift(ds, bounds_pm=BOUNDS, split_a="a",
                                  split_b="b", top_n=10)
                      .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(frames[0], frames[1])
