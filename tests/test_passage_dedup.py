"""Passage-level exact dedup (ops/dedup.py:passage_dedup_stats):
hand-worked keeper semantics, within-doc repeats, tail passages,
zero-token sentinel, hostile-token identity, partitioning invariance."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ccnerx_ray.ops.dedup import passage_dedup_stats


def _ds(rows, parallelism=None):
    import ray.data
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string())})
    ds = ray.data.from_arrow(tbl)
    if parallelism:
        ds = ds.repartition(parallelism)
    return ds


def _stats(ds, **kw):
    return {r["doc_id"]: (r["n_passages"], r["n_dup_passages"],
                          r["n_tokens_dropped"])
            for r in passage_dedup_stats(ds, **kw).take_all()}


def _reference(rows, window):
    """Driver-side textbook reference: dict of first-seen passages."""
    seen = {}
    out = {}
    for did, txt in sorted(rows):
        toks = (txt or "").split()
        n = dup = dropped = 0
        for s in range(0, len(toks), window):
            p = tuple(toks[s:s + window])
            n += 1
            if p in seen:
                dup += 1
                dropped += len(p)
            else:
                seen[p] = (did, s // window)
        out[did] = (n, dup, dropped)
    return out


def test_hand_worked_cross_and_within_doc(ray_session):
    rows = [
        (0, "a b c d e f"),          # passages (a b c d), (e f)
        (1, "a b c d x y z w"),      # first passage dups doc 0
        (2, "e f"),                  # NOT a dup of doc 0's tail? it IS:
                                     # (e f) == doc 0 passage 1 content
        (3, "p q p q"),              # one 4-token passage, no dup
        (4, "p q p q"),              # exact dup of doc 3's passage
        (5, ""),                     # zero-token sentinel
    ]
    got = _stats(_ds(rows), window=4)
    assert got[0] == (2, 0, 0)
    assert got[1] == (2, 1, 4)
    assert got[2] == (1, 1, 2)       # tail-length passages compare equal
    assert got[3] == (1, 0, 0)
    assert got[4] == (1, 1, 4)
    assert got[5] == (0, 0, 0)
    assert got == _reference(rows, 4)


def test_within_doc_repeat_is_dup(ray_session):
    rows = [(7, "x y x y")]          # window 2 → (x y) twice in one doc
    assert _stats(_ds(rows), window=2)[7] == (2, 1, 2)


def test_first_occurrence_order_is_doc_then_idx(ray_session):
    # same passage in docs 10 and 2 → doc 2 is the keeper
    rows = [(10, "k l m n"), (2, "z z z z k l m n")]
    got = _stats(_ds(rows), window=4)
    assert got[2] == (2, 0, 0)
    assert got[10] == (1, 1, 4)


def test_hostile_tokens_keep_identity(ray_session):
    # length-prefixed join: ("ab", "c") must NOT equal ("a", "bc"),
    # and tokens containing ':' or '\x1f' must not alias
    rows = [(0, "ab c"), (1, "a bc"), (2, "x\x1fy z"), (3, "x y\x1fz"),
            (4, "1:a b"), (5, "1 :a b")]
    got = _stats(_ds(rows), window=2)
    assert all(v == ((1, 0, 0) if k != 5 else (2, 0, 0))
               for k, v in got.items()), got


def test_partitioning_invariance_and_reference(ray_session):
    import numpy as np
    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(6)]
    rows = [(i, " ".join(rng.choice(vocab,
                                    size=int(rng.integers(0, 12)))))
            for i in range(80)]
    exp = _reference(rows, 3)
    for par in (1, 7):
        got = _stats(_ds(rows, parallelism=par), window=3, num_buckets=5)
        assert got == exp


def test_window_guard():
    with pytest.raises(ValueError, match="window"):
        passage_dedup_stats(None, window=0)


# ---------------------------------------------------------- key_skew
def test_key_skew_hand_worked(ray_session):
    import ray.data
    from ccnerx_ray.ops.profile import key_skew

    # counts: a=4, b=2, c=1, d=1 → N=8, Σc²=22, HHI=22/64
    tbl = pa.table({"k": pa.array(list("aaaabbcd"), pa.string())})
    out = key_skew(ray.data.from_arrow(tbl), "k").take_all()
    assert out == [{"n_rows": 8, "n_keys": 4, "max_count": 4,
                    "hhi_ppm": (1_000_000 * 22) // 64}]


def test_key_skew_hot_key_and_uniform(ray_session):
    import ray.data
    from ccnerx_ray.ops.profile import key_skew

    hot = pa.table({"k": pa.array(["h"] * 99 + ["x"], pa.string())})
    r = key_skew(ray.data.from_arrow(hot), "k").take_all()[0]
    assert r["max_count"] == 99 and r["hhi_ppm"] > 900_000

    uni = pa.table({"k": pa.array([str(i) for i in range(100)],
                                  pa.string())})
    r = key_skew(ray.data.from_arrow(uni), "k").take_all()[0]
    assert r["hhi_ppm"] == 10_000  # 1e6 / n_keys exactly
