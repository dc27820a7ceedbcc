"""Unigram-LM document scoring (ops/lm.py): hand-worked surprisal
arithmetic, OOV convention, zero-token sentinel, broadcast↔partitioned
parity, and the bitlen64 exactness guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from ccnerx_ray.ops.lm import bitlen64, score_documents, train_unigram


def _docs_ds(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def _scores(ds):
    out = {r["doc_id"]: r for r in ds.take_all()}
    return out


def _hand_scores(rows, model_rows):
    """Independent driver-side reference: collections.Counter training +
    int.bit_length scoring (the textbook formulation)."""
    from collections import Counter
    counts: Counter = Counter()
    for _i, t in model_rows:
        counts.update((t or "").split())
    n_total = sum(counts.values())
    nb = n_total.bit_length()
    exp = {}
    for i, t in rows:
        toks = (t or "").split()
        bits = sum(nb - counts[w].bit_length() if w in counts else nb
                   for w in toks)
        exp[i] = {"doc_id": i, "n_tokens": len(toks),
                  "surprisal_bits": bits,
                  "mean_surprisal_x100": (100 * bits) // len(toks)
                  if toks else 0}
    return exp


def test_train_and_score_hand_worked(ray_session):
    # counts: a=4, b=2, c=1, d=1  → N=8 (bitlen 4)
    # bits: a → 4-3=1, b → 4-2=2, c/d → 4-1=3
    rows = [(0, "a a b c"), (1, "a b d a"), (2, "")]
    ds = _docs_ds(rows)
    got = _scores(score_documents(ds, train_unigram(ds)))
    assert got[0] == {"doc_id": 0, "n_tokens": 4, "surprisal_bits": 1 + 1 + 2 + 3,
                      "mean_surprisal_x100": 700 // 4}
    assert got[1] == {"doc_id": 1, "n_tokens": 4, "surprisal_bits": 1 + 2 + 3 + 1,
                      "mean_surprisal_x100": 700 // 4}
    # zero-token doc keeps its row, all-zero stats
    assert got[2] == {"doc_id": 2, "n_tokens": 0, "surprisal_bits": 0,
                      "mean_surprisal_x100": 0}
    assert got == _hand_scores(rows, rows)


def test_oov_scoring_against_foreign_model(ray_session):
    model_rows = [(100, "x x x y")]     # N=4 (bitlen 3); x→3-2=1, y→3-1=2
    score_rows = [(0, "x y zz"), (1, "zz zz")]
    model = train_unigram(_docs_ds(model_rows))
    got = _scores(score_documents(_docs_ds(score_rows), model))
    # OOV token costs bitlen(N)=3 bits (the c=1/2 convention)
    assert got[0]["surprisal_bits"] == 1 + 2 + 3
    assert got[1]["surprisal_bits"] == 6
    assert got == _hand_scores(score_rows, model_rows)


def test_partitioned_path_matches_broadcast(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(0, 30)))))
            for i in range(60)]
    rows.append((60, ""))               # sentinel path
    ds = _docs_ds(rows)
    model = train_unigram(ds)
    bcast = _scores(score_documents(ds, model, mode="broadcast"))
    part = _scores(score_documents(ds, model, mode="partitioned",
                                   num_buckets=7))
    assert part == bcast == _hand_scores(rows, rows)


def test_partitioned_path_oov_and_auto_bound(ray_session):
    model_rows = [(100, "x x x y")]
    score_rows = [(0, "x y zz"), (1, "")]
    model = train_unigram(_docs_ds(model_rows))
    ds = _docs_ds(score_rows)
    part = _scores(score_documents(ds, model, mode="partitioned"))
    assert part == _hand_scores(score_rows, model_rows)
    # auto with a zero byte bound must take the partitioned path and agree
    auto = _scores(score_documents(ds, model, broadcast_bytes=0))
    assert auto == part
    with pytest.raises(ValueError, match="broadcast byte bound"):
        score_documents(ds, model, mode="broadcast", broadcast_bytes=0)


def test_bitlen64_exact_and_guarded():
    vals = [0, 1, 2, 3, 7, 8, 1023, 1024, (1 << 52) + 12345, (1 << 53) - 1]
    assert list(bitlen64(vals)) == [int(v).bit_length() for v in vals]
    with pytest.raises(ValueError, match="2\\*\\*53"):
        bitlen64([1 << 53])
    with pytest.raises(ValueError, match="non-negative"):
        bitlen64([-1])
