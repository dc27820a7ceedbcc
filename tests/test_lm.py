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


# ------------------------------------------------------------ bigram LM
def _hand_scores_bigram(rows, model_rows):
    """Independent reference: Counter-trained unigram+bigram,
    int.bit_length conventions (module docstring of ops/lm.py)."""
    from collections import Counter
    uni: Counter = Counter()
    big: Counter = Counter()
    for _i, t in model_rows:
        toks = (t or "").split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    nb = sum(uni.values()).bit_length()

    def u(w):
        return nb - uni[w].bit_length() if w in uni else nb

    exp = {}
    for i, t in rows:
        toks = (t or "").split()
        bits = 0
        for j, w in enumerate(toks):
            if j == 0:
                bits += u(w)
            else:
                prev = toks[j - 1]
                if prev not in uni:
                    bits += u(w)
                elif (prev, w) not in big:
                    bits += uni[prev].bit_length()
                else:
                    bits += uni[prev].bit_length() \
                        - big[(prev, w)].bit_length()
        exp[i] = {"doc_id": i, "n_tokens": len(toks),
                  "surprisal_bits": bits,
                  "mean_surprisal_x100": (100 * bits) // len(toks)
                  if toks else 0}
    return exp


def _bigram_scores(score_rows, model_rows, **kw):
    from ccnerx_ray.ops.lm import (score_documents_bigram, train_bigram,
                                   train_unigram)
    m = _docs_ds(model_rows)
    return _scores(score_documents_bigram(
        _docs_ds(score_rows), train_unigram(m), train_bigram(m), **kw))


def test_bigram_hand_worked(ray_session):
    # uni: a=3 b=2 c=1 → N=6 (bitlen 3); big: (a,b)=2 (b,a)=1 (a,c)=1
    rows = [(0, "a b a c"), (1, "a b"), (2, "")]
    got = _bigram_scores(rows, rows)
    # doc 0: pos0 a: 3-2=1; (a,b): bitlen(3)-bitlen(2)=2-2=0;
    #        (b,a): bitlen(2)-bitlen(1)=2-1=1; (a,c): 2-1=1  → 3
    assert got[0]["surprisal_bits"] == 3
    # doc 1: pos0 a: 1; (a,b): 0 → 1
    assert got[1]["surprisal_bits"] == 1
    assert got[2] == {"doc_id": 2, "n_tokens": 0, "surprisal_bits": 0,
                      "mean_surprisal_x100": 0}
    assert got == _hand_scores_bigram(rows, rows)


def test_bigram_oov_conventions(ray_session):
    model_rows = [(100, "x y x y z")]
    score_rows = [
        (0, "x y"),       # seen pair
        (1, "x z"),       # prev seen, pair unseen → bitlen(cu(x))
        (2, "qq y"),      # prev unseen → unigram of y
        (3, "qq rr"),     # everything unseen
    ]
    got = _bigram_scores(score_rows, model_rows)
    assert got == _hand_scores_bigram(score_rows, model_rows)


def test_bigram_partitioned_matches_broadcast(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(15)]
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(0, 25)))))
            for i in range(50)]
    rows.append((50, ""))
    bcast = _bigram_scores(rows, rows, mode="broadcast")
    part = _bigram_scores(rows, rows, mode="partitioned", num_buckets=7)
    assert part == bcast == _hand_scores_bigram(rows, rows)
    # foreign-model partitioned path exercises every OOV branch
    model_rows = [(100, "x y x y z w0 w1")]
    b2 = _bigram_scores(rows, model_rows, mode="broadcast")
    p2 = _bigram_scores(rows, model_rows, mode="partitioned")
    assert p2 == b2 == _hand_scores_bigram(rows, model_rows)
