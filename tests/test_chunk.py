"""Overlapping token-window chunking (``ops/chunk.py``): hand-worked
boundaries, coverage/overlap invariants, degenerate docs, guards."""

from __future__ import annotations

import pandas as pd
import pytest

from ccnerx_ray.ops.chunk import chunk_documents


def _run(ray_session, docs, **kw):
    import ray.data

    return (chunk_documents(ray.data.from_items(docs), **kw)
            .to_pandas().sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True))


def test_hand_worked_windows(ray_session):
    docs = [{"doc_id": 1, "text": "a b c d e f g"}]  # 7 tokens
    out = _run(ray_session, docs, window=4, stride=3)
    # starts 0, 3, 6 → windows abcd / defg(4) / g(1)
    assert out.start_tok.tolist() == [0, 3, 6]
    assert out.chunk_id.tolist() == [0, 1, 2]
    assert out.n_tokens.tolist() == [4, 4, 1]
    assert out.chunk_text.tolist() == ["a b c d", "d e f g", "g"]


def test_every_token_covered_and_overlap(ray_session):
    text = " ".join(f"w{i}" for i in range(53))
    out = _run(ray_session, [{"doc_id": 0, "text": text}],
               window=24, stride=16)
    covered = set()
    for _, r in out.iterrows():
        covered |= set(range(r.start_tok, r.start_tok + r.n_tokens))
        toks = r.chunk_text.split()
        assert toks == [f"w{i}" for i in
                        range(r.start_tok, r.start_tok + r.n_tokens)]
    assert covered == set(range(53))
    # consecutive chunks overlap by window - stride = 8 (except the tail)
    assert out.start_tok.tolist() == [0, 16, 32, 48]
    assert out.n_tokens.tolist() == [24, 24, 21, 5]


def test_exact_multiple_boundary(ray_session):
    # n == stride: exactly one full chunk, NO empty trailing chunk
    out = _run(ray_session, [{"doc_id": 0, "text": "a b c"}],
               window=3, stride=3)
    assert len(out) == 1 and out.n_tokens.tolist() == [3]


def test_degenerates(ray_session):
    docs = [{"doc_id": 0, "text": ""},        # no tokens → no chunks
            {"doc_id": 1, "text": "   "},     # whitespace only
            {"doc_id": 2, "text": "solo"}]    # single short doc
    out = _run(ray_session, docs, window=8, stride=8)
    assert out.doc_id.tolist() == [2]
    assert out.chunk_text.tolist() == ["solo"]


def test_guards(ray_session):
    import ray.data

    ds = ray.data.from_items([{"doc_id": 0, "text": "x"}])
    with pytest.raises(ValueError):
        chunk_documents(ds, window=4, stride=5)  # gaps would drop tokens
    with pytest.raises(ValueError):
        chunk_documents(ds, window=0, stride=1)
