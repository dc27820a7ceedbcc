"""RAG composition (``ops/rag.py``): independent driver-side reference
(own sha256/chunk/quantize code), exact-match retrieval sanity, packing
guards, and partitioning invariance."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from ccnerx_ray.ops.rag import (chunk_embeddings, rag_build_store,
                                rag_chunk_knn, rag_store_knn)


def _ref_vec(text, dim):
    """Independent encoder: per-token sha256 (offset, stride) slices,
    component ((h1 + d·h2) mod 2^64) mod 2000001 − 1e6, mean over
    tokens in micros."""
    toks = text.split()
    sums = np.zeros(dim, dtype=object)
    for w in toks:
        hx = hashlib.sha256(w.encode()).hexdigest()
        h1, h2 = int(hx[:15], 16), int(hx[15:30], 16)
        for d in range(1, dim + 1):
            sums[d - 1] += ((h1 + d * h2) % 2**64) % 2_000_001 - 1_000_000
    n = max(len(toks), 1)
    return np.array([float(s) for s in sums]) / (n * 1e6), len(toks)


def _ref_rag(docs, queries, window, stride, dim, k):
    chunks = []
    for d in docs:
        toks = d["text"].split()
        for s in range(0, len(toks), stride):
            chunks.append((d["doc_id"], s // stride,
                           " ".join(toks[s:s + window])))
    V = np.stack([_ref_vec(c[2], dim)[0] for c in chunks])
    amax = np.abs(V).max()
    Vc = np.floor(V * 127.0 / amax)
    rows = []
    for qi, q in enumerate(queries):
        qv, _ = _ref_vec(q, dim)
        qc = np.floor(qv * 127.0 / amax)
        dots = (Vc @ qc).astype(np.int64)
        cids = np.array([c[0] * 4096 + c[1] for c in chunks])
        order = np.lexsort((cids, -dots))[:k]
        for r, j in enumerate(order):
            rows.append((qi, chunks[j][0], chunks[j][1], r + 1,
                         int(dots[j])))
    return pd.DataFrame(rows, columns=["query_id", "doc_id", "chunk_id",
                                       "rank", "qdot"])


def _corpus():
    import numpy as np

    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta"]
    docs = []
    for i in range(25):
        n = int(rng.integers(5, 40))
        docs.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, size=n))})
    return docs


def test_rag_matches_independent_reference(ray_session):
    import ray.data

    docs = _corpus()
    queries = ["alpha beta", "zeta zeta theta"]
    got = (rag_chunk_knn(ray.data.from_items(docs), queries, window=8,
                         stride=5, dim=6, k=7)
           .to_pandas().sort_values(["query_id", "rank"])
           .reset_index(drop=True))
    want = _ref_rag(docs, queries, 8, 5, 6, 7)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))


def test_rag_partitioning_invariance(ray_session):
    import ray.data

    docs = _corpus()
    frames = []
    for parts in (1, 9):
        ds = ray.data.from_items(docs).repartition(parts)
        frames.append(rag_chunk_knn(ds, ["gamma delta"], window=8,
                                    stride=5, dim=6, k=5)
                      .to_pandas().sort_values(["query_id", "rank"])
                      .reset_index(drop=True))
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_rag_exact_chunk_query_ranks_first(ray_session):
    import ray.data

    # docs over DISJOINT vocabularies; querying one doc's exact text
    # must put that doc's chunk at rank 1
    docs = [{"doc_id": 0, "text": "apple apple banana apple"},
            {"doc_id": 1, "text": "carrot daikon carrot daikon"},
            {"doc_id": 2, "text": "egg fig egg fig egg"}]
    got = (rag_chunk_knn(ray.data.from_items(docs),
                         ["carrot daikon carrot daikon"], window=8,
                         stride=8, dim=8, k=3)
           .to_pandas().sort_values("rank").reset_index(drop=True))
    assert got.iloc[0].doc_id == 1 and got.iloc[0].chunk_id == 0


def test_rag_guards(ray_session):
    import ray.data

    ds = ray.data.from_items([{"doc_id": 0, "text": "a b"}])
    with pytest.raises(ValueError):
        rag_chunk_knn(ds, ["ok", "   "])  # tokenless query

    neg = ray.data.from_items([{"doc_id": -1, "text": "a b"}])
    with pytest.raises(Exception):
        chunk_embeddings(neg).materialize()  # packed id needs id >= 0


def test_rag_store_probe_equals_direct(ray_session, tmp_path):
    import ray.data

    docs = _corpus()
    queries = ["alpha beta", "theta eta zeta"]
    store = str(tmp_path / "rag")
    ds = ray.data.from_items(docs)
    summary = rag_build_store(ds, store, window=8, stride=5, dim=6,
                              num_shards=4)
    assert summary["dim"] == 6 and summary["rows"] > len(docs)
    direct = (rag_chunk_knn(ds, queries, window=8, stride=5, dim=6, k=7)
              .to_pandas().sort_values(["query_id", "rank"])
              .reset_index(drop=True))
    probed = (rag_store_knn(store, queries, k=7)
              .to_pandas().sort_values(["query_id", "rank"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(direct.astype("int64"),
                                  probed.astype("int64"))


def test_chunk_embeddings_cid_bijection(ray_session):
    import ray.data

    docs = _corpus()
    emb = (chunk_embeddings(ray.data.from_items(docs), window=8,
                            stride=5, dim=4)
           .to_pandas())
    assert (emb.cid == emb.doc_id * 4096 + emb.chunk_id).all()
    assert emb.cid.is_unique

def _ref_rerank(docs, queries, window, stride, dim, k, m):
    """Independent two-stage reference: quantized top-m (the _ref_rag
    machinery), then exact integer sum-dot reranking by rdot/n_tokens."""
    chunks = []
    for d in docs:
        toks = d["text"].split()
        for s in range(0, len(toks), stride):
            sl = toks[s:s + window]
            chunks.append((d["doc_id"], s // stride, " ".join(sl),
                           len(sl)))
    V, S = [], []
    for c in chunks:
        v, _ = _ref_vec(c[2], dim)
        V.append(v)
        S.append(np.array([round(x) for x in v * c[3] * 1e6],
                          dtype=np.int64))
    V = np.stack(V)
    amax = np.abs(V).max()
    Vc = np.floor(V * 127.0 / amax)
    cids = np.array([c[0] * 4096 + c[1] for c in chunks])
    rows = []
    for qi, q in enumerate(queries):
        qv, nq = _ref_vec(q, dim)
        qS = np.array([round(x) for x in qv * max(nq, 1) * 1e6],
                      dtype=np.int64)
        qc = np.floor(qv * 127.0 / amax)
        dots = (Vc @ qc).astype(np.int64)
        cand = np.lexsort((cids, -dots))[:m]
        rd = np.array([int(S[j] @ qS) for j in cand], dtype=np.int64)
        nt = np.array([chunks[j][3] for j in cand], dtype=np.int64)
        ratio = rd.astype(np.float64) / nt
        order = np.lexsort((cids[cand], -ratio))[:k]
        for r, oi in enumerate(order):
            j = cand[oi]
            rows.append((qi, chunks[j][0], chunks[j][1], r + 1,
                         int(rd[oi]), int(nt[oi])))
    return pd.DataFrame(rows, columns=["query_id", "doc_id", "chunk_id",
                                       "rank", "rdot", "n_tokens"])


def test_rag_rerank_matches_independent_reference(ray_session):
    import ray.data

    from ccnerx_ray.ops.rag import rag_rerank

    docs = _corpus()
    queries = ["alpha beta", "zeta zeta theta"]
    got = (rag_rerank(ray.data.from_items(docs), queries, window=8,
                      stride=5, dim=6, k=6, m=15)
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    want = _ref_rerank(docs, queries, 8, 5, 6, 6, 15)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))


def test_rag_rerank_partitioning_invariance(ray_session):
    import ray.data

    from ccnerx_ray.ops.rag import rag_rerank

    docs = _corpus()
    frames = []
    for parts in (1, 9):
        ds = ray.data.from_items(docs).repartition(parts)
        frames.append(rag_rerank(ds, ["gamma delta"], window=8,
                                 stride=5, dim=6, k=5, m=12)
                      .sort_values(["query_id", "rank"])
                      .reset_index(drop=True))
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_rag_rerank_guards(ray_session):
    import ray.data

    from ccnerx_ray.ops.rag import rag_rerank

    ds = ray.data.from_items([{"doc_id": 0, "text": "a b"}])
    with pytest.raises(ValueError):
        rag_rerank(ds, ["ok"], k=10, m=5)        # m < k
    with pytest.raises(ValueError):
        rag_rerank(ds, ["   "])                  # tokenless query


def test_rag_rerank_stage2_reorders(ray_session):
    import ray.data

    from ccnerx_ray.ops.rag import rag_rerank

    # the rerank rank must follow the exact ratio, not the quantized
    # qdot: verify against the coarse ranking that at least the scores
    # used differ in kind (rdot is the unquantized integer dot)
    docs = _corpus()
    got = rag_rerank(ray.data.from_items(docs), ["alpha beta gamma"],
                     window=8, stride=5, dim=6, k=8, m=20)
    assert (got["rank"].to_numpy() == np.arange(1, len(got) + 1)).all()
    ratio = got["rdot"].to_numpy(np.float64) / got["n_tokens"].to_numpy()
    assert (np.diff(ratio) <= 1e-12).all()       # non-increasing
