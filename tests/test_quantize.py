"""SQ8 scalar quantization (``ops/quantize.py``): hand-worked code
arithmetic, ray ≡ independent-numpy-reference parity, store probe ≡
direct, compression evidence, recall vs exact float top-k, and the
degenerate scales."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ccnerx_ray.ops.quantize import (corpus_amax, sq8_codes, sq_build_store,
                                     sq_knn, sq_knn_store)


def test_sq8_codes_hand_worked():
    # amax 2.0 → code = floor(x * 127 / 2)
    V = np.array([[2.0, -2.0, 0.0, 1.0, -0.5, 0.01]])
    out = sq8_codes(V, 2.0)
    assert out.tolist() == [[127, -127, 0, 63, -32, 0]]
    # negative values floor TOWARD -inf: -0.5*63.5 = -31.75 → -32
    assert out.dtype == np.int64


def test_sq8_codes_zero_scale():
    V = np.zeros((3, 4))
    assert sq8_codes(V, 0.0).tolist() == np.zeros((3, 4)).tolist()


def _toy(ray_session, n=60, dim=8, seed=3):
    import ray.data

    rng = np.random.default_rng(seed)
    # two clusters plus noise so quantized ranking has real structure
    M = np.where(rng.random((n, 1)) < 0.5, 1.0, -1.0) * rng.random((n, dim))
    M = M.astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": M[i].tolist()} for i in range(n)])
    return ds, M.astype(np.float64)


def _reference_topk(M, Q, amax, k):
    """Independent driver-side reference: same quantization convention,
    plain argsort."""
    Mc = np.floor(M * 127.0 / amax) if amax else np.zeros_like(M)
    Qc = np.floor(Q * 127.0 / amax) if amax else np.zeros_like(Q)
    rows = []
    ids = np.arange(M.shape[0])
    for qi in range(Q.shape[0]):
        dots = (Qc[qi] * Mc).sum(axis=1).astype(np.int64)
        order = np.lexsort((ids, -dots))[:k]
        for r, j in enumerate(order):
            rows.append((qi, int(ids[j]), r + 1, int(dots[j])))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "rank", "qdot"])


def test_sq_knn_matches_reference(ray_session):
    ds, M = _toy(ray_session)
    Q = M[:3]
    amax = float(np.abs(M).max())
    assert corpus_amax(ds) == amax
    got = (sq_knn(ds, Q, k=5).to_pandas()
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    want = _reference_topk(M, Q, amax, 5)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_sq_store_probe_equals_direct(ray_session, tmp_path):
    ds, M = _toy(ray_session, n=80)
    Q = M[:4]
    store = str(tmp_path / "sq")
    summary = sq_build_store(ds, store, num_shards=4)
    assert summary["rows"] == 80 and summary["dim"] == 8
    # compression evidence: codes are 1 byte/component vs 4 for float32
    assert summary["code_logical_bytes"] * 4 == summary["raw_vec_logical_bytes"]
    direct = (sq_knn(ds, Q, k=7).to_pandas()
              .sort_values(["query_id", "rank"]).reset_index(drop=True))
    probed = (sq_knn_store(store, Q, k=7).to_pandas()
              .sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(direct.astype("int64"),
                                  probed.astype("int64"))


def test_sq_store_refuses_append(ray_session, tmp_path):
    ds, _ = _toy(ray_session, n=10)
    store = str(tmp_path / "sq")
    sq_build_store(ds, store, num_shards=2)
    with pytest.raises(FileExistsError):
        sq_build_store(ds, store, num_shards=2)


def test_sq_recall_vs_exact_float(ray_session):
    """Quantized ranking is approximate; on structured data recall@k vs
    the exact float inner product must stay high (the FAISS-SQ8
    contract). Uses clustered vectors, not adversarial noise."""
    ds, M = _toy(ray_session, n=120, dim=16, seed=11)
    Q = M[:5]
    got = sq_knn(ds, Q, k=10).to_pandas()
    ids = np.arange(M.shape[0])
    recalls = []
    for qi in range(Q.shape[0]):
        dots = M @ Q[qi]
        exact = set(ids[np.lexsort((ids, -dots))[:10]].tolist())
        mine = set(got[got.query_id == qi].vec_id.tolist())
        recalls.append(len(exact & mine) / 10)
    assert np.mean(recalls) >= 0.8, recalls


def test_sq_zero_corpus(ray_session):
    import ray.data

    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": [0.0, 0.0, 0.0]} for i in range(5)])
    out = (sq_knn(ds, np.zeros((1, 3)), k=3).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    # amax == 0 → every code 0 → every dot 0 → rank purely by vec_id
    assert out.vec_id.tolist() == [0, 1, 2]
    assert out.qdot.tolist() == [0, 0, 0]
