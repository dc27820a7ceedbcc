"""Signed random projection (ops/projection.py): arbitrary-precision
python-int reference, sign-matrix determinism, integer linearity,
partitioning invariance, guards."""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from ccnerx_ray.ops.projection import rp_project, rp_sign_matrix


def _ref_sign(i, j, salt="rp"):
    h = int.from_bytes(
        hashlib.sha256(f"{salt}:{i}:{j}".encode()).digest()[:8],
        "big") >> 4
    return 1 if h % 2 == 0 else -1


def _ref_project(vectors, d_out, salt="rp"):
    # pure-python ints: arbitrary precision, so any int64 overflow in
    # the op would show up as a mismatch
    rows = []
    for vid, v in vectors:
        micro = [int(np.sign(x) * np.floor(abs(x * 1e6) + 0.5))
                 for x in v]
        for j in range(1, d_out + 1):
            y = sum(m * _ref_sign(i + 1, j, salt)
                    for i, m in enumerate(micro))
            rows.append((vid, j, y))
    return pd.DataFrame(rows, columns=["vec_id", "dim", "y"])


def _vecs(seed=3, n=25, d=8):
    rng = np.random.default_rng(seed)
    return [(i, list(rng.normal(size=d) * 1.5)) for i in range(n)]


def _ds(ray_session, vectors, parts=1):
    import ray.data

    ds = ray.data.from_items(
        [{"vec_id": vid, "embedding": v} for vid, v in vectors])
    return ds.repartition(parts) if parts > 1 else ds


def _sorted(df):
    return df.sort_values(["vec_id", "dim"]).reset_index(drop=True)


def test_matches_python_int_reference(ray_session):
    vectors = _vecs()
    got = rp_project(_ds(ray_session, vectors), d_out=5).to_pandas()
    want = _ref_project(vectors, 5)
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want))


def test_partitioning_invariance(ray_session):
    vectors = _vecs(seed=11, n=40)
    a = rp_project(_ds(ray_session, vectors, parts=7),
                   d_out=4).to_pandas()
    pd.testing.assert_frame_equal(_sorted(a), _sorted(_ref_project(
        vectors, 4)))


def test_sign_matrix_deterministic_and_balanced():
    S = rp_sign_matrix(64, 16)
    assert np.array_equal(S, rp_sign_matrix(64, 16))
    assert set(np.unique(S)) == {-1, 1}
    # sha256 bits: close to half positive (loose 3-sigma-ish band)
    frac = (S == 1).mean()
    assert 0.42 < frac < 0.58
    # salt changes the matrix
    assert not np.array_equal(S, rp_sign_matrix(64, 16, salt="rp2"))


def test_integer_linearity(ray_session):
    # exact-micro inputs (integer multiples of 1e-6): projection is
    # linear at the integer level, proj(x+y) == proj(x) + proj(y)
    x = [1e-6 * k for k in (5, -3, 7, 2)]
    y = [1e-6 * k for k in (-2, 9, 1, -8)]
    s = [a + b for a, b in zip(x, y)]
    out = rp_project(
        _ds(ray_session, [(0, x), (1, y), (2, s)]), d_out=3).to_pandas()
    piv = out.pivot(index="dim", columns="vec_id", values="y")
    assert (piv[0] + piv[1] == piv[2]).all()


def test_guards(ray_session):
    with pytest.raises(ValueError, match="dims"):
        rp_sign_matrix(0, 4)
    ragged = _ds(ray_session, [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])])
    with pytest.raises(Exception, match="width|ragged"):
        rp_project(ragged, d_out=2, d_in=2).materialize()


# ------------------------------------------------------------------ rp_knn
def _ref_rp_knn(vectors, qidx, k, m, d_out, salt="rp"):
    """Independent two-stage reference: python-int projection dots,
    then numpy cosine rerank — own sign/micro code path."""
    ids = [vid for vid, _ in vectors]
    V = np.stack([np.asarray(v, dtype=np.float64) for _, v in vectors])
    d_in = V.shape[1]
    S = np.array([[_ref_sign(i, j, salt)
                   for j in range(1, d_out + 1)]
                  for i in range(1, d_in + 1)], dtype=object)
    micro = np.vectorize(
        lambda x: int(np.sign(x) * np.floor(abs(x * 1e6) + 0.5)),
        otypes=[object])
    P = micro(V) @ S                      # python ints — no overflow
    out = []
    for qid in qidx:
        qrow = P[ids.index(qid)]
        pd_ = [(int(sum(a * b for a, b in zip(qrow, P[r]))), ids[r])
               for r in range(len(ids))]
        pd_.sort(key=lambda t: (-t[0], t[1]))
        cand = sorted(i for _, i in pd_[:m])
        qv = V[ids.index(qid)]
        qn = qv / np.linalg.norm(qv)
        sims = [(float(qn @ (V[ids.index(c)]
                             / np.linalg.norm(V[ids.index(c)]))), c)
                for c in cand]
        sims.sort(key=lambda t: (-t[0], t[1]))
        for r, (_, c) in enumerate(sims[:k], 1):
            out.append((qid, c, r))
    return pd.DataFrame(out, columns=["query_id", "vec_id", "rank"])


def test_rp_knn_matches_reference(ray_session):
    from ccnerx_ray.ops.projection import rp_knn

    vectors = _vecs(seed=5, n=30, d=12)
    ds = _ds(ray_session, vectors, parts=4)
    got = rp_knn(ds, np.stack([np.asarray(v) for _, v in vectors[:3]]),
                 query_ids=[0, 1, 2], k=5, m=12, d_out=6)
    want = _ref_rp_knn(vectors, [0, 1, 2], k=5, m=12, d_out=6)
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        want.sort_values(["query_id", "rank"]).reset_index(drop=True))


def test_rp_knn_probe_all_equals_exact_knn(ray_session):
    # m >= corpus size ⇒ stage 1 passes everything and the result IS
    # exact cosine knn (the ivf_knn_full probe-all contract)
    from ccnerx_ray.ops.projection import rp_knn
    from ccnerx_ray.ops.similarity import knn_bruteforce

    vectors = _vecs(seed=9, n=35, d=10)
    ds = _ds(ray_session, vectors, parts=3)
    Q = np.stack([np.asarray(v) for _, v in vectors[:2]])
    got = rp_knn(ds, Q, query_ids=[0, 1], k=6, m=100, d_out=4)
    exact = (knn_bruteforce(ds, Q, query_ids=[0, 1], k=6)
             .to_pandas()[["query_id", "vec_id", "rank"]])
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
        .astype({"query_id": "int64", "vec_id": "int64",
                 "rank": "int64"}))


def test_rp_knn_guards(ray_session):
    from ccnerx_ray.ops.projection import rp_knn

    ds = _ds(ray_session, _vecs(n=5, d=4))
    with pytest.raises(ValueError, match="candidates"):
        rp_knn(ds, np.zeros((1, 4)), k=10, m=5)
