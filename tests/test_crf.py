"""Viterbi decode vs brute-force path enumeration (crf.py:89-134 semantics)."""

import itertools

import numpy as np

from ccnerx_ray.model.crf import CRFParams, IMPOSSIBLE, viterbi_decode


def brute_force(feats, mask, params):
    """Enumerate all tag paths over real tags; score exactly as the
    reference does: start→t0, transitions, emissions, last→stop."""
    L = int(mask.sum())
    C = feats.shape[1]
    real = [c for c in range(C)]
    best, best_path = -np.inf, None
    for path in itertools.product(real, repeat=L):
        s = params.transitions[path[0], params.start_idx] + feats[0, path[0]]
        for t in range(1, L):
            s += params.transitions[path[t], path[t - 1]] + feats[t, path[t]]
        s += params.transitions[params.stop_idx, path[L - 1]]
        if s > best:
            best, best_path = s, list(path)
    return best_path


def make_params(num_tags, seed):
    return CRFParams.seeded(num_tags, seed)


def test_matches_brute_force():
    rng = np.random.default_rng(0)
    num_tags = 3
    params = make_params(num_tags, 7)
    T = num_tags + 2
    for trial in range(20):
        L = int(rng.integers(1, 5))
        feats = rng.standard_normal((1, L, T))
        feats[:, :, -2:] = IMPOSSIBLE
        mask = np.ones((1, L))
        got = viterbi_decode(feats, mask, params)[0]
        want = brute_force(feats[0], mask[0], params)
        assert got == want, (trial, got, want)


def test_mask_trailing_padding():
    params = make_params(2, 3)
    T = 4
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 6, T))
    feats[:, :, -2:] = IMPOSSIBLE
    mask = np.ones((1, 6))
    mask[0, 4:] = 0
    got = viterbi_decode(feats, mask, params)[0]
    assert len(got) == 4
    # identical to decoding the unpadded row
    got2 = viterbi_decode(feats[:, :4], np.ones((1, 4)), params)[0]
    assert got == got2


def test_batch_composition_independence():
    """A row's path must not depend on its batch neighbours (SURVEY.md §7)."""
    params = make_params(4, 11)
    T = 6
    rng = np.random.default_rng(2)
    rows = [rng.standard_normal((int(rng.integers(1, 8)), T)) for _ in range(6)]
    for r in rows:
        r[:, -2:] = IMPOSSIBLE

    def decode_batch(batch):
        L = max(len(r) for r in batch)
        feats = np.zeros((len(batch), L, T))
        masks = np.zeros((len(batch), L))
        for i, r in enumerate(batch):
            feats[i, :len(r)] = r
            masks[i, :len(r)] = 1
        return viterbi_decode(feats, masks, params)

    solo = [decode_batch([r])[0] for r in rows]
    together = decode_batch(rows)
    assert solo == together
