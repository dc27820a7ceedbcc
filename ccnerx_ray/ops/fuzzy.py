"""Edit-distance fuzzy matching: blocked candidate generation + a
pair-vectorized Levenshtein DP.

The reference groups near-identical surface forms with Python loops over
string pairs (`CC/loaders/utils/label_collections.py` similarity helpers);
here the same capability is a distributed blocked self-join: rows shuffle
once on the blocking key (exact cover of the equality predicate), and each
coarse group computes all surviving pair distances with a DP that runs one
numpy op per DP cell across ALL pairs at once — no Python-level loop over
pairs. Length pruning (|len(a)-len(b)| <= max_dist, implied by the distance
bound) keeps the candidate set near-linear under realistic name skew.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ccnerx_ray.functions.grouping import coarse_grouped


def batched_levenshtein(a_list: list[str], b_list: list[str]) -> np.ndarray:
    """Unit-cost Levenshtein distance for N string pairs at once.

    Classic (len(a)+1) x (len(b)+1) DP, vectorized across the pair axis:
    the i/j loops run over the MAX lengths only, and every cell update is
    one numpy minimum over all N pairs. Answers are harvested at row
    ``len(a)`` / column ``len(b)`` per pair, so padding never corrupts a
    result. Matches DuckDB's ``levenshtein()`` exactly (same unit costs).
    """
    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((len(s) for s in a_list), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in b_list), dtype=np.int64, count=n)
    max_a, max_b = int(la.max()), int(lb.max())

    def pad(strs, width):
        m = np.zeros((n, width), dtype=np.uint32)
        for i, s in enumerate(strs):
            if s:
                m[i, :len(s)] = np.frombuffer(
                    s.encode("utf-32-le"), dtype=np.uint32)
        return m

    A, B = pad(a_list, max(max_a, 1)), pad(b_list, max(max_b, 1))
    ans = np.zeros(n, dtype=np.int64)
    prev = np.broadcast_to(np.arange(max_b + 1, dtype=np.int64),
                           (n, max_b + 1)).copy()
    done = la == 0
    ans[done] = lb[done]
    cur = np.empty_like(prev)
    for i in range(1, max_a + 1):
        cur[:, 0] = i
        cost = (A[:, i - 1, None] != B).astype(np.int64)  # (n, max_b)
        for j in range(1, max_b + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1])
        hit = la == i
        if hit.any():
            ans[hit] = cur[hit, lb[hit]]
        prev, cur = cur, prev
    return ans


def fuzzy_name_pairs(ds, block_col: str, key_col: str, name_col: str,
                     max_dist: int = 2, num_buckets: int = 256):
    """All pairs (key_a < key_b) sharing ``block_col`` with
    ``levenshtein(name_a, name_b) <= max_dist``.

    One shuffle on the blocking key; inside each coarse group, candidate
    pairs are pruned by TWO lossless filters before the vectorized DP:
    the length band |len(a)-len(b)| <= max_dist (edit distance >= length
    difference) and the bag-of-characters bound (a substitution moves the
    character multiset by 2 L1 units, an insert/delete by 1, so edit
    distance >= L1(bag_a, bag_b)/2). The bag bound kills the bulk of the
    band survivors — the DP runs only on near-anagram candidates.
    Output: (block, key_a, key_b, dist).
    """

    def band_pair_chunks(ls: np.ndarray, chunk_pairs: int = 2_000_000):
        """Candidate (i, j) pairs over length-SORTED positions, emitted
        only inside the |Δlen| <= max_dist band (searchsorted window per
        position — the band is never materialized as a full triu; ADVICE
        r3: a hot block's O(b²) int64 triu allocated tens of GB before
        any pruning ran) and in bounded-memory chunks."""
        n = len(ls)
        hi = np.searchsorted(ls, ls + max_dist, side="right")
        cnt = hi - np.arange(n) - 1
        start = 0
        while start < n:
            end, tot = start, 0
            while end < n and (tot + cnt[end] <= chunk_pairs
                               or end == start):
                tot += int(cnt[end])
                end += 1
            if tot:
                c = cnt[start:end]
                ii = np.repeat(np.arange(start, end), c)
                offs = np.cumsum(c) - c
                yield ii, np.arange(tot) - np.repeat(offs, c) + ii + 1
            start = end

    def local(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for block, grp in g.groupby(block_col, sort=False):
            names = grp[name_col].to_numpy()
            keys = grp[key_col].to_numpy()
            codes = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
                     for s in names]
            lens = np.fromiter((len(c) for c in codes), dtype=np.int64,
                               count=len(codes))
            order = np.argsort(lens, kind="stable")
            ls = lens[order]
            # bag-of-chars counts over the group's observed alphabet
            vocab = np.unique(np.concatenate(codes)) if codes else \
                np.zeros(0, np.uint32)
            counts = np.zeros((len(names), len(vocab)), dtype=np.int16)
            for r, c in enumerate(codes):
                pos = np.searchsorted(vocab, c)
                np.add.at(counts[r], pos, 1)
            counts_s = counts[order]
            cand_i, cand_j = [], []
            for ii, jj in band_pair_chunks(ls):
                # bag bound (a substitution moves the character multiset
                # by 2 L1 units, an insert/delete by 1) applied PER
                # CHUNK, so survivors are all that ever accumulates
                l1 = np.abs(counts_s[ii].astype(np.int32)
                            - counts_s[jj]).sum(axis=1)
                bag = l1 <= 2 * max_dist
                if bag.any():
                    cand_i.append(order[ii[bag]])
                    cand_j.append(order[jj[bag]])
            if not cand_i:
                continue
            ii = np.concatenate(cand_i)
            jj = np.concatenate(cand_j)
            dist = batched_levenshtein(list(names[ii]), list(names[jj]))
            keep = dist <= max_dist
            ka, kb = keys[ii[keep]], keys[jj[keep]]
            lo, hi = np.minimum(ka, kb), np.maximum(ka, kb)
            frames.append(pd.DataFrame({
                block_col: block, "key_a": lo, "key_b": hi,
                "dist": dist[keep]}))
        if not frames:
            return pd.DataFrame({block_col: pd.Series([], dtype="string"),
                                 "key_a": pd.Series([], dtype="int64"),
                                 "key_b": pd.Series([], dtype="int64"),
                                 "dist": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    return coarse_grouped(ds, [block_col], local, num_buckets,
                          out_dtypes={block_col: "string", "key_a": "int64",
                                      "key_b": "int64", "dist": "int64"})
