"""Distributed BPE tokenizer training over a text corpus.

A 100-TB training-data pipeline needs its tokenizer TRAINED on the corpus
it will tokenize; classic byte-pair encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm) learns a merge table by repeatedly fusing the most frequent
adjacent symbol pair. The standard production regime — and the only one
that scales — trains on the WORD-FREQUENCY table, not the raw corpus:

* **one corpus-scale pass** builds ``(word, cnt)`` via a pre-combined
  coarse reduce (``grouped_reduce``) — corpus bytes are touched exactly
  once, the shuffle carries distinct words;
* the **merge loop runs over the word table** (distinct-word scale,
  ~10^8-10^9 rows at 100 TB — big enough to stay distributed, orders of
  magnitude below corpus scale). Each iteration: vectorized adjacent-pair
  counting (Arrow list-offset arithmetic + a per-batch ``group_by``
  pre-combine), one pair-scale reduce, a width-bounded local-argmax
  collect (the top-k×blocks merge shape), then the winning merge applied
  via ``map_batches`` — only rows actually containing the pair are
  rebuilt.

Contract (shared with the independent reference implementation in
``corpus.py:expected_bpe_merges`` and the VALUES oracle):

* words are whitespace-split tokens of ``text_col`` (empties dropped);
* a word's initial symbols are its characters plus a trailing ``</w>``
  end-of-word marker symbol;
* each round merges the pair with the highest total count, ties broken
  by lexicographically smallest ``(left, right)``; merging within a word
  is greedy left-to-right; training stops early when the best pair's
  count is < 2.

Driver fast path (the ``kmeans``/``dup_components`` bounded-collect
precedent): when the distinct-word table has ≤ ``max_driver_words`` rows
it is collected and the loop runs in-process — exactly the regime
single-node BPE trainers use — with the distributed path taking over
beyond the bound. Both paths are pinned bit-identical by a forced-bound
parity test.

No reference counterpart (the reference consumes pre-trained BERT
vocabularies, ``vocab.txt`` readers only); this operator is part of the
LLM-data-pipeline family the brief adds on top of SURVEY §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ccnerx_ray.functions.grouping import grouped_reduce
from ccnerx_ray.ops.join import derive_hash_partitions

MERGE_SCHEMA = pa.schema([
    ("merge_rank", pa.int64()), ("left_sym", pa.string()),
    ("right_sym", pa.string()), ("pair_count", pa.int64()),
])


def _word_rows(text_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        la = pc.utf8_split_whitespace(
            batch.column(text_col).combine_chunks())
        flat = pc.list_flatten(la)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({
            "word": flat,
            "cnt": pa.array(np.ones(len(flat), dtype=np.int64)),
        })
    return fn


def word_frequencies(corpus, text_col: str = "text",
                     input_bytes: int | None = None):
    """corpus → distributed ``(word, cnt)`` table: the ONE corpus-scale
    pass of BPE training. Pre-combined coarse reduce — the shuffle
    carries distinct words per bucket, never corpus-scale token rows."""
    rows = corpus.map_batches(_word_rows(text_col), batch_format="pyarrow")
    return grouped_reduce(rows, ["word"], {"cnt": "sum"},
                          num_buckets=derive_hash_partitions(input_bytes),
                          out_dtypes={"word": "string", "cnt": "int64"},
                          pre_combine=True)


def _symbolize(batch: pa.Table) -> pa.Table:
    # one-time pass at DISTINCT-WORD scale (not corpus scale): the
    # char-split has no Arrow kernel, and each distinct word is touched
    # exactly once here.
    syms = [list(w) + ["</w>"] for w in batch.column("word").to_pylist()]
    return pa.table({
        "syms": pa.array(syms, pa.list_(pa.string())),
        "cnt": batch.column("cnt"),
    })


def _pair_partials(batch: pa.Table) -> pa.Table:
    """Vectorized adjacent-pair counting: list-offset arithmetic finds
    in-word adjacencies, a per-batch group_by pre-combines — rows leaving
    the batch are (left, right, partial count), pair-scale not
    symbol-scale. The pair stays TWO columns end to end: a joined key
    would be ambiguous for symbols containing the delimiter (the graph
    pair-key lesson), and tuple order is the tie-break contract."""
    la = batch.column("syms").combine_chunks()
    flat = pc.list_flatten(la)
    n = len(flat)
    if n < 2:
        return pa.table({"l": pa.array([], pa.string()),
                         "r": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    parent = pc.list_parent_indices(la).to_numpy(zero_copy_only=False)
    valid = parent[:-1] == parent[1:]
    left = flat.slice(0, n - 1).filter(pa.array(valid))
    right = flat.slice(1, n - 1).filter(pa.array(valid))
    w = pc.take(batch.column("cnt"),
                pa.array(parent[:-1][valid], pa.int64()))
    t = pa.table({"l": left, "r": right, "c": w})
    return t.group_by(["l", "r"]).aggregate([("c", "sum")]) \
            .rename_columns(["l", "r", "c"])


def _local_best(batch: pa.Table) -> pa.Table:
    """pair-scale reduce output → one local champion row per block:
    max count, then lexicographically smallest (left, right) tuple."""
    if batch.num_rows == 0:
        return batch
    t = batch.filter(pc.equal(batch.column("c"), pc.max(batch.column("c"))))
    t = t.filter(pc.equal(t.column("l"), pc.min(t.column("l"))))
    return t.filter(pc.equal(t.column("r"),
                             pc.min(t.column("r")))).slice(0, 1)


def _merge_word(syms: list, left: str, right: str, fused: str) -> list:
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(fused)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _apply_merge(left: str, right: str):
    fused = left + right

    def fn(batch: pa.Table) -> pa.Table:
        la = batch.column("syms").combine_chunks()
        flat = pc.list_flatten(la)
        n = len(flat)
        if n < 2:
            return batch
        parent = pc.list_parent_indices(la).to_numpy(zero_copy_only=False)
        adj = parent[:-1] == parent[1:]
        hit = adj & pc.and_(
            pc.equal(flat.slice(0, n - 1), left),
            pc.equal(flat.slice(1, n - 1), right)).to_numpy(
                zero_copy_only=False).astype(bool)
        if not hit.any():
            return batch
        # rebuild ONLY the rows that contain the pair (Python, but the
        # affected-row fraction collapses after the first few merges and
        # the table is distinct-word scale to begin with); row order is
        # irrelevant downstream (pair counting is order-free), so the
        # untouched majority passes through zero-copy
        sel = np.zeros(batch.num_rows, dtype=bool)
        sel[np.unique(parent[:-1][hit])] = True
        keep = batch.filter(pa.array(~sel))
        aff = batch.filter(pa.array(sel))
        fixed = [_merge_word(s, left, right, fused)
                 for s in aff.column("syms").to_pylist()]
        aff = pa.table({"syms": pa.array(fixed, pa.list_(pa.string())),
                        "cnt": aff.column("cnt")})
        return pa.concat_tables([keep, aff]).combine_chunks()
    return fn


def _train_driver(words: list[tuple[str, int]], num_merges: int):
    """In-process merge loop over a collected (word, cnt) list — the
    bounded fast path. Same contract as the distributed loop."""
    freq = {}
    for w, c in words:
        k = tuple(list(w) + ["</w>"])
        freq[k] = freq.get(k, 0) + c
    merges = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in freq.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < 2:
            break
        merges.append((rank, best[0], best[1], counts[best]))
        fused = best[0] + best[1]
        nxt = {}
        for syms, c in freq.items():
            ns = tuple(_merge_word(list(syms), best[0], best[1], fused))
            nxt[ns] = nxt.get(ns, 0) + c
        freq = nxt
    return merges


def _merges_from_wf(wf, num_merges: int, input_bytes: int | None,
                    max_driver_words: int) -> list:
    """(word, cnt) Dataset → merge list — the loop shared by
    :func:`train_bpe` and :func:`bpe_vocab`."""
    n_words = wf.count()
    if n_words == 0:
        merges: list = []
    elif n_words <= max_driver_words:
        rows = [(r["word"], r["cnt"]) for r in wf.take_all()]
        merges = _train_driver(rows, num_merges)
    else:
        merges = []
        words = wf.map_batches(_symbolize, batch_format="pyarrow") \
                  .materialize()
        nb = derive_hash_partitions(input_bytes)
        for rank in range(num_merges):
            pairs = grouped_reduce(
                words.map_batches(_pair_partials, batch_format="pyarrow"),
                ["l", "r"], {"c": "sum"}, num_buckets=nb,
                out_dtypes={"l": "string", "r": "string", "c": "int64"},
                pre_combine=True)
            champs = [r for r in
                      pairs.map_batches(_local_best,
                                        batch_format="pyarrow").take_all()]
            if not champs:
                break
            best = min(champs,
                       key=lambda r: (-r["c"], (r["l"], r["r"])))
            if best["c"] < 2:
                break
            left, right = best["l"], best["r"]
            merges.append((rank, left, right, best["c"]))
            words = words.map_batches(_apply_merge(left, right),
                                      batch_format="pyarrow").materialize()
    return merges


def _merge_table(merges: list) -> pa.Table:
    return pa.table({
        "merge_rank": pa.array([m[0] for m in merges], pa.int64()),
        "left_sym": pa.array([m[1] for m in merges], pa.string()),
        "right_sym": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    })


def train_bpe(corpus, text_col: str = "text", num_merges: int = 50,
              input_bytes: int | None = None,
              max_driver_words: int = 2_000_000) -> pa.Table:
    """corpus → BPE merge table ``(merge_rank, left_sym, right_sym,
    pair_count)``.

    The corpus-scale work (word counting) is always distributed; the
    merge loop collects the distinct-word table when it fits under
    ``max_driver_words`` rows (single-node trainer regime) and otherwise
    iterates distributed: per round one pair-scale pre-combined reduce,
    a width-bounded local-argmax collect, and a broadcast-free merge map
    (the winning pair travels in the task closure — two strings)."""
    wf = word_frequencies(corpus, text_col, input_bytes)
    return _merge_table(
        _merges_from_wf(wf, num_merges, input_bytes, max_driver_words))


def bpe_vocab(corpus, text_col: str = "text", num_merges: int = 50,
              input_bytes: int | None = None,
              max_driver_words: int = 2_000_000) -> pa.Table:
    """corpus → the trained vocabulary table ``(token_id, token, kind)``:
    base symbols first (every distinct character of the corpus words,
    sorted, plus ``</w>``), then merged symbols in rank order; duplicate
    strings (two merge paths fusing to the same text) dedupe keeping the
    smallest id. The Ray-native analogue of the reference's ordered
    ``vocab.txt`` artifact (``vocab.py`` readers, SURVEY §2 S4/K2) with
    the vocabulary LEARNED from the corpus instead of shipped. The word
    table is materialized once and feeds both the alphabet scan and the
    merge loop."""
    wf = word_frequencies(corpus, text_col, input_bytes).materialize()

    def chars(batch: pa.Table) -> pa.Table:
        seen = sorted({ch for w in batch.column("word").to_pylist()
                       for ch in w})
        return pa.table({"token": pa.array(seen, pa.string())})

    alpha_ds = grouped_reduce(
        wf.map_batches(chars, batch_format="pyarrow").map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.ones(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow"),
        ["token"], {"one": "sum"}, num_buckets=8,
        out_dtypes={"token": "string", "one": "int64"}, pre_combine=True)
    # alphabet-scale collect (distinct characters — bounded by the
    # corpus's script repertoire, thousands at most)
    alphabet = sorted(r["token"] for r in alpha_ds.take_all())
    merges = _merges_from_wf(wf, num_merges, input_bytes,
                             max_driver_words)
    toks: list[tuple[str, str]] = [(t, "base") for t in alphabet]
    toks.append(("</w>", "base"))
    toks.extend((l + r, "merged") for _rank, l, r, _c in merges)
    seen: dict[str, None] = {}
    rows = [(t, k) for t, k in toks
            if t not in seen and seen.setdefault(t) is None]
    return pa.table({
        "token_id": pa.array(range(len(rows)), pa.int64()),
        "token": pa.array([t for t, _k in rows], pa.string()),
        "kind": pa.array([k for _t, k in rows], pa.string()),
    })


def apply_bpe(corpus, merges: pa.Table, text_col: str = "text",
              out_col: str = "bpe_tokens"):
    """Tokenize a corpus with a trained merge table: one stateless
    ``map_batches`` pass; the merge list rides the task closure (it is
    vocab-scale — tens of thousands of rows — not data-scale). Merges
    apply in rank order per word, the greedy-left contract."""
    ranked = sorted(zip(merges.column("merge_rank").to_pylist(),
                        merges.column("left_sym").to_pylist(),
                        merges.column("right_sym").to_pylist()))

    def encode_word(w: str, cache: dict) -> list:
        got = cache.get(w)
        if got is None:
            syms = list(w) + ["</w>"]
            for _r, l, r, in ranked:
                if len(syms) < 2:
                    break
                syms = _merge_word(syms, l, r, l + r)
            got = cache[w] = syms
        return got

    def fn(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        toks = []
        for text in batch.column(text_col).to_pylist():
            out: list = []
            for w in (text or "").split():
                out.extend(encode_word(w, cache))
            toks.append(out)
        return batch.append_column(out_col,
                                   pa.array(toks, pa.list_(pa.string())))
    return corpus.map_batches(fn, batch_format="pyarrow")
