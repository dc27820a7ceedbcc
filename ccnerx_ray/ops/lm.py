"""Unigram language-model document scoring — the CCNet/KenLM-style
perplexity quality filter re-expressed in exact integer arithmetic so the
whole train→score loop value-hashes against a SQL oracle.

The reference loads a scoring model once per worker and maps it over
text (SURVEY §2.4 stateful-stage family); a 100-TB curation pipeline
additionally needs the model TRAINED from the corpus it will filter
(Wenzek et al. 2020 — CCNet — train a LM on the target domain and keep
the low-perplexity tail). Training here is ONE corpus scan: per-batch
partial ``(token, n)`` counts (the classic combiner wordcount) landing
in a vocab-scale grouped reduce.

Scoring is exact-integer: ``floor(log2 x) == x.bit_length() - 1``, so a
token with corpus count ``c`` out of ``N`` total occurrences carries

    surprisal_bits(c) = N.bit_length() - c.bit_length()    (≈ log2(N/c), ≥ 0)

and a document's score is the sum over its token OCCURRENCES. An OOV
token (scoring a corpus the model never saw) costs ``N.bit_length()``
bits — the ``c = 1/2`` convention. DuckDB mirrors ``bit_length`` exactly
as ``length(bin(x))``, so the oracle re-trains and re-scores entirely in
SQL and the comparison is value-hash exact (no float logs on either
side).

Scale: the model broadcasts once per worker only under an asserted byte
bound (``ops/join.py:_materialize_build`` — never materializes past it);
beyond the bound the score pass explodes per-document DISTINCT
``(token, tf)`` pairs — doc-vocab scale, never raw occurrences — and
resolves them in ONE hash-partitioned co-group against the model
*Dataset* (``functions/grouping.py:lookup_join_on``) followed by a
per-doc pre-combined reduce; both sides stay distributed and nothing
lands on the driver. A forced-bound parity test pins the two paths
bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ccnerx_ray.functions.grouping import grouped_reduce, lookup_join_on
from ccnerx_ray.functions.tokenize import ws_tokens
from ccnerx_ray.ops import join as joinmod

# np.frexp on float64(int) is exact below 2**53; above, the conversion
# rounds and the exponent can misreport next to powers of two
_BITLEN_EXACT_MAX = 1 << 53


def bitlen64(arr) -> np.ndarray:
    """Vectorized exact ``int.bit_length`` for non-negative int64 values
    below 2**53 (the frexp exponent of the exact float64 conversion;
    ``bitlen(0) == 0``). Counts at/above 2**53 (> 9e15 token
    occurrences) raise loudly — at that scale swap in a chunked
    object-dtype ``int.bit_length`` map."""
    a = np.asarray(arr, dtype=np.int64)
    if a.size:
        if int(a.min()) < 0:
            raise ValueError("bitlen64 requires non-negative counts")
        if int(a.max()) >= _BITLEN_EXACT_MAX:
            raise ValueError(
                "bitlen64 is float64-exact only below 2**53; counts this "
                "large need a chunked int.bit_length map")
    return np.frexp(a.astype(np.float64))[1].astype(np.int64)


def train_unigram(docs, text_col: str = "text", num_buckets: int | None = None):
    """Corpus unigram counts ``(token, n)`` — one scan, per-batch
    combiner (distinct tokens per batch cross the shuffle, never raw
    occurrences), vocab-scale coarse reduce."""

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column(text_col).to_pylist():
            for w in ws_tokens(t):
                counts[w] = counts.get(w, 0) + 1
        return pa.table({"token": pa.array(list(counts), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    partials = docs.map_batches(partial, batch_format="pyarrow")
    if num_buckets is None:
        num_buckets = joinmod.derive_hash_partitions(None)
    # partial() already combined inside the batch → plain coarse reduce
    return grouped_reduce(partials, ["token"], {"n": "sum"},
                          num_buckets=num_buckets,
                          out_dtypes={"token": "string", "n": "int64"})


def score_documents(docs, model, *, text_col: str = "text",
                    id_col: str = "doc_id",
                    broadcast_bytes: int | None = None,
                    num_buckets: int | None = None,
                    mode: str = "auto"):
    """Per-document integer surprisal under a trained unigram model →
    ``(id_col, n_tokens, surprisal_bits, mean_surprisal_x100)``.

    ``mean_surprisal_x100 = (100 * surprisal_bits) // n_tokens`` (0 for
    empty documents — every document keeps its row). ``mode`` forces the
    ``"broadcast"`` or ``"partitioned"`` path for tests; ``"auto"``
    broadcasts only under ``broadcast_bytes`` (the
    ``_materialize_build`` incremental-abort contract)."""
    if mode not in ("auto", "broadcast", "partitioned"):
        raise ValueError(f"unknown mode {mode!r}")
    if broadcast_bytes is None:
        broadcast_bytes = joinmod.BROADCAST_BYTES_DEFAULT

    # vocab-scale plan executes once; feeds N, the byte estimate, and
    # whichever join side runs
    model = model.materialize()

    sch = docs.schema()
    id_type = sch.types[list(sch.names).index(id_col)]

    tbl = None
    if mode in ("auto", "broadcast"):
        tbl = joinmod._materialize_build(model, broadcast_bytes,
                                         model.size_bytes())
        if tbl is None and mode == "broadcast":
            raise ValueError("model exceeds the broadcast byte bound")

    if tbl is not None:
        # N comes off the already-pulled table — no extra executor job
        # (cold-session job count is the composite queries' wall cost)
        counts = tbl.column("n").to_numpy(zero_copy_only=False)
        n_total = int(counts.sum())
        oov_bits = n_bits = n_total.bit_length()
        bits = n_bits - bitlen64(counts)
        tbl = pa.table({"token": tbl.column("token"),
                        "bits": pa.array(bits, pa.int64())})
        import ray
        ref = ray.put(tbl)

        def score(batch: pa.Table) -> pa.Table:
            b, _keys, idx = joinmod._prepared_build(ref, "token")
            if idx is None:
                raise ValueError("model has duplicate tokens")
            toks = [ws_tokens(t)
                    for t in batch.column(text_col).to_pylist()]
            lens = np.fromiter((len(ts) for ts in toks), np.int64,
                               len(toks))
            flat = [w for ts in toks for w in ts]
            bb = b.column("bits").to_numpy(zero_copy_only=False)
            if flat:
                indexer = idx.get_indexer(pd.Index(flat))
                per_tok = np.where(indexer >= 0,
                                   bb[np.clip(indexer, 0, None)],
                                   oov_bits).astype(np.int64)
            else:
                per_tok = np.zeros(0, np.int64)
            cs = np.concatenate([np.zeros(1, np.int64),
                                 np.cumsum(per_tok, dtype=np.int64)])
            offs = np.concatenate([np.zeros(1, np.int64),
                                   np.cumsum(lens, dtype=np.int64)])
            sums = cs[offs[1:]] - cs[offs[:-1]]
            mean = np.where(lens > 0,
                            (100 * sums) // np.maximum(lens, 1), 0)
            return pa.table({
                id_col: batch.column(id_col),
                "n_tokens": pa.array(lens, pa.int64()),
                "surprisal_bits": pa.array(sums, pa.int64()),
                "mean_surprisal_x100": pa.array(mean, pa.int64())})

        return docs.map_batches(score, batch_format="pyarrow")

    # ---- partitioned path: per-doc distinct (token, tf) pairs co-grouped
    # against the model Dataset; zero-token docs ride a tf=0 sentinel
    # (ws_tokens never emits '', so the sentinel token cannot collide —
    # and its tf=0 contributes nothing either way)
    n_total = int(model.sum("n") or 0)
    oov_bits = n_bits = n_total.bit_length()
    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        out_id: list = []
        out_tok: list[str] = []
        out_tf: list[int] = []
        for i, t in zip(ids, batch.column(text_col).to_pylist()):
            counts: dict[str, int] = {}
            for w in ws_tokens(t):
                counts[w] = counts.get(w, 0) + 1
            if not counts:
                out_id.append(i)
                out_tok.append("")
                out_tf.append(0)
            else:
                out_id.extend([i] * len(counts))
                out_tok.extend(counts)
                out_tf.extend(counts.values())
        return pa.table({id_col: pa.array(out_id, id_type),
                         "token": pa.array(out_tok, pa.string()),
                         "tf": pa.array(out_tf, pa.int64())})

    def model_bits(batch: pa.Table) -> pa.Table:
        bits = n_bits - bitlen64(batch.column("n").to_numpy(
            zero_copy_only=False))
        return pa.table({"token": batch.column("token"),
                         "bits": pa.array(bits, pa.int64())})

    if num_buckets is None:
        num_buckets = joinmod.derive_hash_partitions(None)
    pair_ds = docs.map_batches(pairs, batch_format="pyarrow")
    lut = model.map_batches(model_bits, batch_format="pyarrow")
    joined = lookup_join_on(pair_ds, "token", lut, "bits",
                            num_buckets=num_buckets)

    def weigh(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        # lookup_join_on carries the value as string (null = OOV miss)
        bits = (pd.to_numeric(batch.column("bits").to_pandas())
                .fillna(oov_bits).astype(np.int64).to_numpy())
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": batch.column("tf").cast(pa.int64()),
            "surprisal_bits": pa.array(tf * bits, pa.int64())})

    per_doc = grouped_reduce(joined.map_batches(weigh,
                                                batch_format="pyarrow"),
                             [id_col],
                             {"n_tokens": "sum", "surprisal_bits": "sum"},
                             num_buckets=num_buckets, pre_combine=True)

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        s = batch.column("surprisal_bits").to_numpy(zero_copy_only=False)
        mean = np.where(n > 0, (100 * s) // np.maximum(n, 1), 0)
        return batch.append_column("mean_surprisal_x100",
                                   pa.array(mean, pa.int64()))

    return per_doc.map_batches(finalize, batch_format="pyarrow")


def train_bigram(docs, text_col: str = "text",
                 num_buckets: int | None = None):
    """Corpus adjacent-pair counts ``(w1, w2, n)`` — one scan, per-batch
    combiner, pair-scale coarse reduce. The pair identity stays TWO
    columns end to end (the delimiter-collision hazard class — same rule
    as the BPE and graph pair tables)."""

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for t in batch.column(text_col).to_pylist():
            toks = ws_tokens(t)
            for pair in zip(toks, toks[1:]):
                counts[pair] = counts.get(pair, 0) + 1
        return pa.table({
            "w1": pa.array([p[0] for p in counts], pa.string()),
            "w2": pa.array([p[1] for p in counts], pa.string()),
            "n": pa.array(list(counts.values()), pa.int64())})

    partials = docs.map_batches(partial, batch_format="pyarrow")
    if num_buckets is None:
        num_buckets = joinmod.derive_hash_partitions(None)
    return grouped_reduce(partials, ["w1", "w2"], {"n": "sum"},
                          num_buckets=num_buckets,
                          out_dtypes={"w1": "string", "w2": "string",
                                      "n": "int64"})


# per-process cache of prepared bigram lookup structures (the
# ops/join.py:_prepared_build recipe, keyed by object ref)
_PAIR_BUILDS: dict = {}


def _prepared_pair_build(ref):
    key = ref.hex()
    got = _PAIR_BUILDS.get(key)
    if got is None:
        import ray
        if len(_PAIR_BUILDS) > 4:
            _PAIR_BUILDS.clear()
        tbl = ray.get(ref)
        idx = pd.MultiIndex.from_arrays(
            [tbl.column("w1").to_pandas(), tbl.column("w2").to_pandas()])
        got = (tbl.column("n").to_numpy(zero_copy_only=False), idx)
        _PAIR_BUILDS[key] = got
    return got


def _uni_bits(cu: np.ndarray, seen: np.ndarray, n_bits: int) -> np.ndarray:
    """Unigram surprisal: ``bitlen(N) − bitlen(cu)`` where seen, else
    ``bitlen(N)`` (the c=1/2 OOV convention)."""
    safe = np.where(seen, cu, 1)
    return np.where(seen, n_bits - bitlen64(safe), n_bits).astype(np.int64)


def _cond_bits(cup: np.ndarray, prev_seen: np.ndarray,
               cb: np.ndarray, pair_seen: np.ndarray,
               uni_cur: np.ndarray) -> np.ndarray:
    """Conditional (bigram) surprisal per position > 0:

    * pair seen:   ``bitlen(cu(prev)) − bitlen(cb(pair))`` (≈ log2 of
      1/P(cur|prev); cb ≤ cu(prev) so it is ≥ 0);
    * pair unseen, prev seen: ``bitlen(cu(prev))`` (c=1/2 convention);
    * prev unseen: back off to the current token's unigram surprisal.
    """
    cup_safe = np.where(prev_seen, cup, 1)
    cb_safe = np.where(pair_seen, cb, 1)
    seen_bits = bitlen64(cup_safe) - bitlen64(cb_safe)
    miss_bits = bitlen64(cup_safe)
    return np.where(prev_seen,
                    np.where(pair_seen, seen_bits, miss_bits),
                    uni_cur).astype(np.int64)


def score_documents_bigram(docs, uni_model, big_model, *,
                           text_col: str = "text", id_col: str = "doc_id",
                           broadcast_bytes: int | None = None,
                           num_buckets: int | None = None,
                           mode: str = "auto"):
    """Per-document integer surprisal under a trained BIGRAM model →
    ``(id_col, n_tokens, surprisal_bits, mean_surprisal_x100)``.

    Position 0 scores by the unigram model; positions i>0 by the
    conditional convention of :func:`_cond_bits`. Both models broadcast
    only under the asserted byte bound (each checked; the bigram table
    is the one that outgrows it first — vocab², not vocab); beyond it
    the pass explodes per-doc DISTINCT pair rows plus one first-token
    row and resolves them through THREE hash-partitioned co-group
    lookups (pair → cb via the multi-key helper, prev → cu, cur → cu) —
    keys stay separate columns throughout — and a per-doc pre-combined
    reduce. Forced-path parity is pinned by test."""
    from ccnerx_ray.functions.grouping import (grouped_reduce,
                                               lookup_join_on,
                                               lookup_join_on_keys)

    if mode not in ("auto", "broadcast", "partitioned"):
        raise ValueError(f"unknown mode {mode!r}")
    if broadcast_bytes is None:
        broadcast_bytes = joinmod.BROADCAST_BYTES_DEFAULT

    uni_model = uni_model.materialize()
    big_model = big_model.materialize()

    sch = docs.schema()
    id_type = sch.types[list(sch.names).index(id_col)]

    u_tbl = b_tbl = None
    if mode in ("auto", "broadcast"):
        u_tbl = joinmod._materialize_build(uni_model, broadcast_bytes,
                                           uni_model.size_bytes())
        if u_tbl is not None:
            b_tbl = joinmod._materialize_build(big_model, broadcast_bytes,
                                               big_model.size_bytes())
        if (u_tbl is None or b_tbl is None) and mode == "broadcast":
            raise ValueError("model exceeds the broadcast byte bound")

    if u_tbl is not None and b_tbl is not None:
        u_counts = u_tbl.column("n").to_numpy(zero_copy_only=False)
        n_total = int(u_counts.sum())
        n_bits = n_total.bit_length()
        import ray
        u_ref = ray.put(pa.table({"token": u_tbl.column("token"),
                                  "n": u_tbl.column("n")}))
        b_ref = ray.put(b_tbl)

        def score(batch: pa.Table) -> pa.Table:
            ub, _keys, uidx = joinmod._prepared_build(u_ref, "token")
            if uidx is None:
                raise ValueError("unigram model has duplicate tokens")
            bc, bidx = _prepared_pair_build(b_ref)
            un = ub.column("n").to_numpy(zero_copy_only=False)
            toks = [ws_tokens(t)
                    for t in batch.column(text_col).to_pylist()]
            lens = np.fromiter((len(ts) for ts in toks), np.int64,
                               len(toks))
            flat = [w for ts in toks for w in ts]
            offs = np.concatenate([np.zeros(1, np.int64),
                                   np.cumsum(lens, dtype=np.int64)])
            if flat:
                cur_i = uidx.get_indexer(pd.Index(flat))
                cur_seen = cur_i >= 0
                cu_cur = np.where(cur_seen,
                                  un[np.clip(cur_i, 0, None)], 0)
                uni_cur = _uni_bits(cu_cur, cur_seen, n_bits)
                # per-position first-token mask from doc offsets
                first = np.zeros(len(flat), dtype=bool)
                first[offs[:-1][lens > 0]] = True
                prev = np.empty(len(flat), dtype=object)
                prev[1:] = flat[:-1]
                prev[first] = ""          # never a real token
                prev_i = uidx.get_indexer(pd.Index(prev.tolist()))
                prev_seen = prev_i >= 0
                cup = np.where(prev_seen,
                               un[np.clip(prev_i, 0, None)], 0)
                pair_i = bidx.get_indexer(
                    pd.MultiIndex.from_arrays([prev.tolist(), flat]))
                pair_seen = pair_i >= 0
                cb = np.where(pair_seen, bc[np.clip(pair_i, 0, None)], 0)
                bits = np.where(
                    first, uni_cur,
                    _cond_bits(cup, prev_seen, cb, pair_seen, uni_cur))
            else:
                bits = np.zeros(0, np.int64)
            cs = np.concatenate([np.zeros(1, np.int64),
                                 np.cumsum(bits, dtype=np.int64)])
            sums = cs[offs[1:]] - cs[offs[:-1]]
            mean = np.where(lens > 0,
                            (100 * sums) // np.maximum(lens, 1), 0)
            return pa.table({
                id_col: batch.column(id_col),
                "n_tokens": pa.array(lens, pa.int64()),
                "surprisal_bits": pa.array(sums, pa.int64()),
                "mean_surprisal_x100": pa.array(mean, pa.int64())})

        return docs.map_batches(score, batch_format="pyarrow")

    # ---- partitioned path ------------------------------------------------
    n_total = int(uni_model.sum("n") or 0)
    n_bits = n_total.bit_length()
    if num_buckets is None:
        num_buckets = joinmod.derive_hash_partitions(None)

    def rows_fn(batch: pa.Table) -> pa.Table:
        d, w1, w2, tf, first = [], [], [], [], []
        for did, t in zip(batch.column(id_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            toks = ws_tokens(t)
            if not toks:
                d.append(did); w1.append(""); w2.append("")
                tf.append(0); first.append(0)
                continue
            d.append(did); w1.append(""); w2.append(toks[0])
            tf.append(1); first.append(1)
            counts: dict[tuple[str, str], int] = {}
            for pr in zip(toks, toks[1:]):
                counts[pr] = counts.get(pr, 0) + 1
            for (a, b), c in counts.items():
                d.append(did); w1.append(a); w2.append(b)
                tf.append(c); first.append(0)
        return pa.table({id_col: pa.array(d, id_type),
                         "w1": pa.array(w1, pa.string()),
                         "w2": pa.array(w2, pa.string()),
                         "tf": pa.array(tf, pa.int64()),
                         "first": pa.array(first, pa.int64())})

    def renamed(model, key_cols, val_name):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {c: batch.column(c) for c in key_cols}
            cols[val_name] = batch.column("n")
            return pa.table(cols)
        return model.map_batches(fn, batch_format="pyarrow")

    rows = docs.map_batches(rows_fn, batch_format="pyarrow")
    rows = lookup_join_on_keys(rows, ["w1", "w2"],
                               renamed(big_model, ["w1", "w2"], "cb"),
                               "cb", num_buckets=num_buckets)
    rows = lookup_join_on(rows, "w1",
                          renamed(uni_model, ["token"], "cup"),
                          "cup", lut_key_col="token",
                          num_buckets=num_buckets)
    rows = lookup_join_on(rows, "w2",
                          renamed(uni_model, ["token"], "cuc"),
                          "cuc", lut_key_col="token",
                          num_buckets=num_buckets)

    def weigh(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        first = batch.column("first").to_numpy(zero_copy_only=False)

        def num(col):
            s = pd.to_numeric(batch.column(col).to_pandas())
            return (s.fillna(-1).astype(np.int64).to_numpy(),
                    s.notna().to_numpy())

        cb, pair_seen = num("cb")
        cup, prev_seen = num("cup")
        cuc, cur_seen = num("cuc")
        uni_cur = _uni_bits(np.maximum(cuc, 0), cur_seen, n_bits)
        bits = np.where(first == 1, uni_cur,
                        _cond_bits(np.maximum(cup, 0), prev_seen,
                                   np.maximum(cb, 0), pair_seen,
                                   uni_cur))
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": batch.column("tf").cast(pa.int64()),
            "surprisal_bits": pa.array(tf * bits, pa.int64())})

    per_doc = grouped_reduce(rows.map_batches(weigh,
                                              batch_format="pyarrow"),
                             [id_col],
                             {"n_tokens": "sum", "surprisal_bits": "sum"},
                             num_buckets=num_buckets, pre_combine=True)

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        s = batch.column("surprisal_bits").to_numpy(zero_copy_only=False)
        mean = np.where(n > 0, (100 * s) // np.maximum(n, 1), 0)
        return batch.append_column("mean_surprisal_x100",
                                   pa.array(mean, pa.int64()))

    return per_doc.map_batches(finalize, batch_format="pyarrow")
