"""Deduplication family over document tables.

Exact dedup is the G5 pattern from the reference (hash-keyed first-wins,
``label_counter.py:39-44`` / ``expand_data.py:63-109``) scaled out: partial
per-batch combiners, then a hash groupby on a content digest — never a
shuffle of raw text. Near-dup (MinHash+LSH, SimHash, embedding-cosine) is
new capability a 100 TB training-data pipeline needs (no counterpart in the
reference).

Scale notes (10^12 rows):
* every groupby key here is a short digest (8-64 bytes), never document
  text — the shuffle moves keys + ids (+ compact binary signatures) only;
* all high-cardinality groupbys go through
  :func:`ccnerx_ray.functions.grouping.coarse_grouped` — hash-partition to
  a bounded bucket count, vectorized pandas groupby inside (10× faster
  than per-group ``map_groups`` at sf0.1, identical output);
* LSH bucket sizes are capped (``max_bucket``) so one degenerate bucket
  (e.g. the empty document) cannot emit O(n²) pairs; drops are by
  deterministic id order and are the documented trade-off of LSH dedup;
* exact-cosine all-pairs is the sf-scale oracle baseline; the scale path is
  :func:`embedding_dup_pairs_lsh` (random-hyperplane bucketing).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ccnerx_ray.functions.grouping import (coarse_grouped,
                                           drop_duplicate_rows, semi_join_on)
from ccnerx_ray.functions.tokenize import ws_tokens
from ccnerx_ray.functions.hashing import (minhash_params, minhash_signature,
                                          sha256_hex, simhash64, stable_hash64)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ one row per distinct text: ``(text_sha256, keep_id, n_copies)``
    with ``keep_id = min(id)`` (deterministic first-wins). Per-batch
    combiner first: hot texts collapse before the shuffle."""

    def combine(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        agg: dict[str, list] = {}
        for t, i in zip(texts, ids):
            key = sha256_hex(t or "")
            cur = agg.get(key)
            if cur is None:
                agg[key] = [i, 1]
            else:
                cur[0] = min(cur[0], i)
                cur[1] += 1
        return pa.table({
            "text_sha256": pa.array(list(agg.keys()), pa.string()),
            "keep_id": pa.array([v[0] for v in agg.values()], pa.int64()),
            "n_copies": pa.array([v[1] for v in agg.values()], pa.int64()),
        })

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("text_sha256", sort=False)
                 .agg(keep_id=("keep_id", "min"), n_copies=("n_copies", "sum"))
                 .reset_index())

    partials = ds.map_batches(combine, batch_format="pyarrow")
    # the shuffle carries ~90 B digest rows, not documents (~1/10 of the
    # corpus bytes for ~1 KB docs); width follows the data with the old
    # 512 as the corpus-scale cap
    width = int(min(max((ds.size_bytes() or 0) // (640 << 20), 8), 512))
    return coarse_grouped(partials, ["text_sha256"], local,
                          num_buckets=width,
                          out_dtypes={"text_sha256": "string",
                                      "keep_id": "int64",
                                      "n_copies": "int64"})


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep exactly the ``min(id)`` row of each distinct-text group
    (all original columns survive)."""

    def add_key(batch: pa.Table) -> pa.Table:
        keys = [sha256_hex(t or "") for t in batch.column(text_col).to_pylist()]
        return batch.append_column("_dedup_key", pa.array(keys, pa.string()))

    def local(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.loc[g.groupby("_dedup_key", sort=False)[id_col].idxmin()]
        return keep.drop(columns=["_dedup_key"])

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    # full rows shuffle here — size from the corpus bytes directly
    width = int(min(max((ds.size_bytes() or 0) // (64 << 20), 8), 512))
    return coarse_grouped(keyed, ["_dedup_key"], local, num_buckets=width)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """k-token shingle hashes in the 60-bit vectorized-fold domain
    (:func:`~ccnerx_ray.functions.hashing.fold_shingles60` over
    :func:`~ccnerx_ray.functions.hashing.token_hashes60`): sha256 runs
    once per unique TOKEN, the per-shingle combine is a numpy uint64
    multiply-add fold — DuckDB mirrors the fold in HUGEINT arithmetic, so
    the whole MinHash/Jaccard family stays oracle-reproducible while the
    map stage stops paying one Python hashlib call per shingle (VERDICT
    r3 #2)."""
    from ccnerx_ray.functions.hashing import fold_shingles60, token_hashes60

    return fold_shingles60(token_hashes60(ws_tokens(text)), k)


def batch_shingle_hashes(texts, k: int) -> list[np.ndarray]:
    """Per-document shingle-hash arrays for a whole batch: one factorize
    over the batch's tokens, one sha256 per unique token (process-cached
    across batches), then a vectorized fold per document."""
    from ccnerx_ray.functions.hashing import (batch_token_hash_lists,
                                              fold_shingles60)

    flat, offsets = batch_token_hash_lists(texts, ws_tokens)
    return [fold_shingles60(flat[offsets[i]:offsets[i + 1]], k)
            for i in range(len(texts))]


def minhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_k: int = 3, seed: int = 1):
    """→ ``(id, sig binary)`` per document; the signature rides as a
    num_perm×8-byte binary blob (hash-join- and shuffle-friendly)."""
    a, b = minhash_params(num_perm, seed)

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        shingles = batch_shingle_hashes(
            batch.column(text_col).to_pylist(), shingle_k)
        sigs = [minhash_signature(hs, a, b).tobytes() for hs in shingles]
        return pa.table({
            id_col: pa.array(ids, batch.schema.field(id_col).type),
            "sig": pa.array(sigs, pa.binary()),
        })

    return ds.map_batches(sig_batch, batch_format="pyarrow")


def _pairs_from_buckets(g: pd.DataFrame, id_col: str, bucket_col: str,
                        sig_col: str, max_bucket: int,
                        score_fn) -> pd.DataFrame:
    """Vectorized within-coarse-group pair emission: local groupby on the
    true bucket key, numpy signature comparison per bucket. Rows dropped
    by the ``max_bucket`` cap are counted into the ``lsh_rows_truncated``
    run metric (no silent caps)."""
    from ccnerx_ray.state import metrics

    ida, idb, score = [], [], []
    truncated = 0
    for _, sub in g.groupby(bucket_col, sort=False):
        if len(sub) < 2:
            continue
        truncated += max(0, len(sub) - max_bucket)
        sub = sub.sort_values(id_col).head(max_bucket)
        ids = sub[id_col].to_numpy()
        S = np.stack([np.frombuffer(x, dtype=np.int64) for x in sub[sig_col]])
        for x in range(len(ids) - 1):
            sc = score_fn(S[x], S[x + 1:])
            for j in np.nonzero(sc[0])[0]:
                ida.append(ids[x])
                idb.append(ids[x + 1 + j])
                score.append(sc[1][j])
    metrics.incr("lsh_rows_truncated", truncated)
    return pd.DataFrame({"id_a": ida, "id_b": idb, "score": score})


def _dedup_pairs(pairs, score_name: str, score_dtype: str = "float64"):
    def local(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values(["id_a", "id_b"])
                .drop_duplicates(subset=["id_a", "id_b"]))
        return out.rename(columns={"score": score_name})

    return coarse_grouped(pairs, ["id_a", "id_b"], local, num_buckets=64,
                          out_dtypes={"id_a": "int64", "id_b": "int64",
                                      score_name: score_dtype})


def lsh_candidate_pairs(sig_ds, id_col: str = "doc_id", bands: int = 16,
                        threshold: float = 0.7, max_bucket: int = 64,
                        num_buckets: int = 1024):
    """MinHash-LSH: band the signatures, coarse-bucket-groupby, emit
    verified pairs ``(id_a, id_b, est_jaccard)`` with est_jaccard =
    fraction of agreeing signature components, filtered at ``threshold``.

    The shuffle carries (bucket int64, id, sig binary) — tiny relative to
    the corpus."""

    def band_rows(batch: pa.Table) -> pa.Table:
        from ccnerx_ray.functions.hashing import FNV64_PRIME, splitmix64

        ids = batch.column(id_col)
        sigs = batch.column("sig").to_pylist()
        n = len(sigs)
        if n == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             id_col: ids,
                             "sig": pa.array([], pa.binary())})
        S = np.frombuffer(b"".join(sigs), dtype=np.uint64).reshape(n, -1)
        P = S.shape[1]
        r = P // bands
        # bucket key per (doc, band): FNV fold of the band's r signature
        # components, mixed with the band index — all vectorized; bucket
        # equality tracks band equality modulo a ~2^-64 mix collision
        # (the r3 per-(doc, band) Python stable_hash64 had the same
        # collision contract and cost a hash call per row)
        M = np.uint64(FNV64_PRIME)
        fold = np.zeros((n, bands), dtype=np.uint64)
        for j in range(r):
            # component j of every band: columns j, j+r, j+2r, ...
            fold = fold * M + S[:, j + np.arange(bands) * r]
        mixed = splitmix64(
            fold ^ ((np.arange(1, bands + 1, dtype=np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15))[None, :]))
        bucket = (mixed >> np.uint64(1)).astype(np.int64).ravel()
        idx = np.repeat(np.arange(n), bands)
        return pa.table({
            "bucket": pa.array(bucket, pa.int64()),
            id_col: ids.take(pa.array(idx)),
            "sig": pa.array([sigs[i] for i in idx], pa.binary()),
        })

    def score(ref: np.ndarray, rest: np.ndarray):
        est = (rest == ref).mean(axis=1)
        return est >= threshold, est

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_from_buckets(g, id_col, "bucket", "sig",
                                   max_bucket, score)

    banded = sig_ds.map_batches(band_rows, batch_format="pyarrow")
    pairs = coarse_grouped(banded, ["bucket"], local,
                           num_buckets=num_buckets,
                           out_dtypes={"id_a": "int64", "id_b": "int64",
                                       "score": "float64"})
    return _dedup_pairs(pairs, "est_jaccard")


def minhash_dedup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        num_perm: int = 64, shingle_k: int = 3,
                        bands: int = 16, threshold: float = 0.7):
    """documents → near-dup pairs (the full shingle→minhash→band→bucket
    pipeline)."""
    sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle_k)
    # banded rows are bands x (16 B keys + num_perm*8 B sig) per doc —
    # comparable to the corpus bytes for ~1 KB docs; size the bucket
    # shuffle from the input instead of a fixed 1024-task fan-out
    width = int(min(max((ds.size_bytes() or 0) // (64 << 20), 8), 1024))
    return lsh_candidate_pairs(sigs, id_col, bands, threshold,
                               num_buckets=width)


def ngram_jaccard_verify(pairs_rows: list[dict], docs_by_id: dict,
                         shingle_k: int = 3) -> list[dict]:
    """Exact n-gram Jaccard for candidate pairs (small side — runs on the
    driver or inside a map over pair batches with a broadcast doc dict)."""
    out = []
    for row in pairs_rows:
        sa = {h for h in shingle_hashes(docs_by_id[row["id_a"]] or "", shingle_k)}
        sb = {h for h in shingle_hashes(docs_by_id[row["id_b"]] or "", shingle_k)}
        inter = len(sa & sb)
        union = len(sa | sb) or 1
        out.append(dict(row, jaccard=inter / union))
    return out


def shingle_set_rows(ds, text_col: str = "text", id_col: str = "doc_id",
                     shingle_k: int = 3):
    """→ ``(doc_id, sh, n_doc)``: one row per DISTINCT shingle hash per
    document, with the document's distinct-shingle count ``n_doc`` carried
    on every row (so the downstream similarity join never needs a second
    shuffle to attach set sizes)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        shingles = batch_shingle_hashes(texts, shingle_k)
        uniq = [np.unique(hs) for hs in shingles]
        lens = np.fromiter((len(u) for u in uniq), dtype=np.int64,
                           count=len(uniq))
        oi = np.repeat(np.asarray(ids, dtype=np.int64), lens)
        oh = (np.concatenate(uniq) if uniq
              else np.empty(0, dtype=np.int64))
        on = np.repeat(lens, lens)
        return pa.table({
            id_col: pa.array(oi).cast(batch.schema.field(id_col).type),
            "sh": pa.array(oh, pa.int64()),
            "n_doc": pa.array(on, pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def _posting_pairs(id_col: str, max_posting: int | None,
                   threshold: float = 0.0):
    """Local fn for :func:`coarse_grouped` over shingle rows: for every
    shingle (inverted-index posting list), emit the doc pairs sharing it,
    PRE-COMBINED per (id_a, id_b) with a partial shared-shingle count
    ``cnt``. Group iteration is numpy boundary slicing, not per-shingle
    pandas sub-frames (the r4 profile's hot spot). Two EXACT row-volume
    cuts before the pair shuffle:

    * length filter (SSJoin/PPJoin size bound): ``J = s/(n_a+n_b-s)``
      with ``s ≤ min`` gives ``J ≤ min/max``, so any pair with
      ``min(n_a, n_b) < threshold · max(n_a, n_b)`` provably fails and
      is dropped at the source;
    * combiner: a surviving pair sharing many shingles in one bucket
      collapses to one partial row.

    ``max_posting`` caps hot posting lists (truncation metric-counted)."""
    from ccnerx_ray.state import metrics

    def local(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["sh"].to_numpy()
        ids = g[id_col].to_numpy()
        nd = g["n_doc"].to_numpy()
        # sort by (sh, id): groups become contiguous slices and triu on
        # the sorted slice keeps the id_a < id_b pair canon
        order = np.lexsort((ids, sh))
        sh, ids, nd = sh[order], ids[order], nd[order]
        bounds = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1], True])
        ida_p, idb_p, na_p, nb_p = [], [], [], []
        truncated = 0
        for s, e in zip(bounds[:-1], bounds[1:]):
            k = int(e - s)
            if k < 2:
                continue
            if max_posting is not None and k > max_posting:
                truncated += k - max_posting
                e = s + max_posting
                k = max_posting
            ai, bi = np.triu_indices(k, 1)
            ida_p.append(ids[s:e][ai])
            idb_p.append(ids[s:e][bi])
            na_p.append(nd[s:e][ai])
            nb_p.append(nd[s:e][bi])
        if truncated:
            metrics.incr("jaccard_postings_truncated", truncated)
        if not ida_p:
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in _PAIR_DTYPES})
        a = np.concatenate(ida_p)
        b = np.concatenate(idb_p)
        na = np.concatenate(na_p)
        nb = np.concatenate(nb_p)
        if threshold > 0.0:
            keep = (np.minimum(na, nb)
                    >= threshold * np.maximum(na, nb))
            a, b, na, nb = a[keep], b[keep], na[keep], nb[keep]
        df = pd.DataFrame({"id_a": a, "id_b": b, "n_a": na, "n_b": nb})
        return (df.groupby(["id_a", "id_b"], sort=False, as_index=False)
                  .agg(n_a=("n_a", "first"), n_b=("n_b", "first"),
                       cnt=("n_a", "size")))

    return local


_PAIR_DTYPES = {"id_a": "int64", "id_b": "int64",
                "n_a": "int64", "n_b": "int64", "cnt": "int64"}


def _score_jaccard_pairs(pair_rows, threshold: float,
                         num_buckets: int = 256):
    """(id_a, id_b, n_a, n_b, cnt) partials → per-pair shared count
    (``sum(cnt)``) → exact Jaccard ≥ threshold. One coarse-grouped
    shuffle keyed on the pair."""

    def count(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["id_a", "id_b"], sort=False)
                .agg(n_a=("n_a", "first"), n_b=("n_b", "first"),
                     n_shared=("cnt", "sum"))
                .reset_index())
        j = agg["n_shared"] / (agg["n_a"] + agg["n_b"] - agg["n_shared"])
        agg["jaccard"] = j
        return agg[j >= threshold]

    return coarse_grouped(pair_rows, ["id_a", "id_b"], count,
                          num_buckets=num_buckets,
                          out_dtypes={"id_a": "int64", "id_b": "int64",
                                      "n_a": "int64", "n_b": "int64",
                                      "n_shared": "int64",
                                      "jaccard": "float64"})


def jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  shingle_k: int = 3, threshold: float = 0.5,
                  max_posting: int | None = None):
    """EXACT n-gram Jaccard similarity join (the fourth dedup family
    member next to exact / MinHash-LSH / SimHash): distributed
    inverted-index join — explode distinct shingle hashes per doc →
    coarse-group postings by shingle and emit co-occurring pairs →
    coarse-group by pair and count shared shingles → exact
    ``J = shared / (n_a + n_b - shared)`` filtered at ``threshold``.

    Exact when ``max_posting is None``; a cap bounds the quadratic blowup
    of stop-shingle posting lists at scale (truncation counted into the
    ``jaccard_postings_truncated`` run metric — no silent caps). For
    corpora where even capped posting lists are too hot, use
    :func:`jaccard_pairs_prefix` (prefix-filtered candidate generation).

    Shuffle payload is ``(shingle int64, id, n int64)`` then
    ``(pair ids, sizes)`` — never the documents themselves.
    """
    rows = shingle_set_rows(ds, text_col, id_col, shingle_k)
    # size both shuffles from the input bytes (shingle rows are ~24 B
    # per token ≈ 4× the corpus bytes; the caps keep the 100-TB fan-out)
    bytes_est = 4 * (ds.size_bytes() or 0)
    w_post = int(min(max(bytes_est // (64 << 20), 8), 1024))
    w_pair = int(min(max(bytes_est // (64 << 20), 8), 256))
    pairs = coarse_grouped(rows, ["sh"],
                           _posting_pairs(id_col, max_posting, threshold),
                           num_buckets=w_post, out_dtypes=_PAIR_DTYPES)
    return _score_jaccard_pairs(pairs, threshold, num_buckets=w_pair)


def jaccard_pairs_prefix(ds, text_col: str = "text", id_col: str = "doc_id",
                         shingle_k: int = 3, threshold: float = 0.5,
                         max_posting: int | None = None):
    """Prefix-filtered exact Jaccard join (AllPairs/PPJoin candidate
    rule; Bayardo et al., WWW'07): index only each document's first
    ``p = n - ceil(t*n) + 1`` shingles under the global hash order — any
    pair with ``J >= t`` must share a prefix shingle — then verify
    exactly over the full shingle rows of CANDIDATE DOCUMENTS only.

    Same output as :func:`jaccard_pairs` (tested equal); the inverted
    index only ever sees the prefix postings, so hot stop-shingles deep
    in documents never explode. Fully distributed (VERDICT r2 #1 — the
    candidate set no longer materializes on the driver): candidate doc
    ids stay a Dataset and filter the verify rows through a
    hash-partitioned semi join (``grouping.semi_join_on``). No pair-level
    filter is needed for correctness — the prefix theorem guarantees
    every pair with ``J >= t`` IS a candidate pair, so any extra pair the
    verify stage counts among candidate docs falls below ``threshold``
    and dies in the final filter. ``max_posting`` bounds the verify
    stage's posting lists when candidate docs share hot shingles
    (truncation metric-counted; ``None`` = exact, the oracle-checked
    configuration)."""
    rows = shingle_set_rows(ds, text_col, id_col, shingle_k)

    def to_prefix(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # Ray may split one doc's rows across batches; keeping each
        # fragment's p-smallest is safe — anything in the doc's true
        # p-prefix is in the p-prefix of every fragment containing it,
        # so the union is a SUPERSET of the true prefix (extra
        # candidates only; the verify stage is exact).
        keep = []
        for _, sub in df.groupby(id_col, sort=False):
            n = int(sub["n_doc"].iloc[0])
            p = n - math.ceil(threshold * n) + 1
            keep.append(sub.nsmallest(p, "sh"))
        out = (pd.concat(keep) if keep
               else df.iloc[0:0])
        return pa.Table.from_pandas(out, preserve_index=False)

    prefix_rows = rows.map_batches(to_prefix, batch_format="pyarrow")
    cand = coarse_grouped(prefix_rows, ["sh"],
                          _posting_pairs(id_col, None, threshold),
                          num_buckets=1024, out_dtypes=_PAIR_DTYPES)

    # candidate DOC ids (both sides of every candidate pair), distinct —
    # a Dataset end to end
    def ids_of(batch: pa.Table) -> pa.Table:
        return pa.table({"cid": pa.concat_arrays(
            [batch.column("id_a").combine_chunks().cast(pa.int64()),
             batch.column("id_b").combine_chunks().cast(pa.int64())])})

    cand_ids = drop_duplicate_rows(
        cand.map_batches(ids_of, batch_format="pyarrow"), ["cid"],
        num_buckets=64)

    verify_rows = semi_join_on(
        rows, id_col, cand_ids, keys_col="cid", num_buckets=256,
        out_dtypes={id_col: "int64", "sh": "int64", "n_doc": "int64"})
    shared = coarse_grouped(verify_rows, ["sh"],
                            _posting_pairs(id_col, max_posting, threshold),
                            num_buckets=256, out_dtypes=_PAIR_DTYPES)
    return _score_jaccard_pairs(shared, threshold)


def winnow_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                 k: int = 8, w: int = 4, max_bucket: int | None = None):
    """Winnowing near-dup pairs (the MOSS candidate-generation shape):
    explode each document's winnowed fingerprint set
    (:func:`ccnerx_ray.ops.text.winnow_fingerprints`) → coarse groupby on
    the fingerprint → all pairs per fingerprint → per-pair count of
    shared fingerprints. Output: ``(id_a, id_b, n_shared)``; any pair
    sharing a run of ``k + w - 1`` tokens is guaranteed to appear.

    ``max_bucket=None`` (exact — the oracle-checked configuration); set a
    cap at production scale (a stop-phrase fingerprint shared by millions
    of docs would emit O(n²) pairs), counted into ``lsh_rows_truncated``."""
    from ccnerx_ray.ops.text import winnow_fingerprints

    def explode(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for i, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            for fp in winnow_fingerprints(t or "", k, w):
                ids.append(i)
                fps.append(fp)
        # explicit id type: an all-empty batch would otherwise emit a
        # null-typed column and poison downstream schema unification
        return pa.table({id_col: pa.array(ids,
                                          batch.schema.field(id_col).type),
                         "fp": pa.array(fps, pa.string())})

    def local(g: pd.DataFrame) -> pd.DataFrame:
        from ccnerx_ray.state import metrics

        ida, idb = [], []
        truncated = 0
        for _, sub in g.groupby("fp", sort=False):
            if len(sub) < 2:
                continue
            if max_bucket is not None:
                truncated += max(0, len(sub) - max_bucket)
                sub = sub.sort_values(id_col).head(max_bucket)
            ids = np.sort(sub[id_col].to_numpy())
            for x in range(len(ids) - 1):
                ida.extend([int(ids[x])] * (len(ids) - 1 - x))
                idb.extend(int(v) for v in ids[x + 1:])
        metrics.incr("lsh_rows_truncated", truncated)
        return pd.DataFrame({"id_a": ida, "id_b": idb})

    def reduce_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["id_a", "id_b"], sort=False).size()
                 .reset_index(name="n_shared"))

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    pairs = coarse_grouped(exploded, ["fp"], local, num_buckets=256,
                           out_dtypes={"id_a": "int64", "id_b": "int64"})
    return coarse_grouped(pairs, ["id_a", "id_b"], reduce_pairs,
                          num_buckets=64,
                          out_dtypes={"id_a": "int64", "id_b": "int64",
                                      "n_shared": "int64"})


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, bands: int | None = None,
                  max_bucket: int = 64):
    """SimHash near-dup: 64-bit fingerprints, banded into ``bands``
    disjoint sub-keys; by pigeonhole a pair within hamming ≤ bands-1
    shares ≥1 exact band, so ``bands`` defaults to ``max_hamming + 1`` to
    make the guarantee hold for the requested radius (bits beyond
    ``bands * (64 // bands)`` fall outside every band, which only widens
    candidate recall). Within-bucket pairs are verified by true hamming
    distance."""
    if bands is None:
        bands = max_hamming + 1
    if not 1 <= bands <= 64:
        raise ValueError(f"bands must be in [1, 64], got {bands}")
    width = 64 // bands

    def band_rows(batch: pa.Table) -> pa.Table:
        from ccnerx_ray.functions.hashing import (batch_token_hash_lists,
                                                  splitmix64,
                                                  token_hashes64)

        ids = batch.column(id_col)
        texts = batch.column(text_col).to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             id_col: ids,
                             "fp": pa.array([], pa.binary())})
        # sha256-derived 64-bit token hashes (one hashlib call per unique
        # token; the SimHash pipeline stays DuckDB-oracle-reproducible),
        # then per-doc bit votes in ONE reduceat over the flat matrix
        flat, offsets = batch_token_hash_lists(texts, ws_tokens,
                                               hasher=token_hashes64)
        fps = np.zeros(n, dtype=np.uint64)
        if len(flat):
            bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = np.add.reduceat(2 * bits - 1, offsets[:-1].clip(
                max=max(len(flat) - 1, 0)), axis=0)
            nonempty = offsets[1:] > offsets[:-1]
            pos = (votes > 0) & nonempty[:, None]
            fps = (pos.astype(np.uint64)
                   << np.arange(64, dtype=np.uint64)[None, :]).sum(
                       axis=1, dtype=np.uint64)
        # bucket per (doc, band): splitmix of band key ^ salted band index
        bidx = np.arange(bands, dtype=np.uint64)
        keys = (fps[:, None] >> (bidx * np.uint64(width))[None, :]) \
            & np.uint64((1 << width) - 1)
        mixed = splitmix64(keys ^ ((bidx + np.uint64(1))
                                   * np.uint64(0x9E3779B97F4A7C15))[None, :])
        bucket = (mixed >> np.uint64(1)).astype(np.int64).ravel()
        idx = np.repeat(np.arange(n), bands)
        fpb = [fps[i:i + 1].tobytes() for i in range(n)]
        return pa.table({"bucket": pa.array(bucket, pa.int64()),
                         id_col: ids.take(pa.array(idx)),
                         "fp": pa.array([fpb[i] for i in idx], pa.binary())})

    def score(ref: np.ndarray, rest: np.ndarray):
        x = rest.view(np.uint64) ^ ref.view(np.uint64)
        d = np.array([bin(int(v)).count("1") for v in x.ravel()])
        return d <= max_hamming, d

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_from_buckets(g, id_col, "bucket", "fp",
                                   max_bucket, score)

    banded = ds.map_batches(band_rows, batch_format="pyarrow")
    pairs = coarse_grouped(banded, ["bucket"], local, num_buckets=1024,
                           out_dtypes={"id_a": "int64", "id_b": "int64",
                                       "score": "int64"})
    return _dedup_pairs(pairs, "hamming", score_dtype="int64")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                        threshold: float = 0.95, matrix_ref=None,
                        ids_ref=None):
    """Exact cosine near-dup pairs ``(id_a, id_b)`` with ``id_a < id_b`` and
    cosine ≥ threshold. The full normalized matrix is broadcast once
    (``ray.put``) and each batch multiplies against it — O(n·B) per batch.
    This is the sf-scale oracle baseline; use
    :func:`embedding_dup_pairs_lsh` when the matrix no longer fits."""
    import ray

    if matrix_ref is None:
        rows = ds.select_columns([id_col, vec_col]).take_all()
        ids = np.array([r[id_col] for r in rows], dtype=np.int64)
        M = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        order = np.argsort(ids)
        ids, M = ids[order], M[order]
        matrix_ref, ids_ref = ray.put(M), ray.put(ids)

    def pairs_batch(batch: pa.Table) -> pa.Table:
        M = ray.get(matrix_ref)
        all_ids = ray.get(ids_ref)
        bids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        B = np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch.column(vec_col).to_pylist()])
        B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        sims = B @ M.T
        ra, ca = np.nonzero(sims >= threshold)
        ida, idb = [], []
        for r, c in zip(ra, ca):
            a, b = int(bids[r]), int(all_ids[c])
            if a < b:
                ida.append(a)
                idb.append(b)
        return pa.table({"id_a": pa.array(ida, pa.int64()),
                         "id_b": pa.array(idb, pa.int64())})

    return ds.map_batches(pairs_batch, batch_format="pyarrow")


def embedding_dup_pairs_lsh(ds, vec_col: str = "embedding",
                            id_col: str = "vec_id", threshold: float = 0.95,
                            n_planes: int = 12, n_tables: int = 4,
                            seed: int = 7, max_bucket: int = 256):
    """Scale path: random-hyperplane LSH — ``n_tables`` independent sign
    sketches bucket the vectors; exact cosine runs only within buckets.
    Recall < 1 by construction (tunable via n_tables/n_planes)."""

    def bucket_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        V = np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch.column(vec_col).to_pylist()])
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        # planes sized from the actual embedding dim; the fixed seed makes
        # every batch draw the identical planes (retry-stable)
        rng = np.random.default_rng(seed)
        planes = [rng.standard_normal((V.shape[1], n_planes))
                  for _ in range(n_tables)]
        ok, oi, ov = [], [], []
        for t, P in enumerate(planes):
            bits = (Vn @ P > 0)
            keys = bits @ (1 << np.arange(n_planes))
            for j, i in enumerate(ids):
                ok.append(stable_hash64(f"{t}:{int(keys[j])}"))
                oi.append(i)
                ov.append(Vn[j].tobytes())
        return pa.table({"bucket": pa.array(ok, pa.int64()),
                         id_col: pa.array(oi),
                         "vec": pa.array(ov, pa.binary())})

    def local(g: pd.DataFrame) -> pd.DataFrame:
        from ccnerx_ray.state import metrics

        ida, idb = [], []
        truncated = 0
        for _, sub in g.groupby("bucket", sort=False):
            if len(sub) < 2:
                continue
            truncated += max(0, len(sub) - max_bucket)
            sub = sub.sort_values(id_col).head(max_bucket)
            ids = sub[id_col].to_numpy()
            V = np.stack([np.frombuffer(x, dtype=np.float64)
                          for x in sub["vec"]])
            sims = V @ V.T
            xs, ys = np.nonzero(np.triu(sims >= threshold, k=1))
            ida.extend(int(ids[x]) for x in xs)
            idb.extend(int(ids[y]) for y in ys)
        metrics.incr("lsh_rows_truncated", truncated)
        return pd.DataFrame({"id_a": ida, "id_b": idb,
                             "score": [1.0] * len(ida)})

    banded = ds.map_batches(bucket_rows, batch_format="pyarrow")
    pairs = coarse_grouped(banded, ["bucket"], local, num_buckets=512,
                           out_dtypes={"id_a": "int64", "id_b": "int64",
                                       "score": "float64"})

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["id_a", "id_b"])
                 .drop_duplicates(subset=["id_a", "id_b"])[["id_a", "id_b"]])

    return coarse_grouped(pairs, ["id_a", "id_b"], dd, num_buckets=64,
                          out_dtypes={"id_a": "int64", "id_b": "int64"})


def semantic_dedup(ds, k: int = 8, n_iter: int = 3,
                   threshold: float = 0.45,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   num_buckets: int = 64, max_cluster: int = 200_000):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then dedup WITHIN clusters only — the scale path
    for embedding-cosine dedup. :func:`embedding_dup_pairs`'s all-pairs
    matrix is the sf-scale oracle baseline; at 10^12 rows the broadcast
    matrix is unthinkable, while per-cluster all-pairs with k ∝ corpus
    size keeps every group a bounded-work unit (the paper's point).

    Keeper rule, deterministic and order-free: a point is DROPPED iff
    some SMALLER-id point in the SAME final cluster has cosine ≥
    ``threshold`` — the within-cluster form of :func:`exact_dedup`'s
    min-id first-wins. (Not a transitive closure: q being itself dropped
    does not rescue p — one SQL EXISTS, no recursion.)

    Returns ``(vec_id, cluster, kept)`` — one row per input point.

    Exactness ledger (what lets this value-hash against DuckDB): the
    cluster assignment is the exact-integer kmeans chain
    (:func:`kmeans_lloyd_int` — micro units, trunc-div centroid updates)
    plus ONE more integer assignment round under the final centroids
    (:func:`assign_clusters`, mirrored in SQL by extending
    :func:`kmeans_cte_chain` with a ``df``/``af`` round); the only float
    comparison is the cosine ≥ threshold test, the exact formulation the
    ``embedding_dedup`` oracle has proven hash-stable (numpy float64
    normalized dot vs DuckDB ``list_cosine_similarity``).

    Scale shape: one kmeans run (n_iter+1 corpus scans, k×dim driver
    rows), one pure-map assignment pass, one coarse grouped pass whose
    pairwise work is row-chunked (memory O(chunk × |cluster|)).
    ``max_cluster`` is a loud guard, not a silent cap: a cluster past it
    means k is undersized for the corpus — raise k (SemDeDup sizes
    k ∝ n precisely so clusters stay bounded)."""
    from ccnerx_ray.ops.cluster import (assign_clusters, centroid_matrix,
                                        kmeans_lloyd_int)

    cent = kmeans_lloyd_int(ds, k=k, n_iter=n_iter, vec_col=vec_col,
                            id_col=id_col)
    C = centroid_matrix(cent)                       # k×dim ints — tiny
    assigned = assign_clusters(ds.select_columns([id_col, vec_col]), C,
                               vec_col=vec_col, id_col=id_col,
                               keep_vec=True)

    def local(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cl, sub in g.groupby("cluster", sort=False):
            n = len(sub)
            if n > max_cluster:
                raise ValueError(
                    f"cluster {cl} has {n} points > max_cluster="
                    f"{max_cluster}; raise k — SemDeDup keeps clusters "
                    "bounded by sizing k to the corpus")
            ids = sub[id_col].to_numpy(dtype=np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v in sub[vec_col].to_numpy()[order]])
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True),
                            1e-12)
            dup = np.zeros(n, dtype=bool)
            for s in range(0, n, 2048):              # memory O(2048 × n)
                e = min(n, s + 2048)
                sims = M[s:e] @ M.T
                smaller = (np.arange(n)[None, :]
                           < np.arange(s, e)[:, None])
                dup[s:e] = ((sims >= threshold) & smaller).any(axis=1)
            outs.append(pd.DataFrame({
                id_col: ids,
                "cluster": np.full(n, cl, dtype=np.int64),
                "kept": (~dup).astype("int64")}))
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                   "cluster": pd.Series(dtype="int64"),
                                   "kept": pd.Series(dtype="int64")}))

    return coarse_grouped(assigned, ["cluster"], local,
                          num_buckets=num_buckets,
                          out_dtypes={id_col: "int64", "cluster": "int64",
                                      "kept": "int64"})


# ---------------------------------------------------------------------------
# near-dup clustering: connected components over candidate pairs
# ---------------------------------------------------------------------------


def dup_components(pairs, id_a: str = "id_a", id_b: str = "id_b",
                   max_rounds: int = 30, driver_max_pairs: int = 500_000):
    """Cluster near-dup pairs into components: ``(doc_id, component)`` with
    component = min id of the component (the canonical keeper of a dup
    cluster).

    Two paths, chosen by a cheap distributed ``pairs.count()`` — the pair
    set is never pulled to the driver to *decide*:

    * **small** (≤ ``driver_max_pairs`` pairs): driver union-find with path
      compression — an order of magnitude faster than iterated shuffles
      for the typical case where dup participants are a sliver of the
      corpus.
    * **large**: delegates to :func:`ccnerx_ray.ops.graph.\
connected_components` — pointer-jumping min-label propagation, so
      convergence is O(log n) rounds on ANY topology (the earlier
      in-place loop here was O(component diameter), adversarial on chain
      graphs, and its per-round label blocks grew with every union).
      Edges stay a Dataset throughout; nothing pair-scale reaches the
      driver."""
    import ray.data

    from ccnerx_ray.ops.graph import connected_components

    if not hasattr(pairs, "select_columns"):
        edges = [(int(a), int(b)) for a, b in pairs]
        return _uf_components(edges)

    pair_ds = pairs.select_columns([id_a, id_b]).materialize()
    if pair_ds.count() <= driver_max_pairs:
        edges = [(int(r[id_a]), int(r[id_b])) for r in pair_ds.take_all()]
        return _uf_components(edges)

    def as_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch.column(id_a).cast(pa.int64()),
                         "v": batch.column(id_b).cast(pa.int64())})

    comp = connected_components(
        pair_ds.map_batches(as_edges, batch_format="pyarrow"),
        max_rounds=max_rounds)
    return comp.map_batches(
        lambda b: b.rename_columns(
            ["doc_id" if c == "node" else c for c in b.column_names]),
        batch_format="pyarrow")


def _uf_components(edges: list[tuple[int, int]]):
    """Driver union-find with path compression (small-candidate fast path:
    |nodes| ≤ 2·|pairs| is provably bounded by the caller's pair count)."""
    import ray.data

    nodes = sorted({n for e in edges for n in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return ray.data.from_items(
        [{"doc_id": n, "component": find(n)} for n in nodes])


def shared_ngram_stats(docs, *, n: int = 13, text_col: str = "text",
                       id_col: str = "doc_id", num_buckets: int = 256):
    """Per-document repeated-span exposure WITHIN a corpus: of each doc's
    distinct token n-grams, how many occur verbatim in at least one OTHER
    document. The per-doc shared fraction is the standard signal for
    boilerplate/template contamination (the n-gram-windowed form of
    suffix-array substring dedup — Lee et al. 2021 "Deduplicating
    Training Data Makes Language Models Better" §4 run exact substrings;
    fixed windows are its shuffle-friendly approximation).

    One corpus scan (the ``ngram_contamination`` skeleton with a
    distinct-doc-count predicate instead of a split test):

    * explode emits each doc's DISTINCT gram digests once, so (gram,
      doc) rows are globally unique and the bucket-local "docs per gram"
      count is exact with no second distinct pass;
    * shuffle carries ``(gram int64, doc_id int64)`` digests, never gram
      text; width derives from the input bytes (same 4×-bytes model as
      decontamination), capped at ``num_buckets``;
    * docs shorter than ``n`` tokens emit one sentinel row so their
      ``(n_grams=0, n_shared=0)`` row survives to the output.

    Returns Dataset ``(doc_id, n_grams, n_shared)``, exact integers.
    """
    from ccnerx_ray.functions.grouping import coarse_grouped, grouped_reduce
    from ccnerx_ray.ops.decontaminate import _doc_grams_arr

    out_dtypes = {"doc_id": "int64", "n_grams": "int64", "n_shared": "int64"}

    def explode(batch: pa.Table) -> pa.Table:
        g_col, d_col = [], []
        for did, txt in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            grams = _doc_grams_arr(txt, n)
            if len(grams) == 0:
                g_col.append(-1)
                d_col.append(did)
                continue
            g_col.extend(grams.tolist())
            d_col.extend([did] * len(grams))
        return pa.table({"gram": pa.array(g_col, pa.int64()),
                         "doc_id": pa.array(d_col, pa.int64())})

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        real = g[g["gram"] >= 0]
        tot = real.groupby("doc_id", sort=False).size()
        docs_per_gram = real.groupby("gram", sort=False)["doc_id"] \
                            .transform("size")
        hit = real[docs_per_gram >= 2].groupby("doc_id", sort=False).size()
        out = tot.to_frame(name="n_grams")
        out["n_shared"] = hit.reindex(tot.index, fill_value=0)
        out = out.reset_index()
        zero = g.loc[g["gram"] < 0, ["doc_id"]].drop_duplicates()
        if len(zero):
            zero = zero.assign(n_grams=0, n_shared=0)
            out = pd.concat([out, zero], ignore_index=True)
        return out[["doc_id", "n_grams", "n_shared"]]

    bytes_est = 4 * (docs.size_bytes() or 0)
    width = int(min(max(bytes_est // (64 << 20), 8), num_buckets))
    grams = docs.map_batches(explode, batch_format="pyarrow")
    stats = coarse_grouped(grams, ["gram"], bucket_stats,
                           num_buckets=width, out_dtypes=out_dtypes)
    return grouped_reduce(stats, ["doc_id"],
                          {"n_grams": "sum", "n_shared": "sum"},
                          num_buckets=min(64, width),
                          out_dtypes=out_dtypes, pre_combine=True)


def passage_dedup_stats(docs, *, window: int = 32, text_col: str = "text",
                        id_col: str = "doc_id", num_buckets: int = 256):
    """Sub-document EXACT dedup at passage granularity: split each
    document's token stream into consecutive ``window``-token passages
    (the tail passage may be shorter) and keep only the globally FIRST
    occurrence of each passage content, ordered by ``(doc_id,
    passage_idx)`` — every later identical passage is a duplicate. The
    per-(doc, position) keeper semantics are the sub-document analogue of
    :func:`exact_dedup` (RefinedWeb/MassiveText drop repeated boilerplate
    spans inside otherwise-unique pages, where whole-document dedup sees
    nothing).

    Returns Dataset ``(doc_id, n_passages, n_dup_passages,
    n_tokens_dropped)`` — exact integers, one row per input document
    (zero-token docs ride a per-doc sentinel).

    Scale shape (the :func:`shared_ngram_stats` skeleton):

    * passage identity is the sha256 of the LENGTH-PREFIXED token join
      (``f"{len(t)}:{t}"`` concatenated) — collision-free for any token
      content including the join-delimiter hazard class (ADVICE r4), and
      exactly mirrorable in SQL (``sha256(array_to_string(list_transform(
      tk, x -> length(x)||':'||x), ''))``), so the oracle shares identity
      semantics instead of approximating them;
    * the shuffle carries ``(pkey hex64, doc_id, idx, n_toks)`` — never
      passage text; width derives from the input bytes, capped at
      ``num_buckets``;
    * first-occurrence marking is bucket-local (all rows of a pkey land
      in one coarse group), per-doc partials ride a pre-combined reduce.
    """
    import hashlib

    from ccnerx_ray.functions.grouping import coarse_grouped, grouped_reduce

    if window < 1:
        raise ValueError("window must be >= 1")
    out_dtypes = {"doc_id": "int64", "n_passages": "int64",
                  "n_dup_passages": "int64", "n_tokens_dropped": "int64"}

    def explode(batch: pa.Table) -> pa.Table:
        k_col: list[str] = []
        d_col: list[int] = []
        i_col: list[int] = []
        t_col: list[int] = []
        for did, txt in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            toks = ws_tokens(txt)
            if not toks:
                # unique per-doc sentinel (\x00 prefix cannot collide with
                # sha256 hex): keeps the zero-stat row alive, never a dup
                k_col.append(f"\x00{did}")
                d_col.append(did)
                i_col.append(-1)
                t_col.append(0)
                continue
            for start in range(0, len(toks), window):
                p = toks[start:start + window]
                key = hashlib.sha256(
                    "".join(f"{len(t)}:{t}" for t in p)
                    .encode("utf-8")).hexdigest()
                k_col.append(key)
                d_col.append(did)
                i_col.append(start // window)
                t_col.append(len(p))
        return pa.table({"pkey": pa.array(k_col, pa.string()),
                         "doc_id": pa.array(d_col, pa.int64()),
                         "idx": pa.array(i_col, pa.int64()),
                         "n_toks": pa.array(t_col, pa.int64())})

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pkey", "doc_id", "idx"], kind="mergesort")
        first = ~g["pkey"].duplicated()
        real = g["idx"].to_numpy() >= 0
        dup = (~first.to_numpy()) & real
        out = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_passages": real.astype(np.int64),
            "n_dup_passages": dup.astype(np.int64),
            "n_tokens_dropped": np.where(dup, g["n_toks"].to_numpy(), 0),
        })
        return (out.groupby("doc_id", sort=False).sum().reset_index())

    bytes_est = docs.size_bytes() or 0
    width = int(min(max(bytes_est // (64 << 20), 8), num_buckets))
    rows = docs.map_batches(explode, batch_format="pyarrow")
    stats = coarse_grouped(rows, ["pkey"], bucket_stats,
                           num_buckets=width, out_dtypes=out_dtypes)
    return grouped_reduce(stats, ["doc_id"],
                          {"n_passages": "sum", "n_dup_passages": "sum",
                           "n_tokens_dropped": "sum"},
                          num_buckets=min(64, width),
                          out_dtypes=out_dtypes, pre_combine=True)
