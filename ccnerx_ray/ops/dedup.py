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

import numpy as np
import pandas as pd
import pyarrow as pa

from ccnerx_ray.functions.grouping import coarse_grouped
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
    return coarse_grouped(partials, ["text_sha256"], local, num_buckets=512)


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
    return coarse_grouped(keyed, ["_dedup_key"], local, num_buckets=512)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        return (np.array([stable_hash64(" ".join(toks))], dtype=np.int64)
                if toks else np.empty(0, dtype=np.int64))
    return np.fromiter((stable_hash64(" ".join(toks[i:i + k]))
                        for i in range(len(toks) - k + 1)),
                       dtype=np.int64)


def minhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_k: int = 3, seed: int = 1):
    """→ ``(id, sig binary)`` per document; the signature rides as a
    num_perm×8-byte binary blob (hash-join- and shuffle-friendly)."""
    a, b = minhash_params(num_perm, seed)

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sigs = [minhash_signature(shingle_hashes(t or "", shingle_k), a, b).tobytes()
                for t in batch.column(text_col).to_pylist()]
        return pa.table({
            id_col: pa.array(ids, batch.schema.field(id_col).type),
            "sig": pa.array(sigs, pa.binary()),
        })

    return ds.map_batches(sig_batch, batch_format="pyarrow")


def _pairs_from_buckets(g: pd.DataFrame, id_col: str, bucket_col: str,
                        sig_col: str, max_bucket: int,
                        score_fn) -> pd.DataFrame:
    """Vectorized within-coarse-group pair emission: local groupby on the
    true bucket key, numpy signature comparison per bucket."""
    ida, idb, score = [], [], []
    for _, sub in g.groupby(bucket_col, sort=False):
        if len(sub) < 2:
            continue
        sub = sub.sort_values(id_col).head(max_bucket)
        ids = sub[id_col].to_numpy()
        S = np.stack([np.frombuffer(x, dtype=np.int64) for x in sub[sig_col]])
        for x in range(len(ids) - 1):
            sc = score_fn(S[x], S[x + 1:])
            for j in np.nonzero(sc[0])[0]:
                ida.append(ids[x])
                idb.append(ids[x + 1 + j])
                score.append(sc[1][j])
    return pd.DataFrame({"id_a": ida, "id_b": idb, "score": score})


def _dedup_pairs(pairs, score_name: str):
    def local(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values(["id_a", "id_b"])
                .drop_duplicates(subset=["id_a", "id_b"]))
        return out.rename(columns={"score": score_name})

    return coarse_grouped(pairs, ["id_a", "id_b"], local, num_buckets=64)


def lsh_candidate_pairs(sig_ds, id_col: str = "doc_id", bands: int = 16,
                        threshold: float = 0.7, max_bucket: int = 64):
    """MinHash-LSH: band the signatures, coarse-bucket-groupby, emit
    verified pairs ``(id_a, id_b, est_jaccard)`` with est_jaccard =
    fraction of agreeing signature components, filtered at ``threshold``.

    The shuffle carries (bucket int64, id, sig binary) — tiny relative to
    the corpus."""

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sigs = batch.column("sig").to_pylist()
        ob, oi, os_ = [], [], []
        for i, sig_b in zip(ids, sigs):
            sig = np.frombuffer(sig_b, dtype=np.int64)
            P = len(sig)
            r = P // bands
            for bidx in range(bands):
                chunk = sig[bidx * r:(bidx + 1) * r]
                ob.append(stable_hash64(f"{bidx}:" + chunk.tobytes().hex()))
                oi.append(i)
                os_.append(sig_b)
        return pa.table({
            "bucket": pa.array(ob, pa.int64()),
            id_col: pa.array(oi),
            "sig": pa.array(os_, pa.binary()),
        })

    def score(ref: np.ndarray, rest: np.ndarray):
        est = (rest == ref).mean(axis=1)
        return est >= threshold, est

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_from_buckets(g, id_col, "bucket", "sig",
                                   max_bucket, score)

    banded = sig_ds.map_batches(band_rows, batch_format="pyarrow")
    pairs = coarse_grouped(banded, ["bucket"], local, num_buckets=1024)
    return _dedup_pairs(pairs, "est_jaccard")


def minhash_dedup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        num_perm: int = 64, shingle_k: int = 3,
                        bands: int = 16, threshold: float = 0.7):
    """documents → near-dup pairs (the full shingle→minhash→band→bucket
    pipeline)."""
    sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle_k)
    return lsh_candidate_pairs(sigs, id_col, bands, threshold)


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


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, bands: int = 4, max_bucket: int = 64):
    """SimHash near-dup: 64-bit fingerprints, banded into ``bands`` 16-bit
    sub-keys (a pair within hamming ≤ bands-1 shares ≥1 exact band);
    within-bucket pairs are verified by true hamming distance."""
    width = 64 // bands

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ob, oi, of = [], [], []
        for i, t in zip(ids, batch.column(text_col).to_pylist()):
            toks = (t or "").split()
            th = np.fromiter((stable_hash64(w) for w in toks), dtype=np.int64) \
                if toks else np.empty(0, dtype=np.int64)
            fp = simhash64(th)
            fpb = np.array([fp], dtype=np.uint64).tobytes()
            for bidx in range(bands):
                key = (fp >> (bidx * width)) & ((1 << width) - 1)
                ob.append(stable_hash64(f"{bidx}:{key}"))
                oi.append(i)
                of.append(fpb)
        return pa.table({"bucket": pa.array(ob, pa.int64()),
                         id_col: pa.array(oi),
                         "fp": pa.array(of, pa.binary())})

    def score(ref: np.ndarray, rest: np.ndarray):
        x = rest.view(np.uint64) ^ ref.view(np.uint64)
        d = np.array([bin(int(v)).count("1") for v in x.ravel()])
        return d <= max_hamming, d

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_from_buckets(g, id_col, "bucket", "fp",
                                   max_bucket, score)

    banded = ds.map_batches(band_rows, batch_format="pyarrow")
    pairs = coarse_grouped(banded, ["bucket"], local, num_buckets=1024)
    return _dedup_pairs(pairs, "hamming")


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
        rng = np.random.default_rng(seed)
        planes = [rng.standard_normal((64, n_planes)) for _ in range(n_tables)]
        ids = batch.column(id_col).to_pylist()
        V = np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch.column(vec_col).to_pylist()])
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        ok, oi, ov = [], [], []
        for t, P in enumerate(planes):
            bits = (Vn @ P[:Vn.shape[1]] > 0)
            keys = bits @ (1 << np.arange(n_planes))
            for j, i in enumerate(ids):
                ok.append(stable_hash64(f"{t}:{int(keys[j])}"))
                oi.append(i)
                ov.append(Vn[j].tobytes())
        return pa.table({"bucket": pa.array(ok, pa.int64()),
                         id_col: pa.array(oi),
                         "vec": pa.array(ov, pa.binary())})

    def local(g: pd.DataFrame) -> pd.DataFrame:
        ida, idb = [], []
        for _, sub in g.groupby("bucket", sort=False):
            if len(sub) < 2:
                continue
            sub = sub.sort_values(id_col).head(max_bucket)
            ids = sub[id_col].to_numpy()
            V = np.stack([np.frombuffer(x, dtype=np.float64)
                          for x in sub["vec"]])
            sims = V @ V.T
            xs, ys = np.nonzero(np.triu(sims >= threshold, k=1))
            ida.extend(int(ids[x]) for x in xs)
            idb.extend(int(ids[y]) for y in ys)
        return pd.DataFrame({"id_a": ida, "id_b": idb,
                             "score": [1.0] * len(ida)})

    banded = ds.map_batches(bucket_rows, batch_format="pyarrow")
    pairs = coarse_grouped(banded, ["bucket"], local, num_buckets=512)

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["id_a", "id_b"])
                 .drop_duplicates(subset=["id_a", "id_b"])[["id_a", "id_b"]])

    return coarse_grouped(pairs, ["id_a", "id_b"], dd, num_buckets=64)


# ---------------------------------------------------------------------------
# near-dup clustering: connected components over candidate pairs
# ---------------------------------------------------------------------------


def dup_components(pairs, id_a: str = "id_a", id_b: str = "id_b",
                   max_rounds: int = 10):
    """Cluster near-dup pairs into components by iterative min-label
    propagation — distributed union-find: each node's label is the minimum
    id reachable so far; rounds of (explode edges → coarse groupby min)
    until the label assignment stops changing. Converges in O(component
    diameter) rounds; the per-round shuffle carries (node, label) pairs
    only. Output: ``(doc_id, component)`` with component = min id of the
    component (the canonical keeper of a dup cluster)."""
    import pandas as pd

    from ccnerx_ray.functions.grouping import coarse_grouped

    edges = [(int(r[id_a]), int(r[id_b]))
             for r in pairs.select_columns([id_a, id_b]).take_all()] \
        if hasattr(pairs, "select_columns") else list(pairs)
    import ray.data
    nodes = sorted({n for e in edges for n in e})

    # Candidate-pair participants are few relative to the corpus; under a
    # million nodes, driver-side union-find beats iterated distributed
    # label propagation by an order of magnitude (the guide rule: driver
    # union-find only when the candidate set is provably small — it is:
    # |nodes| <= 2·|pairs|).
    if len(nodes) <= 1_000_000:
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

    labels = ray.data.from_items(
        [{"node": n, "label": n} for n in nodes])
    edge_ref = None
    import ray as _ray
    edge_ref = _ray.put(edges)

    for _ in range(max_rounds):
        def propagate(batch: pa.Table) -> pa.Table:
            lab = dict(zip(batch.column("node").to_pylist(),
                           batch.column("label").to_pylist()))
            out_n, out_l = list(lab.keys()), list(lab.values())
            for a, b in _ray.get(edge_ref):
                la, lb = lab.get(a), lab.get(b)
                if la is not None:
                    out_n.append(b)
                    out_l.append(la)
                if lb is not None:
                    out_n.append(a)
                    out_l.append(lb)
            return pa.table({"node": pa.array(out_n, pa.int64()),
                             "label": pa.array(out_l, pa.int64())})

        def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
            return (g.groupby("node", sort=False)["label"].min()
                     .reset_index())

        new_labels = coarse_grouped(
            labels.map_batches(propagate, batch_format="pyarrow"),
            ["node"], reduce_min, num_buckets=64)
        new_rows = {r["node"]: r["label"] for r in new_labels.take_all()}
        old_rows = {r["node"]: r["label"] for r in labels.take_all()}
        labels = ray.data.from_items(
            [{"node": n, "label": l} for n, l in sorted(new_rows.items())])
        if new_rows == old_rows:
            break
    return labels.map_batches(
        lambda b: b.rename_columns(["doc_id", "component"]),
        batch_format="pyarrow")
