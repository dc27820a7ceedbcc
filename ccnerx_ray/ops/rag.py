"""The RAG ingestion + retrieval loop, end to end and hash-exact:
chunk → embed → quantize → search.

This is the pipeline a retrieval-augmented system actually runs over a
fresh corpus: split documents into overlapping token windows
(``ops/chunk.py``), embed every chunk (the A5 hash-token micro encoder,
``stages/encode.py`` — exact integer sums, one float division), compress
the chunk vectors to SQ8 codes (``ops/quantize.py`` — the 4× memory cut
that makes the index fit), and answer text queries by quantized
inner-product top-k. Every stage is the already-verified machinery; the
composition itself is what this module registers and proves — the whole
loop value-hashes against one SQL oracle that re-runs chunking,
embedding, quantization and retrieval in DuckDB.

Determinism ledger (why a float pipeline can hash):

* chunk token windows — integer slicing, no arithmetic;
* ``sum_micro`` — exact int64 (HUGEINT double-mod in SQL);
* ``x = sum_micro / (n_tokens · 1e6)`` — ONE IEEE double division
  (the int operands convert exactly: |sum| ≤ 24·10⁶, n·1e6 ≤ 2.4·10⁷);
* ``amax = max(|x|)`` — comparison only;
* ``code = floor(x · 127.0 / amax)`` — the two SQ8 roundings, written
  multiply-then-divide on both sides;
* ``qdot = Σ code_q · code_c`` — exact int64.

Scale shape: chunk+encode is a pure map; the chunk-embedding table
materializes ONCE (it feeds both the amax scan and the scoring scan —
the ``doc_packs`` two-consumer recipe); scoring is the
partial-topk-then-merge of ``knn_bruteforce``. Chunk identity crosses
the top-k as ONE packed int64 (``doc_id · 4096 + chunk_id``, bounds
asserted loudly — the packing is bijective, unlike string joins) and is
unpacked to two columns at the end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ccnerx_ray.ops.chunk import chunk_documents
from ccnerx_ray.ops.quantize import sq_build_store, sq_knn
from ccnerx_ray.stages.encode import _doc_sums

_CHUNK_ID_SPAN = 4096


def chunk_embeddings(docs, *, window: int = 24, stride: int = 16,
                     dim: int = 8, text_col: str = "text",
                     id_col: str = "doc_id"):
    """documents → one embedding row per overlapping token chunk:
    ``(doc_id, chunk_id, cid, n_tokens, sum_micro list<int64>,
    embedding list<float64>)`` with ``cid = doc_id·4096 + chunk_id``
    (asserted bijective). ``sum_micro`` is the EXACT integer encoder sum
    the float vector derives from — the rerank stage scores candidates
    on it so its arithmetic never leaves ℤ. Pure map — chunking and
    encoding fuse into one pass over the corpus; every chunk has ≥ 1
    token by construction, so the encoder's zero-token branch never
    fires here."""
    chunks = chunk_documents(docs, window=window, stride=stride,
                             text_col=text_col, id_col=id_col)

    def encode(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch.column(id_col).to_pylist(),
                             dtype=np.int64)
        chunk_ids = batch.column("chunk_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(doc_ids):
            if doc_ids.min() < 0:
                raise ValueError("packed chunk ids need doc_id >= 0")
            if chunk_ids.max() >= _CHUNK_ID_SPAN:
                raise ValueError(
                    f"chunk_id {int(chunk_ids.max())} >= {_CHUNK_ID_SPAN}"
                    " — raise _CHUNK_ID_SPAN (docs this long should also"
                    " raise the window)")
        texts = batch.column("chunk_text").to_pylist()
        n_tok, sums = _doc_sums(texts, dim)
        vecs = sums.astype(np.float64) / (np.maximum(n_tok, 1)[:, None]
                                          * 1e6)
        return pa.table({
            id_col: pa.array(doc_ids, pa.int64()),
            "chunk_id": pa.array(chunk_ids, pa.int64()),
            "cid": pa.array(doc_ids * _CHUNK_ID_SPAN + chunk_ids,
                            pa.int64()),
            "n_tokens": batch.column("n_tokens"),
            "sum_micro": pa.array(list(sums.astype(np.int64)),
                                  pa.list_(pa.int64())),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        })

    return chunks.map_batches(encode, batch_format="pyarrow")


def rag_chunk_knn(docs, query_texts: list[str], *, window: int = 24,
                  stride: int = 16, dim: int = 8, k: int = 10,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Answer text queries against the chunked corpus →
    ``(query_id, doc_id, chunk_id, rank, qdot)``: chunks embed and
    SQ8-quantize under the CHUNK corpus's own scale; queries embed
    driver-side through the identical encoder arithmetic and quantize
    under the same scale; ranking is the exact-integer quantized dot
    with the (qdot desc, (doc_id, chunk_id) asc) tie-break."""
    for i, q in enumerate(query_texts):
        if not q.split():
            raise ValueError(f"query {i} has no tokens")
    emb = chunk_embeddings(docs, window=window, stride=stride, dim=dim,
                           text_col=text_col, id_col=id_col)
    # two consumers (amax scan + scoring scan) — materialize once so
    # chunk+encode doesn't run twice
    emb = emb.materialize()

    n_tok, sums = _doc_sums(list(query_texts), dim)
    Q = sums.astype(np.float64) / (np.maximum(n_tok, 1)[:, None] * 1e6)

    out = sq_knn(emb, Q, query_ids=list(range(len(query_texts))), k=k,
                 vec_col="embedding", id_col="cid")

    def unpack(batch: pa.Table) -> pa.Table:
        cid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "query_id": batch.column("query_id"),
            "doc_id": pa.array(cid // _CHUNK_ID_SPAN, pa.int64()),
            "chunk_id": pa.array(cid % _CHUNK_ID_SPAN, pa.int64()),
            "rank": batch.column("rank"),
            "qdot": batch.column("qdot"),
        })

    return out.map_batches(unpack, batch_format="pyarrow")


def rag_rerank(docs, query_texts: list[str], *, window: int = 24,
               stride: int = 16, dim: int = 8, k: int = 10, m: int = 30,
               text_col: str = "text", id_col: str = "doc_id"):
    """Two-stage retrieve-then-rerank — the shape every production
    retrieval system runs: a CHEAP quantized stage over the whole corpus
    cuts to ``m`` candidates per query, then a higher-fidelity scorer
    re-ranks ONLY those candidates to the final ``k``. Stage 1 is
    :func:`rag_chunk_knn`'s SQ8 quantized dot (1-byte codes); stage 2
    rescores on the UNQUANTIZED exact-integer encoder sums.

    → ``(query_id, doc_id, chunk_id, rank, rdot, n_tokens)`` where
    ``rdot = Σ_d sum_micro_q[d] · sum_micro_c[d]`` (exact int64 —
    |chunk sum| ≤ window·10⁶, |query sum| ≤ n_qtok·10⁶, so dim·products
    ≤ ~3·10¹⁵ ≪ 2⁶³) and ``rank`` orders by the true cosine-equivalent
    ratio ``rdot / n_tokens`` (per query, dot(x_q, x_c) ∝ rdot / n_c —
    the query's own norm is constant within its ranking). The ratio is
    ONE IEEE double division of exactly-representable operands
    (|rdot| < 2⁵³), identical in numpy and DuckDB; ties break on packed
    cid ascending on both sides.

    Scale shape: the corpus sees the stage-1 scans plus ONE extra
    vectorized pass that scores candidate rows only; everything ranked
    after that is ≤ |queries|·m rows BY CONSTRUCTION (the driver merge
    is bounded the way sq_knn's partial-topk merge is). Candidate recall
    vs exact top-k is the two-stage trade-off — both engines compute the
    identical pipeline, so the result still value-hashes."""
    import pandas as pd

    from ccnerx_ray.ops.quantize import sq_knn

    if m < k:
        raise ValueError(f"m={m} candidates < k={k} results")
    for i, q in enumerate(query_texts):
        if not q.split():
            raise ValueError(f"query {i} has no tokens")
    emb = chunk_embeddings(docs, window=window, stride=stride, dim=dim,
                           text_col=text_col, id_col=id_col)
    # three consumers (amax scan, scoring scan, rerank scan) — one pass
    emb = emb.materialize()

    n_tok_q, sums_q = _doc_sums(list(query_texts), dim)
    Sq = sums_q.astype(np.int64)                        # (nq, dim)
    Q = sums_q.astype(np.float64) / (np.maximum(n_tok_q, 1)[:, None]
                                     * 1e6)
    nq = len(query_texts)

    coarse = sq_knn(emb, Q, query_ids=list(range(nq)), k=m,
                    vec_col="embedding", id_col="cid")
    cand = coarse.select_columns(["query_id", "vec_id"]).take_all()
    # ≤ nq·m rows by construction — the bounded stage boundary
    cand_by_q = [np.sort(np.array(
        [r["vec_id"] for r in cand if r["query_id"] == qi],
        dtype=np.int64)) for qi in range(nq)]
    all_cand = np.unique(np.concatenate(
        [c for c in cand_by_q if len(c)] or [np.array([], np.int64)]))

    def rescore(batch: pa.Table) -> pa.Table:
        cid = batch.column("cid").to_numpy(zero_copy_only=False)
        hit = np.isin(cid, all_cand)
        qs, cs, ds_, ns = [], [], [], []
        if hit.any():
            idx = np.nonzero(hit)[0]
            sub = batch.take(pa.array(idx))
            scid = cid[idx]
            Sc = np.stack([np.asarray(v, dtype=np.int64) for v in
                           sub.column("sum_micro").to_pylist()])
            ntc = sub.column("n_tokens").to_numpy(
                zero_copy_only=False).astype(np.int64)
            dots = Sc @ Sq.T                            # exact int64
            for qi in range(nq):
                mine = np.isin(scid, cand_by_q[qi])
                qs.extend([qi] * int(mine.sum()))
                cs.extend(scid[mine].tolist())
                ds_.extend(dots[mine, qi].tolist())
                ns.extend(ntc[mine].tolist())
        return pa.table({"query_id": pa.array(qs, pa.int64()),
                         "cid": pa.array(cs, pa.int64()),
                         "rdot": pa.array(ds_, pa.int64()),
                         "n_tokens": pa.array(ns, pa.int64())})

    rows = emb.map_batches(rescore, batch_format="pyarrow").take_all()
    df = pd.DataFrame(rows, columns=["query_id", "cid", "rdot",
                                     "n_tokens"])
    df["query_id"] = df["query_id"].astype("int64")
    for c in ("cid", "rdot", "n_tokens"):
        df[c] = df[c].astype("int64")
    ratio = df["rdot"].to_numpy(np.int64).astype(np.float64) \
        / df["n_tokens"].to_numpy(np.int64)             # ONE division
    df["_ratio"] = ratio
    df = df.sort_values(["query_id", "_ratio", "cid"],
                        ascending=[True, False, True], kind="mergesort")
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k]
    out = pd.DataFrame({
        "query_id": df["query_id"].to_numpy(np.int64),
        "doc_id": df["cid"].to_numpy(np.int64) // _CHUNK_ID_SPAN,
        "chunk_id": df["cid"].to_numpy(np.int64) % _CHUNK_ID_SPAN,
        "rank": df["rank"].to_numpy(np.int64),
        "rdot": df["rdot"].to_numpy(np.int64),
        "n_tokens": df["n_tokens"].to_numpy(np.int64),
    })
    return out.reset_index(drop=True)


def rag_build_store(docs, store_dir: str, *, window: int = 24,
                    stride: int = 16, dim: int = 8, num_shards: int = 8,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> dict:
    """Persist the ingestion half of the loop: chunk + embed once, then
    write the SQ8 code store (``ops/quantize.py:sq_build_store`` over
    the packed ``cid``) — the artifact queries probe WITHOUT touching
    the corpus again. The chunking/encoder parameters land in
    ``_lineage/rag.json`` next to the quantizer ledger, so query-time
    embedding always matches build-time embedding (a dim/window
    mismatch would silently break retrieval)."""
    import json
    import os

    emb = chunk_embeddings(docs, window=window, stride=stride, dim=dim,
                           text_col=text_col, id_col=id_col)
    # sq_build_store scans twice (amax + encode) — materialize so
    # chunk+encode doesn't run twice
    emb = emb.materialize()
    summary = sq_build_store(emb, store_dir, vec_col="embedding",
                             id_col="cid", num_shards=num_shards)
    params = {"window": window, "stride": stride, "dim": dim,
              "text_col": text_col, "id_col": id_col,
              "chunk_id_span": _CHUNK_ID_SPAN}
    with open(os.path.join(store_dir, "_lineage", "rag.json"), "w") as f:
        json.dump(params, f, indent=1, sort_keys=True)
    summary.update(params)
    return summary


def rag_store_knn(store_dir: str, query_texts: list[str], *,
                  k: int = 10):
    """Answer text queries FROM a :func:`rag_build_store` store: embed
    the queries driver-side under the STORED encoder parameters,
    quantize under the stored scale, and rank against the 1-byte codes
    — bit-identical to :func:`rag_chunk_knn` over the original corpus
    (pinned by test)."""
    import json
    import os

    from ccnerx_ray.ops.quantize import sq_knn_store

    with open(os.path.join(store_dir, "_lineage", "rag.json")) as f:
        params = json.load(f)
    for i, q in enumerate(query_texts):
        if not q.split():
            raise ValueError(f"query {i} has no tokens")
    n_tok, sums = _doc_sums(list(query_texts), params["dim"])
    Q = sums.astype(np.float64) / (np.maximum(n_tok, 1)[:, None] * 1e6)
    out = sq_knn_store(store_dir, Q,
                       query_ids=list(range(len(query_texts))), k=k,
                       id_col="cid")
    span = params["chunk_id_span"]

    def unpack(batch: pa.Table) -> pa.Table:
        cid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "query_id": batch.column("query_id"),
            "doc_id": pa.array(cid // span, pa.int64()),
            "chunk_id": pa.array(cid % span, pa.int64()),
            "rank": batch.column("rank"),
            "qdot": batch.column("qdot"),
        })

    return out.map_batches(unpack, batch_format="pyarrow")
