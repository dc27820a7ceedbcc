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
    ``(doc_id, chunk_id, cid, n_tokens, embedding list<float64>)`` with
    ``cid = doc_id·4096 + chunk_id`` (asserted bijective). Pure map —
    chunking and encoding fuse into one pass over the corpus; every
    chunk has ≥ 1 token by construction, so the encoder's zero-token
    branch never fires here."""
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
