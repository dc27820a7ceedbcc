"""Overlapping token-window chunking — the RAG/embedding-ingestion
splitter.

Embedding and retrieval pipelines never index whole documents: they
split each doc into fixed token windows with overlap (stride < window)
so no answer span is cut at a boundary, then embed/index the chunks.
The reference windows sentences for its tagger the same way
(``ftloader_v1.py`` sentence windowing via the split normalizer —
SURVEY §2.3 M9); this is that operation at corpus scale with the
overlap a retrieval index needs.

Semantics (mirrored exactly by the SQL oracle):

* tokens = ``ws_tokens(text)`` (the repo-wide ``\\s+`` contract);
* chunk starts are ``0, stride, 2·stride, …`` while ``start < n_tokens``
  — every token lands in ≥1 chunk, the last chunk may be short, and a
  zero-token document yields NO chunks (there is nothing to index;
  callers tracking doc presence join back on ``doc_id``);
* ``chunk_id = start // stride`` (0-based, contiguous per doc);
* ``chunk_text`` re-joins the window's tokens with single spaces —
  chunk identity is over TOKENS, not original byte offsets (the
  tokenizer already collapsed whitespace).

A PURE flat map: no shuffle, no state, output order irrelevant — the
streaming executor fans it out and the chunk table feeds the encoder /
index stages directly. Emitted rows carry (doc_id, chunk_id, start_tok,
n_tokens, chunk_text).
"""

from __future__ import annotations

import pyarrow as pa

from ccnerx_ray.functions.tokenize import ws_tokens


def chunk_documents(docs, *, window: int = 24, stride: int = 16,
                    text_col: str = "text", id_col: str = "doc_id"):
    """→ ``(doc_id, chunk_id, start_tok, n_tokens, chunk_text)`` — one
    row per overlapping token window (see module docstring for the
    boundary conventions)."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    if stride > window:
        raise ValueError(
            f"stride {stride} > window {window} would drop tokens "
            "between consecutive chunks")

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        o_id, o_ck, o_st, o_n, o_tx = [], [], [], [], []
        for did, text in zip(ids, texts):
            toks = ws_tokens(text)
            for start in range(0, len(toks), stride):
                win = toks[start:start + window]
                o_id.append(did)
                o_ck.append(start // stride)
                o_st.append(start)
                o_n.append(len(win))
                o_tx.append(" ".join(win))
        id_type = batch.column(id_col).type
        return pa.table({
            id_col: pa.array(o_id, id_type),
            "chunk_id": pa.array(o_ck, pa.int64()),
            "start_tok": pa.array(o_st, pa.int64()),
            "n_tokens": pa.array(o_n, pa.int64()),
            "chunk_text": pa.array(o_tx, pa.string()),
        })

    return docs.map_batches(chunks, batch_format="pyarrow")
