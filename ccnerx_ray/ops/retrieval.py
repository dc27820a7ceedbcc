"""BM25-style ranked retrieval over the documents table — EXACT integer
scoring, oracle-checkable.

Classic BM25 is transcendental (log idf) and float-fragile across
engines. This operator uses the standard BM25 tf saturation with the
rational parameters k1 = 6/5 and b = 3/4 folded into one integer
fraction, and a log-free idf, so every score is a deterministic int64:

    tf_factor_micro = (1e6 * 44 * tf * T) // (20*T*tf + 6*T + 18*dl*N)
    idf_micro       = (1e6 * N) // df
    s_term          = (idf_micro * tf_factor_micro) // 1e6
    score_micro     = Σ_{t ∈ query} s_term

where ``T`` = total corpus tokens, ``N`` = corpus docs, ``dl`` = doc
tokens, ``tf`` = term count in doc, ``df`` = docs containing the term.
Derivation: tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)) with avgdl = T/N,
numerator and denominator multiplied through by 20·T (k1=6/5, b=3/4 →
(k1+1)·20 = 44, k1·(1-b)·20 = 6, k1·b·20 = 18). All divisions truncate
(DuckDB ``//``; operands here are non-negative so floor == trunc).

Distributed shape — TWO corpus scans, ZERO corpus-scale shuffles:

1. stats scan: one partial row per batch carrying ``(n_docs, n_tokens,
   df_<term>...)`` as fixed columns (the query vocabulary is known up
   front), merged by ``Dataset.sum`` — a few dozen ints to the driver.
2. scoring scan: a doc's tokens never leave its batch, so the COMPLETE
   per-query score of every doc is computed inside the batch against
   the broadcast stats; each batch keeps only its local top-k per
   query, and a final per-query merge ranks ``top_k × n_blocks`` rows.

Tokenization is the repo's whitespace contract (``ws_tokens`` ≡
``list_filter(string_split_regex(text,'\\s+'), w -> w <> '')``, the
RE2-contract the tokenizer's hypothesis test pins against live DuckDB).

Overflow bound: ``44 · tf · T · 1e6`` must fit int64, i.e. ``tf · T <
2.1e11`` (T = corpus tokens). Holds through sf-scale and beyond; the
guard raises loudly rather than wrapping, and the documented 100 TB
path is swapping the int64 numpy kernel for Python int / int128
arithmetic in the same per-batch function.

No reference counterpart; first-class training-data operator (quality
retrieval / decontamination-adjacent ranked lookup).
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ccnerx_ray.functions.tokenize import ws_tokens

# (query_id, terms) — fixed deterministic query set over the synthetic
# corpus vocabulary; callers can pass their own.
DEFAULT_QUERIES: list[tuple[int, list[str]]] = [
    (0, ["hash", "join", "merge"]),
    (1, ["window", "sort"]),
    (2, ["stream", "batch", "dup"]),
    (3, ["customer", "query", "filter"]),
]


def bm25_topk(ds, queries: Sequence[tuple[int, Sequence[str]]] | None = None,
              text_col: str = "text", id_col: str = "doc_id",
              top_k: int = 10):
    """Top-``top_k`` documents per query by exact-integer BM25 score
    (module docstring): ``(query_id, doc_id, score_micro, rank)``.
    Ties rank by ``doc_id`` ascending. Documents scoring 0 (no query
    term present) never rank."""
    import ray.data

    queries = list(DEFAULT_QUERIES if queries is None else queries)
    terms = sorted({t for _, ts in queries for t in ts})
    t_index = {t: i for i, t in enumerate(terms)}

    # ---- scan 1: corpus stats + per-term document frequencies --------
    def stats_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n_tok = 0
        df = np.zeros(len(terms), dtype=np.int64)
        for txt in texts:
            toks = ws_tokens(txt)
            n_tok += len(toks)
            seen = set(toks)
            for t, i in t_index.items():
                if t in seen:
                    df[i] += 1
        cols = {"n_docs": pa.array([len(texts)], pa.int64()),
                "n_tokens": pa.array([n_tok], pa.int64())}
        for t, i in t_index.items():
            cols[f"df_{i}"] = pa.array([int(df[i])], pa.int64())
        return pa.table(cols)

    agg = (ds.select_columns([text_col])
             .map_batches(stats_partial, batch_format="pyarrow")
             .sum(["n_docs", "n_tokens"] + [f"df_{i}" for i in
                                            range(len(terms))]))
    N = int(agg["sum(n_docs)"])
    T = int(agg["sum(n_tokens)"])
    df_by_term = {t: int(agg[f"sum(df_{i})"]) for t, i in t_index.items()}
    if N == 0:
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "score_micro": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64())}))
    idf = {t: (1_000_000 * N) // df for t, df in df_by_term.items()
           if df > 0}
    # int64 guard for 1e6·44·tf·T (tf ≤ longest doc; bounded by T)
    if 44 * 1_000_000 * T * min(T, 10 ** 6) >= 2 ** 63:
        raise OverflowError(
            "BM25 int64 numerator bound exceeded; switch the per-batch "
            "kernel to Python int / int128 arithmetic")

    # ---- scan 2: complete per-doc scores inside each batch -----------
    def score_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_q, out_d, out_s = [], [], []
        per_query: dict[int, list[tuple[int, int]]] = {q: []
                                                       for q, _ in queries}
        for did, txt in zip(ids, texts):
            toks = ws_tokens(txt)
            dl = len(toks)
            cnt = None
            for qid, qterms in queries:
                s = 0
                for t in qterms:
                    if t not in idf:
                        continue
                    if cnt is None:
                        cnt = Counter(toks)
                    tf = cnt.get(t, 0)
                    if tf == 0:
                        continue
                    num = 1_000_000 * 44 * tf * T
                    den = 20 * T * tf + 6 * T + 18 * dl * N
                    s += (idf[t] * (num // den)) // 1_000_000
                if s > 0:
                    per_query[qid].append((int(did), s))
        for qid, rows in per_query.items():
            rows.sort(key=lambda r: (-r[1], r[0]))
            for did, s in rows[:top_k]:
                out_q.append(qid)
                out_d.append(did)
                out_s.append(s)
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "score_micro": pa.array(out_s, pa.int64()),
        })

    partials = ds.select_columns([id_col, text_col]).map_batches(
        score_partial, batch_format="pyarrow")

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_micro", "doc_id"],
                          ascending=[False, True]).head(top_k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "doc_id", "score_micro", "rank"]]

    return partials.groupby("query_id").map_groups(
        merge_topk, batch_format="pandas")


def bm25_oracle_sql(queries: Sequence[tuple[int, Sequence[str]]]
                    | None = None, top_k: int = 10,
                    table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`bm25_topk`: identical integer
    arithmetic. The query set becomes a VALUES list of (query_id, term)
    pairs; non-negative operands make ``//`` == floor on both sides."""
    queries = list(DEFAULT_QUERIES if queries is None else queries)
    pairs = ", ".join(f"({qid}, '{t}')" for qid, ts in queries
                      for t in ts)
    return rf"""
WITH q(query_id, term) AS (VALUES {pairs}),
tok AS (
  SELECT {id_col} AS doc_id,
         list_filter(string_split_regex({text_col}, '\s+'),
                     w -> w <> '') AS toks
  FROM {table}
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(sum(len(toks)), 0) AS BIGINT) AS t
  FROM tok
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
  WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY 1, 2
),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tok),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT q.query_id, tf.doc_id,
         CAST(sum(((1000000 * s.n // df.df) *
                   ((1000000 * 44 * tf.tf * s.t) //
                    (20 * s.t * tf.tf + 6 * s.t + 18 * dl.dl * s.n)))
                  // 1000000) AS BIGINT) AS score_micro
  FROM q JOIN tf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN df USING (term), stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score_micro,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_micro DESC, doc_id) AS rank
  FROM scored WHERE score_micro > 0
)
SELECT query_id, doc_id, score_micro, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {top_k}
"""
