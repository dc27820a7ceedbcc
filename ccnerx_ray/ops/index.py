"""Inverted-index store: term-partitioned postings on Parquet with
partition-pruned lookups — the exact-text sibling of the IVF vector store
(``ops/similarity.py:ivf_build_store``), and the artifact form of ranked
retrieval (``ops/retrieval.py:bm25_topk`` re-scores the corpus per query
set; an index answers point lookups without touching unprobed bytes).

At 100 TB the only way Ray Data skips IO is partition pruning at
``read_parquet``, so the index IS the partitioning: every posting row
``(term, doc_id, tf)`` lands in the hive shard
``shard = blake2b64(term) % num_shards``, a pure function of the term
that the probe side recomputes. Because the shard key is content-derived,
BUILD IS A PURE MAP — per-batch term counting plus a partitioned write
(the hive writer splits blocks by partition value); no groupby, no
all-to-all exchange, and rows are already unique per (term, doc) since
``tf`` is counted within the owning document.

Unlike the IVF store (approximate by construction), an inverted index is
EXACT: the pruned lookup is oracle-pairable against plain SQL
(tokenize → filter → count), so the whole build → shard → prune → probe
loop value-hashes. Probe lineage (``_lineage/probe.json``) records
``bytes_probed`` vs ``bytes_total`` — the direct evidence the index
prunes the scan.
"""

from __future__ import annotations

import glob
import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from ccnerx_ray.functions.hashing import stable_hash64
from ccnerx_ray.functions.tokenize import ws_tokens


def term_shard(term: str, num_shards: int) -> int:
    """Shard routing — a pure function of the term (recomputed at probe
    time; never read back from hive paths)."""
    return int(stable_hash64(term) % num_shards)


def _postings_fn(text_col: str, id_col: str, num_shards: int):
    def postings(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        ids: list[int] = []
        tfs: list[int] = []
        dls: list[int] = []
        for did, txt in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            counts: dict[str, int] = {}
            dl = 0
            for w in ws_tokens(txt):
                counts[w] = counts.get(w, 0) + 1
                dl += 1
            terms.extend(counts)
            ids.extend([did] * len(counts))
            tfs.extend(counts.values())
            dls.extend([dl] * len(counts))
        shards = [term_shard(t, num_shards) for t in terms]
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "tf": pa.array(tfs, pa.int64()),
                         "doc_len": pa.array(dls, pa.int64()),
                         "shard": pa.array(shards, pa.int64())})
    return postings


def _corpus_stats(docs, text_col: str) -> tuple[int, int]:
    """(n_docs, n_tokens) — one lightweight pre-combined scan (the
    ``bm25_topk`` scan-1 shape without the per-term dfs; dfs live IN the
    index, one shard each, so probes recount them exactly)."""

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = sum(len(ws_tokens(t))
                    for t in batch.column(text_col).to_pylist())
        return pa.table({"n_docs": pa.array([batch.num_rows], pa.int64()),
                         "n_tokens": pa.array([n_tok], pa.int64())})

    agg = (docs.select_columns([text_col])
               .map_batches(partial, batch_format="pyarrow")
               .sum(["n_docs", "n_tokens"]))
    return int(agg["sum(n_docs)"] or 0), int(agg["sum(n_tokens)"] or 0)


def _write_ledger(store_dir: str, num_shards: int, n_docs: int,
                  n_tokens: int, wall_s: float) -> dict:
    shards = {}
    total_bytes = 0
    for d in sorted(glob.glob(os.path.join(store_dir, "shard=*"))):
        files = glob.glob(os.path.join(d, "*.parquet"))
        nbytes = sum(os.path.getsize(f) for f in files)
        total_bytes += nbytes
        shards[os.path.basename(d).split("=", 1)[1]] = {
            "files": len(files), "bytes": nbytes}
    summary = {"num_shards": int(num_shards), "wall_s": wall_s,
               "n_docs": int(n_docs), "n_tokens": int(n_tokens),
               "total_bytes": total_bytes, "shards": shards}
    os.makedirs(os.path.join(store_dir, "_lineage"), exist_ok=True)
    with open(os.path.join(store_dir, "_lineage", "build.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    return summary


def build_index_store(docs, store_dir: str, *, text_col: str = "text",
                      id_col: str = "doc_id",
                      num_shards: int = 64) -> dict:
    """One corpus scan → hive-partitioned postings store
    ``shard=<bucket>/`` with rows ``(term, doc_id, tf, doc_len, shard)``
    (``doc_len`` rides every posting so index-side BM25 never needs the
    corpus), plus one lightweight stats scan for the ledger's corpus
    totals (``n_docs``/``n_tokens`` — BM25's N and T). The ledger
    (rows/bytes per shard, totals) lands at ``_lineage/build.json``.
    Returns the ledger."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")

    t0 = time.time()
    docs.map_batches(_postings_fn(text_col, id_col, num_shards),
                     batch_format="pyarrow").write_parquet(
        store_dir, partition_cols=["shard"])
    n_docs, n_tokens = _corpus_stats(docs, text_col)
    return _write_ledger(store_dir, num_shards, n_docs, n_tokens,
                         time.time() - t0)


def update_index_store(store_dir: str, new_docs, *, text_col: str = "text",
                       id_col: str = "doc_id") -> dict:
    """Incremental index update: append the NEW documents' postings into
    the SAME hive shards (the content-derived routing makes the delta
    write embarrassingly parallel — no read-modify-write of existing
    files, no shuffle) and roll the ledger's corpus totals forward. The
    caller guarantees the delta's doc ids are new (the ``update_kg``
    delta contract); update ≡ fresh rebuild over the union is pinned by
    test. Returns the refreshed ledger."""
    with open(os.path.join(store_dir, "_lineage", "build.json")) as f:
        build = json.load(f)
    num_shards = build["num_shards"]
    t0 = time.time()
    new_docs.map_batches(_postings_fn(text_col, id_col, num_shards),
                         batch_format="pyarrow").write_parquet(
        store_dir, partition_cols=["shard"])
    d_docs, d_tokens = _corpus_stats(new_docs, text_col)
    return _write_ledger(store_dir, num_shards,
                         build["n_docs"] + d_docs,
                         build["n_tokens"] + d_tokens,
                         build["wall_s"] + (time.time() - t0))


def lookup_terms(store_dir: str, terms: list[str]):
    """Exact postings for ``terms`` → Dataset ``(term, doc_id, tf)``,
    reading ONLY the shards the terms route to (explicit pruned file
    list — unprobed bytes never leave storage) and appending a probe
    record to ``_lineage/probe.json``. Terms absent from the corpus
    simply yield no rows (their shard is still probed — absence is only
    provable by looking)."""
    import ray.data

    if not terms:
        raise ValueError("terms must be non-empty")
    with open(os.path.join(store_dir, "_lineage", "build.json")) as f:
        build = json.load(f)
    num_shards = build["num_shards"]
    probed = sorted({term_shard(t, num_shards) for t in terms})
    paths = [f for i in probed
             for f in sorted(glob.glob(
                 os.path.join(store_dir, f"shard={i}", "*.parquet")))]

    bytes_probed = sum(build["shards"].get(str(i), {}).get("bytes", 0)
                       for i in probed)
    rec = {"terms": sorted(terms), "probed_shards": probed,
           "bytes_probed": bytes_probed,
           "bytes_total": build["total_bytes"],
           "read_fraction": (bytes_probed / build["total_bytes"]
                             if build["total_bytes"] else 1.0)}
    with open(os.path.join(store_dir, "_lineage", "probe.json"), "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)

    if not paths:  # every probed shard is empty (no such terms anywhere)
        return ray.data.from_arrow(pa.table({
            "term": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64())}))

    ds = ray.data.read_parquet(paths, columns=["term", "doc_id", "tf"])
    want = pa.array(sorted(set(terms)), pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("term"),
                                     value_set=want))

    return ds.map_batches(keep, batch_format="pyarrow")


def index_bm25(store_dir: str, queries=None, top_k: int = 10):
    """Exact-integer BM25 (the ``ops/retrieval.py`` formula family,
    k1=6/5 b=3/4 folded into one int fraction, log-free idf) answered
    FROM THE INDEX: only the shards the query terms route to are read
    (twice — a df pass and a score pass over the same pruned file list),
    so point queries never rescan the corpus the way ``bm25_topk``'s
    scan-2 must. Results are bit-identical to ``bm25_topk`` on the same
    corpus — the registered query shares its oracle.

    Per posting row ``(term, doc_id, tf, doc_len)`` the contribution is
    ``(idf[t] * ((1e6·44·tf·T) // (20·T·tf + 6·T + 18·dl·N))) // 1e6``
    (N, T from the build ledger; df recounted exactly from the term's
    own shard); per-(query, doc) sums ride one candidate-scale reduce,
    then per-batch lossless top-k partials merge per query. Returns
    ``(query_id, doc_id, score_micro, rank)``."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ccnerx_ray.functions.grouping import grouped_reduce
    from ccnerx_ray.ops.retrieval import DEFAULT_QUERIES

    queries = list(DEFAULT_QUERIES if queries is None else queries)
    terms = sorted({t for _, ts in queries for t in ts})
    t_index = {t: i for i, t in enumerate(terms)}
    # per-query term multiplicities (the oracle's VALUES rows sum per
    # occurrence, so a repeated query term counts repeatedly)
    q_mult = [(qid, {t: ts.count(t) for t in ts}) for qid, ts in queries]

    with open(os.path.join(store_dir, "_lineage", "build.json")) as f:
        build = json.load(f)
    N, T = int(build["n_docs"]), int(build["n_tokens"])

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "score_micro": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})
    probed = sorted({term_shard(t, build["num_shards"]) for t in terms})
    paths = [f for i in probed
             for f in sorted(glob.glob(
                 os.path.join(store_dir, f"shard={i}", "*.parquet")))]
    if N == 0 or not paths:
        return ray.data.from_arrow(empty)
    if 44 * 1_000_000 * T * min(T, 10 ** 6) >= 2 ** 63:
        raise OverflowError(
            "BM25 int64 numerator bound exceeded; switch the per-batch "
            "kernel to Python int / int128 arithmetic")

    want = pa.array(terms, pa.string())

    def pruned():
        ds = ray.data.read_parquet(
            paths, columns=["term", "doc_id", "tf", "doc_len"])
        return ds.map_batches(
            lambda b: b.filter(pc.is_in(b.column("term"), value_set=want)),
            batch_format="pyarrow")

    # ---- pass 1 over probed shards: exact per-term dfs ---------------
    def df_partial(batch: pa.Table) -> pa.Table:
        tcol = batch.column("term").to_pylist()
        df = [0] * len(terms)
        for t in tcol:
            df[t_index[t]] += 1
        return pa.table({f"df_{i}": pa.array([df[i]], pa.int64())
                         for i in range(len(terms))})

    agg = pruned().map_batches(df_partial, batch_format="pyarrow") \
                  .sum([f"df_{i}" for i in range(len(terms))])
    if agg is None:
        return ray.data.from_arrow(empty)
    idf = {t: (1_000_000 * N) // int(agg[f"sum(df_{i})"])
           for t, i in t_index.items() if int(agg[f"sum(df_{i})"] or 0) > 0}

    # ---- pass 2: per-posting contributions → per-(query, doc) sum ----
    def contrib(batch: pa.Table) -> pa.Table:
        ts = batch.column("term").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        tfs = batch.column("tf").to_pylist()
        dls = batch.column("doc_len").to_pylist()
        oq, od, os_ = [], [], []
        for t, did, tf, dl in zip(ts, ids, tfs, dls):
            if t not in idf:
                continue
            num = 1_000_000 * 44 * tf * T
            den = 20 * T * tf + 6 * T + 18 * dl * N
            c = (idf[t] * (num // den)) // 1_000_000
            for qid, mult in q_mult:
                m = mult.get(t, 0)
                if m:
                    oq.append(qid)
                    od.append(did)
                    os_.append(m * c)
        return pa.table({"query_id": pa.array(oq, pa.int64()),
                         "doc_id": pa.array(od, pa.int64()),
                         "score_micro": pa.array(os_, pa.int64())})

    scored = grouped_reduce(
        pruned().map_batches(contrib, batch_format="pyarrow"),
        ["query_id", "doc_id"], {"score_micro": "sum"},
        num_buckets=8, pre_combine=True,
        out_dtypes={"query_id": "int64", "doc_id": "int64",
                    "score_micro": "int64"})

    # rows unique per (query, doc) now → per-batch top-k is a lossless
    # superset; zero scores never rank (bm25_topk contract)
    def local_topk(batch: pa.Table) -> pa.Table:
        g = batch.to_pandas()
        g = g[g["score_micro"] > 0]
        g = g.sort_values(["query_id", "score_micro", "doc_id"],
                          ascending=[True, False, True])
        g = g.groupby("query_id", sort=False).head(top_k)
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_micro", "doc_id"],
                          ascending=[False, True]).head(top_k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "doc_id", "score_micro", "rank"]]

    return (scored.map_batches(local_topk, batch_format="pyarrow")
                  .groupby("query_id")
                  .map_groups(merge_topk, batch_format="pandas"))
