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


def build_index_store(docs, store_dir: str, *, text_col: str = "text",
                      id_col: str = "doc_id",
                      num_shards: int = 64) -> dict:
    """One corpus scan → hive-partitioned postings store
    ``shard=<bucket>/`` with rows ``(term, doc_id, tf, shard)``; the
    build ledger (rows/bytes per shard, ``num_shards``) lands at
    ``_lineage/build.json``. Returns the ledger."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")

    def postings(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        ids: list[int] = []
        tfs: list[int] = []
        for did, txt in zip(batch.column(id_col).to_pylist(),
                            batch.column(text_col).to_pylist()):
            counts: dict[str, int] = {}
            for w in ws_tokens(txt):
                counts[w] = counts.get(w, 0) + 1
            terms.extend(counts)
            ids.extend([did] * len(counts))
            tfs.extend(counts.values())
        shards = [term_shard(t, num_shards) for t in terms]
        return pa.table({"term": pa.array(terms, pa.string()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "tf": pa.array(tfs, pa.int64()),
                         "shard": pa.array(shards, pa.int64())})

    t0 = time.time()
    docs.map_batches(postings, batch_format="pyarrow").write_parquet(
        store_dir, partition_cols=["shard"])

    shards = {}
    total_bytes = 0
    for d in sorted(glob.glob(os.path.join(store_dir, "shard=*"))):
        files = glob.glob(os.path.join(d, "*.parquet"))
        nbytes = sum(os.path.getsize(f) for f in files)
        total_bytes += nbytes
        shards[os.path.basename(d).split("=", 1)[1]] = {
            "files": len(files), "bytes": nbytes}
    summary = {"num_shards": int(num_shards), "wall_s": time.time() - t0,
               "total_bytes": total_bytes, "shards": shards}
    os.makedirs(os.path.join(store_dir, "_lineage"), exist_ok=True)
    with open(os.path.join(store_dir, "_lineage", "build.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    return summary


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
