#!/usr/bin/env python
"""RAG ingestion/query job — the ``ray job submit`` entry point for the
chunk → embed → quantize → retrieve loop (``ops/rag.py``).

Build the store once (one pass over the corpus; the store is 1-byte SQ8
codes per chunk — 4× smaller logical width than float32 vectors):

    python jobs/rag_job.py build --input /path/docs --store /path/ragstore

Then answer queries from the store WITHOUT touching the corpus again
(reads only the ``(cid, code)`` columns of the sharded code store):

    python jobs/rag_job.py query --store /path/ragstore \
        --query "hash join key" --query "window agg stream" --k 10

On a real cluster: ``ray job submit --working-dir . -- python
jobs/rag_job.py build --input s3://bucket/docs --store s3://bucket/rag``.
The store dir carries its own lineage (``_lineage/build.json`` — scale,
byte counts; ``_lineage/rag.json`` — chunking/encoder parameters, so
query-time embedding always matches build-time embedding). Build into a
fresh directory; the sharded store is the resume unit for queries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="chunk + embed + write the SQ8 "
                                     "code store")
    b.add_argument("--input", required=True,
                   help="documents Parquet dir (doc_id, text, ...)")
    b.add_argument("--store", required=True, help="store dir to create")
    b.add_argument("--window", type=int, default=24)
    b.add_argument("--stride", type=int, default=16)
    b.add_argument("--dim", type=int, default=8)
    b.add_argument("--num-shards", type=int, default=8)
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--text-col", default="text")
    b.add_argument("--num-cpus", type=int, default=None,
                   help="local mode only; on a cluster leave unset")

    q = sub.add_parser("query", help="top-k chunks from the store")
    q.add_argument("--store", required=True)
    q.add_argument("--query", action="append", required=True,
                   help="query text (repeatable)")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--num-cpus", type=int, default=None)

    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)
        else:
            ray.init()
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import ray.data

    t0 = time.time()
    if args.cmd == "build":
        if os.path.exists(args.store):
            print(f"store dir {args.store} already exists — build into "
                  "a fresh directory (append would double-count)",
                  file=sys.stderr)
            ray.shutdown()
            return 2
        from ccnerx_ray.ops.rag import rag_build_store

        docs = ray.data.read_parquet(
            args.input, columns=[args.id_col, args.text_col])
        summary = rag_build_store(docs, args.store, window=args.window,
                                  stride=args.stride, dim=args.dim,
                                  num_shards=args.num_shards,
                                  text_col=args.text_col,
                                  id_col=args.id_col)
        summary["wall_s"] = round(time.time() - t0, 3)
        print(json.dumps(summary, sort_keys=True))
    else:
        from ccnerx_ray.ops.rag import rag_store_knn

        out = rag_store_knn(args.store, args.query, k=args.k).to_pandas()
        rows = out.sort_values(["query_id", "rank"]).to_dict("records")
        print(json.dumps({"queries": args.query, "k": args.k,
                          "wall_s": round(time.time() - t0, 3),
                          "results": rows}, default=int))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
