#!/usr/bin/env python
"""Corpus-curation job — the ``ray job submit`` entry point for the
composite keep/drop pass (``ops/curation.py``).

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/curate_job.py --input s3://bucket/docs --output s3://bucket/curated

Locally (owns its Ray session, like every CLI in this repo):

    python jobs/curate_job.py --input /path/docs --output /path/curated

Reads a documents Parquet dir, computes the four-family drop-reason
bitmask (length / repetition / boilerplate passages / corpus-trained LM
surprisal), joins it back to the full rows in ONE hash-partitioned
co-group, and writes hive partitions ``keep=1/`` (the curated corpus)
and ``keep=0/`` (the rejects, with their ``reasons`` — an audit trail,
never a silent drop). Per-reason counts land in
``_lineage/curation.json`` and on stdout.

Deliberately MONOLITHIC-streaming (no chunk ledger): two of the four
filter families are corpus-global — the LM trains on the whole corpus
and passage keepers are global first occurrences — so chunk-local masks
would silently change semantics. Re-run into a fresh directory to
retry; the partitioned output is the resume unit for downstream
consumers.
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
    ap.add_argument("--input", required=True,
                    help="documents Parquet dir (doc_id, text, ...)")
    ap.add_argument("--output", required=True,
                    help="curated-store dir (hive keep=0/1 partitions)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--dup-bigram-pm", type=int, default=100)
    ap.add_argument("--dup-passage-pm", type=int, default=250)
    ap.add_argument("--passage-window", type=int, default=4)
    ap.add_argument("--max-surprisal-x100", type=int, default=510)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local mode only; on a cluster leave unset")
    args = ap.parse_args()

    if os.path.exists(args.output):
        print(f"output dir {args.output} already exists — curation runs "
              "into a fresh directory (re-run = full re-curation: the "
              "mask is corpus-global)", file=sys.stderr)
        return 2

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

    from ccnerx_ray.functions.grouping import lookup_join_on
    from ccnerx_ray.ops.curation import curation_mask, reason_counts
    from ccnerx_ray.ops.join import derive_hash_partitions

    t0 = time.time()
    docs = ray.data.read_parquet(args.input)
    mask = curation_mask(
        docs.select_columns([args.id_col, args.text_col]),
        text_col=args.text_col, id_col=args.id_col,
        min_tokens=args.min_tokens, dup_bigram_pm=args.dup_bigram_pm,
        dup_passage_pm=args.dup_passage_pm,
        passage_window=args.passage_window,
        max_mean_surprisal_x100=args.max_surprisal_x100).materialize()

    counts = reason_counts(mask)

    # join the mask back to the FULL rows: fact-scale on both sides →
    # one hash-partitioned co-group (reasons ride as a string value,
    # cast after; every doc matches by construction)
    import numpy as np
    import pyarrow as pa

    width = derive_hash_partitions(docs.size_bytes())
    joined = lookup_join_on(docs, args.id_col, mask, "reasons",
                            num_buckets=width)

    def finish(batch: pa.Table) -> pa.Table:
        import pandas as pd
        r = (pd.to_numeric(batch.column("reasons").to_pandas())
             .astype(np.int64).to_numpy())
        batch = batch.drop_columns(["reasons"])
        return (batch
                .append_column("reasons", pa.array(r, pa.int64()))
                .append_column("keep",
                               pa.array((r == 0).astype(np.int64))))

    joined.map_batches(finish, batch_format="pyarrow").write_parquet(
        args.output, partition_cols=["keep"])

    counts["wall_s"] = round(time.time() - t0, 3)
    os.makedirs(os.path.join(args.output, "_lineage"), exist_ok=True)
    with open(os.path.join(args.output, "_lineage", "curation.json"),
              "w") as f:
        json.dump(counts, f, indent=1, sort_keys=True)
    print(json.dumps(counts))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
