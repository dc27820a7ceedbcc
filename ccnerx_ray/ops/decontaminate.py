"""Train/eval n-gram decontamination (GPT-3 appendix-C style).

Before training, every eval/benchmark document must be checked for
verbatim n-gram overlap with the training corpus (Brown et al. 2020 use
13-grams; The Pile and Llama report the same scheme). At 100 TB this is
a pure shuffle problem: explode documents to distinct n-gram keys,
co-locate train and eval occurrences of the same gram by hash bucket,
and count, per eval document, how many of its grams also occur anywhere
in the training split.

Scale shape:
* the shuffle carries ``(gram_digest int64, doc_id int64, is_eval)`` —
  never the gram text (13 words ≈ 100 B vs 8 B; a 12× shuffle saving);
* gram sets are deduplicated per document at explode time, so the
  contaminated count is exactly "distinct grams of this eval doc seen in
  train" with no post-hoc distinct pass;
* per-bucket work is a vectorized pandas groupby (``coarse_grouped``);
* the final per-doc combine is a streaming ``grouped_reduce`` —
  nothing materializes on the driver.

Digest note: grams are compared by ``stable_hash64`` digest, not text;
two different grams colliding in 63 bits (~n²/2⁶⁴) could overcount by
one. The SQL oracle compares gram strings — agreement of the two is
itself evidence no collision occurred at test scale.

No reference counterpart (the reference never handles corpus hygiene);
included as a first-class LLM-data-pipeline operator.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from ccnerx_ray.functions.grouping import coarse_grouped, grouped_reduce
from ccnerx_ray.functions.hashing import stable_hash64

_WS_RE = re.compile(r"\s+")

_OUT_DTYPES = {"doc_id": "int64", "n_grams": "int64",
               "n_contaminated": "int64"}


def _doc_grams(text: str, n: int) -> set[int]:
    toks = _WS_RE.split(text.strip()) if text and text.strip() else []
    return {stable_hash64("\x1f".join(toks[i:i + n]))
            for i in range(len(toks) - n + 1)}


def ngram_contamination(docs, eval_sources: set[str], *, n: int = 13,
                        text_col: str = "text", id_col: str = "doc_id",
                        source_col: str = "source",
                        num_buckets: int = 256):
    """Per-eval-document contamination counts against the train split.

    ``docs`` rows are split by ``source_col``: rows whose source is in
    ``eval_sources`` form the eval side, everything else is train.
    Returns a Dataset of ``(doc_id, n_grams, n_contaminated)`` — one row
    per EVAL document (zero rows for docs shorter than ``n`` tokens give
    ``n_grams = 0``), both columns exact integers.
    """
    evset = frozenset(eval_sources)

    # stream A: per-eval-doc distinct gram totals (zeros included)
    def eval_totals(batch: pa.Table) -> pa.Table:
        ids, out = [], []
        for did, src, txt in zip(batch.column(id_col).to_pylist(),
                                 batch.column(source_col).to_pylist(),
                                 batch.column(text_col).to_pylist()):
            if src in evset:
                ids.append(did)
                out.append(len(_doc_grams(txt, n)))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_grams": pa.array(out, pa.int64()),
                         "n_contaminated": pa.array([0] * len(ids),
                                                    pa.int64())})

    # stream B: gram occurrences; train grams dedupe per batch (the
    # bucket stage tolerates cross-batch repeats — presence is presence)
    def explode(batch: pa.Table) -> pa.Table:
        g_col, d_col, e_col = [], [], []
        train_seen: set[int] = set()
        for did, src, txt in zip(batch.column(id_col).to_pylist(),
                                 batch.column(source_col).to_pylist(),
                                 batch.column(text_col).to_pylist()):
            grams = _doc_grams(txt, n)
            if src in evset:
                g_col.extend(grams)
                d_col.extend([did] * len(grams))
                e_col.extend([1] * len(grams))
            else:
                fresh = grams - train_seen
                train_seen |= fresh
                g_col.extend(fresh)
                d_col.extend([-1] * len(fresh))
                e_col.extend([0] * len(fresh))
        return pa.table({"gram": pa.array(g_col, pa.int64()),
                         "doc_id": pa.array(d_col, pa.int64()),
                         "is_eval": pa.array(e_col, pa.int64())})

    def bucket_matches(g: pd.DataFrame) -> pd.DataFrame:
        # a gram is contaminating iff BOTH sides occur in its (single)
        # bucket; count matched grams per eval doc, vectorized
        in_train = g.groupby("gram", sort=False)["is_eval"].transform("min")
        hits = g[(g["is_eval"] == 1) & (in_train == 0)]
        out = hits.groupby("doc_id", sort=False).size().reset_index(
            name="n_contaminated")
        out["n_grams"] = 0
        return out[["doc_id", "n_grams", "n_contaminated"]]

    totals = docs.map_batches(eval_totals, batch_format="pyarrow")
    grams = docs.map_batches(explode, batch_format="pyarrow")
    matches = coarse_grouped(grams, ["gram"], bucket_matches,
                             num_buckets=num_buckets,
                             out_dtypes=_OUT_DTYPES)
    combined = totals.union(matches)
    return grouped_reduce(combined, ["doc_id"],
                          {"n_grams": "sum", "n_contaminated": "sum"},
                          num_buckets=64)
