"""Composite corpus curation: the keep/drop decision a training-data
pipeline ships, as one distributed mask.

Every document gets a drop-reason BITMASK from four independent filter
families (each on its own already-verified scale path) and
``keep = (reasons == 0)``:

* bit 1 — too short (``n_tokens < min_tokens``);
* bit 2 — repetitive (duplicate-bigram per-mille > ``dup_bigram_pm`` —
  Gopher §A1.1, ``ops/text.py:add_repetition_stats``);
* bit 4 — boilerplate spans (non-first-copy passage per-mille >
  ``dup_passage_pm`` — ``ops/dedup.py:passage_dedup_stats``, global
  first-occurrence keeper semantics);
* bit 8 — off-distribution under the corpus's OWN unigram LM
  (``mean_surprisal_x100 > max_mean_surprisal_x100`` — the CCNet
  regime, ``ops/lm.py``).

Composition shape: three sources each emit exactly ONE ``(id,
partial-bitmask)`` row per document (bits are disjoint powers of two), a
union + one pre-combined reduce sums them into the mask — no joins. The
whole decision is SQL-expressible and oracle-paired through the
``curation_pass`` registry query; ``jobs/curate_job.py`` is the
operational form (mask → join back → hive ``keep=`` partitioned write
with per-reason lineage).

NOTE on chunked resume: two of the four families are CORPUS-GLOBAL
(the LM trains on the whole corpus; passage keepers are global first
occurrences), so the curation job is deliberately monolithic-streaming —
chunk-local masks would silently change semantics. Resumability lives in
the partitioned OUTPUT (re-run into a fresh dir), not in chunk ledgers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# reason bits (disjoint powers of two; summing partials == OR)
BIT_SHORT = 1
BIT_REPETITIVE = 2
BIT_BOILERPLATE = 4
BIT_OFF_DISTRIBUTION = 8

REASON_NAMES = {BIT_SHORT: "too_short",
                BIT_REPETITIVE: "repetitive",
                BIT_BOILERPLATE: "boilerplate_passages",
                BIT_OFF_DISTRIBUTION: "off_distribution"}


def curation_mask(docs, *, text_col: str = "text", id_col: str = "doc_id",
                  min_tokens: int = 20, dup_bigram_pm: int = 100,
                  dup_passage_pm: int = 250, passage_window: int = 4,
                  max_mean_surprisal_x100: int = 510,
                  num_buckets: int = 32):
    """→ Dataset ``(id_col, reasons, keep)`` — one row per document,
    exact integers (module docstring for semantics)."""
    from ccnerx_ray.functions.grouping import grouped_reduce
    from ccnerx_ray.ops.dedup import passage_dedup_stats
    from ccnerx_ray.ops.lm import score_documents, train_unigram
    from ccnerx_ray.ops.text import add_repetition_stats, add_token_stats

    def bits_text(batch: pa.Table) -> pa.Table:
        b = add_repetition_stats(add_token_stats(batch, text_col=text_col),
                                 text_col=text_col)
        nt = b.column("n_tokens").to_numpy(zero_copy_only=False)
        nb = b.column("n_bigrams").to_numpy(zero_copy_only=False)
        ub = b.column("n_uniq_bigrams").to_numpy(zero_copy_only=False)
        r = ((nt < min_tokens) * BIT_SHORT
             + ((nb > 0) & (1000 * (nb - ub) > dup_bigram_pm * nb))
             * BIT_REPETITIVE)
        return pa.table({id_col: batch.column(id_col),
                         "r": pa.array(r.astype(np.int64))})

    def bits_passage(batch: pa.Table) -> pa.Table:
        np_ = batch.column("n_passages").to_numpy(zero_copy_only=False)
        nd = batch.column("n_dup_passages").to_numpy(zero_copy_only=False)
        r = ((np_ > 0) & (1000 * nd > dup_passage_pm * np_)) \
            * BIT_BOILERPLATE
        return pa.table({id_col: batch.column(id_col),
                         "r": pa.array(r.astype(np.int64))})

    def bits_lm(batch: pa.Table) -> pa.Table:
        m = batch.column("mean_surprisal_x100").to_numpy(
            zero_copy_only=False)
        r = (m > max_mean_surprisal_x100) * BIT_OFF_DISTRIBUTION
        return pa.table({id_col: batch.column(id_col),
                         "r": pa.array(r.astype(np.int64))})

    srcs = (docs.map_batches(bits_text, batch_format="pyarrow")
            .union(passage_dedup_stats(docs, window=passage_window,
                                       text_col=text_col, id_col=id_col)
                   .map_batches(bits_passage, batch_format="pyarrow"))
            .union(score_documents(docs,
                                   train_unigram(docs, text_col=text_col),
                                   text_col=text_col, id_col=id_col)
                   .map_batches(bits_lm, batch_format="pyarrow")))
    mask = grouped_reduce(srcs, [id_col], {"r": "sum"},
                          num_buckets=num_buckets, pre_combine=True,
                          out_dtypes={id_col: "int64", "r": "int64"})

    def finish(batch: pa.Table) -> pa.Table:
        r = batch.column("r").to_numpy(zero_copy_only=False)
        return pa.table({id_col: batch.column(id_col),
                         "reasons": pa.array(r, pa.int64()),
                         "keep": pa.array((r == 0).astype(np.int64))})

    return mask.map_batches(finish, batch_format="pyarrow")


def reason_counts(mask) -> dict:
    """Per-bit drop counts + keep/drop totals off a mask Dataset — one
    pass of mergeable sums (the lineage record)."""

    def partial(batch: pa.Table) -> pa.Table:
        r = batch.column("reasons").to_numpy(zero_copy_only=False)
        cols = {"n_docs": pa.array([len(r)], pa.int64()),
                "n_kept": pa.array([int((r == 0).sum())], pa.int64())}
        for bit, name in REASON_NAMES.items():
            cols[name] = pa.array([int(((r & bit) > 0).sum())], pa.int64())
        return pa.table(cols)

    agg = mask.map_batches(partial, batch_format="pyarrow").sum(
        ["n_docs", "n_kept"] + list(REASON_NAMES.values()))
    out = {k.replace("sum(", "").rstrip(")"): int(v or 0)
           for k, v in (agg or {}).items()}
    if out:
        out["n_dropped"] = out["n_docs"] - out["n_kept"]
    return out
