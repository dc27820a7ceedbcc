"""Corpus drift detection — which tokens drive the distribution shift
between two corpus slices, in exact integer arithmetic.

A 100-TB training pipeline ingests a new slice every day and needs to
know when its token distribution walks away from the reference mix
(crawl-quality regressions, a new boilerplate family, a language mix
shift) BEFORE the slice trains a model. The standard monitor is the
per-token cross-entropy gap: token ``t`` with counts ``c_a`` (slice A,
total ``N_a``) and ``c_b`` (slice B, total ``N_b``) contributes

    gain_bits(t) = c_a · (bits_b(t) − bits_a(t))

extra bits when A is encoded under B's unigram model instead of its own
— the per-token decomposition of ``N_a · (H(A, B) − H(A))``, the same
KL-style quantity CCNet-style filters threshold on (Wenzek et al. 2020),
ranked per token so the answer is actionable. ``bits_x`` follows
``ops/lm.py``'s exact-integer surprisal convention — ``bitlen(N_x) −
bitlen(c_x)``, OOV costs ``bitlen(N_x)`` — so the whole
split→count→score→rank loop value-hashes against a SQL oracle (DuckDB
``length(bin(x))`` is the ``bit_length`` twin; the degenerate empty-slice
``N=0`` differs — ``bin(0)`` is ``'0'`` — and is documented, not
registered).

Slices come from :func:`ccnerx_ray.ops.sampling.hash_split` — the
deterministic per-mille bucket assignment — so the comparison needs no
second input table and is stable across runs/retries/partitionings; any
caller with two real corpora can pass pre-labelled rows instead.

Scale shape: ONE corpus scan (the classic combiner — per-batch distinct
``(token, c_a, c_b)`` partials, never raw occurrences, cross the
shuffle) into a vocab-scale grouped reduce; totals are two sums over the
vocab table; ranking is per-block lossless top-n partials merged in one
final single-block cut — the vocab table is never globally sorted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ccnerx_ray.functions.grouping import grouped_reduce
from ccnerx_ray.functions.tokenize import ws_tokens
from ccnerx_ray.ops import join as joinmod
from ccnerx_ray.ops.lm import bitlen64
from ccnerx_ray.ops.sampling import hash_split

_DEFAULT_BOUNDS = (("train", 900), ("val", 950), ("test", 1000))


def split_token_counts(docs, *, text_col: str = "text",
                       id_col: str = "doc_id", salt: str = "split",
                       bounds_pm=_DEFAULT_BOUNDS,
                       split_a: str = "train", split_b: str = "val",
                       num_buckets: int | None = None):
    """Per-token occurrence counts in two hash-split slices →
    ``(token, c_a, c_b)`` (vocab-scale). One scan; rows outside the two
    slices are skipped at the combiner."""
    tagged = hash_split(docs, id_col=id_col, salt=salt,
                        bounds_pm=bounds_pm)

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, list] = {}
        texts = batch.column(text_col).to_pylist()
        splits = batch.column("split").to_pylist()
        for t, s in zip(texts, splits):
            if s == split_a:
                k = 0
            elif s == split_b:
                k = 1
            else:
                continue
            for w in ws_tokens(t):
                e = counts.get(w)
                if e is None:
                    counts[w] = e = [0, 0]
                e[k] += 1
        return pa.table({
            "token": pa.array(list(counts), pa.string()),
            "c_a": pa.array([v[0] for v in counts.values()], pa.int64()),
            "c_b": pa.array([v[1] for v in counts.values()], pa.int64()),
        })

    parts = tagged.map_batches(partial, batch_format="pyarrow")
    if num_buckets is None:
        num_buckets = joinmod.derive_hash_partitions(None)
    return grouped_reduce(parts, ["token"],
                          {"c_a": "sum", "c_b": "sum"},
                          num_buckets=num_buckets,
                          out_dtypes={"token": "string", "c_a": "int64",
                                      "c_b": "int64"})


def split_drift(docs, *, text_col: str = "text", id_col: str = "doc_id",
                salt: str = "split", bounds_pm=_DEFAULT_BOUNDS,
                split_a: str = "train", split_b: str = "val",
                top_n: int = 50, num_buckets: int | None = None):
    """Top-``top_n`` drift-driving tokens between two hash-split slices
    → ``(token, c_a, c_b, bits_a, bits_b, gain_bits)`` ordered by
    (gain desc, token asc).

    ``gain_bits = c_a · (bits_b − bits_a)``: the extra bits slice B's
    unigram model pays to encode slice A's occurrences of this token —
    positive for tokens A over-represents, the per-token decomposition
    of the cross-entropy gap. Exact int64 throughout (``bitlen`` diffs
    are ≤ 64, so the product is safe wherever ``c_a`` itself is)."""
    model = split_token_counts(
        docs, text_col=text_col, id_col=id_col, salt=salt,
        bounds_pm=bounds_pm, split_a=split_a, split_b=split_b,
        num_buckets=num_buckets).materialize()
    na = int(model.sum("c_a") or 0)
    nb = int(model.sum("c_b") or 0)
    na_bits, nb_bits = na.bit_length(), nb.bit_length()

    def score_topn(df: pd.DataFrame) -> pd.DataFrame:
        ca = df["c_a"].to_numpy(dtype=np.int64)
        cb = df["c_b"].to_numpy(dtype=np.int64)
        bits_a = np.where(ca > 0, na_bits - bitlen64(np.maximum(ca, 1)),
                          na_bits).astype(np.int64)
        bits_b = np.where(cb > 0, nb_bits - bitlen64(np.maximum(cb, 1)),
                          nb_bits).astype(np.int64)
        out = pd.DataFrame({"token": df["token"], "c_a": ca, "c_b": cb,
                            "bits_a": bits_a, "bits_b": bits_b,
                            "gain_bits": ca * (bits_b - bits_a)})
        # per-block lossless top-n partial: the global top-n is a subset
        # of the union of block top-ns
        return (out.sort_values(["gain_bits", "token"],
                                ascending=[False, True]).head(top_n))

    partials = model.map_batches(score_topn, batch_format="pandas")
    # final cut: blocks-scale rows (n_blocks × top_n) in ONE block
    return partials.repartition(1).map_batches(
        lambda df: (df.sort_values(["gain_bits", "token"],
                                   ascending=[False, True])
                    .head(top_n).reset_index(drop=True)),
        batch_format="pandas")
