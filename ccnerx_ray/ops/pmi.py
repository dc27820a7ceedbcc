"""PMI phrase mining: which adjacent token pairs co-occur far more than
their marginals predict — the collocation/phrase-discovery pass a
training-data pipeline runs before building a phrase vocabulary (the
corpus-scale form of "new york" ≠ "new" + "york").

Score: ``PMI(x,y) = log( p(x,y) / (p(x)·p(y)) )``. For RANKING the
constant corpus totals cancel, so pairs order by the rational
``c_xy / (c_x · c_y)`` — compared as ONE IEEE double division of
exactly-representable int64 operands (``c_x·c_y ≤ N² < 2⁵³`` up to
N ≈ 9.5·10⁷ tokens per slice; past that swap the ratio to log-space —
documented, not silent). The emitted columns are counts only (ints +
tokens), so the result value-hashes; the ratio is derivable.

Scale shape (the ``split_drift`` recipe): ONE combiner scan emits
distinct ``(kind, x, y, c)`` partials — unigrams and adjacent bigrams
together, occurrences never cross the shuffle — then a vocab-scale
reduce, two :func:`ccnerx_ray.ops.join.adaptive_join` marginal joins
(broadcast under the byte bound, hash-partitioned beyond), and
per-block lossless top-n partials merged in one single-block cut. The
bigram table is never globally sorted."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ccnerx_ray.functions.grouping import grouped_reduce
from ccnerx_ray.functions.tokenize import ws_tokens
from ccnerx_ray.ops import join as joinmod


def assoc_top_pairs(pairs, marginals, *, top_n: int = 25,
                    min_count: int = 2,
                    pair_cols: tuple = ("ea", "eb"),
                    count_col: str = "c_xy",
                    marg_key: str = "eid", marg_count: str = "c"):
    """Generalized PMI ranking over an ARBITRARY pair-count table: given
    ``pairs(ea, eb, c_xy)`` and a marginal table ``marginals(eid, c)``,
    rank pairs by ``c_xy / (c_x · c_y)`` (the constant-total-cancelled
    PMI ratio — same exactness ledger as :func:`pmi_top_pairs`: emitted
    columns are the INT counts, ordering is ONE IEEE double division of
    <2⁵³ operands, ties broken by the pair key). This is the KG edge
    **confidence weighting** step: over document-level entity
    co-occurrence counts it scores which ``co_occurs_with`` edges are
    association-driven rather than popularity-driven (reference analogue:
    the co-occurrence triples its pipeline emits unweighted —
    `ftloader_v1.py` materializes pairs with no strength signal).

    Scale shape: two :func:`ccnerx_ray.ops.join.adaptive_join` marginal
    joins (broadcast under the byte bound, hash-partitioned beyond) and
    per-block lossless top-n partials merged in one single-block cut —
    the pair table is never globally sorted. Output columns:
    ``(ea, eb, c_xy, c_x, c_y)`` ordered by ratio desc then pair key."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    ca, cb = pair_cols
    # the marginal table feeds BOTH joins — materialize once (it is
    # vocab-scale: one row per entity/token)
    marginals = marginals.materialize()

    def marg_as(key_name: str, val_name: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.select([marg_key, marg_count]).rename_columns(
                [key_name, val_name])
        return fn

    j = joinmod.adaptive_join(
        pairs, marginals.map_batches(marg_as(ca, "c_x"),
                                     batch_format="pyarrow"), on=ca)
    j = joinmod.adaptive_join(
        j, marginals.map_batches(marg_as(cb, "c_y"),
                                 batch_format="pyarrow"), on=cb)

    empty = {ca: pd.Series(dtype="object"), cb: pd.Series(dtype="object"),
             count_col: pd.Series(dtype="int64"),
             "c_x": pd.Series(dtype="int64"),
             "c_y": pd.Series(dtype="int64")}

    def score_topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[count_col] >= min_count]
        if not len(df):
            return pd.DataFrame(empty)
        cx = df["c_x"].to_numpy(np.int64)
        cy = df["c_y"].to_numpy(np.int64)
        den = cx * cy
        assert den.max(initial=0) < (1 << 53), \
            "marginal product exceeds exact-double range — swap the " \
            "ranking ratio to log-space (documented in the module header)"
        ratio = df[count_col].to_numpy(np.int64).astype(np.float64) / den
        out = df.assign(_r=ratio)
        # per-block lossless top-n partial (scoring is per-row, so the
        # global top-n is a subset of the union of block top-ns)
        out = out.sort_values(["_r", ca, cb],
                              ascending=[False, True, True],
                              kind="mergesort").head(top_n)
        return out[[ca, cb, count_col, "c_x", "c_y"]].astype(
            {count_col: "int64", "c_x": "int64", "c_y": "int64"})

    partials = j.map_batches(score_topn, batch_format="pandas")
    # final cut: blocks-scale rows (n_blocks × top_n) in ONE block
    return partials.repartition(1).map_batches(
        lambda df: score_topn(df).reset_index(drop=True),
        batch_format="pandas")


def token_pair_counts(docs, *, text_col: str = "text",
                      num_buckets: int | None = None):
    """One scan → reduced ``(kind, x, y, c)``: kind 0 = unigram counts
    (y = ''), kind 1 = adjacent-bigram counts. Combiner emits distinct
    keys per batch, never occurrences."""

    def partial(batch: pa.Table) -> pa.Table:
        uni: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        for t in batch.column(text_col).to_pylist():
            toks = ws_tokens(t or "")
            for w in toks:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(toks, toks[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        xs = list(uni) + [p[0] for p in bi]
        ys = [""] * len(uni) + [p[1] for p in bi]
        ks = [0] * len(uni) + [1] * len(bi)
        cs = list(uni.values()) + list(bi.values())
        return pa.table({"kind": pa.array(ks, pa.int64()),
                         "x": pa.array(xs, pa.string()),
                         "y": pa.array(ys, pa.string()),
                         "c": pa.array(cs, pa.int64())})

    parts = docs.map_batches(partial, batch_format="pyarrow")
    if num_buckets is None:
        num_buckets = joinmod.derive_hash_partitions(None)
    return grouped_reduce(parts, ["kind", "x", "y"], {"c": "sum"},
                          num_buckets=num_buckets,
                          out_dtypes={"kind": "int64", "x": "string",
                                      "y": "string", "c": "int64"})


def pmi_top_pairs(docs, *, top_n: int = 25, min_count: int = 5,
                  text_col: str = "text",
                  num_buckets: int | None = None):
    """Top-``top_n`` adjacent token pairs by PMI with a ``min_count``
    support floor → ``(tok_x, tok_y, c_xy, c_x, c_y)`` ordered by
    (c_xy/(c_x·c_y) desc, tok_x, tok_y). See the module docstring for
    the exactness and scale ledger."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    counts = token_pair_counts(docs, text_col=text_col,
                               num_buckets=num_buckets).materialize()

    def split(kind: int, rename: dict):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            sub = batch.filter(pc.equal(batch.column("kind"), kind))
            keep = [c for c in rename if c in sub.column_names]
            return sub.select(keep).rename_columns(
                [rename[c] for c in keep])
        return fn

    bi = counts.map_batches(split(1, {"x": "tok_x", "y": "tok_y",
                                      "c": "c_xy"}),
                            batch_format="pyarrow")
    uni_x = counts.map_batches(split(0, {"x": "tok_x", "c": "c_x"}),
                               batch_format="pyarrow")
    uni_y = counts.map_batches(split(0, {"x": "tok_y", "c": "c_y"}),
                               batch_format="pyarrow")
    j = joinmod.adaptive_join(bi, uni_x, on="tok_x")
    j = joinmod.adaptive_join(j, uni_y, on="tok_y")

    def score_topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_xy"] >= min_count]
        if not len(df):
            return pd.DataFrame({"tok_x": pd.Series(dtype="object"),
                                 "tok_y": pd.Series(dtype="object"),
                                 "c_xy": pd.Series(dtype="int64"),
                                 "c_x": pd.Series(dtype="int64"),
                                 "c_y": pd.Series(dtype="int64")})
        den = df["c_x"].to_numpy(np.int64) * df["c_y"].to_numpy(np.int64)
        ratio = df["c_xy"].to_numpy(np.int64).astype(np.float64) / den
        out = df.assign(_r=ratio)
        # per-block lossless top-n partial (scoring is per-row, so the
        # global top-n is a subset of the union of block top-ns)
        out = out.sort_values(["_r", "tok_x", "tok_y"],
                              ascending=[False, True, True],
                              kind="mergesort").head(top_n)
        return out[["tok_x", "tok_y", "c_xy", "c_x", "c_y"]].astype(
            {"c_xy": "int64", "c_x": "int64", "c_y": "int64"})

    partials = j.map_batches(score_topn, batch_format="pandas")
    # final cut: blocks-scale rows (n_blocks × top_n) in ONE block
    return partials.repartition(1).map_batches(
        lambda df: score_topn(df).reset_index(drop=True),
        batch_format="pandas")
