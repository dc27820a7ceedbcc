"""Code-analysis operators over the graft corpus ``(repo, path, commit,
lang, content)`` — the north-star input shape (BASELINE.json
``input_hint``: Parquet tables of source-code repositories).

A KG built FROM code needs structure the NER tagger doesn't see: which
modules a file imports, which symbols a repo defines, and the cross-repo
dependency graph those two tables imply. These are the classic
"source-graph" extraction stages (import scanning / symbol indexing /
dependency-edge materialization) re-expressed Ray-Data-first:

* every extractor is a single ``map_batches`` pass of pure Arrow string
  kernels (``split_pattern`` → ``list_flatten`` / ``list_parent_indices``
  → ``starts_with`` filters → slice/trim) — zero Python loops over rows,
  zero-copy from the object store;
* aggregation rides :func:`ccnerx_ray.functions.grouping.grouped_reduce`
  (per-batch combiner → one coarse hash-partitioned shuffle), so shuffle
  volume is ~distinct-keys, not line-scale;
* the dependency join is one coarse co-group on the module/symbol key
  (the ``semi_join_on`` shape with a carried one-to-MANY right side) —
  both sides stay distributed, nothing broadcasts, giant-monorepo key
  skew is bounded by the catalog's surface count per coarse bucket.

Line-grammar contract (matches ``ccnerx_ray.corpus`` rendering and the
common Python/go/js surface): ``import <module>``, ``def <sym> ( … ) :``,
``class <sym> :``, with dotted qualified names rendered token-spaced
(``lib . func``) and canonicalized to ``lib.func``. Real-world corpora
with other grammars extend ``IMPORT_PREFIXES``/``DEF_PREFIXES``.

No reference counterpart (the reference is a text-NER repo); this family
is what its mention detection becomes when the corpus is code and the KG
must also carry structural (repo)-[imports]->(repo) edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ccnerx_ray.functions.grouping import (coarse_grouped, drop_duplicate_rows,
                                           grouped_reduce)
from ccnerx_ray.ops.join import derive_hash_partitions

LINE_SCHEMA = pa.schema([
    ("repo", pa.string()), ("path", pa.string()), ("lang", pa.string()),
    ("line_no", pa.int64()), ("line", pa.string()),
])


def _explode_lines(batch: pa.Table) -> pa.Table:
    """content → one row per line, carrying (repo, path, lang, line_no).
    Pure Arrow: split_pattern / list_flatten / list_parent_indices; line
    numbers are offset arithmetic (numpy on the list offsets)."""
    la = pc.split_pattern(batch.column("content"), "\n").combine_chunks()
    flat = pc.list_flatten(la)
    parent = pc.list_parent_indices(la)
    pidx = parent.to_numpy(zero_copy_only=False)
    starts = la.offsets.to_numpy(zero_copy_only=False)[:-1]
    line_no = np.arange(len(flat), dtype=np.int64) - starts[pidx] \
        if len(flat) else np.zeros(0, dtype=np.int64)
    return pa.table({
        "repo": pc.take(batch.column("repo"), parent),
        "path": pc.take(batch.column("path"), parent),
        "lang": pc.take(batch.column("lang"), parent),
        "line_no": pa.array(line_no, pa.int64()),
        "line": flat,
    })


def corpus_lines(corpus):
    """Dataset[(repo,path,lang,content,…)] → Dataset[LINE_SCHEMA]."""
    return corpus.map_batches(_explode_lines, batch_format="pyarrow")


def _canon(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Token-spaced dotted name → canonical: ``lib . func`` → ``lib.func``,
    then trim. (The corpus renders multi-token catalog surfaces with
    single spaces around each dot; real code has no padding — replace is
    a no-op there.)"""
    return pc.utf8_trim_whitespace(pc.replace_substring(arr, " . ", "."))


def _extract_imports_batch(batch: pa.Table) -> pa.Table:
    t = _explode_lines(batch)
    t = t.filter(pc.starts_with(t.column("line"), "import "))
    mod = _canon(pc.utf8_slice_codeunits(t.column("line"), 7))
    out = pa.table({"repo": t.column("repo"), "path": t.column("path"),
                    "lang": t.column("lang"), "module": mod})
    return out.filter(pc.not_equal(out.column("module"), ""))


def extract_imports(corpus):
    """corpus → Dataset[(repo, path, lang, module)] — one row per import
    line, module canonicalized. Single fused pass (explode + filter +
    slice inside one map_batches)."""
    return corpus.map_batches(_extract_imports_batch, batch_format="pyarrow")


def _extract_symbols_batch(batch: pa.Table) -> pa.Table:
    t = _explode_lines(batch)
    parts = []
    for prefix, terminator, kind in (("def ", " (", "def"),
                                     ("class ", " :", "class")):
        s = t.filter(pc.starts_with(t.column("line"), prefix))
        rest = pc.utf8_slice_codeunits(s.column("line"), len(prefix))
        # symbol = text before the first terminator (args / colon); split
        # with max_splits=1 then take element 0 — surfaces never contain
        # '(' or ':' so the first hit is the boundary
        sym = _canon(pc.list_element(
            pc.split_pattern(rest, terminator, max_splits=1), 0))
        parts.append(pa.table({
            "repo": s.column("repo"), "path": s.column("path"),
            "lang": s.column("lang"),
            "symbol": sym,
            "kind": pa.nulls(s.num_rows, pa.string()).fill_null(kind),
        }))
    out = pa.concat_tables(parts).combine_chunks()
    return out.filter(pc.not_equal(out.column("symbol"), ""))


def extract_symbols(corpus):
    """corpus → Dataset[(repo, path, lang, symbol, kind)] — one row per
    def/class definition line."""
    return corpus.map_batches(_extract_symbols_batch, batch_format="pyarrow")


def _width(input_bytes: int | None) -> int:
    return derive_hash_partitions(input_bytes)


def module_popularity(imports, input_bytes: int | None = None):
    """imports → (module, n_imports, n_repos): total import-line count and
    distinct importing-repo count per module. Two-level reduce: the
    per-(module,repo) partial rides a pre-combined coarse shuffle (line
    scale → distinct-pair scale), the per-module rollup is pair-scale."""
    nb = _width(input_bytes)

    def one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "cnt", pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    pairs = grouped_reduce(
        imports.select_columns(["module", "repo"]).map_batches(
            one, batch_format="pyarrow"),
        ["module", "repo"], {"cnt": "sum"}, num_buckets=nb,
        out_dtypes={"module": "string", "repo": "string", "cnt": "int64"},
        pre_combine=True)

    def roll(g):
        out = (g.groupby("module", sort=False)
                .agg(n_imports=("cnt", "sum"), n_repos=("repo", "count"))
                .reset_index())
        return out

    return coarse_grouped(pairs, ["module"], roll, num_buckets=nb,
                          out_dtypes={"module": "string",
                                      "n_imports": "int64",
                                      "n_repos": "int64"})


def symbol_stats(symbols, input_bytes: int | None = None):
    """symbols → (symbol, kind, n_defs, n_repos) per definition surface."""
    nb = _width(input_bytes)

    def one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "cnt", pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    pairs = grouped_reduce(
        symbols.select_columns(["symbol", "kind", "repo"]).map_batches(
            one, batch_format="pyarrow"),
        ["symbol", "kind", "repo"], {"cnt": "sum"}, num_buckets=nb,
        out_dtypes={"symbol": "string", "kind": "string", "repo": "string",
                    "cnt": "int64"},
        pre_combine=True)

    def roll(g):
        return (g.groupby(["symbol", "kind"], sort=False)
                 .agg(n_defs=("cnt", "sum"), n_repos=("repo", "count"))
                 .reset_index())

    return coarse_grouped(pairs, ["symbol", "kind"], roll, num_buckets=nb,
                          out_dtypes={"symbol": "string", "kind": "string",
                                      "n_defs": "int64", "n_repos": "int64"})


def repo_dep_edges(imports, symbols, input_bytes: int | None = None):
    """(imports, symbols) → (src_repo, dst_repo, n_links): the cross-repo
    dependency graph. Each import LINE of module m links its repo to every
    DISTINCT repo defining m (def or class); undefined modules drop (inner
    join). One coarse co-group on the module/symbol key performs the
    one-to-many join with per-group pandas merge — both sides distributed,
    no broadcast — then a pair-scale reduce sums partial counts.

    Skew note: a module defined in many repos AND imported everywhere
    multiplies inside its key group; group width is bounded by (imports of
    that module in the bucket) × (its defining repos), and defining repos
    are deduped before the shuffle.
    """
    nb = _width(input_bytes)
    defs = drop_duplicate_rows(
        symbols.select_columns(["symbol", "repo"]),
        ["symbol", "repo"], num_buckets=nb)

    def imp_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch.column("module"),
            "src_repo": batch.column("repo"),
            "dst_repo": pa.nulls(n, pa.string()),
            "_side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def def_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch.column("symbol"),
            "src_repo": pa.nulls(n, pa.string()),
            "dst_repo": batch.column("repo"),
            "_side": pa.array(np.ones(n, dtype=np.int8)),
        })

    both = imports.map_batches(imp_rows, batch_format="pyarrow").union(
        defs.map_batches(def_rows, batch_format="pyarrow"))

    def local(g):
        imp = g[g["_side"] == 0][["key", "src_repo"]]
        dfs = g[g["_side"] == 1][["key", "dst_repo"]]
        if imp.empty or dfs.empty:
            return imp.iloc[:0].assign(dst_repo="", n_links=0)[
                ["src_repo", "dst_repo", "n_links"]]
        m = imp.merge(dfs, on="key")
        return (m.groupby(["src_repo", "dst_repo"], sort=False)
                 .size().rename("n_links").reset_index())

    partial = coarse_grouped(both, ["key"], local, num_buckets=nb,
                             out_dtypes={"src_repo": "string",
                                         "dst_repo": "string",
                                         "n_links": "int64"})
    return grouped_reduce(partial, ["src_repo", "dst_repo"],
                          {"n_links": "sum"}, num_buckets=nb,
                          out_dtypes={"src_repo": "string",
                                      "dst_repo": "string",
                                      "n_links": "int64"})
