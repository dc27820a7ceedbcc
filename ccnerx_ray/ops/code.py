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


_CARRY_DEFAULT = ("repo", "path", "lang")


def _explode_lines(batch: pa.Table,
                   carry: tuple[str, ...] = _CARRY_DEFAULT) -> pa.Table:
    """content → one row per line, carrying ``carry`` columns + line_no.
    Pure Arrow: split_pattern / list_flatten / list_parent_indices; line
    numbers are offset arithmetic (numpy on the list offsets)."""
    la = pc.split_pattern(batch.column("content"), "\n").combine_chunks()
    flat = pc.list_flatten(la)
    parent = pc.list_parent_indices(la)
    pidx = parent.to_numpy(zero_copy_only=False)
    starts = la.offsets.to_numpy(zero_copy_only=False)[:-1]
    line_no = np.arange(len(flat), dtype=np.int64) - starts[pidx] \
        if len(flat) else np.zeros(0, dtype=np.int64)
    cols = {c: pc.take(batch.column(c), parent) for c in carry}
    cols["line_no"] = pa.array(line_no, pa.int64())
    cols["line"] = flat
    return pa.table(cols)


def corpus_lines(corpus):
    """Dataset[(repo,path,lang,content,…)] → Dataset[LINE_SCHEMA]."""
    return corpus.map_batches(_explode_lines, batch_format="pyarrow")


def _canon(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Token-spaced dotted name → canonical: ``lib . func`` → ``lib.func``,
    then trim. (The corpus renders multi-token catalog surfaces with
    single spaces around each dot; real code has no padding — replace is
    a no-op there.)"""
    return pc.utf8_trim_whitespace(pc.replace_substring(arr, " . ", "."))


STRUCTURE_SCHEMA = pa.schema([
    ("repo", pa.string()), ("path", pa.string()), ("lang", pa.string()),
    ("kind", pa.string()), ("name", pa.string()),
])


def _kind_rows(t: pa.Table, mask, name, kind: str,
               carry: tuple[str, ...] = _CARRY_DEFAULT) -> pa.Table:
    s = t.filter(mask)
    name = _canon(name(s)) if callable(name) else name
    cols = {c: s.column(c) for c in carry}
    cols["kind"] = pa.nulls(s.num_rows, pa.string()).fill_null(kind)
    cols["name"] = name
    return pa.table(cols)


def _extract_structure_batch(batch: pa.Table,
                             carry: tuple[str, ...] = _CARRY_DEFAULT
                             ) -> pa.Table:
    """ONE pass over the lines: every structural extraction (import /
    def / class / call / callarg) shares the explode, so downstream
    consumers that need several kinds cost one corpus scan, not one per
    kind. All masks/slices are Arrow kernels."""
    t = _explode_lines(batch, carry)
    line = t.column("line")
    is_imp = pc.starts_with(line, "import ")
    is_def = pc.starts_with(line, "def ")
    is_cls = pc.starts_with(line, "class ")
    # call lines: `<var> = <callee> ( <arg> )` — anything not already a
    # keyword line that contains both ` = ` and ` ( `
    is_call = pc.and_(
        pc.and_(pc.match_substring(line, " = "),
                pc.match_substring(line, " ( ")),
        pc.invert(pc.or_(pc.or_(is_imp, is_def), is_cls)))

    def after_eq(s: pa.Table):
        # "<var> = <callee> ( <arg> )" → rhs after first " = "
        return pc.list_element(
            pc.split_pattern(s.column("line"), " = ", max_splits=1), 1)

    def callee(s: pa.Table):
        return pc.list_element(
            pc.split_pattern(after_eq(s), " (", max_splits=1), 0)

    def callarg(s: pa.Table):
        # text between the first "( " and the final " )"
        inner = pc.list_element(
            pc.split_pattern(after_eq(s), "( ", max_splits=1), 1)
        return pc.list_element(
            pc.split_pattern(inner, " )", max_splits=1), 0)

    parts = [
        _kind_rows(t, is_imp,
                   lambda s: pc.utf8_slice_codeunits(s.column("line"), 7),
                   "import", carry),
        _kind_rows(t, is_def,
                   lambda s: pc.list_element(pc.split_pattern(
                       pc.utf8_slice_codeunits(s.column("line"), 4),
                       " (", max_splits=1), 0),
                   "def", carry),
        _kind_rows(t, is_cls,
                   lambda s: pc.list_element(pc.split_pattern(
                       pc.utf8_slice_codeunits(s.column("line"), 6),
                       " :", max_splits=1), 0),
                   "class", carry),
        _kind_rows(t, is_call, callee, "call", carry),
        _kind_rows(t, is_call, callarg, "callarg", carry),
    ]
    out = pa.concat_tables(parts).combine_chunks()
    return out.filter(pc.not_equal(out.column("name"), ""))


def extract_structure(corpus):
    """corpus → Dataset[STRUCTURE_SCHEMA]: one row per structural fact
    (kind ∈ import/def/class/call/callarg, name canonicalized). The
    single-scan source for every code-analysis aggregate — materialize
    it when feeding multiple consumers (structure rows carry names only,
    a small fraction of corpus bytes)."""
    return corpus.map_batches(_extract_structure_batch,
                              batch_format="pyarrow")


def imports_from_structure(st):
    """structure → (repo, path, lang, module): zero extra corpus scans."""
    def fn(batch: pa.Table) -> pa.Table:
        s = batch.filter(pc.equal(batch.column("kind"), "import"))
        return pa.table({"repo": s.column("repo"), "path": s.column("path"),
                         "lang": s.column("lang"),
                         "module": s.column("name")})
    return st.map_batches(fn, batch_format="pyarrow")


def symbols_from_structure(st):
    """structure → (repo, path, lang, symbol, kind) over def/class."""
    def fn(batch: pa.Table) -> pa.Table:
        s = batch.filter(pc.is_in(batch.column("kind"),
                                  value_set=pa.array(["def", "class"])))
        return pa.table({"repo": s.column("repo"), "path": s.column("path"),
                         "lang": s.column("lang"),
                         "symbol": s.column("name"),
                         "kind": s.column("kind")})
    return st.map_batches(fn, batch_format="pyarrow")


def extract_imports(corpus):
    """corpus → Dataset[(repo, path, lang, module)] — one row per import
    line, module canonicalized. Single fused pass."""
    return imports_from_structure(extract_structure(corpus))


def extract_symbols(corpus):
    """corpus → Dataset[(repo, path, lang, symbol, kind)] — one row per
    def/class definition line."""
    return symbols_from_structure(extract_structure(corpus))


def _width(input_bytes: int | None) -> int:
    return derive_hash_partitions(input_bytes)


def _ones(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "cnt", pa.array(np.ones(batch.num_rows, dtype=np.int64)))


def name_popularity(ds, name_col: str, n_count: str, n_repos: str,
                    input_bytes: int | None = None):
    """(name_col, repo) rows → (name_col, <n_count>, <n_repos>): total
    line count and distinct-repo count per name. Two-level reduce: the
    per-(name,repo) partial rides a pre-combined coarse shuffle (line
    scale → distinct-pair scale), the per-name rollup is pair-scale."""
    nb = _width(input_bytes)
    pairs = grouped_reduce(
        ds.select_columns([name_col, "repo"]).map_batches(
            _ones, batch_format="pyarrow"),
        [name_col, "repo"], {"cnt": "sum"}, num_buckets=nb,
        out_dtypes={name_col: "string", "repo": "string", "cnt": "int64"},
        pre_combine=True)

    def roll(g):
        return (g.groupby(name_col, sort=False)
                 .agg(**{n_count: ("cnt", "sum"),
                         n_repos: ("repo", "count")})
                 .reset_index())

    return coarse_grouped(pairs, [name_col], roll, num_buckets=nb,
                          out_dtypes={name_col: "string",
                                      n_count: "int64", n_repos: "int64"})


def module_popularity(imports, input_bytes: int | None = None):
    """imports → (module, n_imports, n_repos)."""
    return name_popularity(imports, "module", "n_imports", "n_repos",
                           input_bytes)


def call_popularity(structure, input_bytes: int | None = None):
    """structure → (callee, n_calls, n_repos) over call lines: which
    symbols the corpus actually invokes (the usage-weighted side of the
    dependency KG; definition counts alone miss dead code)."""
    def calls(batch: pa.Table) -> pa.Table:
        s = batch.filter(pc.equal(batch.column("kind"), "call"))
        return pa.table({"repo": s.column("repo"),
                         "callee": s.column("name")})
    rows = structure.map_batches(calls, batch_format="pyarrow")
    return name_popularity(rows, "callee", "n_calls", "n_repos",
                           input_bytes)


_PRED_OF_KIND = {"import": "imports", "def": "defines_def",
                 "class": "defines_class", "call": "calls",
                 "callarg": "uses"}


def structure_triples(structure, input_bytes: int | None = None):
    """structure → the structural KG triple table
    ``(subj, pred, obj, n_lines)``: subj = repo, pred ∈ imports /
    defines_def / defines_class / calls / uses, obj = canonical name,
    n_lines = supporting line count. This is the edge set a source-code
    KG carries ALONGSIDE the NER mention triples (pipelines/kg.py) —
    same (subj, pred, obj) shape, evidence-counted."""
    def to_triples(batch: pa.Table) -> pa.Table:
        # kind → pred as a dictionary lookup (index_in + take; whole-cell
        # match, immune to 'call' being a prefix of 'callarg')
        idx = pc.index_in(batch.column("kind"),
                          value_set=pa.array(list(_PRED_OF_KIND)))
        pred = pc.take(pa.array(list(_PRED_OF_KIND.values())), idx)
        return pa.table({"subj": batch.column("repo"), "pred": pred,
                         "obj": batch.column("name")})
    rows = structure.map_batches(to_triples, batch_format="pyarrow") \
                    .map_batches(_ones, batch_format="pyarrow")
    return grouped_reduce(rows, ["subj", "pred", "obj"],
                          {"cnt": "sum"}, num_buckets=_width(input_bytes),
                          out_dtypes={"subj": "string", "pred": "string",
                                      "obj": "string", "cnt": "int64"},
                          pre_combine=True).map_batches(
        lambda t: t.rename_columns(
            ["n_lines" if c == "cnt" else c for c in t.column_names]),
        batch_format="pyarrow")


def _file_structure_triples_batch(batch: pa.Table) -> pa.Table:
    """corpus batch → TRIPLE_SCHEMA rows: one row per DISTINCT structural
    fact per FILE (subj = repo, pred via ``_PRED_OF_KIND``, obj = canonical
    name) with full provenance (repo, path, commit, content_sha256) — the
    same "once per distinct fact per unit" emission rule the mention
    triples use (``stages/triples.py``: instance_of is distinct per
    segment). A file never spans batches (one corpus row = one file), so
    the per-batch ``group_by`` distinct is per-file exact. surface /
    norm_key / label are empty, like every non-``mentioned_in`` triple."""
    from ccnerx_ray.functions.hashing import sha256_column
    from ccnerx_ray.stages.triples import TRIPLE_SCHEMA

    b = batch.append_column("content_sha256",
                            sha256_column(batch.column("content")))
    st = _extract_structure_batch(
        b, carry=("repo", "path", "commit", "content_sha256"))
    idx = pc.index_in(st.column("kind"),
                      value_set=pa.array(list(_PRED_OF_KIND)))
    pred = pc.take(pa.array(list(_PRED_OF_KIND.values())), idx)
    t = pa.table({
        "subj": st.column("repo"), "pred": pred, "obj": st.column("name"),
        "repo": st.column("repo"), "path": st.column("path"),
        "commit": st.column("commit"),
        "content_sha256": st.column("content_sha256"),
    })
    t = t.group_by(t.column_names).aggregate([])  # distinct rows
    fill = pa.nulls(t.num_rows, pa.string()).fill_null("")
    for c in ("surface", "norm_key", "label"):
        t = t.append_column(c, fill)
    return t.select(TRIPLE_SCHEMA.names).cast(TRIPLE_SCHEMA)


def file_structure_triples(corpus):
    """corpus → Dataset[``stages.triples.TRIPLE_SCHEMA``] of per-file
    structural facts — the structural edge set the unified KG store
    carries ALONGSIDE the NER mention triples (``pipelines/kg.py``
    ``run_kg(include_structure=True)``). Stateless single pass, never
    shuffles; provenance columns make the rows first-class citizens of
    the incremental-update doc-key semi join (``update_kg``)."""
    return corpus.map_batches(_file_structure_triples_batch,
                              batch_format="pyarrow")


def structure_store_stats(triples, input_bytes: int | None = None):
    """file-distinct structural triple rows → ``(subj, pred, n_facts,
    n_objs)``: per (repo, pred), how many file-distinct facts exist and
    how many distinct objects they mention — the repo-level profile a KG
    store serves ("how import-heavy is this repo, over how many distinct
    modules?"). Two-level reduce (the ``name_popularity`` shape): the
    (subj, pred, obj) distinct-fact partial rides a pre-combined coarse
    shuffle, the rollup is obj-scale."""
    nb = _width(input_bytes)
    keyed = grouped_reduce(
        triples.select_columns(["subj", "pred", "obj"]).map_batches(
            _ones, batch_format="pyarrow"),
        ["subj", "pred", "obj"], {"cnt": "sum"}, num_buckets=nb,
        out_dtypes={"subj": "string", "pred": "string", "obj": "string",
                    "cnt": "int64"},
        pre_combine=True)

    def roll(g):
        return (g.groupby(["subj", "pred"], sort=False)
                 .agg(n_facts=("cnt", "sum"), n_objs=("obj", "count"))
                 .reset_index())

    return coarse_grouped(keyed, ["subj", "pred"], roll, num_buckets=nb,
                          out_dtypes={"subj": "string", "pred": "string",
                                      "n_facts": "int64",
                                      "n_objs": "int64"})


def add_norm_key(ds, col: str = "obj", out_col: str = "norm_key"):
    """Append the canonical-entity norm key of a NAME column: the SAME
    ``tokenize → normalize_surface`` contract the mention pipeline keys
    its canonicalization groupby on (``stages/canonical.py``), so a
    structural name like ``libqa.parse_it`` lands on the identical key as
    NER mentions of the spaced surface ``libqa . parse_it``. Per-batch
    memo over distinct names; the input is name-scale (distinct
    structural facts), never corpus-scale."""
    from ccnerx_ray.functions.tokenize import normalize_surface, tokenize

    def fn(batch: pa.Table) -> pa.Table:
        memo: dict = {}
        out = []
        for v in batch.column(col).to_pylist():
            k = memo.get(v)
            if k is None:
                k = memo[v] = normalize_surface(tokenize(v or ""))
            out.append(k)
        return batch.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def entities_from_catalog(catalog_pairs) -> pa.Table:
    """catalog ``[(surface_tokens, label), ...]`` → the entity node table
    ``(norm_key, entity_id, label)`` with ``entity_id =
    sha256(norm_key)[:16]`` — the same id contract as the mention
    pipeline, so catalog-derived nodes and mention-derived nodes
    coincide. Surfaces colliding on norm_key dedupe deterministically to
    the smallest ``(label, spaced_surface)``. Driver-side build is
    catalog-scale; a 10^8-surface deployment reads its entity table from
    Parquet instead and feeds it to
    :func:`resolve_structure_entities` as a Dataset."""
    from ccnerx_ray.functions.hashing import entity_id
    from ccnerx_ray.functions.tokenize import normalize_surface

    best: dict[str, tuple[str, str]] = {}
    for surf, label in catalog_pairs:
        nk = normalize_surface(surf)
        key = (label, " ".join(surf))
        if nk not in best or key < best[nk]:
            best[nk] = key
    nks = sorted(best)
    return pa.table({
        "norm_key": pa.array(nks, pa.string()),
        "entity_id": pa.array([entity_id(nk) for nk in nks], pa.string()),
        "label": pa.array([best[nk][0] for nk in nks], pa.string()),
    })


def resolve_structure_entities(names, entities,
                               num_buckets: int | None = None,
                               input_bytes: int | None = None):
    """Entity resolution for STRUCTURAL edges: rows carrying an ``obj``
    name column (e.g. the ``structure_triples`` aggregate) are LEFT OUTER
    joined against an entity node table ``(norm_key, entity_id, label)``
    on ``norm_key(obj)`` — unifying the code-structure graph and the NER
    mention graph at the NODE level (a ``calls parse_foo`` edge now
    points at the same ``entity_id`` as every mention of ``parse_foo``).
    One hash-partitioned co-group (``lookup_join_on``): both sides stay
    distributed, nothing broadcasts. Unresolved names keep their rows
    with empty ``entity_id`` / ``label`` (NIL link, the ``LinkScorer``
    convention)."""
    from ccnerx_ray.functions.grouping import lookup_join_on

    def fuse(batch: pa.Table) -> pa.Table:
        # entity_id rides left of the \x1f separator and the split takes
        # the FIRST separator, so the fusion is unambiguous iff
        # entity_id never contains \x1f — true by the sha256-hex id
        # contract; enforced loudly for arbitrary caller tables
        if bool(pc.any(pc.match_substring(
                batch.column("entity_id"), "\x1f")).as_py()):
            raise ValueError("entity_id values must not contain \\x1f")
        val = pc.binary_join_element_wise(
            batch.column("entity_id"), batch.column("label"), "\x1f")
        return pa.table({"norm_key": batch.column("norm_key"),
                         "_ent": val})

    lut = entities.map_batches(fuse, batch_format="pyarrow")
    keyed = add_norm_key(names)
    joined = lookup_join_on(keyed, "norm_key", lut, "_ent",
                            num_buckets=num_buckets
                            or _width(input_bytes))

    def split(batch: pa.Table) -> pa.Table:
        ent = batch.column("_ent").combine_chunks()
        filled = pc.fill_null(ent, "\x1f")
        parts = pc.split_pattern(filled, "\x1f", max_splits=1)
        return batch.drop_columns(["_ent"]) \
                    .append_column("entity_id", pc.list_element(parts, 0)) \
                    .append_column("label", pc.list_element(parts, 1))

    return joined.map_batches(split, batch_format="pyarrow")


def structure_names(structure_triples_ds, input_bytes: int | None = None):
    """(subj, pred, obj, n_lines) structural triples → the corpus-level
    distinct-name table ``(pred, obj, n_lines)`` (line counts summed over
    repos) — the natural resolution unit: each distinct name resolves
    once, not once per repo edge."""
    return grouped_reduce(
        structure_triples_ds.select_columns(["pred", "obj", "n_lines"]),
        ["pred", "obj"], {"n_lines": "sum"},
        num_buckets=_width(input_bytes),
        out_dtypes={"pred": "string", "obj": "string", "n_lines": "int64"},
        pre_combine=True)


def structure_name_counts(structure, input_bytes: int | None = None):
    """structure → ``(pred, obj, n_lines)`` directly: ONE pre-combined
    reduce from the extraction scan (skips the per-repo triple
    intermediate when only corpus-level name counts are needed)."""
    def rows(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column("kind"),
                          value_set=pa.array(list(_PRED_OF_KIND)))
        return pa.table({
            "pred": pc.take(pa.array(list(_PRED_OF_KIND.values())), idx),
            "obj": batch.column("name"),
            "n_lines": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    return grouped_reduce(
        structure.map_batches(rows, batch_format="pyarrow"),
        ["pred", "obj"], {"n_lines": "sum"},
        num_buckets=_width(input_bytes),
        out_dtypes={"pred": "string", "obj": "string", "n_lines": "int64"},
        pre_combine=True)


def symbol_stats(symbols, input_bytes: int | None = None):
    """symbols → (symbol, kind, n_defs, n_repos) per definition surface."""
    nb = _width(input_bytes)
    pairs = grouped_reduce(
        symbols.select_columns(["symbol", "kind", "repo"]).map_batches(
            _ones, batch_format="pyarrow"),
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
