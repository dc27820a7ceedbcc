"""Deterministic synthetic source-code corpus generator.

Produces the graft input table ``(repo, path, commit, lang, content)``
(BASELINE.json ``input_hint``; FIXTURES.md F1) with entity surfaces planted
from a generated catalog, so expected mentions are known. Everything is a
pure function of ``seed`` and the row index — generation is order-free and
parallelizable, and any subset of rows regenerates identically.

Skew is deliberate: ~50% of rows live in one monorepo (FIXTURES.md F1) to
exercise the salted canonicalization groupby.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pyarrow as pa

from ccnerx_ray.state.catalog import EntityCatalog

_SYL = ["ba", "co", "da", "fe", "gi", "ho", "ja", "ke", "lu", "mi",
        "no", "pa", "qu", "ra", "su", "ti", "vo", "wa", "xe", "zo"]
_VERBS = ["parse", "read", "write", "load", "dump", "merge", "split",
          "fetch", "build", "scan", "emit", "pack", "clone", "hash"]
_LANGS = [("python", ".py"), ("java", ".java"), ("go", ".go"),
          ("js", ".js"), ("rust", ".rs")]
_FILLER_VARS = ["x", "y", "val", "tmp", "out", "buf", "idx", "acc", "cur", "res"]


def _rng(seed: int, *parts) -> np.random.Generator:
    h = hashlib.blake2b(("|".join(str(p) for p in parts)).encode(),
                        digest_size=8, key=seed.to_bytes(8, "little")).digest()
    return np.random.default_rng(int.from_bytes(h, "little"))


def _name(rng: np.random.Generator, n_syl: int) -> str:
    return "".join(_SYL[i] for i in rng.integers(0, len(_SYL), n_syl))


def build_catalog(seed: int = 42, n_per_label: int = 80) -> EntityCatalog:
    """Entity catalog (F3 ``entity_catalog.jsonl`` analogue): generated
    surfaces with label-characteristic shapes; ~15% are 3-token dotted
    qualified names to exercise multi-token BIOES spans."""
    cat = EntityCatalog()
    rng = _rng(seed, "catalog")
    for k in range(n_per_label):
        base = _name(rng, 2 + int(rng.integers(0, 2)))
        func = f"{_VERBS[int(rng.integers(0, len(_VERBS)))]}_{base}"
        cls = base.capitalize() + _name(rng, 1).capitalize() + "er"
        lib = "lib" + base
        const = (base + "_" + _name(rng, 1)).upper()
        cat.add((func,), "FUNC")
        cat.add((cls,), "CLASS")
        cat.add((lib,), "LIB")
        cat.add((const,), "CONST")
        if k % 7 == 0:  # dotted multi-token surfaces
            cat.add((lib, ".", func), "FUNC")
            cat.add((cls, ".", base.capitalize()), "CLASS")
    return cat


def _commit(seed: int, repo: str, path: str) -> str:
    return hashlib.sha256(f"{seed}|{repo}|{path}".encode()).hexdigest()[:40]


def dotted_surface(surf: tuple[str, ...]) -> str:
    """Canonical dotted form of a catalog surface: the rendered content
    joins tokens with single spaces (``lib . func``), the canonical form
    removes the space padding (``lib.func``). Single-token surfaces are
    unchanged. This is the module/symbol key the code-analysis operators
    normalize to (``ops/code.py``)."""
    return "".join(surf)


def _gen_row(seed: int, i: int, surfaces: list[tuple[tuple[str, ...], str]],
             n_rows: int) -> tuple[dict, list[tuple[tuple[str, ...], str]],
                                   list[tuple[str, str]]]:
    """Returns (row, planted mention gold, line events). Line events record
    GENERATION INTENT — ``(kind, dotted_surface)`` per structural line
    (kind ∈ import/def/class/call ×2 operands) — so code-analysis oracles
    can be derived without re-parsing content. Recording consumes no extra
    rng draws: existing corpora regenerate bit-identical."""
    rng = _rng(seed, "row", i)
    # skew: half the corpus in one monorepo (FIXTURES.md F1)
    if rng.random() < 0.5:
        repo = "bigcorp/monorepo"
    else:
        repo = f"org{int(rng.integers(0, 8))}/repo{int(rng.integers(0, 4))}"
    lang, ext = _LANGS[int(rng.integers(0, len(_LANGS)))]
    path = "/".join(_name(rng, 1) for _ in range(1 + int(rng.integers(0, 3)))) \
        + f"/{_name(rng, 2)}{ext}"

    # size distribution: mostly small, occasional big files
    r = rng.random()
    n_lines = int(rng.integers(3, 30)) if r < 0.9 else (
        int(rng.integers(100, 400)) if r < 0.99 else int(rng.integers(2000, 4000)))

    lines: list[str] = []
    planted: list[tuple[tuple[str, ...], str]] = []
    events: list[tuple[str, str]] = []

    def pick() -> tuple[str, tuple[str, ...], str]:
        surf, lab = surfaces[int(rng.integers(0, len(surfaces)))]
        planted.append((surf, lab))
        return " ".join(surf), surf, lab

    for _ in range(n_lines):
        t = rng.random()
        if t < 0.25:
            s, surf, _l = pick()
            events.append(("import", dotted_surface(surf)))
            lines.append(f"import {s}")
        elif t < 0.45:
            s, surf, _l = pick()
            events.append(("def", dotted_surface(surf)))
            v = _FILLER_VARS[int(rng.integers(0, len(_FILLER_VARS)))]
            lines.append(f"def {s} ( {v} ) :")
        elif t < 0.60:
            s1, surf1, _l1 = pick()
            s2, surf2, _l2 = pick()
            events.append(("call", dotted_surface(surf1)))
            events.append(("callarg", dotted_surface(surf2)))
            lines.append(f"{_FILLER_VARS[int(rng.integers(0, 10))]} = {s1} ( {s2} )")
        elif t < 0.70:
            s, surf, _l = pick()
            events.append(("class", dotted_surface(surf)))
            lines.append(f"class {s} :")
        else:
            v = _FILLER_VARS[int(rng.integers(0, len(_FILLER_VARS)))]
            lines.append(f"{v} = {v} + {int(rng.integers(0, 100))}")

    content = "\n".join(lines)
    return ({"repo": repo, "path": path, "commit": _commit(seed, repo, path),
             "lang": lang, "content": content}, planted, events)


CORPUS_SCHEMA = pa.schema([("repo", pa.string()), ("path", pa.string()),
                           ("commit", pa.string()), ("lang", pa.string()),
                           ("content", pa.string())])


def generate_corpus(n_rows: int, seed: int = 42,
                    with_gold: bool = False):
    """Generate the corpus table; optionally also the per-row planted-gold
    mention multiset ``[(row_idx, surface, label), ...]``."""
    cat = build_catalog(seed)
    surfaces = sorted(cat.surface2label.items())
    rows, gold = [], []
    for i in range(n_rows):
        row, planted, _events = _gen_row(seed, i, surfaces, n_rows)
        rows.append(row)
        if with_gold:
            for surf, lab in planted:
                gold.append((i, surf, lab))
    table = pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)
    if with_gold:
        return table, gold
    return table


@functools.lru_cache(maxsize=8)
def _lines_gold(n_rows: int, seed: int):
    """Memoized line-event gold — the three ``expected_code_*`` oracles
    and both sf legs share one generation per (n, seed)."""
    _t, gold = generate_corpus_with_lines(n_rows, seed)
    return tuple(gold)


def generate_corpus_with_lines(n_rows: int, seed: int = 42):
    """Corpus table + per-row LINE-EVENT gold
    ``[(row_idx, repo, kind, dotted_surface), ...]`` recording generation
    intent for each structural line (kind ∈ import/def/class/call/callarg).
    The code-analysis oracles (``expected_code_*``) derive expected outputs
    from these events — an independent path from the Arrow string-kernel
    parse the operators perform — so a Ray-vs-oracle match proves the
    render→parse roundtrip, the media-fixture recipe."""
    cat = build_catalog(seed)
    surfaces = sorted(cat.surface2label.items())
    rows, line_gold = [], []
    for i in range(n_rows):
        row, _planted, events = _gen_row(seed, i, surfaces, n_rows)
        rows.append(row)
        for kind, dotted in events:
            line_gold.append((i, row["repo"], kind, dotted))
    return pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA), line_gold


def expected_code_imports(n_rows: int, seed: int = 42) -> pa.Table:
    """Generation-intent expected table for ``module_popularity``:
    (module, n_imports, n_repos) — import-line counts and distinct
    importing-repo counts per canonical module name."""
    gold = _lines_gold(n_rows, seed)
    n_imp: dict[str, int] = {}
    repos: dict[str, set] = {}
    for _i, repo, kind, dotted in gold:
        if kind == "import":
            n_imp[dotted] = n_imp.get(dotted, 0) + 1
            repos.setdefault(dotted, set()).add(repo)
    mods = sorted(n_imp)
    return pa.table({
        "module": pa.array(mods, pa.string()),
        "n_imports": pa.array([n_imp[m] for m in mods], pa.int64()),
        "n_repos": pa.array([len(repos[m]) for m in mods], pa.int64()),
    })


def expected_code_symbols(n_rows: int, seed: int = 42) -> pa.Table:
    """Generation-intent expected table for ``symbol_stats``:
    (symbol, kind, n_defs, n_repos) over def/class definition lines."""
    gold = _lines_gold(n_rows, seed)
    n_def: dict[tuple[str, str], int] = {}
    repos: dict[tuple[str, str], set] = {}
    for _i, repo, kind, dotted in gold:
        if kind in ("def", "class"):
            k = (dotted, kind)
            n_def[k] = n_def.get(k, 0) + 1
            repos.setdefault(k, set()).add(repo)
    keys = sorted(n_def)
    return pa.table({
        "symbol": pa.array([s for s, _k in keys], pa.string()),
        "kind": pa.array([k for _s, k in keys], pa.string()),
        "n_defs": pa.array([n_def[k] for k in keys], pa.int64()),
        "n_repos": pa.array([len(repos[k]) for k in keys], pa.int64()),
    })


def expected_code_calls(n_rows: int, seed: int = 42) -> pa.Table:
    """Generation-intent expected table for ``call_popularity``:
    (callee, n_calls, n_repos) over call lines."""
    gold = _lines_gold(n_rows, seed)
    n_call: dict[str, int] = {}
    repos: dict[str, set] = {}
    for _i, repo, kind, dotted in gold:
        if kind == "call":
            n_call[dotted] = n_call.get(dotted, 0) + 1
            repos.setdefault(dotted, set()).add(repo)
    keys = sorted(n_call)
    return pa.table({
        "callee": pa.array(keys, pa.string()),
        "n_calls": pa.array([n_call[k] for k in keys], pa.int64()),
        "n_repos": pa.array([len(repos[k]) for k in keys], pa.int64()),
    })


_PRED_OF_KIND = {"import": "imports", "def": "defines_def",
                 "class": "defines_class", "call": "calls",
                 "callarg": "uses"}


def expected_structure_triples(n_rows: int, seed: int = 42) -> pa.Table:
    """Generation-intent expected table for ``structure_triples``:
    (subj, pred, obj, n_lines)."""
    gold = _lines_gold(n_rows, seed)
    cnt: dict[tuple[str, str, str], int] = {}
    for _i, repo, kind, dotted in gold:
        k = (repo, _PRED_OF_KIND[kind], dotted)
        cnt[k] = cnt.get(k, 0) + 1
    keys = sorted(cnt)
    return pa.table({
        "subj": pa.array([a for a, _p, _o in keys], pa.string()),
        "pred": pa.array([p for _a, p, _o in keys], pa.string()),
        "obj": pa.array([o for _a, _p, o in keys], pa.string()),
        "n_lines": pa.array([cnt[k] for k in keys], pa.int64()),
    })


def expected_structure_store(n_rows: int, seed: int = 42) -> pa.Table:
    """Generation-intent expected table for ``structure_store_stats`` over
    ``file_structure_triples``: (subj, pred, n_facts, n_objs) where facts
    are DISTINCT per file — distinct (row_idx, kind, dotted) events —
    matching the store's once-per-distinct-fact-per-file emission rule."""
    gold = _lines_gold(n_rows, seed)
    facts = {(i, repo, _PRED_OF_KIND[kind], dotted)
             for i, repo, kind, dotted in gold}
    n_facts: dict[tuple[str, str], int] = {}
    objs: dict[tuple[str, str], set] = {}
    for _i, repo, pred, dotted in facts:
        k = (repo, pred)
        n_facts[k] = n_facts.get(k, 0) + 1
        objs.setdefault(k, set()).add(dotted)
    keys = sorted(n_facts)
    return pa.table({
        "subj": pa.array([s for s, _p in keys], pa.string()),
        "pred": pa.array([p for _s, p in keys], pa.string()),
        "n_facts": pa.array([n_facts[k] for k in keys], pa.int64()),
        "n_objs": pa.array([len(objs[k]) for k in keys], pa.int64()),
    })


def expected_code_repo_deps(n_rows: int, seed: int = 42) -> pa.Table:
    """Generation-intent expected table for ``repo_dep_edges``:
    (src_repo, dst_repo, n_links). Every import LINE of module m in repo r
    contributes one link to EACH DISTINCT repo defining m (def or class
    line); modules nobody defines contribute nothing. Self-links are kept
    (a repo importing its own symbol is a real edge)."""
    gold = _lines_gold(n_rows, seed)
    defining: dict[str, set] = {}
    for _i, repo, kind, dotted in gold:
        if kind in ("def", "class"):
            defining.setdefault(dotted, set()).add(repo)
    links: dict[tuple[str, str], int] = {}
    for _i, repo, kind, dotted in gold:
        if kind == "import":
            for dst in defining.get(dotted, ()):
                links[(repo, dst)] = links.get((repo, dst), 0) + 1
    keys = sorted(links)
    return pa.table({
        "src_repo": pa.array([a for a, _b in keys], pa.string()),
        "dst_repo": pa.array([b for _a, b in keys], pa.string()),
        "n_links": pa.array([links[k] for k in keys], pa.int64()),
    })


def expected_structure_names(n_rows: int, seed: int = 42) -> pa.Table:
    """Generation-intent expected table for ``structure_names``:
    (pred, obj, n_lines) — corpus-level line counts per distinct
    structural name. Feeds the ``kg_resolve`` oracle, where the
    entity-resolution join itself runs in SQL."""
    gold = _lines_gold(n_rows, seed)
    cnt: dict[tuple[str, str], int] = {}
    for _i, _repo, kind, dotted in gold:
        k = (_PRED_OF_KIND[kind], dotted)
        cnt[k] = cnt.get(k, 0) + 1
    keys = sorted(cnt)
    return pa.table({
        "pred": pa.array([p for p, _o in keys], pa.string()),
        "obj": pa.array([o for _p, o in keys], pa.string()),
        "n_lines": pa.array([cnt[k] for k in keys], pa.int64()),
    })


def expected_bpe_merges(n_rows: int, seed: int = 42,
                        num_merges: int = 40) -> pa.Table:
    """Independent reference BPE for the ``bpe_merges`` oracle: textbook
    Sennrich merge learning over the generated corpus, written against
    the shared contract (whitespace words, char symbols + ``</w>``,
    highest-count pair wins with lexicographic tie-break, greedy-left
    in-word merge, stop when best count < 2) with none of the operator's
    code — Counter-based, recomputing pair counts from scratch each
    round."""
    from collections import Counter

    table = generate_corpus(n_rows, seed)
    words = Counter()
    for content in table.column("content").to_pylist():
        words.update(content.split())
    freq = Counter()
    for w, c in words.items():
        freq[tuple(w) + ("</w>",)] += c
    out = []
    for rank in range(num_merges):
        pairs = Counter()
        for syms, c in freq.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        out.append((rank, left, right, cnt))
        nxt = Counter()
        for syms, c in freq.items():
            merged, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            nxt[tuple(merged)] += c
        freq = nxt
    return pa.table({
        "merge_rank": pa.array([r for r, _l, _r, _c in out], pa.int64()),
        "left_sym": pa.array([l for _r, l, _rr, _c in out], pa.string()),
        "right_sym": pa.array([r for _rk, _l, r, _c in out], pa.string()),
        "pair_count": pa.array([c for _r, _l, _rr, c in out], pa.int64()),
    })


def expected_bpe_vocab(n_rows: int, seed: int = 42,
                       num_merges: int = 40) -> pa.Table:
    """Independent reference for the ``bpe_vocab`` oracle: sorted distinct
    word characters + ``</w>``, then the reference merges' fused strings
    in rank order, duplicates keeping the smallest id."""
    table = generate_corpus(n_rows, seed)
    alphabet: set[str] = set()
    for content in table.column("content").to_pylist():
        for w in content.split():
            alphabet.update(w)
    merges = expected_bpe_merges(n_rows, seed, num_merges)
    toks = [(t, "base") for t in sorted(alphabet)] + [("</w>", "base")]
    toks += [(l + r, "merged")
             for l, r in zip(merges.column("left_sym").to_pylist(),
                             merges.column("right_sym").to_pylist())]
    seen: set = set()
    rows = [(t, k) for t, k in toks
            if not (t in seen or seen.add(t))]
    return pa.table({
        "token_id": pa.array(range(len(rows)), pa.int64()),
        "token": pa.array([t for t, _k in rows], pa.string()),
        "kind": pa.array([k for _t, k in rows], pa.string()),
    })


def expected_bpe_token_stats(n_rows: int, seed: int = 42,
                             num_merges: int = 40) -> pa.Table:
    """Independent reference for the ``bpe_token_stats`` oracle: encode
    every document with the reference merge table (each rule applied
    once in rank order, greedy left-to-right — the shared contract) and
    aggregate (lang, n_docs, n_tokens)."""
    merges = expected_bpe_merges(n_rows, seed, num_merges)
    rules = list(zip(merges.column("left_sym").to_pylist(),
                     merges.column("right_sym").to_pylist()))
    cache: dict[str, int] = {}

    def n_word_tokens(w: str) -> int:
        got = cache.get(w)
        if got is None:
            syms = list(w) + ["</w>"]
            for left, right in rules:
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == left
                            and syms[i + 1] == right):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            got = cache[w] = len(syms)
        return got

    table = generate_corpus(n_rows, seed)
    stats: dict[str, list[int]] = {}
    for lang, content in zip(table.column("lang").to_pylist(),
                             table.column("content").to_pylist()):
        s = stats.setdefault(lang, [0, 0])
        s[0] += 1
        s[1] += sum(n_word_tokens(w) for w in content.split())
    langs = sorted(stats)
    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_docs": pa.array([stats[g][0] for g in langs], pa.int64()),
        "n_tokens": pa.array([stats[g][1] for g in langs], pa.int64()),
    })


def write_corpus(path_dir: str, n_rows: int, seed: int = 42,
                 num_files: int = 8) -> str:
    """Write the corpus as a directory of Parquet shards (the multi-file
    layout a real 10^12-file corpus would have), cached: if the directory
    already holds ``num_files`` parquet files it is reused."""
    import os
    import pyarrow.parquet as pq

    os.makedirs(path_dir, exist_ok=True)
    existing = [f for f in os.listdir(path_dir) if f.endswith(".parquet")]
    if len(existing) == num_files:
        return path_dir
    table = generate_corpus(n_rows, seed)
    per = (n_rows + num_files - 1) // num_files
    for k in range(num_files):
        shard = table.slice(k * per, per)
        pq.write_table(shard, os.path.join(path_dir, f"part-{k:05d}.parquet"))
    return path_dir


def synthetic_lexicon(n: int = 1_500_000, seed: int = 2021,
                      bigram_every: int = 10) -> list[tuple[str, ...]]:
    """Deterministic synthetic lexicon at the reference's ``max_scan_num``
    scale (1-1.5M entries — ``Readme.md:59``, ``le_loader.py:25``): mostly
    unigram identifiers plus a bigram every ``bigram_every`` entries (the
    trie's depth-2 regime). Names share syllable prefixes the way real
    identifier vocabularies do, so trie fan-out is realistic rather than
    degenerate. Pure arithmetic per entry — generating 1.5M words takes
    ~1s and never holds more than the output list."""
    syl = ["qa", "ver", "lox", "tem", "rud", "pin", "sol", "gram",
           "dex", "mur", "tal", "riv", "onk", "bel", "zar", "hul"]
    out: list[tuple[str, ...]] = []
    for i in range(n):
        a = syl[(i * 7) % 16] + syl[(i * 13 + 3) % 16] + format(i, "x")
        if i % bigram_every == 0:
            b = syl[(i * 11 + 5) % 16] + format(i % 719, "x")
            out.append((a, b))
        else:
            out.append((a,))
    return out
