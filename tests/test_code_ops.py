"""Code-analysis operators (ops/code.py): hand-worked fixture + generator
parity against the generation-intent expected tables (corpus.py)."""

import pyarrow as pa
import pytest
import ray.data

from ccnerx_ray.corpus import (expected_code_calls, expected_code_imports,
                               expected_code_repo_deps, expected_code_symbols,
                               expected_structure_triples, generate_corpus)
from ccnerx_ray.ops.code import (call_popularity, corpus_lines,
                                 extract_imports, extract_structure,
                                 extract_symbols, module_popularity,
                                 repo_dep_edges, structure_triples,
                                 symbol_stats)


def _corpus(rows):
    return ray.data.from_arrow(pa.table({
        "repo": [r[0] for r in rows],
        "path": [r[1] for r in rows],
        "lang": ["python"] * len(rows),
        "content": [r[2] for r in rows],
    }))


FIX = _corpus([
    ("A", "a.py", "import m1\nimport m1\ndef m1 ( x ) :\nclass C1 :"),
    ("B", "b.py", "import m1\nimport c2\nx = foo ( bar )\nclass c2 :"),
    ("B", "c.py", "def m1 ( y ) :\nimport zz"),
])


def _sorted_pylist(ds, keys):
    rows = [r for b in ds.to_arrow_refs()
            for r in ray.get(b).to_pylist()]
    return sorted(rows, key=lambda r: tuple(r[k] for k in keys))


def test_corpus_lines_numbering():
    out = _sorted_pylist(corpus_lines(FIX), ["repo", "path", "line_no"])
    assert out[0] == {"repo": "A", "path": "a.py", "lang": "python",
                      "line_no": 0, "line": "import m1"}
    per_file = [r["line_no"] for r in out if r["path"] == "a.py"]
    assert per_file == [0, 1, 2, 3]


def test_extract_and_canonicalize_dotted():
    ds = _corpus([("R", "x.py",
                   "import libqa . parse_it\ndef libqa . parse_it ( v ) :")])
    imp = _sorted_pylist(extract_imports(ds), ["module"])
    assert [r["module"] for r in imp] == ["libqa.parse_it"]
    sym = _sorted_pylist(extract_symbols(ds), ["symbol"])
    assert [(r["symbol"], r["kind"]) for r in sym] == [("libqa.parse_it",
                                                        "def")]


def test_module_popularity_hand_worked():
    out = _sorted_pylist(module_popularity(extract_imports(FIX)), ["module"])
    assert out == [
        {"module": "c2", "n_imports": 1, "n_repos": 1},
        {"module": "m1", "n_imports": 3, "n_repos": 2},
        {"module": "zz", "n_imports": 1, "n_repos": 1},
    ]


def test_symbol_stats_hand_worked():
    out = _sorted_pylist(symbol_stats(extract_symbols(FIX)),
                         ["symbol", "kind"])
    assert out == [
        {"symbol": "C1", "kind": "class", "n_defs": 1, "n_repos": 1},
        {"symbol": "c2", "kind": "class", "n_defs": 1, "n_repos": 1},
        {"symbol": "m1", "kind": "def", "n_defs": 2, "n_repos": 2},
    ]


def test_repo_dep_edges_hand_worked():
    # defining: m1→{A,B}, c2→{B}, C1→{A}; zz undefined → contributes nothing
    out = _sorted_pylist(
        repo_dep_edges(extract_imports(FIX), extract_symbols(FIX)),
        ["src_repo", "dst_repo"])
    assert out == [
        {"src_repo": "A", "dst_repo": "A", "n_links": 2},
        {"src_repo": "A", "dst_repo": "B", "n_links": 2},
        {"src_repo": "B", "dst_repo": "A", "n_links": 1},
        {"src_repo": "B", "dst_repo": "B", "n_links": 2},
    ]


def test_call_extraction_hand_worked():
    ds = _corpus([("R", "x.py",
                   "buf = fetch_da ( KE_LU )\nimport m\nv = v + 3")])
    st = _sorted_pylist(extract_structure(ds), ["kind", "name"])
    assert [(r["kind"], r["name"]) for r in st] == [
        ("call", "fetch_da"), ("callarg", "KE_LU"), ("import", "m")]
    pop = _sorted_pylist(call_popularity(extract_structure(ds)), ["callee"])
    assert pop == [{"callee": "fetch_da", "n_calls": 1, "n_repos": 1}]


def test_structure_triples_hand_worked():
    out = _sorted_pylist(structure_triples(extract_structure(FIX)),
                         ["subj", "pred", "obj"])
    assert {"subj": "A", "pred": "imports", "obj": "m1",
            "n_lines": 2} in out
    assert {"subj": "B", "pred": "calls", "obj": "foo",
            "n_lines": 1} in out
    assert {"subj": "B", "pred": "uses", "obj": "bar",
            "n_lines": 1} in out
    assert {"subj": "A", "pred": "defines_class", "obj": "C1",
            "n_lines": 1} in out


@pytest.mark.parametrize("op,expected_fn,keys", [
    (lambda c: module_popularity(extract_imports(c)),
     expected_code_imports, ["module"]),
    (lambda c: symbol_stats(extract_symbols(c)),
     expected_code_symbols, ["symbol", "kind"]),
    (lambda c: call_popularity(extract_structure(c)),
     expected_code_calls, ["callee"]),
    (lambda c: structure_triples(extract_structure(c)),
     expected_structure_triples, ["subj", "pred", "obj"]),
    (lambda c: repo_dep_edges(extract_imports(c), extract_symbols(c)),
     expected_code_repo_deps, ["src_repo", "dst_repo"]),
])
def test_generator_parity(op, expected_fn, keys):
    """Arrow-kernel parse path ≡ generation-intent path on the synthetic
    corpus (the roundtrip proof the registry oracles rely on)."""
    n = 60
    corpus = ray.data.from_arrow(generate_corpus(n, seed=42))
    got = _sorted_pylist(op(corpus), keys)
    want = sorted(expected_fn(n, seed=42).to_pylist(),
                  key=lambda r: tuple(r[k] for k in keys))
    assert got == want


def test_empty_corpus():
    empty = _corpus([])
    assert module_popularity(extract_imports(empty)).count() == 0
    assert repo_dep_edges(extract_imports(empty),
                          extract_symbols(empty)).count() == 0
