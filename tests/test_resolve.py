"""Structural entity resolution (ops/code.py: add_norm_key /
entities_from_catalog / resolve_structure_entities): the node-level
unification of the code-structure graph and the NER mention graph."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data

from ccnerx_ray.functions.tokenize import normalize_surface
from ccnerx_ray.ops.code import (add_norm_key, entities_from_catalog,
                                 resolve_structure_entities,
                                 structure_name_counts, structure_names,
                                 structure_triples)


def _rows(ds):
    import ray
    return [r for b in ds.to_arrow_refs() for r in ray.get(b).to_pylist()]


def _eid(nk: str) -> str:
    return hashlib.sha256(nk.encode()).hexdigest()[:16]


def test_add_norm_key(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "obj": ["libqa.parse_it", "BacoKeer", "SUWABA_MI", "plain"]}))
    got = {r["obj"]: r["norm_key"] for r in _rows(add_norm_key(ds))}
    assert got == {"libqa.parse_it": "libqa . parse it",
                   "BacoKeer": "baco keer",
                   "SUWABA_MI": "suwaba mi",
                   "plain": "plain"}


def test_entities_from_catalog_dedup_rule():
    # two surfaces colliding on norm_key: smallest (label, surface) wins
    pairs = [(("parse_it",), "FUNC"), (("parse", "it"), "CONST"),
             (("other",), "LIB")]
    t = entities_from_catalog(pairs)
    rows = {r["norm_key"]: r for r in t.to_pylist()}
    assert rows["parse it"]["label"] == "CONST"   # CONST < FUNC
    assert rows["parse it"]["entity_id"] == _eid("parse it")
    assert rows["other"]["label"] == "LIB"


def test_resolve_structure_entities(ray_session):
    names = ray.data.from_arrow(pa.table({
        "pred": ["calls", "imports", "uses"],
        "obj": ["libqa.parse_it", "libqa", "nosuchname"],
        "n_lines": [3, 2, 1]}))
    ents = ray.data.from_arrow(entities_from_catalog(
        [(("libqa", ".", "parse_it"), "FUNC"), (("libqa",), "LIB")]))
    got = {r["obj"]: r for r in
           _rows(resolve_structure_entities(names, ents, num_buckets=4))}
    assert got["libqa.parse_it"]["entity_id"] == _eid("libqa . parse it")
    assert got["libqa.parse_it"]["label"] == "FUNC"
    assert got["libqa"]["label"] == "LIB"
    # NIL link: row kept, empty entity columns
    assert got["nosuchname"]["entity_id"] == ""
    assert got["nosuchname"]["label"] == ""
    assert got["nosuchname"]["n_lines"] == 1
    # mention-pipeline id contract: same norm key → same node id
    assert got["libqa"]["entity_id"] == _eid(normalize_surface(("libqa",)))


def test_structure_name_counts_equals_names_via_triples(ray_session):
    from ccnerx_ray.corpus import generate_corpus
    from ccnerx_ray.ops.code import extract_structure
    t = generate_corpus(60, seed=42)
    ds = ray.data.from_arrow([t.slice(i * 15, 15) for i in range(4)])
    st = extract_structure(ds).materialize()
    a = sorted((r["pred"], r["obj"], r["n_lines"])
               for r in _rows(structure_name_counts(st)))
    b = sorted((r["pred"], r["obj"], r["n_lines"])
               for r in _rows(structure_names(structure_triples(st))))
    assert a == b and len(a) > 50


def test_resolve_rejects_separator_in_entity_id(ray_session):
    import pytest
    names = ray.data.from_arrow(pa.table({
        "pred": ["calls"], "obj": ["x"], "n_lines": [1]}))
    bad = ray.data.from_arrow(pa.table({
        "norm_key": ["x"], "entity_id": ["a\x1fb"], "label": ["L"]}))
    with pytest.raises(Exception, match="x1f"):
        resolve_structure_entities(names, bad, num_buckets=2).take_all()
