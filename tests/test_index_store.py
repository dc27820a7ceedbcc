"""Inverted-index store (ops/index.py): build→prune→probe exactness,
pruning evidence, shard routing, absent terms, guards."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ccnerx_ray.ops.index import build_index_store, lookup_terms, term_shard

ROWS = [
    (0, "red blue red green"),
    (1, "blue blue yellow"),
    (2, ""),                       # zero-token doc: no postings
    (3, "red"),
]


def _ds(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def _reference(rows, terms):
    out = set()
    for did, txt in rows:
        counts: dict[str, int] = {}
        for w in (txt or "").split():
            counts[w] = counts.get(w, 0) + 1
        for t in terms:
            if t in counts:
                out.add((t, did, counts[t]))
    return out


def test_build_lookup_exact_and_pruned(ray_session, tmp_path):
    store = str(tmp_path / "idx")
    summary = build_index_store(_ds(ROWS), store, num_shards=8)
    assert summary["num_shards"] == 8
    assert summary["total_bytes"] > 0

    terms = ["red", "yellow", "nope"]
    got = {(r["term"], r["doc_id"], r["tf"])
           for r in lookup_terms(store, terms).take_all()}
    assert got == _reference(ROWS, terms)
    assert got == {("red", 0, 2), ("red", 3, 1), ("yellow", 1, 1)}

    probe = json.load(open(os.path.join(store, "_lineage", "probe.json")))
    assert probe["bytes_probed"] <= probe["bytes_total"]
    assert set(probe["probed_shards"]) == {term_shard(t, 8) for t in terms}
    # single-term probe must not read the whole store
    lookup_terms(store, ["red"]).take_all()
    probe = json.load(open(os.path.join(store, "_lineage", "probe.json")))
    assert probe["probed_shards"] == [term_shard("red", 8)]
    assert probe["read_fraction"] < 1.0


def test_shard_routing_is_content_derived(ray_session, tmp_path):
    store = str(tmp_path / "idx")
    build_index_store(_ds(ROWS), store, num_shards=8)
    # every on-disk row of a term sits in the shard term_shard() names
    for d in glob.glob(os.path.join(store, "shard=*")):
        shard = int(os.path.basename(d).split("=", 1)[1])
        for f in glob.glob(os.path.join(d, "*.parquet")):
            for t in pq.read_table(f, columns=["term"])["term"].to_pylist():
                assert term_shard(t, 8) == shard


def test_absent_everywhere_returns_empty(ray_session, tmp_path):
    store = str(tmp_path / "idx")
    build_index_store(_ds(ROWS), store, num_shards=4)
    out = lookup_terms(store, ["zzzz"]).take_all()
    assert out == []


def test_guards(ray_session, tmp_path):
    with pytest.raises(ValueError, match="num_shards"):
        build_index_store(_ds(ROWS), str(tmp_path / "x"), num_shards=0)
    store = str(tmp_path / "idx")
    build_index_store(_ds(ROWS), store, num_shards=4)
    with pytest.raises(ValueError, match="terms"):
        lookup_terms(store, [])
