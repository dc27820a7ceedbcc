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


def test_index_bm25_equals_corpus_bm25(ray_session, tmp_path):
    """The index path must be BIT-identical to the two-scan corpus path
    (same integer formulas, df/N/T from the store instead of scans)."""
    from ccnerx_ray.ops.index import index_bm25
    from ccnerx_ray.ops.retrieval import bm25_topk

    rows = [(i, " ".join(w for w in ["red", "blue", "green", "klaxon"]
                         * ((i % 3) + 1)) + (" rare" if i == 5 else ""))
            for i in range(12)] + [(12, "")]
    queries = [(0, ["red", "rare"]), (1, ["blue", "blue"]),  # dup term
               (2, ["absent_term"])]
    store = str(tmp_path / "idx")
    build_index_store(_ds(rows), store, num_shards=8)
    via_index = sorted(
        (r["query_id"], r["doc_id"], r["score_micro"], r["rank"])
        for r in index_bm25(store, queries, top_k=5).take_all())
    via_corpus = sorted(
        (r["query_id"], r["doc_id"], r["score_micro"], r["rank"])
        for r in bm25_topk(_ds(rows), queries, top_k=5).take_all())
    assert via_index == via_corpus
    assert via_index  # non-degenerate


def test_update_index_store_equals_fresh_rebuild(ray_session, tmp_path):
    from ccnerx_ray.ops.index import index_bm25, update_index_store

    base = ROWS
    delta = [(10, "red delta delta"), (11, "blue")]
    inc = str(tmp_path / "inc")
    s1 = build_index_store(_ds(base), inc, num_shards=8)
    s2 = update_index_store(inc, _ds(delta))
    fresh = str(tmp_path / "fresh")
    s3 = build_index_store(_ds(base + delta), fresh, num_shards=8)
    assert (s2["n_docs"], s2["n_tokens"]) == (s3["n_docs"], s3["n_tokens"])

    terms = ["red", "blue", "delta"]
    a = sorted((r["term"], r["doc_id"], r["tf"])
               for r in lookup_terms(inc, terms).take_all())
    b = sorted((r["term"], r["doc_id"], r["tf"])
               for r in lookup_terms(fresh, terms).take_all())
    assert a == b and ("delta", 10, 2) in a

    qs = [(0, ["red", "delta"])]
    x = sorted(tuple(r.values())
               for r in index_bm25(inc, qs, top_k=10).take_all())
    y = sorted(tuple(r.values())
               for r in index_bm25(fresh, qs, top_k=10).take_all())
    assert x == y
