"""End-to-end conformance: Ray pipeline vs single-process oracle (SURVEY.md
§5b golden equivalence), planted-gold recall, canonical entity table,
resumable partitioned store."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ccnerx_ray.config import PipelineConfig
from ccnerx_ray.corpus import build_catalog, generate_corpus, write_corpus
from ccnerx_ray.pipelines.kg import (mentions_dataset, read_corpus, run_kg,
                                     triples_dataset)
from ccnerx_ray.pipelines.oracle import oracle_triples, prf

CFG = PipelineConfig(tagger_concurrency=2, output_partitions=4)
N_ROWS = 40
SEED = 42


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    return write_corpus(str(d), N_ROWS, seed=SEED, num_files=4)


@pytest.fixture(scope="module")
def catalog_pairs():
    return sorted(build_catalog(SEED).surface2label.items())


def test_pipeline_matches_oracle(ray_session, corpus_dir, catalog_pairs):
    """Distinct (s,p,o) from the Ray pipeline must match the sequential
    oracle at P/R ≥ 0.95 (BASELINE.json metric) — held at exactly 1.0."""
    ds = triples_dataset(read_corpus(corpus_dir, CFG), catalog_pairs, CFG)
    got = {(r["subj"], r["pred"], r["obj"]) for r in ds.take_all()}
    table = generate_corpus(N_ROWS, seed=SEED)
    want = oracle_triples(table, catalog_pairs, CFG)
    p, r, f = prf(got, want)
    assert p == 1.0 and r == 1.0, (p, r, len(got), len(want))


def test_planted_gold_recall(ray_session, corpus_dir, catalog_pairs):
    """Every planted catalog surface must be recovered as a mention with its
    catalog label (lexicon fusion + CRF grammar, FIXTURES-style check)."""
    table, gold = generate_corpus(N_ROWS, seed=SEED, with_gold=True)
    ds = mentions_dataset(read_corpus(corpus_dir, CFG), catalog_pairs, CFG)
    rows = ds.take_all()
    found = {(r["surface"], r["linked_label"]) for r in rows}
    gold_set = {(" ".join(surf), lab) for _, surf, lab in gold}
    missing = gold_set - found
    assert len(missing) / max(1, len(gold_set)) < 0.05, sorted(missing)[:5]


def test_run_kg_store_and_entities(ray_session, corpus_dir, catalog_pairs, tmp_path):
    out = str(tmp_path / "store")
    summary = run_kg(corpus_dir, catalog_pairs, out, CFG)
    assert summary["rows"] > 0
    # partitioned layout + per-partition lineage sidecars
    parts = [d for d in os.listdir(out) if d.startswith("part=")]
    assert 0 < len(parts) <= CFG.output_partitions
    for p in parts:
        assert os.path.isfile(os.path.join(out, "_lineage", f"{p}.json"))
    # entity table: one row per norm_key, deterministic ids
    ents = pq.read_table(glob.glob(summary["entities_path"] + "/*.parquet"))
    keys = ents.column("norm_key").to_pylist()
    assert len(keys) == len(set(keys))
    assert ents.num_rows > 0
    import hashlib
    for row in ents.to_pylist()[:10]:
        assert row["entity_id"] == hashlib.sha256(
            row["norm_key"].encode()).hexdigest()[:16]


def test_resumable_chunks(ray_session, corpus_dir, catalog_pairs, tmp_path):
    """A second run over the same input skips every finished chunk."""
    from ccnerx_ray.io.store import run_resumable

    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    out = str(tmp_path / "resume")

    def run_chunk(chunk_files, tmp_dir):
        run_kg(chunk_files, catalog_pairs, tmp_dir, CFG, build_entities=False)

    first = run_resumable(files, out, run_chunk, chunk_size=2)
    assert len(first["chunks_run"]) == 2 and not first["chunks_skipped"]
    second = run_resumable(files, out, run_chunk, chunk_size=2)
    assert not second["chunks_run"] and len(second["chunks_skipped"]) == 2
    # the union of chunk stores equals a single-run store (distinct s,p,o)
    import ray.data
    chunked = ray.data.read_parquet(out, file_extensions=["parquet"])
    got = {(r["subj"], r["pred"], r["obj"]) for r in chunked.take_all()}
    want = oracle_triples(generate_corpus(N_ROWS, seed=SEED), catalog_pairs, CFG)
    assert got == want


def test_canonicalize_hot_key_skew(ray_session):
    """SURVEY §7: a dominant identifier (monorepo hot key) must not break
    or mis-count under the salted two-phase coarse groupby."""
    import ray.data
    from ccnerx_ray.stages.canonical import canonicalize

    hot = [{"norm_key": "self", "linked_label": "CONST", "surface": "self"}
           for _ in range(20_000)]
    cold = [{"norm_key": f"k{i}", "linked_label": "FUNC", "surface": f"k{i}"}
            for i in range(500)]
    ds = ray.data.from_items(hot + cold).repartition(16)
    ents = {r["norm_key"]: r for r in canonicalize(ds).take_all()}
    assert len(ents) == 501
    assert ents["self"]["n_mentions"] == 20_000
    assert ents["self"]["label"] == "CONST"
    assert ents["k7"]["n_mentions"] == 1


def test_corpus_matched_words(ray_session, corpus_dir, catalog_pairs):
    from ccnerx_ray.pipelines.kg import read_corpus, segments_dataset
    from ccnerx_ray.stages.featurize import corpus_matched_words

    segs = segments_dataset(read_corpus(corpus_dir, CFG), CFG)
    words = [r["word"] for r in
             corpus_matched_words(segs, [w for w, _ in catalog_pairs]).take_all()]
    assert words == sorted(words) and len(words) > 10
    lex = {" ".join(w) for w, _ in catalog_pairs}
    assert all(w in lex for w in words)


def test_lookup_subject_partition_pruned(ray_session, corpus_dir, catalog_pairs, tmp_path):
    """Subject point lookup touches exactly one hash partition."""
    from ccnerx_ray.io.store import lookup_subject

    out = str(tmp_path / "store2")
    run_kg(corpus_dir, catalog_pairs, out, CFG, build_entities=False)
    import pyarrow.parquet as pq
    any_file = glob.glob(os.path.join(out, "part=*", "*.parquet"))[0]
    subj = pq.read_table(any_file, columns=["subj"]).column("subj")[0].as_py()
    rows = lookup_subject(out, subj, num_partitions=CFG.output_partitions)
    assert rows and all(r["subj"] == subj for r in rows)
    # a made-up subject returns empty, not an error
    assert lookup_subject(out, "no-such-subject",
                          num_partitions=CFG.output_partitions) == []


def test_compact_store(ray_session, corpus_dir, catalog_pairs, tmp_path):
    """Chunked store → one file per partition; triple set unchanged."""
    from ccnerx_ray.io.store import compact_store, run_resumable

    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    out = str(tmp_path / "chunked")

    def run_chunk(chunk_files, tmp_dir):
        run_kg(chunk_files, catalog_pairs, tmp_dir, CFG, build_entities=False)

    run_resumable(files, out, run_chunk, chunk_size=2)
    compacted = str(tmp_path / "compacted")
    summary = compact_store(out, compacted)
    import ray.data
    a = {(r["subj"], r["pred"], r["obj"]) for r in
         ray.data.read_parquet(out, file_extensions=["parquet"]).take_all()}
    b = {(r["subj"], r["pred"], r["obj"]) for r in
         ray.data.read_parquet(compacted, file_extensions=["parquet"]).take_all()}
    assert a == b
    for d in os.listdir(compacted):
        if d.startswith("part="):
            fs = [f for f in os.listdir(os.path.join(compacted, d))
                  if f.endswith(".parquet")]
            assert len(fs) == 1


def test_alias_pairs_planted(ray_session):
    """Same-label near-identical keys pair up; cross-label never."""
    import ray.data
    from ccnerx_ray.stages.canonical import alias_pairs

    rows = [
        {"entity_id": "e1", "norm_key": "parse foo", "label": "FUNC",
         "repr_surface": "parse_foo", "n_mentions": 5},
        {"entity_id": "e2", "norm_key": "parse foo 2", "label": "FUNC",
         "repr_surface": "parse_foo2", "n_mentions": 3},
        {"entity_id": "e3", "norm_key": "parse foo", "label": "CLASS",
         "repr_surface": "ParseFoo", "n_mentions": 1},
        {"entity_id": "e4", "norm_key": "zzz unrelated", "label": "FUNC",
         "repr_surface": "zzz", "n_mentions": 1},
    ]
    pairs = alias_pairs(ray.data.from_items(rows), threshold=0.5).take_all()
    assert {(p["canonical_id"], p["alias_id"]) for p in pairs} == {("e1", "e2")}


def test_lookup_subject_infers_partitions_from_lineage(ray_session, tmp_path):
    """Empty partitions must not shift the lookup modulus: P comes from
    the lineage summary, not from counting part= dirs (ADVICE r1 —
    write_parquet creates dirs only for non-empty partitions)."""
    import ray.data
    from ccnerx_ray.io.store import lookup_subject, write_triple_store

    triples = ray.data.from_items([
        {"subj": "s1", "pred": "p", "obj": "o1"},
        {"subj": "s2", "pred": "p", "obj": "o2"},
    ])
    out = str(tmp_path / "sparse_store")
    write_triple_store(triples, out, num_partitions=16)
    n_dirs = sum(1 for d in os.listdir(out) if d.startswith("part="))
    assert n_dirs < 16                     # some partitions empty on disk
    rows = lookup_subject(out, "s1")       # P inferred from lineage
    assert rows and rows[0]["obj"] == "o1"
    assert lookup_subject(out, "s2")[0]["obj"] == "o2"
    assert lookup_subject(out, "absent") == []


def test_compact_store_multi_row_group(ray_session, tmp_path):
    """Compaction streams row groups (never whole-partition concat): a
    store whose files hold several small row groups compacts losslessly."""
    import pyarrow.parquet as pq
    from ccnerx_ray.io.store import compact_store, write_lineage

    src = str(tmp_path / "rg_store")
    pdir = os.path.join(src, "part=0")
    os.makedirs(pdir)
    for f in range(3):
        t = pa.table({"subj": [f"s{f}-{i}" for i in range(100)],
                      "pred": ["p"] * 100,
                      "obj": [f"o{i}" for i in range(100)]})
        pq.write_table(t, os.path.join(pdir, f"f{f}.parquet"),
                       row_group_size=17)   # 6 row groups per file
    write_lineage(src, 0.0, {"num_partitions": 1})
    dest = str(tmp_path / "rg_compacted")
    summary = compact_store(src, dest)
    assert summary["rows_check"] == 300
    got = pq.read_table(os.path.join(dest, "part=0", "compacted-0.parquet"))
    assert got.num_rows == 300
    assert len({s.as_py() for s in got.column("subj")}) == 300


def test_alias_pairs_cross_first_char(ray_session):
    """The min-3-gram bucket family catches aliases whose first chars
    differ (round-2 recall improvement; the prefix family alone misses
    this pair)."""
    import ray.data
    from ccnerx_ray.stages.canonical import alias_pairs

    rows = [
        {"entity_id": "e1", "norm_key": "parse foo", "label": "FUNC",
         "repr_surface": "parse_foo", "n_mentions": 5},
        {"entity_id": "e2", "norm_key": "xparse foo", "label": "FUNC",
         "repr_surface": "xparse_foo", "n_mentions": 2},
    ]
    pairs = alias_pairs(ray.data.from_items(rows), threshold=0.5).take_all()
    assert {(p["canonical_id"], p["alias_id"]) for p in pairs} == {("e1", "e2")}
    assert all(p["jaccard_pm"] == 857142 for p in pairs)  # 6/7 exactly


def test_compacted_store_lookup_inherits_partitions(ray_session, tmp_path):
    """compact_store must carry num_partitions into the compacted
    lineage: counting non-empty part= dirs there would shift the lookup
    modulus exactly like the pre-round-2 bug (code-review finding)."""
    import ray.data
    from ccnerx_ray.io.store import (compact_store, lookup_subject,
                                     write_triple_store)

    triples = ray.data.from_items([
        {"subj": "s1", "pred": "p", "obj": "o1"},
        {"subj": "s2", "pred": "p", "obj": "o2"},
    ])
    src = str(tmp_path / "sparse16")
    write_triple_store(triples, src, num_partitions=16)
    dest = str(tmp_path / "sparse16_c")
    summary = compact_store(src, dest)
    assert summary["num_partitions"] == 16
    assert lookup_subject(dest, "s1")[0]["obj"] == "o1"
    assert lookup_subject(dest, "s2")[0]["obj"] == "o2"


def test_alias_pairs_semantic_catches_synonyms(ray_session):
    """The pluggable embedding-cosine scorer (A4 gap, VERDICT r2 #9)
    finds SYNONYM aliases the char-3-gram path cannot: 'begin'/'start'
    share no 3-grams (Jaccard = 0) but near-identical embedding vectors;
    unrelated same-label entities stay unpaired."""
    import numpy as np
    import ray.data
    from ccnerx_ray.stages.canonical import alias_pairs
    from ccnerx_ray.state.embedding import WordEmbedding

    rng = np.random.default_rng(3)
    v = rng.standard_normal(16)
    w = rng.standard_normal(16)           # far from v (random direction)
    emb = WordEmbedding({
        "begin": v,
        "start": v + 0.01 * rng.standard_normal(16),   # synonym: ~v
        "halt": w,
    }, 16)
    rows = [
        {"entity_id": "e1", "norm_key": "begin", "label": "FUNC",
         "repr_surface": "begin", "n_mentions": 5},
        {"entity_id": "e2", "norm_key": "start", "label": "FUNC",
         "repr_surface": "start", "n_mentions": 3},
        {"entity_id": "e3", "norm_key": "halt", "label": "FUNC",
         "repr_surface": "halt", "n_mentions": 1},
        {"entity_id": "e4", "norm_key": "start", "label": "CLASS",
         "repr_surface": "Start", "n_mentions": 1},
    ]
    ents = ray.data.from_items(rows)
    # n-gram scorer misses the synonym pair entirely
    ngram = alias_pairs(ents, threshold=0.3).take_all()
    assert not any({p["canonical_id"], p["alias_id"]} == {"e1", "e2"}
                   for p in ngram)
    # semantic scorer finds it — and nothing else (cross-label excluded
    # by bucketing, 'halt' excluded by cosine)
    sem = alias_pairs(ents, threshold=0.9, scorer="semantic",
                      embedding=emb).take_all()
    assert {(p["canonical_id"], p["alias_id"]) for p in sem} == {("e1", "e2")}
    assert all(p["cos_pm"] >= 900_000 for p in sem)


def test_alias_pairs_semantic_off_encoder_vectors(ray_session):
    """A5 closure (VERDICT r3 #5): the semantic alias scorer runs with
    NO fixture embedding table — entity vectors come from the encoder's
    hash-token family (stages/encode.HashWordEmbedding, the same vector
    family doc_embeddings produces). Mean-of-token vectors are word-order
    invariant, so bag-equal norm_keys alias at cosine 1.0 while
    different-token keys stay apart (hash vectors are near-orthogonal)."""
    import ray.data
    from ccnerx_ray.stages.canonical import alias_pairs
    from ccnerx_ray.stages.encode import HashWordEmbedding

    rows = [
        {"entity_id": "e1", "norm_key": "tree parse", "label": "FUNC",
         "repr_surface": "TreeParse", "n_mentions": 5},
        {"entity_id": "e2", "norm_key": "parse tree", "label": "FUNC",
         "repr_surface": "parse_tree", "n_mentions": 3},
        {"entity_id": "e3", "norm_key": "halt now", "label": "FUNC",
         "repr_surface": "halt_now", "n_mentions": 1},
    ]
    sem = alias_pairs(ray.data.from_items(rows), threshold=0.95,
                      scorer="semantic",
                      embedding=HashWordEmbedding(32)).take_all()
    assert {(p["canonical_id"], p["alias_id"]) for p in sem} == {("e1", "e2")}


def test_embedding_dedup_off_derived_embeddings(ray_session):
    """embedding_dup_pairs fed by doc_embeddings output (not fixture
    vectors): two documents sharing most tokens embed near-identically
    (mean of mostly-equal token vectors) and pair up; an unrelated doc
    stays out."""
    import ray.data
    from ccnerx_ray.ops.dedup import embedding_dup_pairs
    from ccnerx_ray.stages.encode import doc_embeddings

    base = " ".join(f"tok{i}" for i in range(60))
    docs = ray.data.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " extra"},
        {"doc_id": 3, "text": " ".join(f"other{i}" for i in range(60))},
    ])
    vecs = doc_embeddings(docs, dim=32, concurrency=2)
    pairs = embedding_dup_pairs(vecs.select_columns(["doc_id", "embedding"])
                                .rename_columns(["vec_id", "embedding"]),
                                threshold=0.95, id_col="vec_id")
    got = {(p["id_a"], p["id_b"]) for p in pairs.take_all()}
    assert got == {(1, 2)}


def test_update_kg_incremental_equals_full_run(ray_session, corpus_dir,
                                               catalog_pairs, tmp_path):
    """Incremental delta update (north rule: a daily corpus drop must
    not re-tag the world): v2 = v1 with some docs changed, some removed,
    some added. ``update_kg`` against the v1 store must (a) produce the
    SAME triple multiset as a fresh full run over v2 and (b) run the
    tagger over ONLY the delta (lineage proves it)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from ccnerx_ray.pipelines.kg import update_kg

    store1 = str(tmp_path / "store1")
    run_kg(corpus_dir, catalog_pairs, store1, CFG, build_entities=False)

    # build v2: drop 5 docs, modify 7 (append a token), add 4 new
    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    rows = []
    for f in files:
        rows.extend(pq2.read_table(f).to_pylist())
    rows = rows[5:]                       # 5 removed
    for r in rows[:7]:                    # 7 changed in place
        r["content"] = r["content"] + "\nchanged_token = 1"
    for j in range(4):                    # 4 added
        rows.append({"repo": "new/repo", "path": f"added_{j}.py",
                     "commit": "f" * 40, "lang": "python",
                     "content": f"import parse_cfg\nadded_{j} = MAX_N"})
    v2 = str(tmp_path / "v2")
    os.makedirs(v2)
    t = pa.Table.from_pylist(rows)
    pq2.write_table(t.slice(0, t.num_rows // 2), os.path.join(v2, "a.parquet"))
    pq2.write_table(t.slice(t.num_rows // 2), os.path.join(v2, "b.parquet"))

    upd = str(tmp_path / "store_upd")
    full = str(tmp_path / "store_full")
    s_upd = update_kg(v2, catalog_pairs, store1, upd, CFG,
                      build_entities=False)
    run_kg(v2, catalog_pairs, full, CFG, build_entities=False)

    assert s_upd["docs_total"] == len(rows)
    assert s_upd["docs_retagged"] == 7 + 4    # changed + added only

    def triple_frame(store):
        from ccnerx_ray.io.store import read_triple_store
        df = read_triple_store(store).to_pandas()
        cols = sorted(c for c in df.columns if c != "part")
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(triple_frame(upd), triple_frame(full))
