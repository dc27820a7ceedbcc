"""The flagship KG-construction pipeline (SURVEY.md §3.1 RD shape):

``read_parquet(corpus)`` → ``map_batches(segment)`` →
``map_batches(MentionTagger actor pool)`` → ``map_batches(LinkScorer actor
pool)`` → ``map_batches(triple emitter)`` → partitioned triple store; the
canonical entity table is then derived from the (small) store — the only
shuffle in the whole job.

Every stage streams: no ``materialize()``/``take_all()`` on big data, the
wide ``content`` column dies at segmentation, and the catalog is broadcast
once via ``ray.put`` and read per actor — never re-shipped per batch and
never shuffled.
"""

from __future__ import annotations

from ccnerx_ray.config import PipelineConfig
from ccnerx_ray.stages.canonical import entities_from_triples
from ccnerx_ray.stages.link import LinkScorer
from ccnerx_ray.stages.segment import make_segmenter
from ccnerx_ray.stages.tag import MentionTagger, explode_mentions
from ccnerx_ray.stages.triples import make_triple_emitter


def read_corpus(paths, cfg: PipelineConfig = PipelineConfig()):
    """Corpus source. Column pruning happens at the read (all five corpus
    columns are needed here; narrower derived reads must pass
    ``columns=[...]``)."""
    import ray.data

    kwargs = {}
    if cfg.read_parallelism and cfg.read_parallelism > 0:
        kwargs["override_num_blocks"] = cfg.read_parallelism
    return ray.data.read_parquet(paths, file_extensions=["parquet"], **kwargs)


def _broadcast_catalog(catalog_pairs):
    import ray

    return ray.put(list(catalog_pairs))


def pool_resources(num_gpus: float) -> dict:
    """Per-actor resource kwargs for a stateful ``map_batches`` pool
    (VERDICT r4 #3): ``cfg.tagger_num_gpus`` / ``cfg.encoder_num_gpus``
    reserve GPUs per actor — pair with ``backend="torch"``,
    ``device="cuda"`` on the tagger. 0.0 (default) adds nothing, so CPU
    deployments schedule exactly as before; fractional values share one
    device across pool actors."""
    return {"num_gpus": float(num_gpus)} if num_gpus else {}


def segments_dataset(corpus, cfg: PipelineConfig = PipelineConfig()):
    return corpus.map_batches(make_segmenter(cfg), batch_format="pyarrow")


def tagged_dataset(corpus, catalog_pairs, cfg: PipelineConfig = PipelineConfig()):
    """corpus → nested, linked segment-mention rows (streaming)."""
    ref = _broadcast_catalog(catalog_pairs)
    segs = segments_dataset(corpus, cfg)
    # autoscaling pools: a FIXED pool pair can reserve every CPU of a small
    # cluster and starve the upstream read tasks (observed deadlock at 4
    # CPUs); (1, n) lets the executor balance. The production path
    # (triples_dataset(fused=True)) uses plain tasks instead.
    tagged = segs.map_batches(
        MentionTagger,
        fn_constructor_kwargs={"catalog_ref": ref, "cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.featurize_batch_size,
        concurrency=(1, cfg.tagger_concurrency),
        **pool_resources(cfg.tagger_num_gpus),
    )
    linked = tagged.map_batches(
        LinkScorer,
        fn_constructor_kwargs={"catalog_ref": ref},
        batch_format="pyarrow",
        batch_size=cfg.featurize_batch_size,
        concurrency=(1, max(2, cfg.tagger_concurrency // 2)),
    )
    return linked


def triples_dataset(corpus, catalog_pairs, cfg: PipelineConfig = PipelineConfig(),
                    fused: bool = True):
    """corpus → triples Dataset (still streaming, unwritten).

    ``fused=True`` (production): tag + link + emit in ONE actor pool —
    fewer pools to spin up and no nested intermediates in the object
    store. ``fused=False`` runs the three discrete stages (parity path);
    outputs are identical (test-enforced)."""
    if fused:
        from ccnerx_ray.stages.tag import make_fused_tagger_fn

        ref = _broadcast_catalog(catalog_pairs)
        segs = segments_dataset(corpus, cfg)
        return segs.map_batches(
            make_fused_tagger_fn(ref, cfg),
            batch_format="pyarrow",
            batch_size=cfg.featurize_batch_size,
        )
    linked = tagged_dataset(corpus, catalog_pairs, cfg)
    return linked.map_batches(make_triple_emitter(cfg), batch_format="pyarrow")


def mentions_dataset_join(corpus, lexicon_pairs, catalog_ds,
                          cfg: PipelineConfig = PipelineConfig(), *,
                          broadcast_bytes: int | None = None,
                          catalog_bytes_hint: int | None = None,
                          max_label_num: int = 3):
    """corpus → flat linked mention table with the link catalog as a
    DATASET (VERDICT r4 #1 — the at-scale path): tagging uses the
    bounded ``lexicon_pairs`` (the reference's ≤ ``max_scan_num`` trie
    regime) broadcast once; LINKING hash-partition joins the exploded
    mentions against ``catalog_ds`` (``(surface, norm_key, label)``
    rows — e.g. ``read_parquet(catalog_path)``), which never lands on
    the driver when it exceeds ``broadcast_bytes``. Output is
    bit-identical to ``mentions_dataset`` when both see the same
    catalog (test-enforced)."""
    from ccnerx_ray.stages.link import link_exploded_mentions
    from ccnerx_ray.stages.tag import make_fused_tagger_fn

    ref = _broadcast_catalog(lexicon_pairs)
    segs = segments_dataset(corpus, cfg)
    raw = segs.map_batches(
        make_fused_tagger_fn(ref, cfg, emit="mentions_raw"),
        batch_format="pyarrow",
        batch_size=cfg.featurize_batch_size,
    )
    return link_exploded_mentions(
        raw, catalog_ds, max_label_num=max_label_num,
        broadcast_bytes=broadcast_bytes,
        catalog_bytes_hint=catalog_bytes_hint)


def mentions_dataset(corpus, catalog_pairs, cfg: PipelineConfig = PipelineConfig(),
                     fused: bool = True):
    """corpus → flat linked mention table (M5 output, for analysis paths).
    ``fused=True``: one task-based pass (tag+link+explode per worker);
    ``fused=False``: discrete actor-pool stages (parity path)."""
    if fused:
        from ccnerx_ray.stages.tag import make_fused_tagger_fn

        ref = _broadcast_catalog(catalog_pairs)
        segs = segments_dataset(corpus, cfg)
        return segs.map_batches(
            make_fused_tagger_fn(ref, cfg, emit="mentions"),
            batch_format="pyarrow",
            batch_size=cfg.featurize_batch_size,
        )
    linked = tagged_dataset(corpus, catalog_pairs, cfg)
    return linked.map_batches(explode_mentions, batch_format="pyarrow")


def structural_triples_dataset(corpus):
    """corpus → TRIPLE_SCHEMA structural facts (file-distinct import /
    def / class / call / callarg edges, subj = repo — ``ops/code.py``).
    The code-native edge set ``run_kg(include_structure=True)`` unions
    into the SAME partitioned store as the NER mention triples: one
    (subj, pred, obj) graph carrying both what the corpus *mentions* and
    what it *structurally declares*, with identical provenance columns
    so the incremental update's doc-key semi join carries both forward."""
    from ccnerx_ray.ops.code import file_structure_triples

    return file_structure_triples(corpus)


def input_fingerprint(paths) -> dict:
    """Lineage input fingerprint (SURVEY §4): source paths + per-file size
    and mtime digest — enough to detect a changed input on resume without
    re-hashing file contents (the per-row ``content_sha256`` carries the
    strong invariant)."""
    import glob
    import hashlib
    import os as _os

    if isinstance(paths, str):
        if _os.path.isdir(paths):
            files = sorted(glob.glob(_os.path.join(paths, "*.parquet")))
        else:
            files = [paths]
    else:
        files = sorted(paths)
    h = hashlib.sha256()
    for f in files:
        try:
            st = _os.stat(f)
            h.update(f"{f}|{st.st_size}|{int(st.st_mtime)}".encode())
        except OSError:
            h.update(f"{f}|?".encode())
    return {"input_files": len(files),
            "input_fingerprint": h.hexdigest()[:16]}


def run_kg(corpus_paths, catalog_pairs, out_dir: str,
           cfg: PipelineConfig = PipelineConfig(),
           build_entities: bool = True,
           include_structure: bool = False) -> dict:
    """End-to-end: corpus Parquet → partitioned triple store (+ lineage)
    → canonical entity table derived from the store. Returns lineage
    summary + entity count.

    ``include_structure=True`` additionally streams the code-structure
    edges (``structural_triples_dataset``) into the SAME store — the
    corpus Parquet is read a second time for that branch (the
    ``update_kg`` precedent: re-reading beats holding 10^12 files'
    content in the object store as a union input), and both branches
    stream independently under the executor."""
    from ccnerx_ray.io.store import read_triple_store, write_triple_store

    corpus = read_corpus(corpus_paths, cfg)
    triples = triples_dataset(corpus, catalog_pairs, cfg)
    if include_structure:
        triples = triples.union(
            structural_triples_dataset(read_corpus(corpus_paths, cfg)))
    summary = write_triple_store(triples, out_dir, cfg.output_partitions,
                                 lineage_extra=input_fingerprint(corpus_paths))
    if summary["rows"] == 0:
        # empty corpus → empty store; nothing to canonicalize
        summary["entities_path"] = None
        return summary
    if build_entities:
        store = read_triple_store(
            out_dir, columns=["subj", "pred", "norm_key", "surface", "label"])
        ents = entities_from_triples(store)
        ents_path = out_dir.rstrip("/") + "_entities"
        ents.write_parquet(ents_path)
        summary["entities_path"] = ents_path
    return summary


def _doc_key_batch(cols: list[str], sha_col: str | None = None):
    """Append a ``_doc_key`` column: the full document identity
    ``repo␟path␟commit␟content_sha256`` (an exact string key — no digest,
    so the carry-forward semantics cannot collide)."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    def add(batch: _pa.Table) -> _pa.Table:
        parts = [batch.column(c) for c in cols]
        if sha_col is None:
            from ccnerx_ray.functions.hashing import sha256_hex
            sha = _pa.array([sha256_hex(t or "")
                             for t in batch.column("content").to_pylist()],
                            _pa.string())
            batch = batch.append_column("content_sha256", sha)
            parts.append(sha)
        else:
            parts.append(batch.column(sha_col))
        key = parts[0]
        for p in parts[1:]:
            key = _pc.binary_join_element_wise(key, p, "\x1f")
        return batch.append_column("_doc_key", key)

    return add


def update_kg(corpus_paths, catalog_pairs, old_store_dir: str,
              out_dir: str, cfg: PipelineConfig = PipelineConfig(),
              build_entities: bool = True,
              include_structure: bool = False) -> dict:
    """INCREMENTAL KG update (the north rule's resumability taken to its
    10^12-file conclusion: a daily corpus drop must not re-tag the
    world). Documents are identified by the exact key (repo, path,
    commit, content_sha256); against an existing store:

    * triples of documents still present carry forward UNTAGGED — a
      hash-partitioned semi join of the old store against the corpus key
      set (``grouping.semi_join_on``: both sides stay distributed,
      nothing broadcasts);
    * only NEW keys (changed content, new or moved files) run through
      the tagger — a left-anti ``adaptive_join`` of the corpus against
      the old store's distinct keys;
    * triples of removed/changed documents simply fail the semi join.

    The result is bit-equal to a fresh full ``run_kg`` over the new
    corpus (test-enforced at the triple-multiset level) while the tagger
    — the expensive stage — touches only the delta. Lineage records
    ``docs_retagged`` / ``docs_total`` so a run can prove how little it
    did. Assumes corpus rows are unique per (repo, path, commit) — the
    same assumption a full run's per-row provenance makes."""
    from ccnerx_ray.functions.grouping import (drop_duplicate_rows,
                                               semi_join_on)
    from ccnerx_ray.io.store import read_triple_store, write_triple_store
    from ccnerx_ray.ops.join import adaptive_join
    from ccnerx_ray.stages.triples import TRIPLE_SCHEMA

    # the corpus is consumed twice (key set + anti-join probe) but NEVER
    # materialized — re-reading the Parquet beats holding 10^12 files'
    # content in the object store; the count is read metadata
    base_corpus = read_corpus(corpus_paths, cfg)
    docs_total = base_corpus.count()
    corpus = base_corpus.map_batches(
        _doc_key_batch(["repo", "path", "commit"]),
        batch_format="pyarrow")

    old = read_triple_store(old_store_dir).map_batches(
        _doc_key_batch(["repo", "path", "commit"],
                       sha_col="content_sha256"),
        batch_format="pyarrow")

    corpus_keys = corpus.select_columns(["_doc_key"])
    tcols = [f.name for f in TRIPLE_SCHEMA]

    def strip_key(batch):
        import pyarrow as _pa
        return batch.select(tcols).cast(_pa.schema(TRIPLE_SCHEMA))

    kept = semi_join_on(
        old, "_doc_key", corpus_keys, num_buckets=256,
        out_dtypes={c: "string" for c in tcols + ["_doc_key"]},
    ).map_batches(strip_key, batch_format="pyarrow")

    # distinct old doc keys — a digest-scale table (one row per doc, not
    # per triple) for the anti join's build side
    old_keys = drop_duplicate_rows(
        old.select_columns(["_doc_key"]), ["_doc_key"], num_buckets=64)
    fresh_corpus = adaptive_join(corpus, old_keys, on="_doc_key",
                                 join_type="left_anti")
    fresh_corpus = fresh_corpus.drop_columns(["_doc_key",
                                              "content_sha256"])
    docs_retagged = fresh_corpus.count()

    fresh = triples_dataset(fresh_corpus, catalog_pairs, cfg)
    if include_structure:
        # structural edges of unchanged docs carry forward through the
        # same semi join above (they live in the old store with the same
        # doc-key columns); only the delta re-extracts. fresh_corpus is
        # lazy — this second consumer re-runs the anti join rather than
        # materializing the delta (delta content can itself be huge).
        fresh = fresh.union(structural_triples_dataset(fresh_corpus))
    extra = dict(input_fingerprint(corpus_paths),
                 updated_from=old_store_dir,
                 docs_total=docs_total, docs_retagged=docs_retagged)
    summary = write_triple_store(kept.union(fresh), out_dir,
                                 cfg.output_partitions,
                                 lineage_extra=extra)
    if summary["rows"] == 0:
        summary["entities_path"] = None
        return summary
    if build_entities:
        store = read_triple_store(
            out_dir, columns=["subj", "pred", "norm_key", "surface",
                              "label"])
        ents = entities_from_triples(store)
        ents_path = out_dir.rstrip("/") + "_entities"
        ents.write_parquet(ents_path)
        summary["entities_path"] = ents_path
    summary["docs_retagged"] = docs_retagged
    summary["docs_total"] = docs_total
    return summary
