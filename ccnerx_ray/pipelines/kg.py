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


def input_fingerprint(paths) -> dict:
    """Lineage input fingerprint (SURVEY §4): source paths + per-file size
    and mtime digest — enough to detect a changed input on resume without
    re-hashing file contents (the per-row ``content_sha256`` carries the
    strong invariant)."""
    import glob
    import hashlib
    import os as _os

    if isinstance(paths, str):
        files = sorted(glob.glob(_os.path.join(paths, "*.parquet")))             if _os.path.isdir(paths) else [paths]
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
           build_entities: bool = True) -> dict:
    """End-to-end: corpus Parquet → partitioned triple store (+ lineage)
    → canonical entity table derived from the store. Returns lineage
    summary + entity count."""
    from ccnerx_ray.io.store import read_triple_store, write_triple_store

    corpus = read_corpus(corpus_paths, cfg)
    triples = triples_dataset(corpus, catalog_pairs, cfg)
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
