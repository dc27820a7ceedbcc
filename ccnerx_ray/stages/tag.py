"""Mention-tagging actor stage: segments → per-segment nested mention rows.

The hot stateful stage of the KG pipeline. One actor holds the trie, the
entity catalog and the tagger weights (built once in ``__init__`` — the
actor-pool analogue of the reference predictor object, ``predicter.py:17-83``);
``__call__`` runs per Arrow batch: emissions + viterbi decode
(``crf.py:89-134`` semantics) + BIOES span extraction (``label.py:11-44``).

Design note (deviation from a literal stage-per-step translation):
featurize → tag → span-extract are fused into one actor so the wide
``matched_word_ids[L, W]`` intermediate never crosses the object store
(SURVEY.md §7 "wide featurized rows ... project aggressively").

Output is NESTED: one row per segment with ``list<...>`` mention columns
(starts/ends/labels/surfaces/norm_keys/entity_ids). Keeping a segment's
mentions inside one row makes every downstream per-segment computation
(entity linking, co-occurrence triple emission) an exact stateless
``map_batches`` — no groupby shuffle, and no correctness dependence on how
Ray re-blocks rows between stages. ``explode_mentions`` flattens to the
classic mention table when needed.

Mentions carry ``entity_id = sha256(norm_key)[:16]`` — computable per row
without any shuffle; the canonicalization groupby only builds the entity
TABLE, it is not needed to link mentions (this is what keeps the pipeline
one-shuffle at 10^12-file scale).
"""

from __future__ import annotations

import pyarrow as pa

from ccnerx_ray.config import PipelineConfig
from ccnerx_ray.functions.bioes import get_entities, normalize_tags
from ccnerx_ray.functions.hashing import entity_id
from ccnerx_ray.functions.tokenize import normalize_surface
from ccnerx_ray.model.tagger import TaggerModel
from ccnerx_ray.state.catalog import EntityCatalog

PASS_THROUGH = ("content_sha256", "repo", "path", "commit", "lang", "seg_id")

SEGMENT_MENTIONS_SCHEMA = pa.schema([
    ("content_sha256", pa.string()),
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("seg_id", pa.int32()),
    ("n_tokens", pa.int32()),
    ("starts", pa.list_(pa.int32())),
    ("ends", pa.list_(pa.int32())),
    ("labels", pa.list_(pa.string())),
    ("surfaces", pa.list_(pa.string())),
    ("norm_keys", pa.list_(pa.string())),
    ("entity_ids", pa.list_(pa.string())),
])

MENTION_SCHEMA = pa.schema([
    ("content_sha256", pa.string()),
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("seg_id", pa.int32()),
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("label", pa.string()),
    ("surface", pa.string()),
    ("norm_key", pa.string()),
    ("entity_id", pa.string()),
])


def extract_mention_rows(tokens: list[str], tags: list[str]) -> list[tuple]:
    """BIOES decode of one segment → [(start, end, label, surface, norm_key,
    entity_id)] with the reference's M-→I- normalization applied first
    (trainer.py:211-214)."""
    out = []
    for start, end, label, word in get_entities(normalize_tags(tags), tokens):
        surface = " ".join(word)
        nk = normalize_surface(word)
        out.append((start, end, label, surface, nk, entity_id(nk)))
    return out


class MentionTagger:
    """Actor-pool callable: Arrow segment batch → nested mention batch.

    ``emit="segments"`` (default) returns nested mention rows for the
    staged pipeline; ``emit="triples"`` FUSES link scoring and triple
    emission into this actor (one pool instead of three stages — the
    production path: fewer pools to spin up, no nested intermediates in
    the object store; equality with the staged path is test-enforced)."""

    def __init__(self, catalog_pairs: list[tuple[tuple[str, ...], str]] | None = None,
                 cfg: PipelineConfig | None = None, catalog_ref=None,
                 emit: str = "segments", backend: str = "numpy",
                 device: str = "cpu", checkpoint_path: str | None = None,
                 extra_lexicon_ref=None):
        """``catalog_pairs`` inline for tests; ``catalog_ref`` a ``ray.put``
        handle for production (broadcast once, read per actor).
        ``backend="torch"`` swaps in the torch emission model
        (:mod:`ccnerx_ray.model.torch_adapter`) — pair it with
        ``map_batches(…, num_gpus=1)`` and ``device="cuda"`` for the GPU
        pool; decode semantics are backend-independent.
        ``checkpoint_path`` loads on-disk weights ONCE per actor (the
        reference's predictor regime, ``predicter.py:52-83`` — every
        actor of the pool reads the artifact in ``__init__``, never per
        batch); ``None`` uses the config-seeded weights.
        ``extra_lexicon_ref``: ``ray.put`` handle of additional trie
        words (token tuples) beyond the catalog — the reference's
        1-1.5M-entry ``max_scan_num`` lexicon regime (``Readme.md:59``,
        ``le_loader.py:25``); broadcast once, trie built per actor."""
        self.cfg = cfg or PipelineConfig()
        if catalog_ref is not None:
            import ray
            catalog_pairs = ray.get(catalog_ref)
        catalog = EntityCatalog.from_pairs(catalog_pairs or [])
        weights = None
        if checkpoint_path is not None:
            from ccnerx_ray.model.tagger import load_checkpoint
            weights = load_checkpoint(checkpoint_path)
        extra_lexicon = None
        if extra_lexicon_ref is not None:
            import ray
            extra_lexicon = ray.get(extra_lexicon_ref)
        if backend == "torch":
            if extra_lexicon is not None:
                raise ValueError("extra_lexicon is numpy-backend-only")
            from ccnerx_ray.model.torch_adapter import TorchTaggerModel
            self.model = TorchTaggerModel(catalog, self.cfg, device=device,
                                          weights=weights)
        elif backend == "numpy":
            self.model = TaggerModel(catalog, self.cfg, weights=weights,
                                     extra_lexicon=extra_lexicon)
        else:
            # a typo ('Torch', 'cuda') silently running the numpy model on
            # an idle GPU pool would be invisible — fail loudly instead
            raise ValueError(f"unknown tagger backend {backend!r}; "
                             "expected 'numpy' or 'torch'")
        self.emit = emit
        if emit in ("triples", "mentions"):
            from ccnerx_ray.stages.link import LinkScorer
            from ccnerx_ray.stages.triples import make_triple_emitter
            self._linker = LinkScorer(catalog_pairs=catalog_pairs)
            self._emitter = make_triple_emitter(self.cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        nested = self._tag_batch(batch)
        if self.emit == "triples":
            return self._emitter(self._linker(nested))
        if self.emit == "mentions":
            return explode_mentions(self._linker(nested))
        if self.emit == "mentions_raw":
            # flat UNLINKED mentions — the probe side of the
            # hash-partitioned catalog join (stages/link.py:
            # link_exploded_mentions); linking happens downstream
            return explode_mentions(nested)
        return nested

    def _tag_batch(self, batch: pa.Table) -> pa.Table:
        token_lists = batch.column("tokens").to_pylist()
        # sort by length to minimize viterbi padding waste; per-row output is
        # batch-composition-independent so restoring order is purely cosmetic
        order = sorted(range(len(token_lists)), key=lambda i: len(token_lists[i]))
        tag_lists: list[list[str]] = [None] * len(token_lists)  # type: ignore
        B = self.cfg.tagger_batch_size
        for off in range(0, len(order), B):
            idxs = order[off:off + B]
            for i, tags in zip(idxs, self.model.tag_segments([token_lists[i] for i in idxs])):
                tag_lists[i] = tags

        out = {name: [] for name in SEGMENT_MENTIONS_SCHEMA.names}
        for c in PASS_THROUGH:
            out[c] = batch.column(c).to_pylist()
        for toks, tags in zip(token_lists, tag_lists):
            rows = extract_mention_rows(toks, tags)
            out["n_tokens"].append(len(toks))
            out["starts"].append([r[0] for r in rows])
            out["ends"].append([r[1] for r in rows])
            out["labels"].append([r[2] for r in rows])
            out["surfaces"].append([r[3] for r in rows])
            out["norm_keys"].append([r[4] for r in rows])
            out["entity_ids"].append([r[5] for r in rows])
        return pa.Table.from_pydict(out, schema=SEGMENT_MENTIONS_SCHEMA)


_PROCESS_MODELS: dict = {}


def make_fused_tagger_fn(catalog_ref, cfg: PipelineConfig, emit: str = "triples"):
    """Task-based fused tagger: a plain ``map_batches`` function holding the
    model as a per-worker-process singleton (built on first batch, reused
    for every later task on that worker).

    Why tasks, not actors, for the CPU tagger: the model is cheap to build
    (seeded numpy + a small trie — no GPU weights), and task scheduling
    uses every CPU in the cluster immediately, where a fixed actor pool
    pays spin-up and pins parallelism to the pool size (measured: 2.2×
    faster end-to-end at 32 CPUs on the scaling corpus). A GPU tagger must
    use the actor-pool path (``MentionTagger`` via ``map_batches(cls,
    num_gpus=1)``) — state there is NOT rebuildable per process."""
    key = (catalog_ref.hex() if hasattr(catalog_ref, "hex") else id(catalog_ref),
           cfg, emit)

    def tag_fused(batch: pa.Table) -> pa.Table:
        m = _PROCESS_MODELS.get(key)
        if m is None:
            if len(_PROCESS_MODELS) > 4:
                _PROCESS_MODELS.clear()
            m = MentionTagger(catalog_ref=catalog_ref, cfg=cfg, emit=emit)
            _PROCESS_MODELS[key] = m
        return m(batch)

    return tag_fused


def explode_mentions(batch: pa.Table) -> pa.Table:
    """Stateless flattener: nested segment-mention rows → one row per
    mention (the classic mentions table, M5 in SURVEY.md §2.3). Uses the
    linked label when the link stage has run."""
    has_link = "linked_labels" in batch.column_names
    has_cands = "cand_labels" in batch.column_names
    out = {name: [] for name in MENTION_SCHEMA.names}
    if has_link:
        out["linked_label"] = []
        out["link_score"] = []
        out["in_catalog"] = []
    if has_cands:
        out["cand_labels"] = []
        out["n_cands"] = []
    cols = {c: batch.column(c).to_pylist() for c in batch.column_names}
    for i in range(batch.num_rows):
        n = len(cols["starts"][i])
        for j in range(n):
            for c in PASS_THROUGH:
                out[c].append(cols[c][i])
            out["start"].append(cols["starts"][i][j])
            out["end"].append(cols["ends"][i][j])
            out["label"].append(cols["labels"][i][j])
            out["surface"].append(cols["surfaces"][i][j])
            out["norm_key"].append(cols["norm_keys"][i][j])
            out["entity_id"].append(cols["entity_ids"][i][j])
            if has_link:
                out["linked_label"].append(cols["linked_labels"][i][j])
                out["link_score"].append(cols["link_scores"][i][j])
                out["in_catalog"].append(cols["in_catalog"][i][j])
            if has_cands:
                out["cand_labels"].append(cols["cand_labels"][i][j])
                out["n_cands"].append(cols["n_cands"][i][j])
    schema = MENTION_SCHEMA
    if has_link:
        schema = schema.append(pa.field("linked_label", pa.string())) \
                       .append(pa.field("link_score", pa.float64())) \
                       .append(pa.field("in_catalog", pa.bool_()))
    if has_cands:
        schema = schema.append(pa.field("cand_labels", pa.string())) \
                       .append(pa.field("n_cands", pa.int32()))
    return pa.Table.from_pydict(out, schema=schema)
