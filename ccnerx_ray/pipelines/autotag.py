"""Lexicon auto-tagging: entity-catalog construction (SURVEY.md §3.3).

The reference tags its whole word vocabulary with the trained model and
writes ``(word, tags)`` JSONL (``t2.py:148-175``), later consumed as the
entity-linking resource (``vocab_tag.py:58-71``). Ray-natively: the word
list is a Dataset; the SAME tagger actor pool used for corpus tagging runs
over it in chunks (``t2.py:163`` chunk 2048 ≙ ``batch_size``); output is
the catalog table ``(word tokens, tags, label)``.
"""

from __future__ import annotations

import pyarrow as pa

from ccnerx_ray.config import PipelineConfig
from ccnerx_ray.functions.bioes import get_entities, normalize_tags
from ccnerx_ray.model.tagger import TaggerModel
from ccnerx_ray.state.catalog import EntityCatalog

AUTOTAG_SCHEMA = pa.schema([
    ("word", pa.list_(pa.string())),
    ("tags", pa.list_(pa.string())),
    ("label", pa.string()),          # majority span label; "O" if none
])


class WordTagger:
    """Actor-pool callable: word rows → (word, tags, label)."""

    def __init__(self, catalog_pairs=None, cfg: PipelineConfig | None = None,
                 catalog_ref=None):
        self.cfg = cfg or PipelineConfig()
        if catalog_ref is not None:
            import ray
            catalog_pairs = ray.get(catalog_ref)
        self.model = TaggerModel(EntityCatalog.from_pairs(catalog_pairs or []),
                                 self.cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = batch.column("word").to_pylist()
        tag_lists = self.model.tag_segments([list(w) for w in words])
        labels = []
        for w, tags in zip(words, tag_lists):
            ents = get_entities(normalize_tags(tags), list(w))
            labels.append(ents[0][2] if ents else "O")
        return pa.Table.from_pydict(
            {"word": words, "tags": tag_lists, "label": labels},
            schema=AUTOTAG_SCHEMA)


def autotag_lexicon(words, catalog_pairs,
                    cfg: PipelineConfig | None = None,
                    concurrency: int = 4):
    """word list / Dataset → auto-tagged catalog Dataset (batched tagging,
    chunk ≙ batch_size per t2.py:163)."""
    import ray
    import ray.data

    cfg = cfg or PipelineConfig()
    if not hasattr(words, "map_batches"):
        words = ray.data.from_arrow(pa.table({
            "word": pa.array([list(w) for w in words],
                             pa.list_(pa.string()))}))
    ref = ray.put(list(catalog_pairs))
    return words.map_batches(
        WordTagger,
        fn_constructor_kwargs={"catalog_ref": ref, "cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.tagger_batch_size,
        concurrency=(1, concurrency),
    )
