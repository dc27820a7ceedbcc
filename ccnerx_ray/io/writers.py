"""Sinks + format converters (SURVEY.md §2.2 K1, K5, K6, K8).

The partitioned triple store lives in :mod:`ccnerx_ray.io.store`; the
auto-tagged-vocab writer (K2) is ``EntityCatalog.to_jsonl``; the embedding
writer (K7) is ``WordEmbedding.write_txt``. Here: tagged-JSONL output,
CoNLL↔JSONL converters, tag-list generation, and dataset merge with
order-preserving label dedup.
"""

from __future__ import annotations

import pyarrow as pa


def write_tagged_jsonl(ds, path: str) -> None:
    """K1: predictions ``{"text": [...], "label": [...]}`` one JSON per
    line (``weibo.py:57-64`` analogue) — sharded by block."""
    ds.write_json(path)


def conll_to_jsonl_rows(batch: pa.Table) -> pa.Table:
    """K6: identity on the parsed sentence schema (the CoNLL reader already
    yields JSONL-shaped rows); kept as an explicit stage for converter
    pipelines (``tools/to_json.py:3-51``)."""
    return batch


def jsonl_to_conll_payloads(batch: pa.Table, split: str = " ") -> pa.Table:
    """K6 reverse converter: sentence rows → CoNLL text payloads (one
    payload per row; a sink writes/concatenates them)."""
    texts = batch.column("text").to_pylist()
    labels = batch.column("label").to_pylist()
    payloads = ["\n".join(f"{t}{split}{l}" for t, l in zip(toks, tags)) + "\n"
                for toks, tags in zip(texts, labels)]
    return pa.table({"conll": pa.array(payloads, pa.string())})


def tag_list_dataset(ds):
    """K6 tag-list generator: ``flat_map(labels) → unique → sort`` (the
    distributed form of ``tools/to_json.py`` tag-gen; order via sort is the
    deterministic-ids rule of SURVEY.md §7)."""

    def explode(batch: pa.Table) -> pa.Table:
        tags = sorted({t for row in batch.column("label").to_pylist()
                       for t in row})
        return pa.table({"tag": pa.array(tags, pa.string())})

    return (ds.map_batches(explode, batch_format="pyarrow")
              .groupby("tag").count().select_columns(["tag"]).sort("tag"))


def merge_corpora(*datasets):
    """K8 dataset merge: concatenation (``tools/merge_json.py:4-14``)."""
    out = datasets[0]
    for ds in datasets[1:]:
        out = out.union(ds)
    return out


def merge_label_lists(*label_lists: list[str]) -> list[str]:
    """K8 label merge: order-preserving dedup across lists
    (``merge_json.py:17-33`` — first-occurrence order is load-bearing
    because it defines tag ids). Driver-side: tag lists are tiny."""
    seen = set()
    out: list[str] = []
    for labels in label_lists:
        for lab in labels:
            if lab not in seen:
                seen.add(lab)
                out.append(lab)
    return out
