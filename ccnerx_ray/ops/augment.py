"""Data augmentation by same-label span replacement (K5;
``tools/expand_data.py:56-111``).

The reference samples sentences, replaces an entity span with another
surface of the same label drawn from a ``LabelCollection``, and records a
``replace`` provenance span. Ray-natively: the label→surfaces collection is
small (it is the canonical entity table) and broadcast; replacement is a
seeded, row-deterministic ``map_batches`` — the draw is keyed on the row's
content hash so retries reproduce the same augmentation (SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ccnerx_ray.functions.bioes import get_entities, get_labels, normalize_tags
from ccnerx_ray.functions.hashing import stable_hash64

AUGMENT_SCHEMA = pa.schema([
    ("text", pa.list_(pa.string())),
    ("label", pa.list_(pa.string())),
    ("replaced", pa.bool_()),
    ("replace_from", pa.string()),   # provenance (expand_data.py:20-32)
    ("replace_to", pa.string()),
])


def augment_by_replacement(ds, label_surfaces: dict[str, list[list[str]]],
                           rate: float = 0.5, seed: int = 2021,
                           surfaces_ref=None):
    """sentence Dataset (text/label lists) → augmented Dataset.

    ``label_surfaces``: label → list of token-list surfaces (broadcast).
    Each row decides to augment from ``hash(content, seed) → [0,1)`` so the
    sample is deterministic per row, independent of partitioning."""
    import ray

    if surfaces_ref is None:
        surfaces_ref = ray.put({k: [list(s) for s in v]
                                for k, v in label_surfaces.items()})

    def aug(batch: pa.Table) -> pa.Table:
        surf = ray.get(surfaces_ref)
        out = {n: [] for n in AUGMENT_SCHEMA.names}
        for toks, tags in zip(batch.column("text").to_pylist(),
                              batch.column("label").to_pylist()):
            h = stable_hash64(f"{seed}|{' '.join(toks)}")
            draw = (h & 0xFFFFFFFF) / 2**32
            ents = get_entities(normalize_tags(tags), toks)
            cand = [e for e in ents if surf.get(e[2])]
            if draw >= rate or not cand:
                out["text"].append(toks)
                out["label"].append(tags)
                out["replaced"].append(False)
                out["replace_from"].append("")
                out["replace_to"].append("")
                continue
            start, end, lab, word = cand[h % len(cand)]
            options = surf[lab]
            new = options[(h >> 32) % len(options)]
            new_toks = toks[:start] + list(new) + toks[end:]
            new_tags = tags[:start] + get_labels(lab, len(new)) + tags[end:]
            out["text"].append(new_toks)
            out["label"].append(new_tags)
            out["replaced"].append(True)
            out["replace_from"].append(" ".join(word))
            out["replace_to"].append(" ".join(new))
        return pa.Table.from_pydict(out, schema=AUGMENT_SCHEMA)

    return ds.map_batches(aug, batch_format="pyarrow")
