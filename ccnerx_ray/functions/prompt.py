"""Prompt generation + MLM label masking (M8 / M10 — the reference's
pretraining-corpus utilities, re-expressed as pure functions usable inside
``map_batches``).

M8 (``CC/loaders/utils/tag_convert.py:10-61``; used ``lex_loader.py:152-211``):
an entity surface plus a tag rule becomes a cloze prompt —
``word ⊕ connector ⊕ [MASK]×len(label_text)`` — with parallel "origin"
tokens carrying the true label text, and BIOES tags covering the entity
span. The reference's connector is the Chinese copula ``是一个``; ours is a
configurable token list (default ``["is", "a"]`` for code corpora).

M10 (``lex_loader.py:218-247``): MLM labels — the loss is computed ONLY on
masked positions; everywhere else the label is ``-100`` (torch's
ignore_index).
"""

from __future__ import annotations

import pyarrow as pa

from ccnerx_ray.functions.bioes import get_labels

MASK = "[MASK]"
IGNORE = -100


def build_prompt(entity_tokens: list[str], label: str,
                 label_text: list[str] | None = None,
                 connector: list[str] | None = None) -> dict:
    """M8: one entity → cloze prompt.

    Returns ``{"prompt": tokens with [MASK]s, "origin": tokens with the
    label text filled in, "mlm_mask": 1 at masked positions, "tags":
    BIOES over the entity + O elsewhere}``.
    """
    connector = connector if connector is not None else ["is", "a"]
    label_text = label_text if label_text is not None else [label.lower()]
    ent = list(entity_tokens)
    prompt = ent + list(connector) + [MASK] * len(label_text)
    origin = ent + list(connector) + list(label_text)
    mlm_mask = [0] * (len(ent) + len(connector)) + [1] * len(label_text)
    tags = get_labels(label, len(ent)) + ["O"] * (len(connector) + len(label_text))
    return {"prompt": prompt, "origin": origin, "mlm_mask": mlm_mask,
            "tags": tags}


def mlm_labels(origin_ids: list[int], mlm_mask: list[int]) -> list[int]:
    """M10: loss labels — the true token id at masked positions, IGNORE
    (-100) everywhere else (lex_loader.py:218-247 semantics)."""
    return [tok if m else IGNORE for tok, m in zip(origin_ids, mlm_mask)]


def prompts_from_catalog(batch: pa.Table,
                         connector: list[str] | None = None) -> pa.Table:
    """map_batches stage: auto-tagged catalog rows ``(word, label)`` →
    prompt rows (the pretraining-corpus generation shape of
    ``lex_loader.py:152-211``)."""
    out = {"prompt": [], "origin": [], "mlm_mask": [], "tags": []}
    for word, label in zip(batch.column("word").to_pylist(),
                           batch.column("label").to_pylist()):
        p = build_prompt(list(word), label, connector=connector)
        for k in out:
            out[k].append(p[k])
    return pa.table({
        "prompt": pa.array(out["prompt"], pa.list_(pa.string())),
        "origin": pa.array(out["origin"], pa.list_(pa.string())),
        "mlm_mask": pa.array(out["mlm_mask"], pa.list_(pa.int8())),
        "tags": pa.array(out["tags"], pa.list_(pa.string())),
    })
