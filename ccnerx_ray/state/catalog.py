"""Entity catalog: surface form → entity label (+ tag sequence).

The reference's entity-linking resource is the auto-tagged lexicon
``tencent_vocab_with_tag.json`` — JSONL of ``(word, tag_sequence)`` produced
by running the tagger over the vocabulary (``t2.py:148-175``) and consumed
through ``VocabTag`` with ``<unk>{len}``/default-tag fallback
(``CC/loaders/utils/vocab_tag.py:24-37``) and the external-entities JSON
(``CC/loaders/finetune/ftloader_v1.py:87-89``).

Here the catalog maps a token-tuple surface to a single entity label; the
BIOES tag sequence for a surface is derived with ``get_labels`` semantics
(``CC/loaders/utils/label.py:47-55``). The catalog is small relative to the
corpus and is broadcast (``ray.put`` / actor ``__init__``), never shuffled
(J2/J3, SURVEY.md §2.5).
"""

from __future__ import annotations

import json
from typing import Iterable, Sequence

from ccnerx_ray.functions.bioes import get_labels


class EntityCatalog:
    """surface (token tuple) → label, with reference fallback semantics."""

    def __init__(self, default_tag: str = "O"):
        self.surface2label: dict[tuple[str, ...], str] = {}
        self.default_tag = default_tag

    def add(self, surface: Sequence[str], label: str) -> "EntityCatalog":
        self.surface2label[tuple(surface)] = label
        return self

    @classmethod
    def from_pairs(cls, pairs: Iterable[tuple[Sequence[str], str]],
                   default_tag: str = "O") -> "EntityCatalog":
        c = cls(default_tag)
        for surface, label in pairs:
            c.add(surface, label)
        return c

    @classmethod
    def from_jsonl(cls, path: str, default_tag: str = "O") -> "EntityCatalog":
        """Read ``{"word": [tok, ...] | str, "label": str}`` JSONL
        (entity_catalog.jsonl per FIXTURES.md F3; analogue of
        ``vocab_tag.py:58-71``)."""
        c = cls(default_tag)
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                word = row["word"]
                surface = tuple(word) if isinstance(word, list) else (word,)
                c.add(surface, row["label"])
        return c

    def label(self, surface: Sequence[str]) -> str | None:
        return self.surface2label.get(tuple(surface))

    def tags(self, surface: Sequence[str]) -> list[str]:
        """BIOES tag sequence for a surface; unknown surfaces get the
        default tag per position (vocab_tag.py:20-21 default behavior)."""
        lab = self.label(surface)
        if lab is None:
            return [self.default_tag] * len(surface)
        return get_labels(lab, len(surface))

    def words(self) -> list[tuple[str, ...]]:
        return list(self.surface2label.keys())

    def __len__(self) -> int:
        return len(self.surface2label)

    def to_jsonl(self, path: str) -> None:
        """Auto-tagged-vocab writer analogue (K2; ``t2.py:158-175``)."""
        with open(path, "w", encoding="utf-8") as f:
            for surface, label in self.surface2label.items():
                f.write(json.dumps({"word": list(surface), "label": label,
                                    "tags": self.tags(surface)}) + "\n")
