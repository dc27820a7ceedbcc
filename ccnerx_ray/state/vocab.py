"""Insertion-ordered token vocabulary with the reference's fallback rules.

Semantics from ``CC/loaders/utils/vocab.py:6-119``:

* first-come insertion order defines ids (``__add__`` at vocab.py:106-114) —
  order is semantically load-bearing, so distributed construction must go
  through a deterministic driver-side build (SURVEY.md §7);
* word-mode vocabularies are seeded with ``<pad>``, ``<unk>`` and
  length-bucketed ``<unk>{i}`` defaults (vocab.py:26-30);
* ``token2id`` falls back to ``<unk>{len(token)}`` then ``<unk>`` for word
  vocabs, and raises ``KeyError`` for unknown tags (vocab.py:92-104).

For token-tuple words (our lexicon entries), "length" is the number of
tokens in the tuple.
"""

from __future__ import annotations

from typing import Iterable, Sequence


def _length(token) -> int:
    return len(token)


class Vocab:
    """token ↔ id maps; ids are insertion-ordered (vocab.py:106-114)."""

    def __init__(self):
        self.item2idx: dict = {}
        self.idx2item: list = []
        self.is_word = False

    @property
    def size(self) -> int:
        return len(self.idx2item)

    def add(self, token) -> "Vocab":
        if token not in self.item2idx:
            self.item2idx[token] = len(self.idx2item)
            self.idx2item.append(token)
        return self

    @classmethod
    def from_list(cls, tokens: Iterable, is_word: bool = False,
                  unk_num: int = 0, max_scan_num: int | None = None) -> "Vocab":
        """Build with the reference's default-token seeding
        (vocab.py:13-34) and scan cap (vocab.py:52-53)."""
        v = cls()
        v.is_word = is_word
        if is_word:
            v.add("<pad>")
            v.add("<unk>")
            for i in range(unk_num):
                v.add(f"<unk>{i + 1}")
        for i, tok in enumerate(tokens):
            if max_scan_num is not None and i >= max_scan_num:
                break
            v.add(tok)
        return v

    def token2id(self, token):
        """Fallback semantics of vocab.py:80-104."""
        if isinstance(token, list):
            return [self.token2id(t) for t in token]
        if token in self.item2idx:
            return self.item2idx[token]
        if self.is_word:
            unk = f"<unk>{_length(token)}"
            if unk in self.item2idx:
                return self.item2idx[unk]
            return self.item2idx["<unk>"]
        raise KeyError(f"token {token!r} does not exist")

    def id2token(self, idx):
        if isinstance(idx, list):
            return [self.id2token(i) for i in idx]
        if idx >= len(self.idx2item):
            raise ValueError("id out of range")
        return self.idx2item[idx]

    def __len__(self) -> int:
        return len(self.idx2item)

    def __contains__(self, token) -> bool:
        return token in self.item2idx
