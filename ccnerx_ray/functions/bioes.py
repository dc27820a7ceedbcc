"""BIOES/BMES tag-sequence codec with the reference's exact semantics.

``get_entities`` replicates ``CC/loaders/utils/label.py:11-44`` including
its quirks (they change P/R and are therefore conformance-relevant,
SURVEY.md §7):

* a sentinel start-tag is appended so a trailing entity is flushed
  (label.py:16-17);
* the emitted span is ``(start, end_exclusive, label, tokens)`` where
  ``end`` is the index at which the entity was flushed;
* a *broken* ``I-``/``M-`` without a preceding ``B-`` opens a new entity at
  that position (tolerated, label.py:28-32);
* every non-``O`` token since ``start`` is appended to the surface — even
  when its label part disagrees with the open entity (label.py:33-34).

``get_labels`` replicates label.py:47-55; ``normalize_tags`` replicates the
``M-`` → ``I-`` bridge applied before scoring (``CC/trainer.py:211-214``).
"""

from __future__ import annotations

from typing import Sequence

_START = {"B"}
_MIDDLE = {"M", "I"}
_OUTSIDE = {"O"}
_SINGLE = {"S"}


def get_entities(labels: Sequence[str], text: Sequence[str]) -> list[tuple]:
    """Extract entity spans ``(start, end, label, tokens)`` from a BIOES/BMES
    tag sequence (semantics of label.py:11-44; non-mutating)."""
    out: list[tuple] = []
    word: list = []
    cur_label = None
    start = -1
    labs = list(labels) + ["B-"]
    toks = list(text) + ["[SEP]"]
    for i, (label, ch) in enumerate(zip(labs, toks)):
        head = label[0] if label else "O"
        if head in _START or head in _OUTSIDE or head in _SINGLE:
            if cur_label is not None:
                out.append((start, i, cur_label, word))
            word = []
            cur_label = None
            start = -1
        if head in _START or head in _SINGLE:
            cur_label = "-".join(label.split("-")[1:])
            start = i
        if head in _MIDDLE and cur_label is None:
            # broken I-/M- start tolerated (label.py:28-32)
            cur_label = "-".join(label.split("-")[1:])
            start = i
        if head not in _OUTSIDE:
            word.append(ch)
    return out


def get_labels(label: str, length: int, has_end: bool = True,
               middle_symbol: str = "I", has_single: bool = True) -> list[str]:
    """Span → BIOES tag list (label.py:47-55)."""
    labels = [f"{middle_symbol}-{label}"] * length
    if length == 1 and has_single:
        labels[0] = f"S-{label}"
        return labels
    if has_end:
        labels[-1] = f"E-{label}"
    labels[0] = f"B-{label}"
    return labels


def normalize_tags(labels: Sequence[str]) -> list[str]:
    """BMES→BIO bridge: ``M-`` → ``I-`` (trainer.py:211-214) applied before
    metric computation and span comparison."""
    return [lab.replace("M-", "I-") for lab in labels]
