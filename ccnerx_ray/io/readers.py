"""Corpus sources beyond Parquet: JSONL, CoNLL, ENAMEX XML, tag lists,
external-entity catalogs (SURVEY.md §2.1 S1-S3, S7, S8).

Whole-file formats with cross-line structure (CoNLL sentence blocks,
ENAMEX markup) are read via ``read_binary_files`` — one file per row — and
parsed by a ``map_batches`` stage that explodes files into sentence rows.
Splitting such formats by *lines* would tear sentences at block
boundaries; at real scale the corpus is pre-sharded into many files, which
is exactly the unit this reader parallelizes over.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

SENTENCE_SCHEMA = pa.schema([
    ("text", pa.list_(pa.string())),
    ("label", pa.list_(pa.string())),
])


# ------------------------------------------------------------------ S1
def read_jsonl_corpus(paths, strict: bool = False):
    """JSONL of ``{"text": [...], "label": [...]}`` (S1;
    ``reader.py:74-82`` + ``le_loader.py:203-207``). Rows missing keys are
    quarantined (M12) unless ``strict``."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        out = {"text": [], "label": []}
        for payload in batch.column("bytes").to_pylist():
            for line in payload.decode("utf-8").splitlines():
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                if "text" not in row or "label" not in row \
                        or len(row["text"]) != len(row["label"]):
                    if strict:
                        raise ValueError(f"invalid corpus row: {line[:80]}")
                    continue
                out["text"].append([str(t) for t in row["text"]])
                out["label"].append([str(t) for t in row["label"]])
        return pa.Table.from_pydict(out, schema=SENTENCE_SCHEMA)

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(parse, batch_format="pyarrow")


# ------------------------------------------------------------------ S2
def parse_conll(payload: str, split: str = " ") -> list[tuple[list, list]]:
    """``word<split>tag`` lines, blank-line sentence delimiter
    (``cn_data_manager.py:118-141`` ReadData semantics)."""
    sentences = []
    toks: list[str] = []
    tags: list[str] = []
    for line in payload.splitlines():
        line = line.strip()
        if not line:
            if toks:
                sentences.append((toks, tags))
                toks, tags = [], []
            continue
        parts = line.rsplit(split, 1)
        if len(parts) != 2:
            continue
        toks.append(parts[0])
        tags.append(parts[1])
    if toks:
        sentences.append((toks, tags))
    return sentences


def read_conll(paths, split: str = " ", remove_pattern: str | None = None):
    """CoNLL reader (S2), plain and "extreme" variants: ``remove_pattern``
    is deleted from the raw payload before parsing (the reference removes
    ``'， O'`` lines to re-split long sentences,
    ``cn_data_manager.py:147-172``)."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        out = {"text": [], "label": []}
        for payload in batch.column("bytes").to_pylist():
            s = payload.decode("utf-8")
            if remove_pattern:
                s = s.replace(remove_pattern, "")
            for toks, tags in parse_conll(s, split):
                out["text"].append(toks)
                out["label"].append(tags)
        return pa.Table.from_pydict(out, schema=SENTENCE_SCHEMA)

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(parse, batch_format="pyarrow")


# ------------------------------------------------------------------ S7
_ENAMEX_RE = re.compile(r'<ENAMEX TYPE="([^"]+)"[^>]*>([^<]*)</ENAMEX>')


def parse_enamex(line: str) -> tuple[list[str], list[str]]:
    """One markup line → (chars, BIOES tags) (``tools/ontonotes4.py:18-71``
    semantics: ENAMEX spans become B/I/E or S tags over characters,
    everything else is O; whitespace is scrubbed)."""
    chars: list[str] = []
    tags: list[str] = []
    pos = 0
    for m in _ENAMEX_RE.finditer(line):
        for ch in re.sub(r"\s", "", line[pos:m.start()]):
            chars.append(ch)
            tags.append("O")
        ent = re.sub(r"\s", "", m.group(2))
        lab = m.group(1)
        if len(ent) == 1:
            chars.append(ent)
            tags.append(f"S-{lab}")
        elif ent:
            for i, ch in enumerate(ent):
                chars.append(ch)
                tags.append(f"B-{lab}" if i == 0 else
                            (f"E-{lab}" if i == len(ent) - 1 else f"I-{lab}"))
        pos = m.end()
    for ch in re.sub(r"\s", "", line[pos:]):
        chars.append(ch)
        tags.append("O")
    return chars, tags


def read_enamex(paths):
    """ENAMEX-markup reader (S7): files → one sentence row per line."""
    import ray.data

    def parse(batch: pa.Table) -> pa.Table:
        out = {"text": [], "label": []}
        for payload in batch.column("bytes").to_pylist():
            for line in payload.decode("utf-8").splitlines():
                line = line.strip()
                if not line or line.startswith("<DOC") or line.startswith("</DOC"):
                    continue
                chars, tags = parse_enamex(line)
                if chars:
                    out["text"].append(chars)
                    out["label"].append(tags)
        return pa.Table.from_pydict(out, schema=SENTENCE_SCHEMA)

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(parse, batch_format="pyarrow")


# ------------------------------------------------------------------ S3 / S8
def read_tags_list(path: str) -> list[str]:
    """Ordered tag list, one per line (S3; ``cn_data_manager.py:212-218``).
    Driver-side: the list is small and its ORDER defines tag ids."""
    with open(path, "r", encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]


def read_external_entities(path: str) -> dict:
    """External-entities JSON (S8; ``ftloader_v1.py:87-89``): whole-file
    ``{"entities": {str(list(word)): {label: [examples]}}}``. Driver-side;
    broadcast with ``ray.put``."""
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)
    return data.get("entities", data)
