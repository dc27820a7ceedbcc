"""word2vec-text embedding reader with deterministic fallback vectors.

Reader semantics from ``CC/loaders/utils/embedding.py:14-34``: the header
line gives ``"<count> <dim>"``; each subsequent line is ``word v1..vd``;
multi-token words (length > dim+1 fields) keep the leading fields joined by
a space; short lines are skipped as errors; the scan is capped at
``max_scan_num`` lines.

Fallback semantics DIFFER deliberately from the reference: the reference
draws a *process-random* uniform vector scaled by ``sqrt(3/dim)`` for
out-of-vocabulary words (``embedding.py:67-69``), which is not stable under
Ray task retries. We keep the same distribution and scale but seed the draw
from a content hash of the word (SURVEY.md §4 "non-determinism traps"), so
any retry or any actor produces the identical vector.
"""

from __future__ import annotations

import hashlib

import numpy as np


def _hash_seed(word: str) -> int:
    return int.from_bytes(hashlib.sha256(word.encode("utf-8")).digest()[:8], "little")


def fallback_embedding(word: str, dim: int) -> np.ndarray:
    """Hash-seeded stand-in for the reference's random_embedding
    (embedding.py:67-69): uniform(-s, s) with s = sqrt(3/dim)."""
    scale = np.sqrt(3.0 / dim)
    rng = np.random.default_rng(_hash_seed(word))
    return rng.uniform(-scale, scale, dim)


class WordEmbedding:
    """In-memory ``{word: vector}`` index from word2vec text."""

    def __init__(self, index: dict[str, np.ndarray], dimension: int):
        self.index = index
        self.dimension = dimension

    @classmethod
    def from_txt(cls, path: str, max_scan_num: int = 1_000_000) -> "WordEmbedding":
        """Parse word2vec text (embedding.py:14-34 semantics)."""
        index: dict[str, np.ndarray] = {}
        dim = -1
        with open(path, "r", encoding="utf-8") as f:
            for i, raw in enumerate(f):
                if i >= max_scan_num >= 0:
                    break
                parts = raw.strip().split()
                if i == 0:
                    dim = int(parts[1])
                    continue
                if not parts:
                    continue
                if len(parts) == dim + 1:
                    index[parts[0]] = np.asarray(parts[1:], dtype=np.float64)
                elif len(parts) > dim + 1:
                    # multi-token word: join the leading fields (embedding.py:30-31)
                    index[" ".join(parts[:-dim])] = np.asarray(parts[-dim:], dtype=np.float64)
                # else: malformed line, skipped (embedding.py:32-33)
        return cls(index, dim)

    def lookup(self, word: str) -> np.ndarray:
        """Embedding row, falling back to the deterministic hash-seeded
        vector for unknown words (J1, SURVEY.md §2.5)."""
        vec = self.index.get(word)
        if vec is None:
            return fallback_embedding(word, self.dimension)
        return vec

    def matrix_for_vocab(self, words: list[str]) -> np.ndarray:
        """Dense ``[len(words), dim]`` matrix (VocabEmbedding.build_from_file
        analogue, embedding.py:45-65)."""
        return np.stack([self.lookup(w) for w in words]) if words else np.zeros((0, self.dimension))

    @staticmethod
    def write_txt(path: str, vectors: dict[str, np.ndarray]) -> None:
        """Embedding-file writer (K7; ``tools/tag_embedding_gen.py:26-33``)."""
        dim = len(next(iter(vectors.values()))) if vectors else 0
        with open(path, "w", encoding="utf-8") as f:
            f.write(f"{len(vectors)} {dim}\n")
            for word, vec in vectors.items():
                f.write(word + " " + " ".join(f"{x:.6f}" for x in vec) + "\n")
