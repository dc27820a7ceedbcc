"""Deterministic hashing primitives.

Replaces the reference's retry-unstable key functions — Python ``hash()``
dedup keys (``CC/loaders/utils/label_counter.py:39``) and md5 file etags
(``CC/loaders/utils/reader.py:32-51``) — with content hashes that are stable
across processes, actors and retries (SURVEY.md §4 "non-determinism traps").

Everything here is pure and importable inside any UDF.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def sha256_hex(s: str | bytes) -> str:
    """Per-row content invariant column (replaces the reference's per-file
    etag, reader.py:32-51)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return hashlib.sha256(s).hexdigest()


def stable_hash64(s: str | bytes) -> int:
    """Stable unsigned 63-bit key (replaces Python hash() at
    label_counter.py:39; safe as int64 Arrow column)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little") >> 1


def sha256_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized-ish sha256 of a string column (hashlib per value is
    C-speed; negligible next to featurization)."""
    vals = col.to_pylist()
    return pa.array([None if v is None else sha256_hex(v) for v in vals], type=pa.string())


def stable_hash64_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    vals = col.to_pylist()
    return pa.array([None if v is None else stable_hash64(v) for v in vals], type=pa.int64())


def entity_id(norm_key: str) -> str:
    """Deterministic canonical-entity id: first 16 hex chars of sha256 of
    the normalized surface key (the :func:`sha256_hex16` contract — the
    KG oracles recompute it as ``substr(sha256(norm_key), 1, 16)``)."""
    return sha256_hex16(norm_key)


def sha256_hex16(s: str | bytes) -> str:
    """16-hex-char sha256 prefix — the oracle-critical contract shared by
    fingerprinting, winnowing and stratified-rank keys; the DuckDB mirror
    is ``substr(sha256(x), 1, 16)``. Keep every Python user on this ONE
    helper so the Python/SQL pairing can't drift."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return hashlib.sha256(s).hexdigest()[:16]


def sha256_int60(s: str | bytes) -> int:
    """60-bit integer from the first 15 hex chars of sha256 — the shingle
    hash domain of the MinHash pipeline. sha256-derived so the DuckDB
    oracle reproduces it exactly (``('0x' || substr(sha256(x),1,15))::
    UBIGINT``); 60 bits keeps ``a*h`` inside HUGEINT for the oracle's
    permutation arithmetic."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int(hashlib.sha256(s).hexdigest()[:15], 16)


def sha256_int64(s: str | bytes) -> int:
    """64-bit integer from the first 16 hex chars of sha256 — the SimHash
    token-hash domain (DuckDB-reproducible:
    ``('0x' || substr(sha256(x),1,16))::UBIGINT``)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int(hashlib.sha256(s).hexdigest()[:16], 16)


_MINHASH_PRIME = (1 << 61) - 1


def minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) coefficients for num_perm universal-hash permutations."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MINHASH_PRIME, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MINHASH_PRIME, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature of a set of shingle hashes: for each permutation i,
    ``min((a_i * h + b_i) mod p)``. Vectorized [S] x [P] → [P] int64."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MINHASH_PRIME, dtype=np.int64)
    h = shingle_hashes.astype(np.uint64)[:, None]
    vals = (h * a.astype(np.uint64)[None, :] + b.astype(np.uint64)[None, :]) % np.uint64(_MINHASH_PRIME)
    return vals.min(axis=0).astype(np.int64)


def simhash64(token_hashes: np.ndarray) -> int:
    """64-bit SimHash over token hashes (unweighted)."""
    if len(token_hashes) == 0:
        return 0
    bits = ((token_hashes.astype(np.uint64)[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")
