"""Deterministic FILTERED negative sampling over a KG edge set — the
training-data prep step every link-prediction / KG-embedding recipe
(TransE-family) runs: for each true edge ``(s, o)`` draw ``k``
corrupted tails from the entity vocabulary, then drop ("filtered"
setting) any corruption that is itself a true edge or a self-loop, so
the training labels carry no false negatives.

Determinism ledger (the ``hash_split`` contract): sample ``i`` of edge
``(s, o)`` indexes the SORTED entity vocabulary at
``sha256(salt ':' len(s) ':' s ':' len(o) ':' o ':' i)``'s first 60
bits mod ``n`` — length-prefixed components (the ADVICE-r4
collision-free pair-key rule: delimiter characters inside ids cannot
alias two edges), stable across runs, retries, partitionings and
cluster sizes, and mirrored exactly in DuckDB as
``('0x' || substr(sha256(...), 1, 15))::UBIGINT % n``. Emitted columns
are strings + one small int, so the result value-hashes.

Scale shape: generation is a PURE MAP (each edge row expands to its
``k`` corruption rows in-batch — no shuffle, no state); the filter is
ONE hash-partitioned anti-join of the corruption rows against the
symmetrized edge set on a collision-free directed pair key
(:func:`ccnerx_ray.ops.graph.encode_pair_key` — broadcast under the
byte bound via :func:`ccnerx_ray.ops.join.adaptive_join`, partitioned
beyond). The entity vocabulary is collected and sorted DRIVER-side
under an explicit bound and broadcast once via ``ray.put`` — the
catalog-broadcast regime: entity vocabularies are catalog-scale
(⋘ corpus scale). At 10⁹+ entities swap the vocabulary index for a
distributed rank (global sort + per-block offset prefix sums) and the
gather for a hash-partitioned join on ``idx`` — documented, not
silent: the bound raises loudly."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ccnerx_ray.ops.graph import encode_pair_key
from ccnerx_ray.ops.join import adaptive_join

VOCAB_BOUND_DEFAULT = 5_000_000


def collect_vocab(ids_ds, id_col: str = "eid",
                  bound: int = VOCAB_BOUND_DEFAULT) -> np.ndarray:
    """Collect a DISTINCT id column into a sorted numpy array under an
    explicit driver-memory bound (raises loudly beyond — see the module
    header for the 10⁹-entity swap)."""
    n = ids_ds.count()
    if n > bound:
        raise ValueError(
            f"entity vocabulary has {n} ids > bound {bound}: swap the "
            "driver-side sorted index for a distributed rank (module "
            "docstring) before running at this scale")
    vals = [r[id_col] for r in ids_ds.take_all()]
    vocab = np.array(sorted(set(vals)), dtype=object)
    if len(vocab) != len(vals):
        raise ValueError("vocabulary ids must be distinct")
    if len(vocab) == 0:
        raise ValueError("empty entity vocabulary")
    return vocab


def negative_edge_samples(edges, vocab: np.ndarray, *, k: int = 2,
                          salt: str = "neg",
                          src_col: str = "ea", dst_col: str = "eb"):
    """``k`` filtered corrupted-tail samples per DISTINCT true edge →
    ``(subj, obj, neg_obj, sample_i)``. ``edges`` must be the deduped
    edge table (one row per undirected pair, any orientation); ``vocab``
    the sorted distinct entity-id array (:func:`collect_vocab`). Rows
    whose corruption lands on the subject itself or on ANY true
    neighbor of the subject (either orientation — the symmetrized edge
    set) are dropped, so ``(subj, neg_obj)`` is guaranteed false."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import ray

    # the edge table feeds BOTH the generation map and the symmetrized
    # filter side — materialize once (pair-scale, not corpus-scale)
    edges = edges.materialize()

    vocab = np.asarray(vocab, dtype=object)
    n_vocab = len(vocab)
    vocab_ref = ray.put(vocab)
    pre = f"{salt}:".encode("utf-8")

    def gen(batch: pa.Table) -> pa.Table:
        vb = ray.get(vocab_ref)
        subs = batch.column(src_col).to_pylist()
        objs = batch.column(dst_col).to_pylist()
        m = len(subs)
        out_s, out_o, out_n, out_i = [], [], [], []
        for i in range(k):
            suf = f":{i}".encode("utf-8")
            # sha256 over the length-prefixed edge key + sample index;
            # first 60 bits == ('0x' || substr(hex,1,15))::UBIGINT —
            # one C-speed hashlib call per (edge, i); keys are unique
            # per row so no cache applies (the hash_split regime)
            idx = np.fromiter(
                ((int.from_bytes(hashlib.sha256(
                    pre + f"{len(s)}:{s}:{len(o)}:{o}".encode("utf-8")
                    + suf).digest()[:8], "big") >> 4) % n_vocab
                 for s, o in zip(subs, objs)),
                dtype=np.int64, count=m)
            negs = vb[idx]
            keep = negs != np.array(subs, dtype=object)  # self-loops out
            out_s.extend(np.array(subs, dtype=object)[keep])
            out_o.extend(np.array(objs, dtype=object)[keep])
            out_n.extend(negs[keep])
            out_i.extend([i] * int(keep.sum()))
        return pa.table({
            "subj": pa.array(out_s, pa.string()),
            "obj": pa.array(out_o, pa.string()),
            "neg_obj": pa.array(out_n, pa.string()),
            "sample_i": pa.array(out_i, pa.int64()),
        })

    cand = edges.map_batches(gen, batch_format="pyarrow")

    # filtered setting: drop candidates whose (subj, neg_obj) is a true
    # edge in EITHER orientation — anti-join on the collision-free
    # directed pair key against the symmetrized edge set
    def cand_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pk", encode_pair_key(batch.column("subj"),
                                  batch.column("neg_obj")))

    def sym_pk(batch: pa.Table) -> pa.Table:
        a, b = batch.column(src_col), batch.column(dst_col)

        def arr(x):
            return (x.combine_chunks()
                    if isinstance(x, pa.ChunkedArray) else x)

        return pa.table({"pk": pa.concat_arrays(
            [arr(encode_pair_key(a, b)), arr(encode_pair_key(b, a))])})

    kept = adaptive_join(
        cand.map_batches(cand_pk, batch_format="pyarrow"),
        edges.map_batches(sym_pk, batch_format="pyarrow"),
        on="pk", join_type="left_anti")
    return kept.drop_columns(["pk"])
