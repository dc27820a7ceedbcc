"""Stats-adaptive distributed joins.

Every production engine picks a join strategy from statistics (Spark's
``autoBroadcastJoinThreshold``, Presto's ``join_distribution_type``):

* **broadcast** when the build side provably fits in a worker heap — the
  build table is materialized ONCE, put in the object store, and every
  probe task joins its Arrow batch against the shared (zero-copy) table
  with an acero hash join. No shuffle at all; the probe side streams.
* **hash-partitioned** (``Dataset.join``) otherwise — both sides
  hash-shuffle on the key. This is the only correct shape when both
  sides are fact-scale (a 100 TB probe against a fact-scale build).

The selection is *asserted, not assumed*: the caller supplies a byte
estimate for the build side (normally ``read_parquet(...).size_bytes()``
on the pre-filter source — a metadata-cheap upper bound, since filters
and projections only shrink it), and after materializing we re-check the
ACTUAL in-memory size against a slack factor; if the estimate lied, the
materialized table is dropped and the hash-partitioned path runs
instead. This addresses the round-1 finding (unbounded driver broadcast
of a fact table) while keeping the small-side case shuffle-free.

No reference counterpart (the reference joins everything in-process
against Python dicts, e.g. ``CC/loaders/utils/vocab.py`` lookups); the
strategy split is what those dict joins become at cluster scale.
"""

from __future__ import annotations

import logging

import pyarrow as pa

logger = logging.getLogger(__name__)

# Spark's default autoBroadcastJoinThreshold is 10 MB and is widely seen
# as too conservative on modern RAM; 64 MiB of Arrow build table per
# worker is comfortably inside this repo's per-task heap budget.
BROADCAST_BYTES_DEFAULT = 64 << 20

# the metadata estimate is an upper bound on file bytes, but Arrow
# in-memory can exceed on-disk parquet (no encodings); re-check with slack
_ACTUAL_SLACK = 4


def _materialize_build(build, broadcast_bytes: int,
                       estimate_bytes: int | None) -> pa.Table | None:
    """Build-side table when the broadcast path is safe, else ``None``.

    ``estimate_bytes`` is checked BEFORE any execution (a lying-high
    estimate costs only a missed fast path); the materialized size is
    re-checked AFTER, so a lying-low estimate cannot smuggle a fact
    table into the object-store broadcast."""
    if estimate_bytes is None:
        estimate_bytes = build.size_bytes()  # may execute derived plans
    if estimate_bytes is None or estimate_bytes > broadcast_bytes:
        return None
    import ray
    tbl = pa.concat_tables(ray.get(build.to_arrow_refs()))
    if tbl.nbytes > broadcast_bytes * _ACTUAL_SLACK:
        logger.warning(
            "adaptive_join: build side estimate %d B but actual %d B > "
            "%d B bound — falling back to hash-partitioned join",
            estimate_bytes, tbl.nbytes, broadcast_bytes * _ACTUAL_SLACK)
        return None
    return tbl.combine_chunks()


def adaptive_join(probe, build, *, on: str, right_on: str | None = None,
                  join_type: str = "inner",
                  broadcast_bytes: int = BROADCAST_BYTES_DEFAULT,
                  build_bytes_hint: int | None = None,
                  num_partitions: int = 8):
    """``probe ⋈ build`` with stats-based strategy selection.

    Parameters
    ----------
    on / right_on : join key column on probe / build (default: same).
    join_type : ``"inner"`` or ``"left_anti"`` (probe rows with no match).
    broadcast_bytes : build sides estimated under this go shuffle-free.
    build_bytes_hint : byte estimate for the build side; pass the
        pre-filter ``read_parquet(...).size_bytes()`` so derived plans
        are not executed twice. ``None`` falls back to
        ``build.size_bytes()`` (which executes derived plans).
    num_partitions : hash-path shuffle width.
    """
    right_on = right_on or on
    if join_type not in ("inner", "left_anti"):
        raise ValueError(f"unsupported join_type: {join_type}")

    tbl = _materialize_build(build, broadcast_bytes, build_bytes_hint)
    if tbl is None:
        return probe.join(build, join_type=join_type,
                          num_partitions=num_partitions,
                          on=(on,), right_on=(right_on,))

    import ray
    ref = ray.put(tbl)
    pa_type = "inner" if join_type == "inner" else "left anti"

    def _probe_join(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)            # zero-copy plasma read, once per call
        return batch.join(b, keys=[on], right_keys=[right_on],
                          join_type=pa_type)

    return probe.map_batches(_probe_join, batch_format="pyarrow")
