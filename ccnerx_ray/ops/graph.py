"""Iterative graph algorithms over an edge Dataset: degree counts and an
EXACT integer PageRank.

KG pipelines need graph centrality over the entity/mention graph (which
entities are load-bearing, which aliases are hubs). The classic blocker
for oracle-checking PageRank is float drift: distributed float sums are
association-order sensitive, so a shuffle-order change flips low bits
and breaks value-hash comparison. This implementation defines PageRank
in INTEGER micro-units with floor division:

    PR_0(v)      = 1_000_000
    contrib(u→v) = PR_k(u) // degree(u)
    PR_{k+1}(v)  = 150_000 + (17 * Σ contrib) // 20     # 0.85 == 17/20

Every operation is an integer sum (order-free) or a floor division, so
the result is bit-identical regardless of partitioning AND expressible
in SQL (unrolled iterations) — the DuckDB oracle checks the full fixed-
iteration computation exactly. ``17*S//20 == 850000*S//1000000`` since
the fractions are equal, and keeps the intermediate within int64 even
for hub nodes holding a large share of total mass (bound documented in
:func:`pagerank_int`).

Distributed shape: edges stay a Dataset throughout; each iteration is
one stats-adaptive join (node table broadcast while it fits, hash-
partitioned when it does not) plus one mergeable grouped sum. Nothing
node- or edge-scale ever lands on the driver.

No reference counterpart; first-class KG-analytics operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ccnerx_ray.functions.grouping import grouped_reduce
from ccnerx_ray.ops.join import adaptive_join


def encode_pair_key(x, y) -> pa.Array:
    """Collision-free string key for a node pair, vectorized: each
    component is LENGTH-PREFIXED (``len(x) ':' x ':' len(y) ':' y``), so
    delimiter characters inside string node ids cannot alias two
    different pairs (ADVICE r4: a bare ``x|y`` concat maps both
    ``('a|b','c')`` and ``('a','b|c')`` to ``'a|b|c'`` — an anti-join on
    that key can wrongly drop a genuine pair). Decoding is unique: the
    digits before the first ``':'`` fix ``len(x)``, which fixes every
    later boundary. Integer ids are cast to their decimal strings first
    (injective). Callers that need an UNORDERED key must min/max the
    components before calling."""
    import pyarrow.compute as pc
    if not isinstance(x, (pa.Array, pa.ChunkedArray)):
        x = pa.array(x)
    if not isinstance(y, (pa.Array, pa.ChunkedArray)):
        y = pa.array(y)
    xs = pc.cast(x, pa.string())
    ys = pc.cast(y, pa.string())
    lx = pc.cast(pc.utf8_length(xs), pa.string())
    ly = pc.cast(pc.utf8_length(ys), pa.string())
    return pc.binary_join_element_wise(lx, xs, ly, ys, ":")


def symmetrize(edges, src_col: str = "u", dst_col: str = "v"):
    """Undirected view of a directed edge list: each (u, v) also emitted
    as (v, u). Input must be duplicate-free if degree semantics require
    it (dedup upstream — e.g. ``grouped_reduce`` on both columns)."""

    def both(batch: pa.Table) -> pa.Table:
        u = batch.column(src_col)
        v = batch.column(dst_col)
        return pa.concat_tables([pa.table({src_col: u, dst_col: v}),
                                 pa.table({src_col: v, dst_col: u})])

    return edges.map_batches(both, batch_format="pyarrow")


def degree_counts(edges, src_col: str = "u", num_buckets: int = 256,
                  node_dtype: str | None = None):
    """Out-degree per source node of an edge Dataset (for an undirected
    graph, pass the symmetrized edges): ``(node, degree)``.

    ``node_dtype`` pins the empty-block schema; when ``None`` it is
    DERIVED from the edge column's Arrow type (an int-keyed edge list
    with a hard-coded 'string' here would emit a string-typed empty
    block from an empty shuffle bucket and poison downstream schema
    unification — the exact failure out_dtypes exists to prevent)."""
    if node_dtype is None:
        sch = edges.schema()
        t = dict(zip(sch.names, sch.types)).get(src_col)
        node_dtype = ("int64" if t is not None and pa.types.is_integer(t)
                      else "string")

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column(src_col),
            "degree": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    return grouped_reduce(edges.map_batches(ones, batch_format="pyarrow"),
                          ["node"], {"degree": "sum"},
                          num_buckets=num_buckets,
                          out_dtypes={"node": node_dtype, "degree": "int64"},
                          pre_combine=True)


def pagerank_int(edges, iterations: int = 3, src_col: str = "u",
                 dst_col: str = "v", num_buckets: int = 256):
    """Exact integer PageRank over an undirected edge list (see module
    docstring for the arithmetic). ``edges`` must be duplicate-free
    directed pairs; they are symmetrized here, so every node has
    degree ≥ 1 and receives mass every round (no dangling-mass term).

    Returns ``(node, degree, pr_micro)``.

    Overflow bound: ``17 * S_v`` must fit int64, i.e. a single node may
    receive up to ~5×10¹⁷ micro-units of inbound mass — total graph
    mass is ``n_nodes × 1e6``, so this holds up to ~5×10¹¹ nodes even
    if ONE hub absorbed the entire graph's mass."""
    sym = symmetrize(edges, src_col, dst_col).materialize()
    sch = sym.schema()
    t = dict(zip(sch.names, sch.types)).get(src_col)
    node_dtype = ("int64" if t is not None and pa.types.is_integer(t)
                  else "string")
    # shuffle width from the DATA, not the constant: every iteration
    # pays a reduce and two joins, and 256 partitions on a node-scale
    # table is a task launch per empty bucket, three times per round
    # (cf. the connected_components sizing)
    num_buckets = int(min(max((sym.size_bytes() or 0) // (64 << 20), 8),
                          num_buckets))
    if sym.num_blocks() > 4 * num_buckets:
        # probe side of every iteration's join — coalesce tiny blocks once
        sym = sym.repartition(num_buckets).materialize()
    # materialized once: reused as the probe side of every iteration's
    # rank update (a lazy deg would re-run its groupby per iteration)
    deg = degree_counts(sym, src_col, num_buckets=num_buckets,
                        node_dtype=node_dtype).materialize()

    # attach the (static) source degree to the edges ONCE: the rank loop
    # then joins only the (node, pr) table per iteration, and — because
    # symmetrize guarantees degree ≥ 1, so every node receives mass every
    # round and `sums` covers ALL nodes — the new ranks apply directly to
    # the reduce output with NO deg re-join per iteration. One-time cost:
    # the edge table materializes ~1.33× wider; amortized over the
    # iterations it removes a join barrier each round.
    sym_deg = adaptive_join(sym, deg, on=src_col, right_on="node",
                            build_bytes_hint=deg.size_bytes()).materialize()

    def init_pr(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node"),
            "pr": pa.array(np.full(batch.num_rows, 1_000_000,
                                   dtype=np.int64)),
        })

    nodes = deg.map_batches(init_pr, batch_format="pyarrow")

    for _ in range(iterations):
        nodes = nodes.materialize()     # reused by join + next round
        joined = adaptive_join(sym_deg, nodes, on=src_col,
                               right_on="node",
                               build_bytes_hint=nodes.size_bytes())

        def contrib(batch: pa.Table) -> pa.Table:
            pr = batch.column("pr").to_numpy()
            d = batch.column("degree").to_numpy()
            return pa.table({
                "node": batch.column(dst_col),
                "s": pa.array(pr // d, pa.int64()),
            })

        def apply_rank(batch: pa.Table) -> pa.Table:
            s = batch.column("s").to_numpy()
            return pa.table({
                "node": batch.column("node"),
                "pr": pa.array(150_000 + (17 * s) // 20, pa.int64()),
            })

        # pre_combine: integer sums are associative, so combining per-batch
        # partials is exact — the shuffle carries ~distinct-nodes-per-batch
        # rows instead of one row PER EDGE per iteration.
        nodes = grouped_reduce(
            joined.map_batches(contrib, batch_format="pyarrow"),
            ["node"], {"s": "sum"}, num_buckets=num_buckets,
            out_dtypes={"node": node_dtype, "s": "int64"},
            pre_combine=True).map_batches(apply_rank,
                                          batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node"),
            "degree": batch.column("degree"),
            "pr_micro": batch.column("pr"),
        })

    # degree re-attaches ONCE at the end for the output schema
    nodes = nodes.materialize()
    return adaptive_join(deg, nodes, on="node",
                         build_bytes_hint=nodes.size_bytes()
                         ).map_batches(finish, batch_format="pyarrow")


def connected_components(edges, src_col: str = "u", dst_col: str = "v",
                         num_buckets: int = 256, max_rounds: int = 50,
                         frontier_node_ratio: int = 50,
                         local_contract: bool = True,
                         fold_block_bytes: int = 64 << 20):
    """Exact connected components: ``(node, component)`` where component
    is the MINIMUM node id (codepoint order for string ids — identical in
    numpy object-min and DuckDB binary collation) reachable from the node.

    Min-label propagation with POINTER JUMPING: each round every node's
    label becomes ``min(lbl(node), min_nb lbl(nb), lbl(lbl(node)))``. The
    pointer term is the path-doubling step — without it the round count
    is the graph diameter (adversarial at 100-TB scale: a path graph of
    n nodes needs n rounds); with it, label chains halve every round, so
    convergence is O(log n) rounds on any topology. Each round is ONE
    (real ∪ pointer)-edge ⋈ labels adaptive join and one mergeable
    grouped min — the pointer term rides the same join as the real edges
    because lbl(lbl(node)) is just propagation over the pointer edge
    (lbl(node) → node), a free map of the label table. An exact
    node-scale convergence check runs EVERY round (it rides the reduce
    via a min-aggregated ``old`` sentinel, so it costs one scan of the
    already-materialized node table) — nothing graph-scale touches the
    driver, and iteration stops at the TRUE fixpoint (required for
    oracle hash-exactness), not a fixed count.

    Per-round fixed cost (each join/reduce is a full streaming-executor
    run) dominates at small scale, so: the init reduce already PERFORMS
    round 1 (label = min(node, neighbors)); and the shuffle width
    derives from the edge bytes instead of a constant.

    The label table's block count is PINNED by a coalescing repartition
    each round: ``map_groups`` emits roughly one block per input block,
    and the round's union feeds ~2× the label blocks back in, so without
    the pin blocks double every round (measured: 17→51→119→255→527→1071
    at sf0.001) and per-block task overhead swamps the executor."""
    import pyarrow.compute as pc

    # the contraction path needs NO symmetrize pass: star_block
    # min-scatters across both endpoint directions itself and its output
    # star edges are emitted in both directions, so raw directed (even
    # duplicate-carrying — min is idempotent) edges feed it as-is
    sym = (edges if local_contract
           else symmetrize(edges, src_col, dst_col)).materialize()
    sch = sym.schema()
    t = dict(zip(sch.names, sch.types)).get(src_col)
    node_dtype = ("int64" if t is not None and pa.types.is_integer(t)
                  else "string")
    dt = {"node": node_dtype, "lbl": node_dtype}
    sym_bytes = sym.size_bytes() or 0
    buckets = int(min(max(sym_bytes // (64 << 20), 8), num_buckets))
    if sym.num_blocks() > 4 * buckets:
        # the edge table is scanned EVERY round as the probe side; an
        # upstream dedup/read can leave it in dozens of tiny blocks and
        # every round pays a task launch per block — coalesce once
        sym = sym.repartition(buckets).materialize()

    if local_contract:
        # BLOCK-LOCAL CONTRACTION preamble: each edge block collapses its
        # own subgraph to a STAR FOREST (node → minimum node id of its
        # block-local component) by in-memory vectorized min-label +
        # pointer-deref iteration over LOCAL integer indices. Replacing a
        # block's edges with its star edges preserves connectivity
        # exactly (two nodes joined inside the block both point at the
        # same local root; nodes shared across blocks bridge them), so
        # the min-reachable-id fixpoint — and the oracle — is unchanged.
        # What it buys: the distributed rounds below are bounded by
        # neighbor-HOOK depth, and all intra-block hook depth is gone
        # before round 1, so the loop only stitches ACROSS blocks
        # (measured sf0.1: 22 rounds → 4); the per-round probe table
        # also shrinks from edge-scale to ≤ 2·block-node-scale. Local
        # index space keeps the kernel integer even for string ids —
        # np.unique's sort order == DuckDB binary collation, so the
        # smallest local index IS the smallest node id.
        def star_block(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            u = batch.column(src_col).to_numpy(zero_copy_only=False)
            v = batch.column(dst_col).to_numpy(zero_copy_only=False)
            nodes, inv = np.unique(np.concatenate([u, v]),
                                   return_inverse=True)
            iu, iv = inv[:len(u)], inv[len(u):]
            lbl = np.arange(len(nodes), dtype=np.int64)
            while True:
                m = lbl.copy()
                np.minimum.at(m, iu, lbl[iv])
                np.minimum.at(m, iv, lbl[iu])
                m = np.minimum(m, m[m])
                if np.array_equal(m, lbl):
                    break
                lbl = m
            keep = lbl != np.arange(len(nodes))
            a, b = nodes[keep], nodes[lbl[keep]]
            # every ROOT keeps a self-loop row: a node whose only edges
            # were self-loops (singleton component) must still reach the
            # init reduce, and ≤ one row per local component is free
            r = nodes[~keep]
            ty = batch.schema.field(src_col).type
            return pa.table({
                src_col: pa.array(np.concatenate([a, b, r]), ty),
                dst_col: pa.array(np.concatenate([b, a, r]), ty)})

        # batch_size=None hands star_block WHOLE blocks — the default
        # 1024-row batches would contract per-sliver and buy nothing
        sym = (sym.map_batches(star_block, batch_format="pyarrow",
                               batch_size=None)
                  .materialize())
        # RECURSIVE FOLD: one per-block pass contracts little when the
        # upstream dedup hash-scattered the edges (measured sf0.1: still
        # 22 rounds — block subgraphs are near-forests of size-2 pieces).
        # So fold the star forests 8-way and re-contract, level by level;
        # each level is ONE shrinking pass (star rows ≤ 2·nodes) and the
        # moment the remainder fits a single 64 MiB block it collapses
        # entirely in-memory — the iterative loop below then just
        # CONFIRMS the fixpoint (init reduce + one zero-changed round).
        # Levels are log8(blocks) at worst; a remainder too big for one
        # block after folding stops shrinking breaks to the pointer
        # rounds, so the 100-TB path is unchanged in the limit.
        one_block = fold_block_bytes
        while sym.num_blocks() > 1:
            if (sym.size_bytes() or 0) <= one_block:
                nxt = 1
            elif sym.num_blocks() >= 16:
                nxt = sym.num_blocks() // 8
            else:
                break
            sym = (sym.repartition(nxt)
                      .map_batches(star_block, batch_format="pyarrow",
                                   batch_size=None)
                      .materialize())
            if nxt == 1:
                break

    # init ≡ round 1: label(v) = min(v, min neighbor) in ONE reduce —
    # grouping the symmetrized edges by src with a min over dst visits
    # every (node, neighbor) pair, and the elementwise min folds the
    # node's own id in afterwards (cheaper than unioning self-rows)
    def edge_pairs(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column(src_col),
                         "lbl": batch.column(dst_col)})

    def fold_self(batch: pa.Table) -> pa.Table:
        # ``old`` = the label BEFORE this round; before init every node's
        # label is implicitly its own id, so init emits old = node — the
        # uniform "changed ⇔ lbl != old" contract every later round uses
        return pa.table({
            "node": batch.column("node"),
            "lbl": pc.min_element_wise(batch.column("node"),
                                       batch.column("lbl")),
            "old": batch.column("node"),
        })

    labels = (grouped_reduce(
        sym.map_batches(edge_pairs, batch_format="pyarrow"),
        ["node"], {"lbl": "min"}, num_buckets=buckets,
        out_dtypes=dt, pre_combine=True)
        .map_batches(fold_self, batch_format="pyarrow")
        .repartition(buckets).materialize())

    def ptr_edges(batch: pa.Table) -> pa.Table:
        # lbl(lbl(node)) as GRAPH PROPAGATION: the pointer edge
        # (lbl(node) → node) forwards lbl(lbl(node)) to node through the
        # same neighbor-min join as the real edges — so the path-doubling
        # term costs ZERO extra joins or executor runs per round
        return pa.table({src_col: batch.column("lbl"),
                         dst_col: batch.column("node")})

    # The convergence check rides THROUGH the reduce: each node's self
    # row carries its previous label in an extra min-aggregated column
    # ``old``, and neighbor rows carry the destination's node id as the
    # ``old`` sentinel — valid because labels only ever DECREASE from the
    # node id, so min(old sentinel rows ∪ self row) is exactly the
    # previous label. Changed-count is then one cheap scan of the
    # materialized node table (no join, no second build materialization),
    # so the exact check runs EVERY round and stops at the earliest
    # fixpoint — still no hash shortcut.
    dt3 = dict(dt, old=node_dtype)

    def self_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "lbl": batch.column("lbl"),
                         "old": batch.column("lbl")})

    def active_rows(batch: pa.Table) -> pa.Table:
        # ACTIVE SET (VERDICT r3 #4): only nodes whose label DECREASED
        # last round can teach a neighbor anything new — an unchanged
        # source's lbl was already folded into every destination on the
        # round it last changed, and min is idempotent. Joining the edge
        # table against just these rows keeps the fixpoint exact while
        # late rounds (most labels stable, chains still halving) shrink
        # from graph-scale to frontier-scale; as the frontier collapses
        # the build side drops under the broadcast bound and the round
        # becomes a shuffle-free map over the edge table.
        t = batch.filter(pc.invert(pc.equal(batch.column("lbl"),
                                            batch.column("old"))))
        return pa.table({"node": t.column("node"), "lbl": t.column("lbl")})

    from ccnerx_ray.state import metrics

    def nb_lbl(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column(dst_col),
                         "lbl": batch.column("lbl"),
                         "old": batch.column(dst_col)})

    def req_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"v": batch.column("node"),
                         "ptr": batch.column("lbl")})

    def deref_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("v"),
                         "lbl": batch.column("lbl"),
                         "old": batch.column("v")})

    def changed_flags(batch: pa.Table) -> pa.Table:
        return pa.table({"c": pc.cast(
            pc.invert(pc.equal(batch.column("lbl"), batch.column("old"))),
            pa.int64())})

    def count_changed(key: str):
        # the changed count rides the SAME executor run that builds the
        # round's label table, as a fire-and-forget metrics increment per
        # block — a HINT, never arithmetic: the counter is documented
        # best-effort (task retries over-count, in-flight sends
        # under-count). Over-counts only buy a harmless idempotent extra
        # round; a zero reading is CONFIRMED by an exact aggregation run
        # before the loop may exit, so the fixpoint stays exact while
        # every non-final round costs ONE executor run instead of two.
        def fn(batch: pa.Table) -> pa.Table:
            n = pc.sum(pc.cast(
                pc.invert(pc.equal(batch.column("lbl"),
                                   batch.column("old"))),
                pa.int64())).as_py() or 0
            metrics.incr(key, int(n))
            return batch
        return fn

    import uuid
    nonce = uuid.uuid4().hex[:8]
    # init counts as round 1 and changed by definition (labels start as
    # the node ids); seed the hint with the node count once known
    changed_hint: int | None = None

    for rnd in range(max_rounds):
        n_nodes = labels.count()          # metadata on a materialized table
        if changed_hint is None:
            changed_hint = n_nodes
        row_bytes = max(1, (labels.size_bytes() or 1) // max(1, n_nodes))
        # frontier mode pays an extra executor run (the scan that FINDS
        # the frontier) plus two broadcast joins; that only beats a wide
        # round when the frontier is a small FRACTION of the graph (the
        # wide round's reduce input shrinks from edge-scale to
        # frontier-scale) — and it must fit the broadcast bound at all
        frontier_small = ((changed_hint * row_bytes) < (16 << 20)
                          and changed_hint * frontier_node_ratio < n_nodes)

        if frontier_small:
            # FRONTIER ROUNDS (VERDICT r3 #4): only nodes whose label
            # DECREASED last round can teach anyone anything new — an
            # unchanged source's label was folded into every destination
            # the round it last changed, and min is idempotent. The
            # frontier is small enough to broadcast, so both joins below
            # go shuffle-free: (1) real ∪ pointer edges probe the
            # broadcast frontier (only frontier-sourced propagation rows
            # survive the inner join); (2) frontier nodes DEREFERENCE
            # their freshly acquired pointee against the label table —
            # without this second half of the doubling term, stale labels
            # crawl through lagged cascades (measured: 22 → 32 rounds at
            # sf0.1 with the deref dropped).
            active = labels.map_batches(active_rows,
                                        batch_format="pyarrow").materialize()
            joined = adaptive_join(
                sym.union(labels.map_batches(ptr_edges,
                                             batch_format="pyarrow")),
                active, on=src_col, right_on="node",
                build_bytes_hint=active.size_bytes())
            deref = adaptive_join(
                labels, active.map_batches(req_rows, batch_format="pyarrow"),
                on="node", right_on="ptr",
                build_bytes_hint=active.size_bytes())
            prop = joined.map_batches(nb_lbl, batch_format="pyarrow").union(
                deref.map_batches(deref_rows, batch_format="pyarrow"))
        else:
            # WIDE ROUNDS: the frontier is still graph-scale, so the
            # active filter buys nothing — join every (real ∪ pointer)
            # edge against the full label table (the full pointer term
            # needs no deref: build side has every pointee)
            # (A chained second jump — deref the pointer edges once more
            # inside the same run for 4× chain contraction — was tried
            # and measured round count 22 → 21 only: the round count here
            # is bounded by neighbor-HOOK depth, not chain length, and
            # the extra broadcast build cost a net +25% wall. Removed.)
            joined = adaptive_join(
                sym.union(labels.map_batches(ptr_edges,
                                             batch_format="pyarrow")),
                labels, on=src_col, right_on="node",
                build_bytes_hint=labels.size_bytes())
            prop = joined.map_batches(nb_lbl, batch_format="pyarrow")

        key = f"cc_changed_{nonce}_{rnd}"
        labels = grouped_reduce(
            labels.map_batches(self_rows, batch_format="pyarrow").union(prop),
            ["node"], {"lbl": "min", "old": "min"}, num_buckets=buckets,
            out_dtypes=dt3, pre_combine=True
        ).map_batches(count_changed(key), batch_format="pyarrow") \
         .repartition(buckets).materialize()

        changed_hint = metrics.snapshot().get(key, 0)
        changed = changed_hint
        if not changed_hint:
            # exact confirmation — the only second run a round ever pays,
            # and only the (rare) rounds whose hint reads zero
            changed = labels.map_batches(changed_flags,
                                         batch_format="pyarrow").sum("c")
            changed_hint = int(changed or 0)
            if not changed:
                break
    else:
        # max_rounds exhausted without reaching the fixpoint — count it
        # rather than silently emitting partial components (pointer
        # jumping converges in O(log n) rounds, so this fires only with
        # a deliberately tiny max_rounds)
        from ccnerx_ray.state import metrics
        metrics.incr("components_unconverged_labels", int(changed or 0))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "component": batch.column("lbl")})

    return labels.map_batches(finalize, batch_format="pyarrow")


def components_oracle_sql(edge_sql: str, rounds: int = 28) -> str:
    """DuckDB oracle for :func:`connected_components`: the SAME
    pointer-jumping min-label rounds, UNROLLED as CTEs (a recursive-CTE
    reachability closure enumerates every (node, reachable-id) pair —
    quadratic in component size, unusable once a giant component forms;
    this stays linear per round). ``edge_sql`` must yield duplicate-free
    directed columns ``u, v``.

    ``rounds`` bounds the solvable topology: min-label + ONE pointer
    hop per round grows a label's reach by considerably less than the
    2**rounds a pure pointer-chase would suggest (the min still has to
    TRAVEL along edges at neighbor speed before chains exist to jump) —
    measured on the sf0.1 co-purchase graph, the deep giant component
    needs 22 rounds, where the old default of 14 under-converged and
    left 6 label groups unmerged (caught by the sf0.1 sweep, exactly
    the loud-fail contract: a too-small ``rounds`` FAILS as a value
    mismatch against the true-fixpoint Ray side, never silently
    passes). 28 keeps headroom at every swept scale; the Ray side
    always runs to its exact convergence check, so only the ORACLE's
    depth is ever in question."""
    # AS MATERIALIZED is load-bearing: each round references the previous
    # CTE three times, and DuckDB inlines plain CTEs — the plan tree would
    # grow 3**rounds without it (measured: fd exhaustion at rounds=14)
    parts = [f"base AS MATERIALIZED ({edge_sql})",
             "edges AS MATERIALIZED (SELECT u, v FROM base "
             "UNION SELECT v AS u, u AS v FROM base)",
             "l0 AS MATERIALIZED (SELECT u AS node, min(least(u, v)) AS lbl "
             "FROM edges GROUP BY u)"]
    for k in range(rounds):
        parts.append(f"""
l{k + 1} AS MATERIALIZED (
  SELECT node, min(lbl) AS lbl FROM (
    SELECT node, lbl FROM l{k}
    UNION ALL
    SELECT e.v AS node, l.lbl FROM l{k} l JOIN edges e ON e.u = l.node
    UNION ALL
    SELECT l.node, t.lbl FROM l{k} l JOIN l{k} t ON t.node = l.lbl
  ) GROUP BY node
)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, lbl AS component FROM l{rounds}")


def pagerank_oracle_sql(edge_sql: str, iterations: int = 3) -> str:
    """DuckDB oracle for :func:`pagerank_int`: ``edge_sql`` must yield
    duplicate-free directed columns ``u, v``; iterations unroll into
    chained CTEs performing the identical integer arithmetic."""
    parts = [f"""
WITH e0 AS ({edge_sql}),
e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
        FROM e GROUP BY u),
p0 AS (SELECT node, degree, CAST(1000000 AS BIGINT) AS pr FROM deg)"""]
    for k in range(1, iterations + 1):
        parts.append(f""",
s{k} AS (SELECT e.v AS node, SUM(p.pr // p.degree) AS s
         FROM e JOIN p{k - 1} p ON e.u = p.node GROUP BY e.v),
p{k} AS (SELECT d.node, d.degree,
                CAST(150000 + (17 * s{k}.s) // 20 AS BIGINT) AS pr
         FROM deg d JOIN s{k} ON d.node = s{k}.node)""")
    parts.append(f"""
SELECT node, degree, pr AS pr_micro FROM p{iterations}""")
    return "".join(parts)


def triangle_count(edges, src_col: str = "u", dst_col: str = "v",
                   num_buckets: int = 64) -> int:
    """EXACT triangle count of an undirected graph given as canonical
    edges (``u < v``; no self-loops). DUPLICATE edges are tolerated — no
    upstream dedup shuffle is needed: degrees computed on the multigraph
    are still a deterministic node→rank function (orientation stays a
    consistent total order; the O(√m) out-degree bound degrades only by
    the duplicate multiplicity), each node's wedge adjacency dedupes
    in-memory via ``np.unique``, and the closing-edge semi-join is
    presence-based.

    Degree-ordered node-iterator (the MapReduce-classic from Suri &
    Vassilvitskii's "Counting Triangles and the Curse of the Last
    Reducer"): orient every edge from its lower-(degree, id) endpoint to
    the higher, emit each node's out-neighbor PAIRS (wedges), and count
    wedges whose closing edge exists. Each triangle is counted exactly
    once — at its lowest-ranked vertex. The orientation bounds out-degree
    by O(sqrt(m)) — total wedges O(m^1.5) worst case — which is the
    difference between this and the naive adjacency blow-up on hub nodes
    (a giant monorepo supplier would otherwise emit deg² wedges).

    Distributed shape: one node-scale degree reduce, two edge⋈degree
    adaptive joins, one grouped wedge emit, one wedge⋈edge hash semi-join
    (`semi_join_on`, fact-scale safe on both sides), one count. The
    count is a scalar summary — the only thing that reaches the driver."""
    import pandas as pd

    from ccnerx_ray.functions.grouping import semi_join_on

    # the edge table is consumed three times (degree count, orientation
    # join probe, closing-edge key scan); coalesce upstream tiny blocks
    # once and size the shuffles from the data, as connected_components does
    edges = edges.materialize()
    ebytes = edges.size_bytes() or 0
    num_buckets = int(min(max(ebytes // (64 << 20), 8), num_buckets))
    if edges.num_blocks() > 4 * num_buckets:
        edges = edges.repartition(num_buckets).materialize()
    sym = symmetrize(edges, src_col, dst_col)
    deg = degree_counts(sym, src_col, num_buckets=num_buckets).materialize()
    dbytes = deg.size_bytes()

    # rank = (degree, id): attach both endpoint degrees, orient low → high
    e1 = adaptive_join(edges, deg, on=src_col, right_on="node",
                       build_bytes_hint=dbytes)

    def tag_u(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch.column(src_col),
                         "b": batch.column(dst_col),
                         "deg_a": batch.column("degree")})

    e2 = adaptive_join(e1.map_batches(tag_u, batch_format="pyarrow"),
                       deg, on="b", right_on="node",
                       build_bytes_hint=dbytes)

    def orient(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        a, b = batch.column("a"), batch.column("b")
        da, db = batch.column("deg_a"), batch.column("degree")
        # swap ⇔ rank(b) < rank(a) under the (degree, id) total order
        swap = pc.or_(pc.less(db, da),
                      pc.and_(pc.equal(db, da), pc.less(b, a)))
        return pa.table({"src": pc.if_else(swap, b, a),
                         "dst": pc.if_else(swap, a, b)})

    oriented = e2.map_batches(orient, batch_format="pyarrow")

    def _pk(x, y) -> pa.Array:
        # canonical length-prefixed pair key, vectorized (arrow kernels).
        # The string-order min/max is applied identically on the wedge and
        # edge sides, so the key is a consistent unordered-pair identity
        # even where string order differs from id order; the length
        # prefix keeps it collision-free for ids containing delimiters.
        import pyarrow.compute as pc
        xs = pc.cast(pa.array(x) if not isinstance(x, (pa.Array,
                     pa.ChunkedArray)) else x, pa.string())
        ys = pc.cast(pa.array(y) if not isinstance(y, (pa.Array,
                     pa.ChunkedArray)) else y, pa.string())
        lo = pc.min_element_wise(xs, ys)
        hi = pc.max_element_wise(xs, ys)
        return encode_pair_key(lo, hi)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        xs, ys = [], []
        for _, grp in g.groupby("src", sort=False):
            # unique == sort + dedupe: duplicate input edges collapse here
            ns = np.unique(grp["dst"].to_numpy())
            k = len(ns)
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            xs.append(ns[iu[0]]); ys.append(ns[iu[1]])
        if not xs:
            return pd.DataFrame({"pk": pd.Series(dtype="string")})
        return pd.DataFrame({"pk": _pk(np.concatenate(xs),
                                       np.concatenate(ys)).to_pandas()})

    def edge_pk(batch: pa.Table) -> pa.Table:
        return pa.table({"pk": _pk(batch.column(src_col),
                                   batch.column(dst_col))})

    from ccnerx_ray.functions.grouping import coarse_grouped
    wedge_ds = coarse_grouped(oriented, ["src"], wedges,
                              num_buckets=num_buckets,
                              out_dtypes={"pk": "string"})

    closed = semi_join_on(
        wedge_ds, "pk",
        edges.map_batches(edge_pk, batch_format="pyarrow"),
        num_buckets=num_buckets, out_dtypes={"pk": "string"})
    return int(closed.count())


def two_hop_counts(edges, src_col: str = "u", dst_col: str = "v",
                   num_buckets: int = 64, max_degree: int | None = None):
    """Per-entity 1-hop and EXACTLY-2-hop neighborhood sizes over an
    undirected graph given as canonical (``u < v``) edges — the
    neighborhood query a KG serves after triples materialize ("what
    co-occurs with what, directly and through one intermediate?").
    Duplicate edges are tolerated (deduped here — the counts are
    DISTINCT-neighbor semantics). Returns ``(entity, n_neighbors,
    n_two_hop)`` with one row per entity that has at least one edge;
    ``n_two_hop`` counts entities at distance exactly 2 (reachable via
    a shared middle, not adjacent, not self).

    Distributed shape: dedup → symmetrize; wedge enumeration groups by
    the MIDDLE node (like :func:`triangle_count`'s adjacency stage) and
    emits each middle's distinct neighbor pairs; a global pair dedup
    plus an anti-join against the direct edges leaves the exact
    distance-2 pair set, which explodes to 2 rows/pair into the same
    per-entity reduce that carries the 1-hop counts. Skew note: wedge
    volume is Σ deg(m)² over middles — for EXACT 2-hop counts that is
    the size of the answer itself (a hub's 2-hop set IS quadratic).
    ``max_degree`` (default None = exact) bounds the per-middle wedge
    memory on hub-heavy graphs: a middle keeps only its ``max_degree``
    smallest neighbors as wedge sources, every truncated neighbor row
    is counted into the ``two_hop_wedges_truncated`` run metric (the
    ``max_bucket`` contract — approximation is explicit, never
    silent), and the result becomes a LOWER bound on n_two_hop."""
    from ccnerx_ray.functions.grouping import (coarse_grouped,
                                               drop_duplicate_rows,
                                               grouped_reduce)
    from ccnerx_ray.ops.join import adaptive_join

    edges_in = edges
    edges = drop_duplicate_rows(
        edges, [src_col, dst_col],
        num_buckets=num_buckets).materialize()
    sch = edges.schema()
    if sch is None:       # no edges at all ⇒ no entities with neighbors
        import ray.data
        # derive the empty-frame entity dtype from the INPUT edge column
        # (ADVICE r4: a hard-coded string here gives an int-keyed empty
        # graph a different schema than its non-empty runs); re-executing
        # the input plan is cheap — it is provably empty
        try:
            in_sch = edges_in.schema()
        except Exception:  # noqa: BLE001 — schema probing is best-effort
            in_sch = None
        in_t = (dict(zip(in_sch.names, in_sch.types)).get(src_col)
                if in_sch is not None else None)
        ent_type = (pa.int64() if isinstance(in_t, pa.DataType)
                    and pa.types.is_integer(in_t) else pa.string())
        return ray.data.from_arrow(pa.table({
            "entity": pa.array([], ent_type),
            "n_neighbors": pa.array([], pa.int64()),
            "n_two_hop": pa.array([], pa.int64())}))
    t = dict(zip(sch.names, sch.types)).get(src_col)
    # the dedup stage may leave pandas-typed blocks: schema types can be
    # numpy dtypes (or `object` for strings) instead of pyarrow types
    if isinstance(t, pa.DataType):
        node_dtype = "int64" if pa.types.is_integer(t) else "string"
    else:
        try:
            node_dtype = ("int64" if t is not None
                          and np.issubdtype(t, np.integer) else "string")
        except TypeError:
            node_dtype = "string"
    ebytes = edges.size_bytes() or 0
    width = int(min(max(ebytes // (64 << 20), 8), num_buckets))
    sym = symmetrize(edges, src_col, dst_col)

    out_d = {"entity": node_dtype, "n_neighbors": "int64",
             "n_two_hop": "int64"}

    def n1_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "entity": batch.column(src_col),
            "n_neighbors": pa.array(np.ones(n, dtype=np.int64)),
            "n_two_hop": pa.array(np.zeros(n, dtype=np.int64)),
        })

    def _pair_key(x: pa.Array, y: pa.Array) -> pa.Array:
        # both sides are already (lo, hi)-canonical; the length-prefixed
        # encoding keeps the key collision-free for arbitrary string ids
        return encode_pair_key(x, y)

    def wedge_pairs(g) -> "pd.DataFrame":
        import pandas as pd

        from ccnerx_ray.state import metrics
        xs, ys = [], []
        truncated = 0
        for _, grp in g.groupby(src_col, sort=False):
            ns = np.unique(grp[dst_col].to_numpy())
            k = len(ns)
            if max_degree is not None and k > max_degree:
                truncated += k - max_degree
                ns = ns[:max_degree]     # smallest ids — deterministic
                k = max_degree
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            xs.append(ns[iu[0]])
            ys.append(ns[iu[1]])
        if truncated:
            metrics.incr("two_hop_wedges_truncated", truncated)
        if not xs:
            return pd.DataFrame({"x": pd.Series(dtype=(
                "int64" if node_dtype == "int64" else "string")),
                "y": pd.Series(dtype=(
                    "int64" if node_dtype == "int64" else "string"))})
        out_x = np.concatenate(xs)
        # wedge volume into lineage next to the truncation count: a
        # hub-skew run can prove its memory stayed bounded (the planted-
        # hub test pins C(max_degree, 2) for a pure star)
        metrics.incr("two_hop_wedge_pairs", len(out_x))
        return pd.DataFrame({"x": out_x, "y": np.concatenate(ys)})

    cand = drop_duplicate_rows(
        coarse_grouped(sym, [src_col], wedge_pairs, num_buckets=width,
                       out_dtypes={"x": node_dtype, "y": node_dtype}),
        ["x", "y"], num_buckets=width)

    def add_pk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pk", _pair_key(batch.column("x"), batch.column("y")))

    def edge_pk(batch: pa.Table) -> pa.Table:
        return pa.table({"pk": _pair_key(batch.column(src_col),
                                         batch.column(dst_col))})

    h2 = adaptive_join(
        cand.map_batches(add_pk, batch_format="pyarrow"),
        edges.map_batches(edge_pk, batch_format="pyarrow"),
        on="pk", join_type="left_anti",
        build_bytes_hint=ebytes)

    def n2_rows(batch: pa.Table) -> pa.Table:
        x = batch.column("x")
        y = batch.column("y")
        # type passed explicitly: a zero-chunk block would otherwise make
        # chunked_array unable to infer one (ADVICE r4)
        ent = (pa.chunked_array(list(x.chunks) + list(y.chunks),
                                type=x.type)
               if isinstance(x, pa.ChunkedArray)
               else pa.chunked_array([x, y], type=x.type))
        n = len(ent)
        return pa.table({
            "entity": ent,
            "n_neighbors": pa.array(np.zeros(n, dtype=np.int64)),
            "n_two_hop": pa.array(np.ones(n, dtype=np.int64)),
        })

    combined = sym.map_batches(n1_rows, batch_format="pyarrow").union(
        h2.map_batches(n2_rows, batch_format="pyarrow"))
    return grouped_reduce(combined, ["entity"],
                          {"n_neighbors": "sum", "n_two_hop": "sum"},
                          num_buckets=width, out_dtypes=out_d,
                          pre_combine=True)


def triangle_oracle_sql(edge_sql: str) -> str:
    """DuckDB oracle for :func:`triangle_count`: ``edge_sql`` must yield
    duplicate-free id-canonical (u < v) undirected edges; each triangle
    u < v < w is counted once via the three-way self-join."""
    return f"""
WITH e AS ({edge_sql})
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
"""


def ppr_int(edges, seeds, iterations: int = 3, src_col: str = "u",
            dst_col: str = "v", seed_col: str = "entity",
            num_buckets: int = 256):
    """Exact integer PERSONALIZED PageRank: the same order-free
    micro-unit arithmetic as :func:`pagerank_int`, but mass starts at —
    and teleports back to — a seed set ``S`` instead of every node (the
    "what matters around THESE entities?" centrality a KG serves for
    entity-context ranking and local graph exploration):

        PR_0(v)      = 1_000_000 · [v ∈ S]
        contrib(u→v) = PR_k(u) // degree(u)
        PR_{k+1}(v)  = 150_000 · [v ∈ S] + (17 · Σ contrib) // 20

    Returns ``(node, degree, ppr_micro)`` for EVERY node (zeros are
    meaningful: mass hasn't reached it yet). ``seeds`` is a Dataset
    (``seed_col`` column, duplicates tolerated); seeds absent from the
    graph contribute nothing (they have no edges). Same int64 overflow
    bound as :func:`pagerank_int` (total mass is |S|·1e6 ≤ n·1e6).

    Distributed shape: identical to :func:`pagerank_int` — degree
    attached to edges ONCE, per iteration one stats-adaptive join + one
    combiner-backed grouped sum — plus one extra node-scale join per
    iteration to re-attach the seed teleport base (the base table is
    built once from a semi/anti split against the seed set, both sides
    distributed)."""
    sym = symmetrize(edges, src_col, dst_col).materialize()
    sch = sym.schema()
    if sch is None:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "degree": pa.array([], pa.int64()),
            "ppr_micro": pa.array([], pa.int64())}))
    t = dict(zip(sch.names, sch.types)).get(src_col)
    node_dtype = ("int64" if t is not None and pa.types.is_integer(t)
                  else "string")
    num_buckets = int(min(max((sym.size_bytes() or 0) // (64 << 20), 8),
                          num_buckets))
    if sym.num_blocks() > 4 * num_buckets:
        sym = sym.repartition(num_buckets).materialize()
    deg = degree_counts(sym, src_col, num_buckets=num_buckets,
                        node_dtype=node_dtype).materialize()
    sym_deg = adaptive_join(sym, deg, on=src_col, right_on="node",
                            build_bytes_hint=deg.size_bytes()).materialize()

    def seed_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column(seed_col)})

    seed_nodes = seeds.map_batches(seed_rows, batch_format="pyarrow")
    sbytes = None
    try:
        sbytes = seed_nodes.size_bytes()
    except Exception:  # noqa: BLE001 — sizing is best-effort
        pass

    def with_base(b: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch.column("node"),
                "base": pa.array(np.full(batch.num_rows, b,
                                         dtype=np.int64))})
        return fn

    in_s = adaptive_join(deg, seed_nodes, on="node", join_type="left_semi",
                         build_bytes_hint=sbytes)
    out_s = adaptive_join(deg, seed_nodes, on="node", join_type="left_anti",
                          build_bytes_hint=sbytes)
    base_tbl = (in_s.map_batches(with_base(150_000), batch_format="pyarrow")
                .union(out_s.map_batches(with_base(0),
                                         batch_format="pyarrow"))
                ).materialize()
    bbytes = base_tbl.size_bytes()

    def init_pr(batch: pa.Table) -> pa.Table:
        base = batch.column("base").to_numpy()
        return pa.table({
            "node": batch.column("node"),
            # base ∈ {0, 150000} ⇒ pr0 ∈ {0, 1000000}: the seed
            # indicator scaled to one full micro-unit of mass
            "pr": pa.array((base // 150_000) * 1_000_000, pa.int64()),
        })

    nodes = base_tbl.map_batches(init_pr, batch_format="pyarrow")

    for _ in range(iterations):
        nodes = nodes.materialize()
        joined = adaptive_join(sym_deg, nodes, on=src_col,
                               right_on="node",
                               build_bytes_hint=nodes.size_bytes())

        def contrib(batch: pa.Table) -> pa.Table:
            pr = batch.column("pr").to_numpy()
            d = batch.column("degree").to_numpy()
            return pa.table({
                "node": batch.column(dst_col),
                "s": pa.array(pr // d, pa.int64()),
            })

        sums = grouped_reduce(
            joined.map_batches(contrib, batch_format="pyarrow"),
            ["node"], {"s": "sum"}, num_buckets=num_buckets,
            out_dtypes={"node": node_dtype, "s": "int64"},
            pre_combine=True)

        def apply_rank(batch: pa.Table) -> pa.Table:
            s = batch.column("s").to_numpy()
            base = batch.column("base").to_numpy()
            return pa.table({
                "node": batch.column("node"),
                "pr": pa.array(base + (17 * s) // 20, pa.int64()),
            })

        # symmetrize guarantees degree ≥ 1, so `sums` covers ALL nodes
        # (zero contributions still emit rows) — the base re-attach is a
        # node-scale join, never a loss of coverage
        nodes = adaptive_join(sums, base_tbl, on="node",
                              build_bytes_hint=bbytes
                              ).map_batches(apply_rank,
                                            batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node"),
            "degree": batch.column("degree"),
            "ppr_micro": batch.column("pr"),
        })

    nodes = nodes.materialize()
    return adaptive_join(deg, nodes, on="node",
                         build_bytes_hint=nodes.size_bytes()
                         ).map_batches(finish, batch_format="pyarrow")


def ppr_oracle_sql(edge_sql: str, seeds_sql: str,
                   iterations: int = 3) -> str:
    """DuckDB oracle for :func:`ppr_int`: ``edge_sql`` yields
    duplicate-free directed ``u, v``; ``seeds_sql`` yields a ``node``
    column (deduped here); iterations unroll into chained CTEs with the
    identical integer arithmetic."""
    parts = [f"""
WITH e0 AS ({edge_sql}),
e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
        FROM e GROUP BY u),
sd AS (SELECT DISTINCT node FROM ({seeds_sql})),
p0 AS (SELECT d.node, d.degree,
              CAST(CASE WHEN sd.node IS NULL THEN 0
                   ELSE 1000000 END AS BIGINT) AS pr
       FROM deg d LEFT JOIN sd ON d.node = sd.node)"""]
    for k in range(1, iterations + 1):
        parts.append(f""",
s{k} AS (SELECT e.v AS node, SUM(p.pr // p.degree) AS s
         FROM e JOIN p{k - 1} p ON e.u = p.node GROUP BY e.v),
p{k} AS (SELECT d.node, d.degree,
                CAST(CASE WHEN sd.node IS NULL THEN 0
                     ELSE 150000 END + (17 * s{k}.s) // 20
                     AS BIGINT) AS pr
         FROM deg d LEFT JOIN sd ON d.node = sd.node
         JOIN s{k} ON d.node = s{k}.node)""")
    parts.append(f"""
SELECT node, degree, pr AS ppr_micro FROM p{iterations}""")
    return "".join(parts)


def node_triangle_counts(edges, src_col: str = "u", dst_col: str = "v",
                         num_buckets: int = 64):
    """Per-node triangle participation over an undirected graph given
    as canonical (``u < v``) edges: ``(entity, degree, n_triangles)``
    for every node with at least one edge — the exact-integer
    numerator/denominator of the local clustering coefficient
    (``2T / (d·(d−1))``; the division is left to the consumer so the
    result stays float-free and value-hashable). Duplicate edges are
    tolerated (deduped here — DISTINCT-neighbor semantics).

    Distributed shape: the degree-ordered wedge enumeration of
    :func:`triangle_count` (each triangle's wedges emitted at its
    lowest-(degree, id) corner — O(m^1.5) total wedge volume, hub-safe)
    with the corner identities CARRIED through the closing-edge
    semi-join; each closed wedge then explodes to its three corners
    into one combiner-backed keyed count, and the counts left-join onto
    the degree table (missing ⇒ 0)."""
    import pandas as pd

    from ccnerx_ray.functions.grouping import (coarse_grouped,
                                               drop_duplicate_rows,
                                               semi_join_on)

    edges = drop_duplicate_rows(edges, [src_col, dst_col],
                                num_buckets=num_buckets).materialize()
    sch = edges.schema()
    if sch is None:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "entity": pa.array([], pa.string()),
            "degree": pa.array([], pa.int64()),
            "n_triangles": pa.array([], pa.int64())}))
    t = dict(zip(sch.names, sch.types)).get(src_col)
    if isinstance(t, pa.DataType):
        node_dtype = "int64" if pa.types.is_integer(t) else "string"
    else:
        try:
            node_dtype = ("int64" if t is not None
                          and np.issubdtype(t, np.integer) else "string")
        except TypeError:
            node_dtype = "string"
    ebytes = edges.size_bytes() or 0
    num_buckets = int(min(max(ebytes // (64 << 20), 8), num_buckets))
    sym = symmetrize(edges, src_col, dst_col)
    deg = degree_counts(sym, src_col, num_buckets=num_buckets,
                        node_dtype=node_dtype).materialize()
    dbytes = deg.size_bytes()

    e1 = adaptive_join(edges, deg, on=src_col, right_on="node",
                       build_bytes_hint=dbytes)

    def tag_u(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch.column(src_col),
                         "b": batch.column(dst_col),
                         "deg_a": batch.column("degree")})

    e2 = adaptive_join(e1.map_batches(tag_u, batch_format="pyarrow"),
                       deg, on="b", right_on="node",
                       build_bytes_hint=dbytes)

    def orient(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        a, b = batch.column("a"), batch.column("b")
        da, db = batch.column("deg_a"), batch.column("degree")
        swap = pc.or_(pc.less(db, da),
                      pc.and_(pc.equal(db, da), pc.less(b, a)))
        return pa.table({"src": pc.if_else(swap, b, a),
                         "dst": pc.if_else(swap, a, b)})

    oriented = e2.map_batches(orient, batch_format="pyarrow")

    def _pk(x, y) -> pa.Array:
        import pyarrow.compute as pc
        xs = pc.cast(pa.array(x) if not isinstance(
            x, (pa.Array, pa.ChunkedArray)) else x, pa.string())
        ys = pc.cast(pa.array(y) if not isinstance(
            y, (pa.Array, pa.ChunkedArray)) else y, pa.string())
        lo = pc.min_element_wise(xs, ys)
        hi = pc.max_element_wise(xs, ys)
        return encode_pair_key(lo, hi)

    pd_dt = "int64" if node_dtype == "int64" else "string"

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        ms, xs, ys = [], [], []
        for m, grp in g.groupby("src", sort=False):
            ns = np.unique(grp["dst"].to_numpy())
            k = len(ns)
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            xs.append(ns[iu[0]])
            ys.append(ns[iu[1]])
            ms.append(np.full(len(iu[0]), m, dtype=object)
                      if node_dtype == "string"
                      else np.full(len(iu[0]), m, dtype=np.int64))
        if not xs:
            return pd.DataFrame({"m": pd.Series(dtype=pd_dt),
                                 "x": pd.Series(dtype=pd_dt),
                                 "y": pd.Series(dtype=pd_dt),
                                 "pk": pd.Series(dtype="string")})
        X, Y = np.concatenate(xs), np.concatenate(ys)
        return pd.DataFrame({"m": np.concatenate(ms), "x": X, "y": Y,
                             "pk": _pk(X, Y).to_pandas()})

    def edge_pk(batch: pa.Table) -> pa.Table:
        return pa.table({"pk": _pk(batch.column(src_col),
                                   batch.column(dst_col))})

    wedge_d = {"m": node_dtype, "x": node_dtype, "y": node_dtype,
               "pk": "string"}
    wedge_ds = coarse_grouped(oriented, ["src"], wedges,
                              num_buckets=num_buckets,
                              out_dtypes=wedge_d)
    closed = semi_join_on(
        wedge_ds, "pk",
        edges.map_batches(edge_pk, batch_format="pyarrow"),
        num_buckets=num_buckets, out_dtypes=wedge_d)

    def corners(batch: pa.Table) -> pa.Table:
        cols = [batch.column(c).combine_chunks() for c in ("m", "x", "y")]
        ent = pa.chunked_array(cols, type=cols[0].type)
        return pa.table({
            "entity": ent,
            "n_triangles": pa.array(np.ones(len(ent), dtype=np.int64))})

    counts = grouped_reduce(
        closed.map_batches(corners, batch_format="pyarrow"),
        ["entity"], {"n_triangles": "sum"}, num_buckets=num_buckets,
        out_dtypes={"entity": node_dtype, "n_triangles": "int64"},
        pre_combine=True).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        nt = pc.fill_null(batch.column("n_triangles"), 0)
        return pa.table({"entity": batch.column("node"),
                         "degree": batch.column("degree"),
                         "n_triangles": nt})

    return adaptive_join(deg, counts, on="node", right_on="entity",
                         join_type="left_outer",
                         build_bytes_hint=counts.size_bytes()
                         ).map_batches(finish, batch_format="pyarrow")
