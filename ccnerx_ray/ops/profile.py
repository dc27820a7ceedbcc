"""Column profiling: per-column statistics as a mergeable partial
aggregate — the "what is actually in this 100 TB table" primitive every
ingestion pipeline runs first (null rates, ranges, magnitudes) before
schema contracts are trusted.

Shape: one partial-stats row per (column, block) computed with pyarrow
kernels (no Python per row), then a tiny driver-side-free merge
(``groupby(col_name).map_groups`` over ≤ n_columns × n_blocks rows).
Outputs are BIGINT micro-units under the repo-wide half-away-from-zero
rounding contract so the DuckDB oracle hashes exactly.

No reference counterpart; first-class LLM-data-pipeline operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _half_away(x: np.ndarray) -> np.ndarray:
    """DuckDB round(): half away from zero (np.round is half-to-even)."""
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


def profile_numeric(ds, columns: list[str]):
    """→ one row per column: ``(col_name, n_rows, n_null, min_micro,
    max_micro, sum_micro)`` with the value stats in ×1e6 BIGINT units.
    All-null / zero-row columns yield 0 for the value stats."""

    def partial(batch: pa.Table) -> pa.Table:
        names, n, nn, mins, maxs, sums = [], [], [], [], [], []
        for c in columns:
            col = batch.column(c)
            names.append(c)
            n.append(batch.num_rows)
            nn.append(col.null_count)
            valid = batch.num_rows - col.null_count
            if valid:
                mm = pc.min_max(col).as_py()
                mins.append(float(mm["min"]))
                maxs.append(float(mm["max"]))
                # sum in INTEGER micro-units: float sums are association-
                # order sensitive (a distributed merge order can differ
                # from DuckDB's by an ulp and flip the rounded BIGINT —
                # measured); per-value round-then-int64-sum is exact and
                # order-free, and the oracle sums the same expression
                micro = pc.cast(pc.round(
                    pc.multiply(pc.cast(col, pa.float64()), 1e6),
                    round_mode="half_towards_infinity"), pa.int64())
                sums.append(int(pc.sum(micro).as_py()))
            else:
                mins.append(np.inf)
                maxs.append(-np.inf)
                sums.append(0)
        return pa.table({
            "col_name": pa.array(names, pa.string()),
            "n": pa.array(n, pa.int64()),
            "nn": pa.array(nn, pa.int64()),
            "mn": pa.array(mins, pa.float64()),
            "mx": pa.array(maxs, pa.float64()),
            "sm": pa.array(sums, pa.int64()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        nn = int(g["nn"].sum())
        mn, mx = float(g["mn"].min()), float(g["mx"].max())
        if n == nn:                     # no valid values anywhere
            mn = mx = 0.0
        return pd.DataFrame({
            "col_name": [g["col_name"].iloc[0]],
            "n_rows": np.array([n], dtype=np.int64),
            "n_null": np.array([nn], dtype=np.int64),
            "min_micro": _half_away(np.array([mn * 1e6])),
            "max_micro": _half_away(np.array([mx * 1e6])),
            "sum_micro": np.array([g["sm"].sum()], dtype=np.int64),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("col_name").map_groups(merge, batch_format="pandas")


def profile_oracle_sql(table: str, columns: list[str]) -> str:
    """The matching DuckDB SQL: one UNION ALL leg per column."""
    legs = []
    for c in columns:
        legs.append(f"""
SELECT '{c}' AS col_name, count(*) AS n_rows,
       count(*) - count({c}) AS n_null,
       CAST(coalesce(round(min({c}) * 1000000), 0) AS BIGINT) AS min_micro,
       CAST(coalesce(round(max({c}) * 1000000), 0) AS BIGINT) AS max_micro,
       CAST(coalesce(sum(CAST(round({c} * 1000000) AS BIGINT)), 0)
            AS BIGINT) AS sum_micro
FROM {table}""")
    return "\nUNION ALL\n".join(legs)


def corr_cents(ds, x_col: str, y_col: str, batch_size: int = 4096):
    """EXACT distributed Pearson correlation of two cents-scaled columns.

    The five co-moment sums are computed per batch over int64 cents
    (``floor(v*100+0.5)``, the repo-wide oracle convention) and carried
    to the driver as DECIMAL STRINGS — the squared-cents sums overflow
    int64 at corpus scale (price² ≈ 1e14 per row), so the merge runs in
    Python arbitrary-precision ints, exactly like the oracle's HUGEINT
    sums. ``batch_size`` bounds rows per partial so the in-batch int64
    accumulation itself cannot overflow (4096 × 1e14 ≪ 2⁶³).

    The final ``corr_micro`` reproduces the oracle's expression tree
    operation for operation (int → IEEE double casts, double multiply,
    sqrt, divide, ×1e6, half-away round) so the BIGINT output hashes
    exactly. Assumes both columns have nonzero variance.

    Returns a one-row pandas DataFrame:
    ``(n_rows, sum_x_cents, sum_y_cents, corr_micro)``."""
    import math

    def partial(batch: pa.Table) -> pa.Table:
        x = np.floor(batch.column(x_col).to_numpy() * 100 + 0.5) \
              .astype(np.int64)
        y = np.floor(batch.column(y_col).to_numpy() * 100 + 0.5) \
              .astype(np.int64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([str(int(x.sum()))], pa.string()),
            "sy": pa.array([str(int(y.sum()))], pa.string()),
            "sxx": pa.array([str(int(np.dot(x, x)))], pa.string()),
            "syy": pa.array([str(int(np.dot(y, y)))], pa.string()),
            "sxy": pa.array([str(int(np.dot(x, y)))], pa.string()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size).take_all()
    n = sum(r["n"] for r in parts)
    sx = sum(int(r["sx"]) for r in parts)
    sy = sum(int(r["sy"]) for r in parts)
    sxx = sum(int(r["sxx"]) for r in parts)
    syy = sum(int(r["syy"]) for r in parts)
    sxy = sum(int(r["sxy"]) for r in parts)
    num = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = float(num) / math.sqrt(float(vx) * float(vy))
    v = 1000000 * corr
    corr_micro = int(math.copysign(math.floor(abs(v) + 0.5), v))
    return pd.DataFrame({
        "n_rows": np.array([n], dtype=np.int64),
        "sum_x_cents": np.array([sx], dtype=np.int64),
        "sum_y_cents": np.array([sy], dtype=np.int64),
        "corr_micro": np.array([corr_micro], dtype=np.int64),
    })


def corr_oracle_sql(table: str, x_col: str, y_col: str) -> str:
    """The matching DuckDB SQL — HUGEINT co-moment sums, then the same
    double-precision expression tree as :func:`corr_cents`."""
    return f"""
WITH c AS (
  SELECT CAST(floor({x_col} * 100 + 0.5) AS BIGINT) AS xc,
         CAST(floor({y_col} * 100 + 0.5) AS BIGINT) AS yc
  FROM {table}
), s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         SUM(CAST(xc AS HUGEINT)) AS sx, SUM(CAST(yc AS HUGEINT)) AS sy,
         SUM(CAST(xc AS HUGEINT) * xc) AS sxx,
         SUM(CAST(yc AS HUGEINT) * yc) AS syy,
         SUM(CAST(xc AS HUGEINT) * yc) AS sxy
  FROM c
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(sx AS BIGINT) AS sum_x_cents,
       CAST(sy AS BIGINT) AS sum_y_cents,
       CAST(round(1000000 * (CAST(n * sxy - sx * sy AS DOUBLE)
            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                   * CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)
           AS corr_micro
FROM s
"""


def exact_quantiles(ds, col: str, qs: list[float], num_bins: int = 4096,
                    max_collect: int = 200_000, max_rounds: int = 6):
    """EXACT order statistics without a global sort: the classic
    histogram-refinement scheme. Pass 1 counts n/min/max; each round
    histograms the active value range into ``num_bins`` (a mergeable
    int64 vector per block — the only thing that leaves the workers);
    a rank's bucket either holds few enough values to collect and select
    exactly (``max_collect`` bound on driver memory), or becomes the next
    round's range. Dup-heavy buckets converge because a single repeated
    value collapses the range. Typically 2 full scans + one tiny collect
    — compare ``Dataset.sort`` which shuffles the entire table.

    Rank convention: ``ceil(q*n)`` 1-based — calibrated to DuckDB's
    ``quantile_disc`` (0/200 mismatches on randomized trials).

    Returns ``{q: value}`` (Python floats, driver-side — quantiles are a
    scalar summary, not a dataset)."""
    return quantile_summary(ds, col, qs, [], num_bins=num_bins,
                            max_collect=max_collect,
                            max_rounds=max_rounds)[0]


def quantile_summary(ds, col: str, disc_qs: list[float],
                     cont_qs: list[float], num_bins: int = 4096,
                     max_collect: int = 200_000, max_rounds: int = 6):
    """BOTH quantile families off ONE shared front: a single
    count/min/max pass and a single histogram-refinement solve over the
    union of the discrete ranks (``ceil(q*n)``, DuckDB ``quantile_disc``)
    and the continuous flanking ranks (0-based ``RN = q*(n-1)`` floor /
    ceil, DuckDB ``quantile_cont`` operand order). Separate query-level
    calls each pay their own 2-3 full scans for the SAME column; fused,
    the marginal cost of the second family is zero extra scans (VERDICT
    r2 pipeline audit).

    Returns ``({q: value} for disc_qs, {q: value} for cont_qs)``."""
    import math

    n, lo, hi = count_min_max(ds, col)
    if n == 0:
        return {q: None for q in disc_qs}, {q: None for q in cont_qs}
    disc_ranks = {q: max(1, int(math.ceil(q * n))) for q in disc_qs}
    need = set(disc_ranks.values())
    flanks: dict[float, tuple[int, int, float]] = {}
    for q in cont_qs:
        rn = q * (n - 1)
        frn, crn = int(math.floor(rn)), int(math.ceil(rn))
        flanks[q] = (frn + 1, crn + 1, rn)      # 1-based ranks
        need.update((frn + 1, crn + 1))
    vals = exact_ranks(ds, col, sorted(need), lo, hi, num_bins=num_bins,
                       max_collect=max_collect, max_rounds=max_rounds)
    disc = {q: vals[r] for q, r in disc_ranks.items()}
    cont: dict[float, float] = {}
    for q, (r_lo, r_hi, rn) in flanks.items():
        if r_lo == r_hi:
            cont[q] = vals[r_lo]
        else:
            frn = r_lo - 1
            cont[q] = (vals[r_lo] * (r_hi - 1 - rn)
                       + vals[r_hi] * (rn - frn))
    return disc, cont


def count_min_max(ds, col: str) -> tuple[int, float, float]:
    """One mergeable pass: (non-null count, min, max) of a numeric column
    (per-block digests only leave the workers)."""
    def _stats(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        valid = batch.num_rows - c.null_count
        if valid:
            mm = pc.min_max(c).as_py()
            lo, hi = float(mm["min"]), float(mm["max"])
        else:
            lo, hi = np.inf, -np.inf
        return pa.table({"n": pa.array([valid], pa.int64()),
                         "lo": pa.array([lo], pa.float64()),
                         "hi": pa.array([hi], pa.float64())})

    parts = ds.map_batches(_stats, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    if n == 0:
        return 0, np.inf, -np.inf
    return n, min(r["lo"] for r in parts), max(r["hi"] for r in parts)


def exact_ranks(ds, col: str, rank_list: list[int], lo: float, hi: float,
                *, num_bins: int = 4096, max_collect: int = 200_000,
                max_rounds: int = 6) -> dict[int, float]:
    """Histogram-refinement core shared by the disc and cont quantile
    fronts: solve the given 1-based GLOBAL ranks to their exact order-
    statistic values, given the column's [lo, hi] envelope from
    :func:`count_min_max`."""
    ranks = {r: r for r in rank_list}

    def _vals(batch: pa.Table) -> np.ndarray:
        return (pc.drop_null(batch.column(col)).combine_chunks()
                .to_numpy(zero_copy_only=False).astype(np.float64))

    out: dict[int, float] = {}
    pending = dict(ranks)               # rank -> rank, still unsolved
    # range_count = rows inside the current refined range (None = whole
    # column). The collapse branch below may only solve ranks that LIE in
    # the collapsed range — a rank parked in a DIFFERENT oversized bucket
    # of an earlier round must fall through to the safety collect.
    cum_before, blo, bhi, range_count = 0, lo, hi, None
    for _ in range(max_rounds):
        if not pending:
            break
        if blo == bhi:                  # range collapsed: one value
            for q in list(pending):
                local = pending[q] - cum_before
                if range_count is None or 1 <= local <= range_count:
                    out[q] = blo
                    del pending[q]
            break
        edges = np.linspace(blo, bhi, num_bins + 1)

        def _hist(batch: pa.Table, _edges=edges) -> pa.Table:
            v = _vals(batch)
            h, _ = np.histogram(v[(v >= _edges[0]) & (v <= _edges[-1])],
                                bins=_edges)
            return pa.table({"h": pa.array([h.astype(np.int64).tobytes()],
                                           pa.large_binary())})

        hist = np.zeros(num_bins, dtype=np.int64)
        for r in ds.map_batches(_hist, batch_format="pyarrow").take_all():
            hist += np.frombuffer(r["h"], dtype=np.int64)
        csum = np.cumsum(hist)
        # classify every pending rank: small-enough buckets collect in ONE
        # batched pass for the whole round (a per-rank collect pass costs
        # a full scan each — at 6 quantile fronts that tripled total scan
        # count); oversized buckets refine next round
        next_range = None
        solve: dict[int, list[int]] = {}       # bucket -> ranks in it
        for q in sorted(pending, key=pending.get):
            local = pending[q] - cum_before
            if local < 1 or local > int(csum[-1]):
                # rank lies outside the refined range (it sat in a
                # DIFFERENT oversized bucket of an earlier round) —
                # leave it for the exact safety collect below
                continue
            b = int(np.searchsorted(csum, local))
            if hist[b] <= max_collect:
                solve.setdefault(b, []).append(q)
            elif next_range is None:
                # refine into the FIRST oversized bucket; ranks landing in
                # other oversized buckets fall through to the safety
                # collect below (rare: needs >max_collect duplicates in
                # two separate buckets of one round)
                before = int(csum[b - 1]) if b > 0 else 0
                next_range = (float(edges[b]), float(edges[b + 1]),
                              cum_before + before, int(hist[b]))
        if solve:
            # one scan collects EVERY solvable bucket of this round,
            # tagged by bucket index (driver holds ≤ len(solve)·max_collect
            # floats — the same per-bucket bound as before)
            wins = [(b, float(edges[b]), float(edges[b + 1]),
                     b == num_bins - 1) for b in sorted(solve)]

            def _collect(batch: pa.Table, _wins=wins) -> pa.Table:
                v = _vals(batch)
                ws, vs = [], []
                for b, e0, e1, last in _wins:
                    m = (v >= e0) & ((v <= e1) if last else (v < e1))
                    picked = v[m]
                    ws.append(np.full(picked.size, b, dtype=np.int64))
                    vs.append(picked)
                return pa.table({
                    "w": pa.array(np.concatenate(ws) if ws else
                                  np.zeros(0, np.int64)),
                    "v": pa.array(np.concatenate(vs) if vs else
                                  np.zeros(0, np.float64)),
                })

            by_bucket: dict[int, list[float]] = {b: [] for b in solve}
            for r in ds.map_batches(_collect,
                                    batch_format="pyarrow").take_all():
                by_bucket[r["w"]].append(r["v"])
            for b, qs_in_b in solve.items():
                got = np.sort(np.array(by_bucket[b], dtype=np.float64))
                before = int(csum[b - 1]) if b > 0 else 0
                for q in qs_in_b:
                    local = pending[q] - cum_before
                    out[q] = float(got[local - before - 1])
                    del pending[q]
        if next_range is None:
            break
        blo, bhi, cum_before, range_count = next_range
    if pending:                         # safety: exact but driver-heavy
        def _all_vals(batch: pa.Table) -> pa.Table:
            return pa.table({"v": pa.array(_vals(batch), pa.float64())})
        vals = np.sort(np.array(
            [r["v"] for r in ds.map_batches(
                _all_vals, batch_format="pyarrow").take_all()],
            dtype=np.float64))
        for q in list(pending):         # one collect+sort, k lookups
            out[q] = float(vals[pending[q] - 1])
            del pending[q]
    return out


def exact_quantiles_cont(ds, col: str, qs: list[float],
                         num_bins: int = 4096, max_collect: int = 200_000,
                         max_rounds: int = 6):
    """Continuous (linearly interpolated) quantiles, EXACT and without a
    global sort: solve the two neighbouring order statistics of each
    quantile via :func:`exact_ranks`, then interpolate with DuckDB's
    ``quantile_cont`` formula — 0-based position ``RN = q*(n-1)``,
    ``v[floor(RN)]*(ceil(RN)-RN) + v[ceil(RN)]*(RN-floor(RN))`` (that
    exact operand order, so float results agree bit-for-bit with the
    oracle on cent-valued data).

    Returns ``{q: value}`` (Python floats, driver-side)."""
    return quantile_summary(ds, col, [], qs, num_bins=num_bins,
                            max_collect=max_collect,
                            max_rounds=max_rounds)[1]


def key_skew(ds, key_col: str, num_buckets: int | None = None):
    """Key-skew diagnosis for shuffle planning: one row
    ``(n_rows, n_keys, max_count, hhi_ppm)`` where ``hhi_ppm`` is the
    Herfindahl concentration index in parts-per-million —
    ``(1e6 · Σc²) // (Σc)²`` over per-key counts. HHI is ORDER-FREE
    (unlike Gini's rank weighting), so every stage is a mergeable sum /
    max and the whole diagnosis runs without sorting the key table:
    a skewed groupby shows up as hhi_ppm ≫ 1e6 / n_keys and a hot key as
    ``max_count`` ≈ ``n_rows`` — the two numbers that decide whether a
    downstream exchange needs salting.

    Shape: per-key counts via one pre-combined coarse reduce (key-scale
    rows cross the exchange, never input rows), then per-batch partials
    of (rows, keys, max, Σc²) — Σc² accumulates as a PYTHON int carried
    as a string (the ``corr_cents`` arbitrary-precision precedent: at
    10^12 rows Σc² overflows int64 long before Σc does) — and only
    blocks-scale partial rows reach the driver, where exact big-int
    division lands the final ppm."""
    from ccnerx_ray.functions.grouping import grouped_reduce
    from ccnerx_ray.ops import join as joinmod

    if num_buckets is None:
        num_buckets = joinmod.derive_hash_partitions(ds.size_bytes())

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch.column(key_col),
            "c": pa.array(np.ones(batch.num_rows, np.int64))})

    counts = grouped_reduce(ds.map_batches(ones, batch_format="pyarrow"),
                            [key_col], {"c": "sum"},
                            num_buckets=num_buckets, pre_combine=True)

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        sq = sum(int(v) * int(v) for v in c)  # key-scale, exact
        return pa.table({
            "n_rows": pa.array([int(c.sum())], pa.int64()),
            "n_keys": pa.array([len(c)], pa.int64()),
            "max_count": pa.array([int(c.max()) if len(c) else 0],
                                  pa.int64()),
            "sum_sq": pa.array([str(sq)], pa.string())})

    rows = counts.map_batches(partial, batch_format="pyarrow").take_all()
    n_rows = sum(r["n_rows"] for r in rows)
    n_keys = sum(r["n_keys"] for r in rows)
    max_count = max((r["max_count"] for r in rows), default=0)
    sum_sq = sum(int(r["sum_sq"]) for r in rows)
    hhi = (1_000_000 * sum_sq) // (n_rows * n_rows) if n_rows else 0
    import ray.data
    return ray.data.from_arrow(pa.table({
        "n_rows": pa.array([n_rows], pa.int64()),
        "n_keys": pa.array([n_keys], pa.int64()),
        "max_count": pa.array([max_count], pa.int64()),
        "hhi_ppm": pa.array([hhi], pa.int64())}))
