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
