"""Driver-style correctness sweep: run every registry query against its
DuckDB oracle at a given scale factor.

Replicates the graft driver's compare (row count + schema + order-
insensitive value equality after sorting columns by name), so registry
changes can be gated locally BEFORE the driver sweep runs — VERDICT r2 #7
(late registry additions missed the driver gate) is closed by running this
after the last oracle lands.

Usage:
    python jobs/sweep.py [sf_dir] [--only name1,name2] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    # ray Dataset — tolerate pandas blocks slipping through the
    # to_arrow_refs zero-copy path (mixed-format block hazard)
    import ray
    blocks = ray.get(res.to_arrow_refs())
    blocks = [pa.Table.from_pandas(b, preserve_index=False)
              if isinstance(b, pd.DataFrame) else b for b in blocks]
    tbls = [t for t in blocks if t.num_rows > 0]
    if not tbls:
        sch = res.schema()
        return pd.DataFrame({n: pd.Series(dtype="object")
                             for n in sch.names})
    return pa.concat_tables(tbls, promote_options="permissive").to_pandas()


def _normalize(df):
    import numpy as np
    import pandas as pd

    df = df.reindex(columns=sorted(df.columns))
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = np.round(s.astype("float64"), 9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype("int64")
        else:
            out[c] = s.astype("string").fillna("\x00null")
    nd = pd.DataFrame(out)
    if len(nd):
        nd = nd.sort_values(list(nd.columns)).reset_index(drop=True)
    return nd


def compare(ray_df, ora_df) -> dict:
    r = {"rows_match": len(ray_df) == len(ora_df),
         "schema_match": sorted(ray_df.columns) == sorted(ora_df.columns),
         "hash_match": False,
         "spark_rows": len(ray_df), "oracle_rows": len(ora_df), "err": None}
    if r["rows_match"] and r["schema_match"]:
        a, b = _normalize(ray_df), _normalize(ora_df)
        r["hash_match"] = a.equals(b)
        if not r["hash_match"]:
            neq = [c for c in a.columns if not a[c].equals(b[c])]
            r["err"] = f"value mismatch in columns {neq[:4]}"
    return r


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True)

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    only = set(args.only.split(",")) if args.only else None
    results, n_ok = {}, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = _to_pandas(fn(args.sf_dir))
            if name in oracles:
                ora_df = con.execute(oracles[name]).df()
                row = compare(ray_df, ora_df)
            else:
                row = {"rows_match": len(ray_df) >= 0, "schema_match": True,
                       "hash_match": None, "spark_rows": len(ray_df),
                       "oracle_rows": None, "err": None}
        except Exception as e:  # noqa: BLE001 — sweep must finish
            row = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": None,
                   "oracle_rows": None, "err": f"{type(e).__name__}: {e}"}
        row["sec"] = round(time.time() - t0, 2)
        ok = (row["hash_match"] or (row["hash_match"] is None
                                    and row["rows_match"]))
        n_ok += bool(ok)
        results[name] = row
        print(f"{'OK ' if ok else 'FAIL'} {name:28s} "
              f"rows={row['spark_rows']} oracle={row['oracle_rows']} "
              f"{row['sec']}s {row['err'] or ''}", flush=True)

    print(f"\n{n_ok}/{len(results)} green "
          f"({sum(1 for r in results.values() if r['hash_match'] is None)} "
          f"rows-only) at {args.sf_dir}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
