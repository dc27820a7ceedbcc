"""Driver-compare simulation: every queries() entry with an oracle must
match DuckDB exactly at sf0.001 — row count, column names, and sorted
values (the driver's order-insensitive value-hash, reproduced here so
mismatches surface before the real gate runs at sf0.01)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _oracle_df(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    df = con.sql(sql).df()
    con.close()
    return df


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def _query_names():
    import __ray_entry__ as e
    return sorted(e.oracle_sql().keys())


def _oracle_names():
    """Parametrize straight from the registry: a new oracle is parity-
    tested automatically, and a renamed one can't silently drop out."""
    from ccnerx_ray.queries import all_oracles
    return sorted(all_oracles())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as e
    qs, os_ = e.queries(), e.oracle_sql()
    assert name in qs and name in os_
    got = _canon(_to_df(qs[name](SF)))
    want = _canon(_oracle_df(os_[name]))
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            # equal_nan: NULL ints (e.g. FULL OUTER's missing sides)
            # surface as NaN after the pandas float conversion on BOTH
            # sides — the driver's value-hash treats them identically
            assert np.allclose(g.astype(float), w.astype(float),
                               rtol=0, atol=1e-9, equal_nan=True), (name, c)
        else:
            assert (g == w).all(), (name, c, g[:5], w[:5])


def test_oracle_keys_subset_of_queries():
    import __ray_entry__ as e
    assert set(e.oracle_sql()) <= set(e.queries())


def test_rows_only_queries_run(ray_session):
    """Queries without an oracle still must run and return rows at sf0.001."""
    import __ray_entry__ as e
    qs, os_ = e.queries(), e.oracle_sql()
    for name in sorted(set(qs) - set(os_)):
        df = _to_df(qs[name](SF))
        assert df is not None and len(df.columns) > 0, name
        assert len(df) > 0, f"{name} returned no rows"


def test_entry_smoke(ray_session):
    import __ray_entry__ as e
    res = e.entry()
    df = _to_df(res)
    assert len(df) > 0
    assert {"subj", "pred", "obj", "content_sha256"} <= set(df.columns)


def test_whitespace_edges_match_oracle():
    """Whitespace the fixtures never contain: tabs/newlines at edges
    (DuckDB trim() strips spaces only) AND the RE2-vs-Python class gap —
    RE2's \\s is [\\t\\n\\f\\r ] while Python's str.split()/re \\s also
    break on \\x0b, \\xa0, \\u2028…; ws_tokens pins the RE2 contract, so
    vertical tabs and non-breaking spaces are TOKEN CHARACTERS on both
    sides (code-review findings, rounds 1+2)."""
    import pyarrow as pa

    from ccnerx_ray.ops.text import (add_fingerprint, add_langid,
                                     add_quality_score,
                                     add_repetition_stats, add_token_stats)
    from ccnerx_ray.queries.analytics import (ORACLE_FINGERPRINT,
                                              ORACLE_LANGID,
                                              ORACLE_QUALITY,
                                              ORACLE_REPETITION,
                                              ORACLE_TOKEN_STATS)

    texts = ["\tthe cat sat on the mat with a hat\n", "  \t ", "",
             "a\nb\tc d", "\n\nder die das und zu ist für auf\t",
             "a\x0bb c\xa0d e f", "\x0b", "x\x0b y\f z\r w"]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("documents", docs)
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    for fn, sql, cols in [
        (add_token_stats, ORACLE_TOKEN_STATS, ["n_tokens", "n_uniq_tokens"]),
        (add_repetition_stats, ORACLE_REPETITION,
         ["n_bigrams", "n_uniq_bigrams", "n_trigrams", "n_uniq_trigrams"]),
        (add_quality_score, ORACLE_QUALITY,
         ["stopword_pm", "punct_pm", "quality"]),
        (add_langid, ORACLE_LANGID, ["pred_lang"]),
        (add_fingerprint, ORACLE_FINGERPRINT, ["fingerprint"]),
    ]:
        got = fn(batch).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = con.sql(sql).df().sort_values("doc_id").reset_index(drop=True)
        for c in cols:
            assert got[c].tolist() == want[c].tolist(), (c, got[c], want[c])
    con.close()
