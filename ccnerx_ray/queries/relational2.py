"""Second wave of oracle-checked relational/text queries — each adds a Ray
Data pattern not covered by the first wave: Min/Max aggregates, numeric
bucketing, temporal (year, month) bucketing, LIKE-filter + aggregate,
conditional (CASE) aggregation, JSON property extraction, and a global
top-k wordcount (flat_map → coarse count → sort/limit)."""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ccnerx_ray.functions.grouping import grouped_reduce
from ccnerx_ray.queries.relational import _read, _rename_cents


# ---------------------------------------------------------------- min/max
def q_supplier_balance_range(sf_dir: str):
    """Min/Max/Count per nation (aggregate family completion)."""
    from ray.data.aggregate import Count, Max, Min
    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    out = ds.groupby("s_nationkey").aggregate(
        Min("s_acctbal"), Max("s_acctbal"), Count())
    return out.map_batches(_rename_cents(
        {"min(s_acctbal)": "min_bal_cents", "max(s_acctbal)": "max_bal_cents",
         "count()": "n_suppliers"},
        {"min_bal_cents": 100, "max_bal_cents": 100}), batch_format="pyarrow")


ORACLE_SUPPLIER_RANGE = """
SELECT s_nationkey,
       CAST(round(min(s_acctbal) * 100) AS BIGINT) AS min_bal_cents,
       CAST(round(max(s_acctbal) * 100) AS BIGINT) AS max_bal_cents,
       count(*) AS n_suppliers
FROM supplier GROUP BY s_nationkey
"""


# ---------------------------------------------------------------- buckets
def q_acctbal_histogram(sf_dir: str):
    """Numeric bucketing: floor(acctbal/1000) histogram."""
    from ray.data.aggregate import Count

    def bucketize(batch: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(batch.column("c_acctbal"), 1000.0)),
                    pa.int64())
        return batch.append_column("bal_bucket", b)

    ds = _read(sf_dir, "customer", ["c_acctbal"])
    out = (ds.map_batches(bucketize, batch_format="pyarrow")
             .groupby("bal_bucket").aggregate(Count()))
    return out.map_batches(_rename_cents({"count()": "n_customers"}, {}),
                           batch_format="pyarrow")


ORACLE_ACCTBAL_HIST = """
SELECT CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
       count(*) AS n_customers
FROM customer GROUP BY 1
"""


# ---------------------------------------------------------------- monthly
def q_orders_monthly(sf_dir: str):
    """Temporal bucketing: orders per (year, month)."""
    from ray.data.aggregate import Count, Sum

    def ym(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        return (batch
                .append_column("year", pc.cast(pc.year(d), pa.int32()))
                .append_column("month", pc.cast(pc.month(d), pa.int32())))

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    out = (ds.map_batches(ym, batch_format="pyarrow")
             .groupby(["year", "month"])
             .aggregate(Count(), Sum("o_totalprice")))
    return out.map_batches(_rename_cents(
        {"count()": "n_orders", "sum(o_totalprice)": "revenue_cents"},
        {"revenue_cents": 100}), batch_format="pyarrow")


ORACLE_ORDERS_MONTHLY = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
       CAST(month(o_orderdate) AS INTEGER) AS month,
       count(*) AS n_orders,
       CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS revenue_cents
FROM orders GROUP BY 1, 2
"""


# ---------------------------------------------------------------- LIKE
def q_economy_parts(sf_dir: str):
    """String-predicate filter + aggregate (LIKE analogue via vectorized
    match_substring)."""
    from ray.data.aggregate import Count

    def flt(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring(batch.column("p_type"), "ECONOMY")
        return batch.filter(mask)

    ds = _read(sf_dir, "part", ["p_type", "p_brand"])
    out = (ds.map_batches(flt, batch_format="pyarrow")
             .groupby("p_brand").aggregate(Count()))
    return out.map_batches(_rename_cents({"count()": "n_parts"}, {}),
                           batch_format="pyarrow")


ORACLE_ECONOMY_PARTS = """
SELECT p_brand, count(*) AS n_parts FROM part
WHERE p_type LIKE '%ECONOMY%' GROUP BY p_brand
"""


# ------------------------------------------------------------ conditional
def q_discount_split(sf_dir: str):
    """Conditional (CASE) aggregation inside the combiner."""
    def combine(batch: pa.Table) -> pa.Table:
        disc = batch.column("l_discount")
        qty = batch.column("l_quantity")
        rf = batch.column("l_returnflag")
        hi = pc.greater(disc, 0.05)
        df = pa.table({"l_returnflag": rf, "hi": hi, "qty": qty}).to_pandas()
        g = (df.groupby(["l_returnflag"], sort=False)
               .agg(n_hi=("hi", "sum"), n=("hi", "size"),
                    qty_hi=("qty", lambda s: 0.0))  # placeholder, fixed below
               .reset_index())
        # qty sums split by predicate (vectorized)
        qh = df[df["hi"]].groupby("l_returnflag")["qty"].sum()
        g["qty_hi"] = g["l_returnflag"].map(qh).fillna(0.0)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("l_returnflag", sort=False)
                .agg(n_high_discount=("n_hi", "sum"), n_rows=("n", "sum"),
                     qty_high=("qty_hi", "sum")).reset_index())
        out["n_high_discount"] = out["n_high_discount"].astype("int64")
        out["qty_high"] = out["qty_high"].round().astype("int64")
        return out

    from ccnerx_ray.functions.grouping import coarse_grouped
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_discount", "l_quantity"])
    partials = ds.map_batches(combine, batch_format="pyarrow")
    return coarse_grouped(partials, ["l_returnflag"], final, num_buckets=8)


ORACLE_DISCOUNT_SPLIT = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_high_discount,
       count(*) AS n_rows,
       CAST(round(sum(CASE WHEN l_discount > 0.05 THEN l_quantity ELSE 0 END))
           AS BIGINT) AS qty_high
FROM lineitem GROUP BY l_returnflag
"""


# ------------------------------------------------------------ JSON props
def q_events_props(sf_dir: str):
    """JSON property extraction from the events props column + aggregate."""
    from ray.data.aggregate import Count, Sum

    def extract(batch: pa.Table) -> pa.Table:
        ks = [json.loads(p)["k"] if p else None
              for p in batch.column("props").to_pylist()]
        return batch.append_column("k_bucket", pa.array(
            [None if k is None else k // 10 for k in ks], pa.int64()))

    ds = _read(sf_dir, "events", ["event_type", "props"])
    out = (ds.map_batches(extract, batch_format="pyarrow")
             .groupby(["event_type", "k_bucket"]).aggregate(Count()))
    return out.map_batches(_rename_cents({"count()": "n_events"}, {}),
                           batch_format="pyarrow")


ORACLE_EVENTS_PROPS = """
SELECT event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
       count(*) AS n_events
FROM events GROUP BY 1, 2
"""


# ------------------------------------------------------------- wordcount
def q_top_words(sf_dir: str):
    """Global top-20 token count over documents: flat_map → per-batch
    partial counts → coarse-grouped sum → sort → limit (the canonical
    distributed wordcount with a combiner)."""

    def explode(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        from ccnerx_ray.functions.tokenize import ws_tokens
        for t in batch.column("text").to_pylist():
            for w in ws_tokens(t):
                counts[w] = counts.get(w, 0) + 1
        return pa.table({"word": pa.array(list(counts), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    ds = _read(sf_dir, "documents", ["text"])
    partials = ds.map_batches(explode, batch_format="pyarrow")
    totals = grouped_reduce(partials, ["word"], {"n": "sum"}, num_buckets=64,
                            pre_combine=True)
    return totals.sort(["n", "word"], descending=[True, False]).limit(20)


ORACLE_TOP_WORDS = r"""
SELECT w AS word, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents)
WHERE w <> '' GROUP BY w ORDER BY n DESC, word LIMIT 20
"""


def q_heavy_hitters(sf_dir: str):
    """Exact top-20 words via the 2-pass Misra-Gries sketch-then-recount
    shape (ops/sketches.py:heavy_hitters_words) — the shuffle-minimal
    alternative to q_top_words: the shuffle carries candidate words
    only, never the vocabulary. Must equal ORACLE_TOP_WORDS exactly,
    which oracle-checks the sketch capture guarantee end to end."""
    from ccnerx_ray.ops.sketches import heavy_hitters_words
    return heavy_hitters_words(_read(sf_dir, "documents", ["text"]),
                               k_out=20, capacity=4096)


RELATIONAL2_QUERIES = {
    "supplier_balance_range": q_supplier_balance_range,
    "acctbal_histogram": q_acctbal_histogram,
    "orders_monthly": q_orders_monthly,
    "economy_parts": q_economy_parts,
    "discount_split": q_discount_split,
    "events_props": q_events_props,
    "top_words": q_top_words,
    "heavy_hitters": q_heavy_hitters,
}

RELATIONAL2_ORACLE = {
    "supplier_balance_range": ORACLE_SUPPLIER_RANGE,
    "acctbal_histogram": ORACLE_ACCTBAL_HIST,
    "orders_monthly": ORACLE_ORDERS_MONTHLY,
    "economy_parts": ORACLE_ECONOMY_PARTS,
    "discount_split": ORACLE_DISCOUNT_SPLIT,
    "events_props": ORACLE_EVENTS_PROPS,
    "top_words": ORACLE_TOP_WORDS,
    "heavy_hitters": ORACLE_TOP_WORDS,   # 2-pass sketch ≡ exact top-20
}


# ----------------------------------------------------------- sessionize
def q_user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization of the event stream: per user, events more
    than ``gap_minutes`` apart open a new session. Ray shape: coarse
    hash-partition groupby on user_id, sort-within-group, vectorized gap
    scan — no global sort, no ordering assumption across users."""
    import pandas as pd

    from ccnerx_ray.functions.grouping import coarse_grouped

    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, sub in g.groupby("user_id", sort=False):
            ts = np.sort(sub["ts"].to_numpy())
            if len(ts) == 0:
                continue
            breaks = int((np.diff(ts) > gap).sum()) if len(ts) > 1 else 0
            out.append((uid, breaks + 1, len(ts)))
        return pd.DataFrame(out, columns=["user_id", "n_sessions", "n_events"])

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return coarse_grouped(ds, ["user_id"], sessions, num_buckets=64)


ORACLE_USER_SESSIONS = """
SELECT user_id,
       CAST(1 + sum(is_new) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM events)
GROUP BY user_id
"""

RELATIONAL2_QUERIES["user_sessions"] = q_user_sessions
RELATIONAL2_ORACLE["user_sessions"] = ORACLE_USER_SESSIONS


# -------------------------------------------------------- quantile / std
def q_quantity_stats(sf_dir: str):
    """Quantile + Std aggregate coverage: median l_quantity (exact: the
    interpolated median of integer-valued doubles is k or k+0.5, both
    exactly representable) and stddev of discount in micro-units."""
    from ray.data.aggregate import Count, Quantile, Std

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])
    out = ds.groupby("l_returnflag").aggregate(
        Quantile("l_quantity", q=0.5), Std("l_discount", ddof=1), Count())

    def rename(batch: pa.Table) -> pa.Table:
        mapping = {}
        for c in batch.column_names:
            if c.startswith("quantile"):
                mapping[c] = "median_qty"
            elif c.startswith("std"):
                mapping[c] = "std_disc_micro"
            elif c == "count()":
                mapping[c] = "n_rows"
        batch = batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names])
        i = batch.column_names.index("std_disc_micro")
        scaled = pc.cast(pc.round(pc.multiply(batch.column(i), 1e6)),
                         pa.int64())
        return batch.set_column(i, "std_disc_micro", scaled)

    return out.map_batches(rename, batch_format="pyarrow")


ORACLE_QUANTITY_STATS = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       CAST(round(stddev_samp(l_discount) * 1000000) AS BIGINT) AS std_disc_micro,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""

RELATIONAL2_QUERIES["quantity_stats"] = q_quantity_stats
RELATIONAL2_ORACLE["quantity_stats"] = ORACLE_QUANTITY_STATS


# --------------------------------------------------------------- as-of join
def q_click_last_purchase(sf_dir: str):
    """As-of join (custom operator, ``ops/sketches.py:asof_join``): each
    click event gets the same user's latest PRIOR purchase value.
    Oracle: DuckDB's native ASOF JOIN."""
    import pandas as pd

    from ccnerx_ray.ops.sketches import asof_join

    from ccnerx_ray.functions.grouping import grouped_reduce

    ev = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])
    clicks = ev.filter(expr="event_type == 'click'") \
               .select_columns(["event_id", "user_id", "ts"])
    # collapse same-timestamp purchases to max(value) BEFORE the as-of:
    # with ties on the on-key, merge_asof picks the last row in block
    # order and DuckDB ASOF picks its own arbitrary row — aggregating
    # first makes both sides deterministic and identical
    purchases = grouped_reduce(
        ev.filter(expr="event_type == 'purchase'")
          .select_columns(["user_id", "ts", "value"]),
        ["user_id", "ts"], {"value": "max"}, num_buckets=32)
    joined = asof_join(clicks, purchases, on="ts", by="user_id",
                       direction="backward")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["value"])
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts_ms": (pd.to_datetime(df["ts"]).astype("datetime64[ms]")
                      .astype("int64")),
            # floor(x+0.5) = half-up on both sides; pandas .round() is
            # half-to-even while DuckDB round() is half-away — an exact
            # .5 product would diverge
            "purchase_cents": np.floor(df["value"].to_numpy() * 100 + 0.5)
                                .astype("int64"),
        })

    return joined.map_batches(finalize, batch_format="pandas")


ORACLE_CLICK_LAST_PURCHASE = """
SELECT c.event_id, c.user_id,
       epoch_ms(c.ts) AS ts_ms,
       CAST(floor(p.value * 100 + 0.5) AS BIGINT) AS purchase_cents
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT user_id, ts, max(value) AS value FROM events
           WHERE event_type = 'purchase' GROUP BY 1, 2) p
  ON c.user_id = p.user_id AND p.ts <= c.ts
"""

RELATIONAL2_QUERIES["click_last_purchase"] = q_click_last_purchase
RELATIONAL2_ORACLE["click_last_purchase"] = ORACLE_CLICK_LAST_PURCHASE


def q_events_global_asof(sf_dir: str):
    """GLOBAL (no ``by``) as-of join — the range-bucketed path of
    ``ops/sketches.py:asof_join`` (VERDICT r2 #2: this shape used to
    funnel into one reducer; now every bucket of the ``on`` domain joins
    independently with driver-computed boundary carries): each event,
    regardless of user, gets the most recent order DAY at or before its
    timestamp plus that day's order count. The right side is aggregated
    per day first, so its ``on`` values are unique and the pandas/DuckDB
    tie rules cannot diverge. Oracle: native DuckDB ASOF LEFT JOIN."""
    import pyarrow.compute as pc

    from ccnerx_ray.functions.grouping import grouped_reduce
    from ccnerx_ray.ops.sketches import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts"])

    def ev_map(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
        })

    left = ev.map_batches(ev_map, batch_format="pyarrow")

    od = _read(sf_dir, "orders", ["o_orderdate"])

    def od_map(b: pa.Table) -> pa.Table:
        return pa.table({
            "d_us": pc.cast(b.column("o_orderdate"), pa.int64()),
            "n_orders": pa.array(np.ones(b.num_rows, dtype=np.int64)),
        })

    daily = grouped_reduce(od.map_batches(od_map, batch_format="pyarrow"),
                           ["d_us"], {"n_orders": "sum"}, num_buckets=32,
                           out_dtypes={"d_us": "int64", "n_orders": "int64"},
                           pre_combine=True)

    def with_key(b: pa.Table) -> pa.Table:
        return b.append_column("ts_us", b.column("d_us"))

    right = daily.map_batches(with_key, batch_format="pyarrow")
    joined = asof_join(left, right, on="ts_us", direction="backward",
                       num_buckets=64)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        # events before the first order day get the -1 sentinel (pandas
        # NaN would float the int columns; DuckDB COALESCEs identically)
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "ts_us": df["ts_us"].astype("int64"),
            "d_us": df["d_us"].fillna(-1).astype("int64"),
            "n_orders": df["n_orders"].fillna(-1).astype("int64"),
        })

    return joined.map_batches(finalize, batch_format="pandas")


ORACLE_EVENTS_GLOBAL_ASOF = """
WITH r AS (SELECT epoch_us(o_orderdate) AS d_us,
                  CAST(count(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY 1),
     l AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events)
SELECT l.event_id, l.ts_us,
       COALESCE(r.d_us, -1) AS d_us,
       COALESCE(r.n_orders, -1) AS n_orders
FROM l ASOF LEFT JOIN r ON l.ts_us >= r.d_us
"""

RELATIONAL2_QUERIES["events_global_asof"] = q_events_global_asof
RELATIONAL2_ORACLE["events_global_asof"] = ORACLE_EVENTS_GLOBAL_ASOF


# --------------------------------------------------------------- range join
PRICE_BANDS = [(900.0, 950.0, "low"), (925.0, 975.0, "mid"),
               (950.0, 1000.0, "high")]


def q_price_bands(sf_dir: str):
    """Range join (custom operator, ``ops/sketches.py:range_join``): parts
    into OVERLAPPING price bands (a part can land in two bands), then a
    per-band count. Oracle: BETWEEN join + group by."""
    import pandas as pd
    import ray.data

    from ccnerx_ray.functions.grouping import coarse_grouped
    from ccnerx_ray.ops.sketches import range_join

    parts = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])
    bands = ray.data.from_items(
        [{"lo": lo, "hi": hi, "band": b} for lo, hi, b in PRICE_BANDS])
    joined = range_join(parts, bands, "p_retailprice", "lo", "hi",
                        bucket_width=25.0, num_buckets=8)

    def local(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("band", sort=False).size()
                 .reset_index(name="n_parts"))

    return coarse_grouped(joined.select_columns(["band"]), ["band"], local,
                          num_buckets=4,
                          out_dtypes={"band": "string", "n_parts": "int64"})


ORACLE_PRICE_BANDS = """
SELECT band, CAST(count(*) AS BIGINT) AS n_parts
FROM part JOIN (VALUES (900.0, 950.0, 'low'), (925.0, 975.0, 'mid'),
                       (950.0, 1000.0, 'high')) AS bands(lo, hi, band)
  ON p_retailprice BETWEEN lo AND hi
GROUP BY band
"""

RELATIONAL2_QUERIES["price_bands"] = q_price_bands
RELATIONAL2_ORACLE["price_bands"] = ORACLE_PRICE_BANDS


# ---------------------------------------------------------- sliding window
def q_events_sliding(sf_dir: str, window_min: int = 30, step_min: int = 10):
    """SLIDING-window aggregate (events_hourly is the tumbling case):
    30-minute windows stepping every 10 minutes — each event lands in
    window_min/step_min = 3 windows. Ray shape: vectorized flat-map of
    each event to its window starts (epoch-ms integers), then a coarse
    grouped count; no ordering assumption, no sort."""
    from ccnerx_ray.functions.grouping import grouped_reduce

    step = step_min * 60 * 1000
    k = window_min // step_min

    def explode(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        base = (us // 1000) // step * step
        n = len(base)
        ws = np.concatenate([base - i * step for i in range(k)])
        et = batch.column("event_type").to_pylist() * k
        return pa.table({
            "window_start_ms": pa.array(ws, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "one": pa.array(np.ones(n * k, dtype=np.int64), pa.int64()),
        })

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    out = grouped_reduce(ds.map_batches(explode, batch_format="pyarrow"),
                         ["window_start_ms", "event_type"], {"one": "sum"},
                         num_buckets=64, pre_combine=True)
    return out.map_batches(
        lambda b: b.rename_columns(
            ["n_events" if c == "one" else c for c in b.column_names]),
        batch_format="pyarrow")


ORACLE_EVENTS_SLIDING = """
SELECT ws AS window_start_ms, event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM (
  SELECT event_type,
         (epoch_ms(ts) // 600000) * 600000
             - 600000 * unnest(generate_series(0, 2)) AS ws
  FROM events)
GROUP BY 1, 2
"""

RELATIONAL2_QUERIES["events_sliding"] = q_events_sliding
RELATIONAL2_ORACLE["events_sliding"] = ORACLE_EVENTS_SLIDING


# ------------------------------------------------------- window functions
def q_orders_running_total(sf_dir: str):
    """Per-key RUNNING TOTAL window (SUM OVER PARTITION BY ... ORDER BY):
    each order gets its customer's cumulative spend so far. Ray shape:
    one coarse-grouped shuffle on the partition key, then a vectorized
    per-customer sort + cumsum inside the group — no global sort. The
    running sum is integer cents (half-up), so left-to-right pandas
    cumsum and DuckDB's window SUM are both exact and associative
    (float accumulation order would hash-diverge).

    Scale note: the window partition (one customer's orders) must fit a
    worker — true for any per-entity window; a partition that doesn't
    fit one machine doesn't fit any engine's window operator either."""
    import pandas as pd

    from ccnerx_ray.functions.grouping import coarse_grouped

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        cents = np.floor(g["o_totalprice"].to_numpy() * 100 + 0.5) \
                  .astype("int64")
        run = (pd.Series(cents).groupby(g["o_custkey"].to_numpy())
                 .cumsum().to_numpy())
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].to_numpy(),
            "o_orderkey": g["o_orderkey"].to_numpy(),
            "running_cents": run,
        })

    return coarse_grouped(ds, ["o_custkey"], local, num_buckets=64,
                          out_dtypes={"o_custkey": "int64",
                                      "o_orderkey": "int64",
                                      "running_cents": "int64"})


ORACLE_ORDERS_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS BIGINT)
           AS running_cents
FROM orders
"""

RELATIONAL2_QUERIES["orders_running_total"] = q_orders_running_total
RELATIONAL2_ORACLE["orders_running_total"] = ORACLE_ORDERS_RUNNING_TOTAL


def q_events_daily_delta(sf_dir: str):
    """Keyed LAG window over an aggregated series: events per
    (event_type, day), each day compared to the type's PREVIOUS observed
    day (``n - LAG(n)``; first day per type dropped, as SQL LAG yields
    NULL there). Ray shape: distributed count to the tiny day grain,
    then a coarse-grouped per-key sort + diff — the raw events never
    sort, only the aggregated series does."""
    import pandas as pd

    from ccnerx_ray.functions.grouping import coarse_grouped, grouped_reduce

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def to_day(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        day = (us // 1000) // 86_400_000 * 86_400_000
        return pa.table({
            "event_type": batch.column("event_type"),
            "day_ms": pa.array(day, pa.int64()),
            "one": pa.array(np.ones(len(day), dtype=np.int64), pa.int64()),
        })

    daily = grouped_reduce(ds.map_batches(to_day, batch_format="pyarrow"),
                           ["event_type", "day_ms"], {"one": "sum"},
                           num_buckets=32, pre_combine=True)

    def local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "day_ms"])
        n = g["one"].to_numpy()
        prev = (pd.Series(n).groupby(g["event_type"].to_numpy())
                  .shift(1).to_numpy())
        keep = ~np.isnan(prev)
        return pd.DataFrame({
            "event_type": g["event_type"].to_numpy()[keep],
            "day_ms": g["day_ms"].to_numpy()[keep],
            "n_events": n[keep],
            "delta": (n[keep] - prev[keep]).astype("int64"),
        })

    return coarse_grouped(daily, ["event_type"], local, num_buckets=8,
                          out_dtypes={"event_type": "string",
                                      "day_ms": "int64",
                                      "n_events": "int64",
                                      "delta": "int64"})


ORACLE_EVENTS_DAILY_DELTA = """
WITH d AS (
  SELECT event_type, (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), w AS (
  SELECT event_type, day_ms, n_events,
         n_events - LAG(n_events) OVER (PARTITION BY event_type
                                        ORDER BY day_ms) AS delta
  FROM d
)
SELECT * FROM w WHERE delta IS NOT NULL
"""

RELATIONAL2_QUERIES["events_daily_delta"] = q_events_daily_delta
RELATIONAL2_ORACLE["events_daily_delta"] = ORACLE_EVENTS_DAILY_DELTA


# ------------------------------------------------------------------ rollup
def q_revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(o_orderpriority, year): order counts and revenue
    at three grains — (priority, year), (priority), grand total — with
    'ALL' marking rolled-up levels. Ray shape: ONE distributed pass to
    the finest grain (mergeable integer sums), then the super-levels
    re-aggregate the finest RESULT, whose size is bounded by
    |priorities| x |years| (dozens of rows at any corpus scale) — the
    raw table is never re-scanned per level."""
    import pandas as pd

    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("o_orderdate"), pa.int64()).to_numpy()
        yr = pd.to_datetime(us, unit="us").year.astype(str)
        cents = np.floor(
            batch.column("o_totalprice").to_numpy() * 100 + 0.5
        ).astype("int64")
        return pa.table({
            "priority": batch.column("o_orderpriority"),
            "o_year": pa.array(yr, pa.string()),
            "n_orders": pa.array(np.ones(len(yr), dtype=np.int64)),
            "revenue_cents": pa.array(cents, pa.int64()),
        })

    from ccnerx_ray.functions.grouping import grouped_reduce

    finest = grouped_reduce(ds.map_batches(prep, batch_format="pyarrow"),
                            ["priority", "o_year"],
                            {"n_orders": "sum", "revenue_cents": "sum"},
                            num_buckets=16, pre_combine=True)
    f = pd.DataFrame(finest.take_all())  # bounded: |priority| x |years|
    by_p = (f.groupby("priority", as_index=False)
              [["n_orders", "revenue_cents"]].sum())
    by_p["o_year"] = "ALL"
    total = pd.DataFrame({"priority": ["ALL"], "o_year": ["ALL"],
                          "n_orders": [f["n_orders"].sum()],
                          "revenue_cents": [f["revenue_cents"].sum()]})
    cols = ["priority", "o_year", "n_orders", "revenue_cents"]
    return pd.concat([f[cols], by_p[cols], total[cols]], ignore_index=True)


ORACLE_REVENUE_ROLLUP = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(CAST(y AS VARCHAR), 'ALL') AS o_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM (SELECT o_orderpriority, year(o_orderdate) AS y,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders)
GROUP BY ROLLUP(o_orderpriority, y)
"""

RELATIONAL2_QUERIES["revenue_rollup"] = q_revenue_rollup
RELATIONAL2_ORACLE["revenue_rollup"] = ORACLE_REVENUE_ROLLUP


# ------------------------------------------------------------- correlation
def q_price_quantity_corr(sf_dir: str):
    """Exact distributed Pearson correlation (quantity vs extendedprice)
    — a mergeable co-moment aggregate (``ops/profile.py:corr_cents``):
    per-batch int64 cent sums ride to the driver as decimal strings and
    merge in arbitrary precision, mirroring the oracle's HUGEINT sums."""
    from ccnerx_ray.ops.profile import corr_cents
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    return corr_cents(ds, "l_quantity", "l_extendedprice")


def _corr_oracle() -> str:
    from ccnerx_ray.ops.profile import corr_oracle_sql
    return corr_oracle_sql("lineitem", "l_quantity", "l_extendedprice")


RELATIONAL2_QUERIES["price_quantity_corr"] = q_price_quantity_corr
RELATIONAL2_ORACLE["price_quantity_corr"] = _corr_oracle()


# ------------------------------------------------------------------- pivot
_PIVOT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_events_pivot(sf_dir: str):
    """Daily event-type PIVOT: one row per day, one integer-cents revenue
    column per (known) event type. Ray shape: a stateless map fans each
    row into the fixed column set (CASE-WHEN equivalent), then one
    mergeable grouped sum — the pivot never shuffles more than the
    day-grain aggregate."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy()
        day = (us // 1000) // 86_400_000 * 86_400_000
        cents = np.floor(batch.column("value").to_numpy() * 100 + 0.5) \
                  .astype(np.int64)
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        cols = {"day_ms": pa.array(day, pa.int64())}
        for t in _PIVOT_TYPES:
            cols[f"{t}_cents"] = pa.array(
                np.where(et == t, cents, 0), pa.int64())
        return pa.table(cols)

    aggs = {f"{t}_cents": "sum" for t in _PIVOT_TYPES}
    dts = {"day_ms": "int64", **{f"{t}_cents": "int64"
                                 for t in _PIVOT_TYPES}}
    return grouped_reduce(ds.map_batches(prep, batch_format="pyarrow"),
                          ["day_ms"], aggs, num_buckets=32, out_dtypes=dts)


ORACLE_EVENTS_PIVOT = """
SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
""" + ",\n".join(
    f"       CAST(SUM(CASE WHEN event_type = '{t}' THEN "
    f"CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) "
    f"AS {t}_cents" for t in _PIVOT_TYPES) + """
FROM events GROUP BY 1
"""

RELATIONAL2_QUERIES["events_pivot"] = q_events_pivot
RELATIONAL2_ORACLE["events_pivot"] = ORACLE_EVENTS_PIVOT


# ------------------------------------------------------- grouped quantiles
def q_grouped_quantiles(sf_dir: str):
    """Per-group exact percentiles (p25/p50/p75 of extendedprice cents by
    return flag) — rank convention ``ceil(q*n)`` 1-based, the same
    quantile_disc calibration as ``ops/profile.py:exact_quantiles``.
    Groups here are few and worker-sized so a coarse-grouped local sort
    is the right shape; a group too big for one worker would use the
    histogram-refinement machinery per group instead."""
    import math

    from ccnerx_ray.functions.grouping import coarse_grouped

    QS = [250, 500, 750]
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def local(g: pd.DataFrame) -> pd.DataFrame:
        out_k, out_q, out_v = [], [], []
        for k, sub in g.groupby("l_returnflag", sort=False):
            cents = np.sort(np.floor(
                sub["l_extendedprice"].to_numpy() * 100 + 0.5
            ).astype("int64"))
            n = len(cents)
            for q_pm in QS:
                r = max(1, math.ceil(q_pm / 1000.0 * n))
                out_k.append(k)
                out_q.append(q_pm)
                out_v.append(int(cents[r - 1]))
        return pd.DataFrame({"l_returnflag": out_k, "q_pm": out_q,
                             "value_cents": out_v})

    return coarse_grouped(ds, ["l_returnflag"], local, num_buckets=8,
                          out_dtypes={"l_returnflag": "string",
                                      "q_pm": "int64",
                                      "value_cents": "int64"})


# quantile_disc requires a CONSTANT fraction → one UNION leg per q
ORACLE_GROUPED_QUANTILES = """
WITH c AS (SELECT l_returnflag,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
           FROM lineitem)
""" + "\nUNION ALL\n".join(
    f"SELECT l_returnflag, CAST({q} AS BIGINT) AS q_pm, "
    f"CAST(quantile_disc(cents, {q / 1000.0}) AS BIGINT) AS value_cents "
    f"FROM c GROUP BY l_returnflag" for q in (250, 500, 750))

RELATIONAL2_QUERIES["grouped_quantiles"] = q_grouped_quantiles
RELATIONAL2_ORACLE["grouped_quantiles"] = ORACLE_GROUPED_QUANTILES


# --------------------------------------------------- count distinct per group
def q_suppliers_per_flag(sf_dir: str):
    """Exact per-group COUNT(DISTINCT ...): distinct suppliers per return
    flag. Distributed shape: dedup the (flag, suppkey) PAIRS first (a
    digest-size hash-partitioned shuffle), then a tiny mergeable count —
    the classic two-step that avoids holding per-group value sets in any
    single reducer."""
    from ccnerx_ray.functions.grouping import drop_duplicate_rows, grouped_reduce

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_suppkey"])
    pairs = drop_duplicate_rows(ds, ["l_returnflag", "l_suppkey"],
                                num_buckets=64)

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "n_suppliers": pa.array(
                np.ones(batch.num_rows, dtype=np.int64)),
        })

    return grouped_reduce(pairs.map_batches(ones, batch_format="pyarrow"),
                          ["l_returnflag"], {"n_suppliers": "sum"},
                          num_buckets=8, pre_combine=True,
                          out_dtypes={"l_returnflag": "string",
                                      "n_suppliers": "int64"})


ORACLE_SUPPLIERS_PER_FLAG = """
SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem GROUP BY l_returnflag
"""

RELATIONAL2_QUERIES["suppliers_per_flag"] = q_suppliers_per_flag
RELATIONAL2_ORACLE["suppliers_per_flag"] = ORACLE_SUPPLIERS_PER_FLAG


# -------------------------------------------------------------------- cube
def q_revenue_cube(sf_dir: str):
    """GROUP BY CUBE(priority, year): all four grains from ONE distributed
    pass to the finest grain (same shape as ``q_revenue_rollup``, plus the
    year-only grain rollup misses); super-levels re-aggregate the bounded
    finest result, never the raw table."""
    import pandas as pd

    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("o_orderdate"), pa.int64()).to_numpy()
        yr = pd.to_datetime(us, unit="us").year.astype(str)
        cents = np.floor(
            batch.column("o_totalprice").to_numpy() * 100 + 0.5
        ).astype("int64")
        return pa.table({
            "priority": batch.column("o_orderpriority"),
            "o_year": pa.array(yr, pa.string()),
            "n_orders": pa.array(np.ones(len(yr), dtype=np.int64)),
            "revenue_cents": pa.array(cents, pa.int64()),
        })

    fine = grouped_reduce(ds.map_batches(prep, batch_format="pyarrow"),
                          ["priority", "o_year"],
                          {"n_orders": "sum", "revenue_cents": "sum"},
                          num_buckets=16, pre_combine=True)
    f = pd.DataFrame(fine.take_all())   # bounded: |priority| x |years|
    by_p = (f.groupby("priority", as_index=False)
              [["n_orders", "revenue_cents"]].sum())
    by_p["o_year"] = "ALL"
    by_y = (f.groupby("o_year", as_index=False)
              [["n_orders", "revenue_cents"]].sum())
    by_y["priority"] = "ALL"
    total = pd.DataFrame({"priority": ["ALL"], "o_year": ["ALL"],
                          "n_orders": [f["n_orders"].sum()],
                          "revenue_cents": [f["revenue_cents"].sum()]})
    cols = ["priority", "o_year", "n_orders", "revenue_cents"]
    return pd.concat([f[cols], by_p[cols], by_y[cols], total[cols]],
                     ignore_index=True)


ORACLE_REVENUE_CUBE = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(CAST(y AS VARCHAR), 'ALL') AS o_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM (SELECT o_orderpriority, year(o_orderdate) AS y,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders)
GROUP BY CUBE(o_orderpriority, y)
"""

RELATIONAL2_QUERIES["revenue_cube"] = q_revenue_cube
RELATIONAL2_ORACLE["revenue_cube"] = ORACLE_REVENUE_CUBE


# --------------------------------------------------------------- intersect
def q_common_ship_months(sf_dir: str):
    """INTERSECT set operation: ship months that appear under BOTH return
    flag 'A' and 'R'. Distributed shape: one pass to (month, flag)
    distinct pairs, then a membership count — months with both flags
    survive (set intersection without materializing either side)."""
    from ccnerx_ray.functions.grouping import drop_duplicate_rows, grouped_reduce

    ds = _read(sf_dir, "lineitem", ["l_shipdate", "l_returnflag"])

    def prep(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("l_returnflag"),
                        value_set=pa.array(["A", "R"]))
        b = batch.filter(keep)
        m = pc.cast(pc.month(b.column("l_shipdate")), pa.int64())
        y = pc.cast(pc.year(b.column("l_shipdate")), pa.int64())
        ym = pc.add(pc.multiply(y, 100), m)
        return pa.table({"ship_ym": ym,
                         "l_returnflag": b.column("l_returnflag")})

    pairs = drop_duplicate_rows(ds.map_batches(prep, batch_format="pyarrow"),
                                ["ship_ym", "l_returnflag"], num_buckets=32)

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({"ship_ym": batch.column("ship_ym"),
                         "nf": pa.array(np.ones(batch.num_rows,
                                                dtype=np.int64))})

    counts = grouped_reduce(pairs.map_batches(ones, batch_format="pyarrow"),
                            ["ship_ym"], {"nf": "sum"}, num_buckets=16,
                            out_dtypes={"ship_ym": "int64", "nf": "int64"})
    return counts.filter(expr="nf == 2").select_columns(["ship_ym"])


ORACLE_COMMON_SHIP_MONTHS = """
SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ship_ym
FROM lineitem WHERE l_returnflag = 'A'
INTERSECT
SELECT year(l_shipdate) * 100 + month(l_shipdate)
FROM lineitem WHERE l_returnflag = 'R'
"""

RELATIONAL2_QUERIES["common_ship_months"] = q_common_ship_months
RELATIONAL2_ORACLE["common_ship_months"] = ORACLE_COMMON_SHIP_MONTHS


# --------------------------------------------------------- left outer join
def q_customer_order_counts(sf_dir: str):
    """LEFT OUTER JOIN family (previously only inner/semi/anti were
    exercised): every customer with their order count, INCLUDING the
    zero-order customers the inner join would drop. Distributed shape:
    reduce orders to per-customer counts first (digest-size build side),
    then an adaptive LEFT OUTER join (broadcast under the asserted byte
    bound, hash-partitioned ``Dataset.join`` beyond it) and a vectorized
    COALESCE-to-0."""
    from ccnerx_ray.ops.join import adaptive_join

    ds_c = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ds_o = _read(sf_dir, "orders", ["o_custkey"])

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": batch.column("o_custkey"),
                         "n_orders": pa.array(
                             np.ones(batch.num_rows, dtype=np.int64))})

    counts = grouped_reduce(ds_o.map_batches(ones, batch_format="pyarrow"),
                            ["o_custkey"], {"n_orders": "sum"},
                            num_buckets=32, pre_combine=True,
                            out_dtypes={"o_custkey": "int64",
                                        "n_orders": "int64"})
    # the counts digest is bounded above by the pruned o_custkey column
    # bytes — a metadata-cheap estimate for the broadcast/hash decision
    joined = adaptive_join(ds_c, counts, on="c_custkey",
                           right_on="o_custkey", join_type="left_outer",
                           build_bytes_hint=ds_o.size_bytes())

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(batch.column("n_orders"), 0)
        return pa.table({"c_custkey": batch.column("c_custkey"),
                         "c_mktsegment": batch.column("c_mktsegment"),
                         "n_orders": pc.cast(n, pa.int64())})

    return joined.map_batches(finish, batch_format="pyarrow")


ORACLE_CUSTOMER_ORDER_COUNTS = """
SELECT c_custkey, c_mktsegment,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_orders
FROM customer LEFT JOIN (
  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
"""

RELATIONAL2_QUERIES["customer_order_counts"] = q_customer_order_counts
RELATIONAL2_ORACLE["customer_order_counts"] = ORACLE_CUSTOMER_ORDER_COUNTS


# --------------------------------------------------------- full outer join
def q_ship_vs_order_months(sf_dir: str):
    """FULL OUTER JOIN (completes the join family: inner, left/semi/anti,
    range, as-of): monthly order counts vs monthly shipment counts, keeping
    months that appear on EITHER side (lineitem ship dates run past the
    last order month, so each side has exclusive keys). Distributed shape:
    both sides reduce to per-month digests first (tiny key space,
    materialized once — bounded by the month count), then FULL OUTER is
    composed as ``left_outer(o, s) ∪ right_anti(s, o)`` through the
    adaptive join: entirely shuffle-free while the digests sit under the
    broadcast byte bound, two hash joins beyond it."""
    from ccnerx_ray.functions.grouping import grouped_reduce
    from ccnerx_ray.ops.join import adaptive_join

    ds_o = _read(sf_dir, "orders", ["o_orderdate"])
    ds_l = _read(sf_dir, "lineitem", ["l_shipdate"])

    def to_ym(col: str, key: str, cnt: str):
        def fn(batch: pa.Table) -> pa.Table:
            c = batch.column(col)
            ym = pc.add(pc.multiply(pc.cast(pc.year(c), pa.int64()), 100),
                        pc.cast(pc.month(c), pa.int64()))
            return pa.table({key: ym, cnt: pa.array(
                np.ones(batch.num_rows, dtype=np.int64))})
        return fn

    o = grouped_reduce(ds_o.map_batches(to_ym("o_orderdate", "ym_o", "n_orders"),
                                        batch_format="pyarrow"),
                       ["ym_o"], {"n_orders": "sum"}, num_buckets=16,
                       out_dtypes={"ym_o": "int64", "n_orders": "int64"},
                       pre_combine=True).materialize()
    s = grouped_reduce(ds_l.map_batches(to_ym("l_shipdate", "ym_s", "n_ships"),
                                        batch_format="pyarrow"),
                       ["ym_s"], {"n_ships": "sum"}, num_buckets=16,
                       out_dtypes={"ym_s": "int64", "n_ships": "int64"},
                       pre_combine=True).materialize()
    both = adaptive_join(o, s, on="ym_o", right_on="ym_s",
                         join_type="left_outer",
                         build_bytes_hint=s.size_bytes())
    s_only = adaptive_join(s, o, on="ym_s", right_on="ym_o",
                           join_type="left_anti",
                           build_bytes_hint=o.size_bytes())

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table({"ym_o": batch.column("ym_s"),
                         "n_orders": pa.nulls(batch.num_rows, pa.int64()),
                         "n_ships": batch.column("n_ships")})

    joined = both.union(s_only.map_batches(widen, batch_format="pyarrow"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "ym": pc.cast(batch.column("ym_o"), pa.int64()),
            "n_orders": pc.cast(pc.fill_null(batch.column("n_orders"), 0),
                                pa.int64()),
            "n_ships": pc.cast(pc.fill_null(batch.column("n_ships"), 0),
                               pa.int64())})

    return joined.map_batches(finish, batch_format="pyarrow")


ORACLE_SHIP_VS_ORDER_MONTHS = """
SELECT COALESCE(o.ym, s.ym) AS ym,
       CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_ships
FROM (SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             count(*) AS n FROM orders GROUP BY 1) o
FULL JOIN
     (SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
             count(*) AS n FROM lineitem GROUP BY 1) s
ON o.ym = s.ym
"""

RELATIONAL2_QUERIES["ship_vs_order_months"] = q_ship_vs_order_months
RELATIONAL2_ORACLE["ship_vs_order_months"] = ORACLE_SHIP_VS_ORDER_MONTHS


# ----------------------------------------------------------------- except
def q_noorder_ship_months(sf_dir: str):
    """EXCEPT set operation (completes the family with UNION and
    INTERSECT): ship months in which NO order was placed (lineitem ship
    dates trail order dates by up to ~4 months, so the tail months ship
    without new orders). Distributed shape: each side reduces to distinct
    months weighted ship=1 / order=2, union, sum per month — months
    totalling exactly 1 are ship-only (set difference without
    materializing either side; the distinct pass guarantees each side
    contributes at most once per month)."""
    from ccnerx_ray.functions.grouping import drop_duplicate_rows, grouped_reduce

    ds_l = _read(sf_dir, "lineitem", ["l_shipdate"])
    ds_o = _read(sf_dir, "orders", ["o_orderdate"])

    def to_month(col: str, w: int):
        def fn(batch: pa.Table) -> pa.Table:
            c = batch.column(col)
            ym = pc.add(pc.multiply(pc.cast(pc.year(c), pa.int64()), 100),
                        pc.cast(pc.month(c), pa.int64()))
            return pa.table({"ship_ym": ym, "w": pa.array(
                np.full(batch.num_rows, w, dtype=np.int64))})
        return fn

    ship = drop_duplicate_rows(
        ds_l.map_batches(to_month("l_shipdate", 1), batch_format="pyarrow"),
        ["ship_ym", "w"], num_buckets=32)
    order = drop_duplicate_rows(
        ds_o.map_batches(to_month("o_orderdate", 2), batch_format="pyarrow"),
        ["ship_ym", "w"], num_buckets=32)

    sums = grouped_reduce(ship.union(order), ["ship_ym"], {"w": "sum"},
                          num_buckets=16,
                          out_dtypes={"ship_ym": "int64", "w": "int64"})
    return sums.filter(expr="w == 1").select_columns(["ship_ym"])


ORACLE_NOORDER_SHIP_MONTHS = """
SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ship_ym
FROM lineitem
EXCEPT
SELECT year(o_orderdate) * 100 + month(o_orderdate)
FROM orders
"""

RELATIONAL2_QUERIES["noorder_ship_months"] = q_noorder_ship_months
RELATIONAL2_ORACLE["noorder_ship_months"] = ORACLE_NOORDER_SHIP_MONTHS


# ------------------------------------------------------ multi-way join (Q5)
def q_regional_nation_revenue(sf_dir: str):
    """TPC-H Q5 shape: a FIVE-table join chain (region → nation →
    customer → orders → lineitem → supplier) with the classic
    local-supplier condition ``s_nationkey = c_nationkey``. Demonstrates
    join *chaining* through :func:`adaptive_join` — each hop re-decides
    broadcast vs hash-shuffle from the build side's measured bytes, so at
    bench scale the whole chain is shuffle-free (customer/supplier
    projections are ~100 KB) while at 100 TB the two fact-fact hops
    (orders ⋈ customer, lineitem ⋈ orders) flip to hash joins sized by
    :func:`derive_hash_partitions`.

    Exactness: per-row revenue is computed in integer TEN-THOUSANDTHS
    (``round(price·100) · (100 − round(disc·100))``) so the grouped sum
    is association-order-free and hash-identical to the oracle (the
    float expression ``sum(price·(1−disc))`` would drift by ulps).
    Overflow bound: ≤1e9 per row → int64 safe to ~9e9 rows per nation;
    the oracle casts its HUGEINT sum back to BIGINT identically.

    Reference analogue: the J2/J3 catalog-lookup family chained with the
    G3 grouped count (SURVEY §2.5/§2.6) — this is the relational stress
    shape those lookups take at warehouse scale."""
    import ray

    from ccnerx_ray.ops.join import adaptive_join

    # dims (region=5 rows, nation=25) — driver-side read is the correct
    # plan at ANY scale; the nation map rides to workers via closure
    # capture of a 25-entry dict (object-store broadcast).
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"]).take_all()
    region = {r["r_regionkey"] for r in _read(
        sf_dir, "region", ["r_regionkey", "r_name"]).take_all()
        if r["r_name"] == "ASIA"}
    nkey2name = {r["n_nationkey"]: r["n_name"] for r in nation
                 if r["n_regionkey"] in region}
    nkeys = np.array(sorted(nkey2name), dtype=np.int64)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def in_region(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("c_nationkey"),
                        value_set=pa.array(nkeys))
        return batch.filter(mask)

    cust = cust.map_batches(in_region, batch_format="pyarrow")

    import datetime

    import pyarrow.compute as _pc
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=((_pc.field("o_orderdate")
                 >= datetime.date(1996, 1, 1)) &
                (_pc.field("o_orderdate")
                 < datetime.date(1997, 1, 1))))

    oc = adaptive_join(orders, cust, on="o_custkey", right_on="c_custkey",
                       join_type="inner")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def to_rev(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), 100.0)), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            batch.column("l_discount"), 100.0)), pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                             disc))
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "l_suppkey": batch.column("l_suppkey"),
                         "rev_tt": rev})

    li = li.map_batches(to_rev, batch_format="pyarrow")
    lo = adaptive_join(li, oc, on="l_orderkey", right_on="o_orderkey",
                       join_type="inner")

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    los = adaptive_join(lo, supp, on="l_suppkey", right_on="s_suppkey",
                        join_type="inner")

    def local_only(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("s_nationkey"),
                                      batch.column("c_nationkey")))
        name = pa.array([nkey2name[k] for k in
                         batch.column("c_nationkey").to_pylist()],
                        pa.string())
        return pa.table({"n_name": name, "rev_tt": batch.column("rev_tt")})

    per_nation = los.map_batches(local_only, batch_format="pyarrow")
    return grouped_reduce(per_nation, ["n_name"], {"rev_tt": "sum"},
                          num_buckets=16, pre_combine=True,
                          out_dtypes={"n_name": "string",
                                      "rev_tt": "int64"}) \
        .map_batches(lambda b: b.rename_columns(["n_name", "revenue_tt"]),
                     batch_format="pyarrow")


ORACLE_REGIONAL_NATION_REVENUE = """
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_tt
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
"""

RELATIONAL2_QUERIES["regional_nation_revenue"] = q_regional_nation_revenue
RELATIONAL2_ORACLE["regional_nation_revenue"] = ORACLE_REGIONAL_NATION_REVENUE


# ------------------------------------------------ correlated subquery (Q17)
def q_parts_above_brand_avg(sf_dir: str):
    """Correlated-subquery shape (TPC-H Q17 family): parts priced above
    their own brand's average retail price. Distributed plan: scan 1
    builds per-brand ``(count, sum_cents)`` partials inside each batch
    (pre-combined — the shuffle carries ~|brands| rows per batch, never
    part-scale); the tiny brand table broadcasts back as a dict and scan
    2 filters vectorized. The fact table is never shuffled and the
    comparison ``price_cents · n > sum_cents`` stays in integers, so no
    division/ulp hazard exists on either engine.

    The brand table is asserted small (low-cardinality group key); at
    100 TB the same plan holds because brand cardinality is fixed by the
    schema, not the data volume."""
    brands = grouped_reduce(
        _read(sf_dir, "part", ["p_brand", "p_retailprice"]).map_batches(
            lambda b: pa.table({
                "p_brand": b.column("p_brand"),
                "price_cents": pc.cast(pc.round(pc.multiply(
                    b.column("p_retailprice"), 100.0)), pa.int64()),
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64))}),
            batch_format="pyarrow"),
        ["p_brand"], {"price_cents": "sum", "n": "sum"}, num_buckets=8,
        pre_combine=True,
        out_dtypes={"p_brand": "string", "price_cents": "int64",
                    "n": "int64"}).take_all()
    assert len(brands) < 100_000, "brand cardinality exploded"
    b_n = {r["p_brand"]: r["n"] for r in brands}
    b_sum = {r["p_brand"]: r["price_cents"] for r in brands}

    def above_avg(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("p_retailprice"), 100.0)), pa.int64()).to_numpy()
        br = batch.column("p_brand").to_pylist()
        n = np.array([b_n[x] for x in br], dtype=np.int64)
        s = np.array([b_sum[x] for x in br], dtype=np.int64)
        mask = cents * n > s
        return pa.table({"p_partkey": batch.column("p_partkey")
                         .to_numpy()[mask],
                         "p_brand": pa.array([x for x, m in zip(br, mask)
                                              if m], pa.string()),
                         "price_cents": cents[mask]})

    return _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_retailprice"]).map_batches(
        above_avg, batch_format="pyarrow")


ORACLE_PARTS_ABOVE_BRAND_AVG = """
WITH b AS (SELECT p_brand, count(*) AS n,
                  SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS s
           FROM part GROUP BY p_brand)
SELECT p_partkey, p.p_brand,
       CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
FROM part p JOIN b ON p.p_brand = b.p_brand
WHERE CAST(round(p_retailprice * 100) AS BIGINT) * b.n > b.s
"""

RELATIONAL2_QUERIES["parts_above_brand_avg"] = q_parts_above_brand_avg
RELATIONAL2_ORACLE["parts_above_brand_avg"] = ORACLE_PARTS_ABOVE_BRAND_AVG
