"""Fourth wave of oracle-checked queries — operator families the first
three waves don't cover:

* per-group extreme ROW (argmax / ``SELECT DISTINCT ON``) via the
  associative combiner in ``functions/grouping.py:grouped_argextreme``
  — the "best mention per entity" shape of a KG pipeline;
* per-group MODE (most frequent value, deterministic tie-break) —
  count-then-argextreme, a two-level grouped reduce;
* calendar-week truncation (``date_trunc('week')``, Monday-start) —
  the only calendar grain the earlier waves' month/day queries miss;
* RANGE-frame moving window (7-day moving sum over an aggregated daily
  series — RANGE, not ROWS: missing days shrink the window);
* exact triangle counting over the supplier co-supply graph
  (``ops/graph.py:triangle_count``, degree-ordered wedge join);
* filter against a global aggregate with ties kept (TPC-H Q15);
* JSON field extraction (one vectorized arrow regex kernel, no per-row
  json.loads) with grouped stats;
* per-user temporal conversion funnel (click→purchase within 1 h;
  co-grouped streams + searchsorted — no window self-join);
* exact integer percent-of-total (per-mille revenue share).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ccnerx_ray.functions.grouping import (coarse_grouped, drop_duplicate_rows,
                                           grouped_argextreme, grouped_reduce)
from ccnerx_ray.queries.relational import _read


# ------------------------------------------------- argmax per group
def q_top_order_per_customer(sf_dir: str):
    """The single most expensive order per customer (ties broken to the
    lowest orderkey): the ``SELECT DISTINCT ON`` / argmax-row shape. The
    per-batch combiner reduces each batch to its per-customer winners
    before the shuffle, so the exchange carries ~distinct-customers-per-
    batch rows — never the fact table."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        p = batch.column("o_totalprice").to_numpy()
        cents = (np.sign(p) * np.floor(np.abs(p) * 100 + 0.5)).astype(np.int64)
        return pa.table({"o_custkey": batch.column("o_custkey"),
                         "o_orderkey": batch.column("o_orderkey"),
                         "price_cents": pa.array(cents, pa.int64())})

    return grouped_argextreme(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        ["o_custkey"], ["price_cents", "o_orderkey"], [False, True],
        num_buckets=64,
        out_dtypes={"o_custkey": "int64", "o_orderkey": "int64",
                    "price_cents": "int64"})


ORACLE_TOP_ORDER_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders
QUALIFY row_number() OVER (
    PARTITION BY o_custkey
    ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
) = 1
"""


# ---------------------------------------------------- mode per group
def q_brand_mode_type(sf_dir: str):
    """Most frequent part TYPE per brand (ties → lexicographically
    smallest type): MODE as count-then-argextreme. Both levels are
    associative — per-batch counts pre-combine, then winners of winners."""
    ds = _read(sf_dir, "part", ["p_brand", "p_type"])

    def ones(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n", pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    counts = grouped_reduce(
        ds.map_batches(ones, batch_format="pyarrow"),
        ["p_brand", "p_type"], {"n": "sum"}, num_buckets=32,
        out_dtypes={"p_brand": "string", "p_type": "string",
                    "n": "int64"},
        pre_combine=True)
    return grouped_argextreme(
        counts, ["p_brand"], ["n", "p_type"], [False, True],
        num_buckets=16,
        out_dtypes={"p_brand": "string", "p_type": "string",
                    "n": "int64"})


ORACLE_BRAND_MODE_TYPE = """
WITH c AS (
  SELECT p_brand, p_type, CAST(count(*) AS BIGINT) AS n
  FROM part GROUP BY 1, 2
)
SELECT p_brand, p_type, n FROM c
QUALIFY row_number() OVER (
    PARTITION BY p_brand ORDER BY n DESC, p_type
) = 1
"""


# ------------------------------------------------ calendar week grain
def q_weekly_revenue(sf_dir: str):
    """Order revenue by ISO week (``date_trunc('week')``: Monday-start).
    Weeks reported as epoch DAYS of the Monday (integer — exact compare);
    revenue in cents (per-value rounding, order-free int sum)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def to_week(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("o_orderdate"), pa.int64()).to_numpy()
        d = us // 86_400_000_000
        # epoch day 0 = Thursday; Monday ⇔ (d + 3) % 7 == 0
        week = d - ((d + 3) % 7)
        p = batch.column("o_totalprice").to_numpy()
        cents = (np.sign(p) * np.floor(np.abs(p) * 100 + 0.5)).astype(np.int64)
        return pa.table({"week_day": pa.array(week, pa.int64()),
                         "revenue_cents": pa.array(cents, pa.int64())})

    return grouped_reduce(
        ds.map_batches(to_week, batch_format="pyarrow"),
        ["week_day"], {"revenue_cents": "sum"}, num_buckets=32,
        out_dtypes={"week_day": "int64", "revenue_cents": "int64"},
        pre_combine=True)


ORACLE_WEEKLY_REVENUE = """
SELECT CAST(CAST(date_trunc('week', o_orderdate) AS DATE) - DATE '1970-01-01' AS BIGINT)
         AS week_day,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders GROUP BY 1
"""


# ------------------------------------- RANGE-frame moving window
def q_events_moving_week(sf_dir: str):
    """Per event type, the 7-day MOVING SUM of daily event counts —
    a RANGE frame (days within [day-6, day]), not ROWS: missing days
    shrink the window. Ray shape: distributed count to the (type, day)
    grain, then a coarse-grouped per-type prefix-sum difference
    (``cumsum[i] - cumsum[first day ≥ day-6]`` via searchsorted) — the
    raw events never sort, only the aggregated series does."""
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
    win_ms = 6 * 86_400_000

    def local(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            grp = grp.sort_values("day_ms")
            days = grp["day_ms"].to_numpy()
            n = grp["one"].to_numpy()
            cs = np.concatenate([[0], np.cumsum(n)])
            lo = np.searchsorted(days, days - win_ms, side="left")
            out.append(pd.DataFrame({
                "event_type": et, "day_ms": days, "n_events": n,
                "week_sum": cs[1 + np.arange(len(days))] - cs[lo]}))
        if not out:
            return pd.DataFrame()
        return pd.concat(out, ignore_index=True)

    return coarse_grouped(daily, ["event_type"], local, num_buckets=8,
                          out_dtypes={"event_type": "string",
                                      "day_ms": "int64",
                                      "n_events": "int64",
                                      "week_sum": "int64"})


ORACLE_EVENTS_MOVING_WEEK = """
WITH d AS (
  SELECT event_type, (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, day_ms, n_events,
       CAST(SUM(n_events) OVER (PARTITION BY event_type ORDER BY day_ms
                                RANGE BETWEEN 518400000 PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS week_sum
FROM d
"""


# --------------------------------------------------- triangle count
def q_supplier_triangles(sf_dir: str):
    """Exact triangle count of the supplier co-supply graph (suppliers
    linked when they both ship a low-quantity lineitem in the same
    order). Per-order pair emission is bounded (≤7 lineitems/order);
    the count itself is ops/graph.py:triangle_count — degree-ordered
    wedge join, O(m^1.5) wedge bound, scalar-only driver traffic."""
    from ccnerx_ray.ops.graph import triangle_count

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_quantity"])

    def filt(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch.column("l_quantity"), 5))
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "l_suppkey": batch.column("l_suppkey")})

    def order_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # np.unique dedupes (orderkey, suppkey) repeats inside the order
        # group — the separate upstream drop_duplicate_rows shuffle was
        # redundant with this sort
        us, vs = [], []
        for _, grp in g.groupby("l_orderkey", sort=False):
            s = np.unique(grp["l_suppkey"].to_numpy(np.int64))
            if len(s) < 2:
                continue
            iu = np.triu_indices(len(s), 1)
            us.append(s[iu[0]])
            vs.append(s[iu[1]])
        if not us:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        return pd.DataFrame({"u": np.concatenate(us),
                             "v": np.concatenate(vs)})

    # cross-order duplicate pairs flow straight into triangle_count —
    # it tolerates duplicate edges by design (multigraph degrees are a
    # deterministic rank; wedge adjacency dedupes in-memory), so the
    # (u, v) dedup all-to-all disappears too
    edges = coarse_grouped(ds.map_batches(filt, batch_format="pyarrow"),
                           ["l_orderkey"], order_pairs, num_buckets=32,
                           out_dtypes={"u": "int64", "v": "int64"})
    n = triangle_count(edges)
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


def _triangle_oracle() -> str:
    from ccnerx_ray.ops.graph import triangle_oracle_sql
    return triangle_oracle_sql(
        "WITH s AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem "
        "WHERE l_quantity < 5) "
        "SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v "
        "FROM s a JOIN s b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_suppkey < b.l_suppkey")


RELATIONAL4_QUERIES = {
    "top_order_per_customer": q_top_order_per_customer,
    "brand_mode_type": q_brand_mode_type,
    "weekly_revenue": q_weekly_revenue,
    "events_moving_week": q_events_moving_week,
    "supplier_triangles": q_supplier_triangles,
}

RELATIONAL4_ORACLE = {
    "top_order_per_customer": ORACLE_TOP_ORDER_PER_CUSTOMER,
    "brand_mode_type": ORACLE_BRAND_MODE_TYPE,
    "weekly_revenue": ORACLE_WEEKLY_REVENUE,
    "events_moving_week": ORACLE_EVENTS_MOVING_WEEK,
    "supplier_triangles": _triangle_oracle(),
}


# ----------------------------- filter vs a global aggregate (Q15 shape)
def q_top_revenue_suppliers(sf_dir: str):
    """Suppliers whose total lineitem revenue equals the GLOBAL maximum
    (TPC-H Q15: a HAVING against a scalar aggregate of the same grouped
    view, ties kept). Revenue in cents with per-value rounding, so the
    distributed sum is order-free; the global max is a scalar reduce of
    the (small) per-supplier table and broadcasts for free in the driver
    plan — no second corpus scan, no self-join."""
    ds = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        p = batch.column("l_extendedprice").to_numpy()
        d = batch.column("l_discount").to_numpy()
        v = p * (1.0 - d)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(np.int64)
        return pa.table({"l_suppkey": batch.column("l_suppkey"),
                         "revenue_cents": pa.array(cents, pa.int64())})

    per_supp = grouped_reduce(
        ds.map_batches(rev, batch_format="pyarrow"),
        ["l_suppkey"], {"revenue_cents": "sum"}, num_buckets=32,
        out_dtypes={"l_suppkey": "int64", "revenue_cents": "int64"},
        pre_combine=True).materialize()
    best = per_supp.max("revenue_cents")
    return per_supp.map_batches(
        lambda b: b.filter(pc.equal(b.column("revenue_cents"), best)),
        batch_format="pyarrow")


ORACLE_TOP_REVENUE_SUPPLIERS = """
WITH r AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem GROUP BY 1
)
SELECT * FROM r WHERE revenue_cents = (SELECT max(revenue_cents) FROM r)
"""

RELATIONAL4_QUERIES["top_revenue_suppliers"] = q_top_revenue_suppliers
RELATIONAL4_ORACLE["top_revenue_suppliers"] = ORACLE_TOP_REVENUE_SUPPLIERS


# ------------------------------------------------ JSON extraction
def q_event_props_stats(sf_dir: str):
    """Per-type stats of a JSON payload field: ``props`` is a JSON string
    column; ``$.k`` is pulled with ONE vectorized arrow regex kernel
    (``pc.extract_regex`` — no per-row json.loads), then a mergeable
    grouped reduce. The semi-structured-column shape every event log
    needs at 100 TB: extraction cost is a single C pass per batch."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": batch.column("event_type"),
                         "k_sum": k, "k_min": k, "k_max": k,
                         "n": pa.array(np.ones(batch.num_rows,
                                               dtype=np.int64))})

    return grouped_reduce(
        ds.map_batches(extract, batch_format="pyarrow"),
        ["event_type"],
        {"k_sum": "sum", "k_min": "min", "k_max": "max", "n": "sum"},
        num_buckets=8,
        out_dtypes={"event_type": "string", "k_sum": "int64",
                    "k_min": "int64", "k_max": "int64", "n": "int64"},
        pre_combine=True)


ORACLE_EVENT_PROPS_STATS = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_min,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_max,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""


# --------------------------------------------- temporal funnel
def q_click_purchase_funnel(sf_dir: str):
    """Per-user conversion funnel: how many of a user's clicks are
    followed by one of their purchases within one hour. The two event
    streams co-group on user (ONE shuffle of the two filtered types);
    inside each user the match is a vectorized searchsorted against the
    sorted purchase times — no per-event join, no window self-join."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    hour_us = 3_600_000_000

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column("event_type"),
                     value_set=pa.array(["click", "purchase"]))
        batch = batch.filter(m)
        return pa.table({
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "ts_us": pc.cast(batch.column("ts"), pa.int64()),
        })

    def local(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, grp in g.groupby("user_id", sort=False):
            clicks = np.sort(
                grp.loc[grp["event_type"] == "click", "ts_us"].to_numpy())
            if len(clicks) == 0:
                continue
            purch = np.sort(
                grp.loc[grp["event_type"] == "purchase", "ts_us"]
                   .to_numpy())
            if len(purch):
                pos = np.searchsorted(purch, clicks, side="right")
                conv = (pos < len(purch)) & \
                       (purch[np.minimum(pos, len(purch) - 1)]
                        <= clicks + hour_us)
                n_conv = int(conv.sum())
            else:
                n_conv = 0
            out.append((uid, len(clicks), n_conv))
        if not out:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n_clicks": pd.Series(dtype="int64"),
                                 "n_converted": pd.Series(dtype="int64")})
        a = np.asarray(out, dtype=np.int64)
        return pd.DataFrame({"user_id": a[:, 0], "n_clicks": a[:, 1],
                             "n_converted": a[:, 2]})

    return coarse_grouped(
        ds.map_batches(keep, batch_format="pyarrow"), ["user_id"], local,
        num_buckets=64,
        out_dtypes={"user_id": "int64", "n_clicks": "int64",
                    "n_converted": "int64"})


ORACLE_CLICK_PURCHASE_FUNNEL = """
SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_clicks,
       CAST(SUM(CASE WHEN EXISTS (
           SELECT 1 FROM events p
           WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
             AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
       ) THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM events c WHERE c.event_type = 'click'
GROUP BY 1
"""


# ------------------------------------------- percent of total
def q_nation_revenue_share(sf_dir: str):
    """Revenue share per nation in exact per-mille (integer floor
    division against the global total): the percent-of-total window
    shape without a window — one broadcast customer→nation join, one
    mergeable grouped sum, one scalar total, one vectorized division."""
    from ccnerx_ray.ops.join import adaptive_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        p = batch.column("o_totalprice").to_numpy()
        c = (np.sign(p) * np.floor(np.abs(p) * 100 + 0.5)).astype(np.int64)
        return pa.table({"o_custkey": batch.column("o_custkey"),
                         "rev": pa.array(c, pa.int64())})

    joined = adaptive_join(orders.map_batches(cents, batch_format="pyarrow"),
                           cust, on="o_custkey", right_on="c_custkey")
    per_nation = grouped_reduce(
        joined.map_batches(
            lambda b: pa.table({"c_nationkey": b.column("c_nationkey"),
                                "rev": b.column("rev")}),
            batch_format="pyarrow"),
        ["c_nationkey"], {"rev": "sum"}, num_buckets=8,
        out_dtypes={"c_nationkey": "int64", "rev": "int64"},
        pre_combine=True).materialize()
    total = per_nation.sum("rev")

    def share(batch: pa.Table) -> pa.Table:
        r = batch.column("rev").to_numpy()
        return pa.table({
            "c_nationkey": batch.column("c_nationkey"),
            "revenue_cents": batch.column("rev"),
            "share_pm": pa.array(r * 1000 // total, pa.int64()),
        })

    return per_nation.map_batches(share, batch_format="pyarrow")


ORACLE_NATION_REVENUE_SHARE = """
WITH n AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
)
SELECT c_nationkey, revenue_cents,
       CAST(revenue_cents * 1000 //
            (SELECT SUM(revenue_cents) FROM n) AS BIGINT) AS share_pm
FROM n
"""

RELATIONAL4_QUERIES["event_props_stats"] = q_event_props_stats
RELATIONAL4_ORACLE["event_props_stats"] = ORACLE_EVENT_PROPS_STATS
RELATIONAL4_QUERIES["click_purchase_funnel"] = q_click_purchase_funnel
RELATIONAL4_ORACLE["click_purchase_funnel"] = ORACLE_CLICK_PURCHASE_FUNNEL
RELATIONAL4_QUERIES["nation_revenue_share"] = q_nation_revenue_share
RELATIONAL4_ORACLE["nation_revenue_share"] = ORACLE_NATION_REVENUE_SHARE


# ------------------------------------------------- key-skew diagnosis
def q_key_skew(sf_dir: str):
    """Shuffle-planning skew profile of the event stream's user key
    (ops/profile.py:key_skew): order-free integer HHI over per-key
    counts — mergeable sums only, no key sort, blocks-scale driver
    traffic."""
    from ccnerx_ray.ops.profile import key_skew
    return key_skew(_read(sf_dir, "events", ["user_id"]), "user_id")


ORACLE_KEY_SKEW = """
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1
)
SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(c) AS BIGINT) AS max_count,
       CAST((1000000 * sum(CAST(c AS HUGEINT) * c)) //
            (CAST(sum(c) AS HUGEINT) * sum(c)) AS BIGINT) AS hhi_ppm
FROM c
"""


# ------------------------------------------------- FULL OUTER join
def q_clicks_purchases_outer(sf_dir: str):
    """Per-user HIGH-VALUE click vs purchase counts through a native
    FULL OUTER hash join (`Dataset.join(join_type="full_outer")`) of two
    natively-aggregated sides — the one join type the §2.5 family didn't
    yet register. The value>200 filter makes the sides genuinely
    asymmetric at every sf, so users with only one activity keep their
    row with a NULL on the other side (the oracle's FULL OUTER NULLs,
    not COALESCE zeros; both NULL directions occur in the data).

    The sides are Ray-NATIVE ``groupby().count()`` aggregations, not the
    repo's coarse co-group: ``Dataset.join`` concatenates raw partition
    blocks into acero and cannot unify the schema-less empty blocks
    ``coarse_grouped``'s pandas ``map_groups`` leaves behind (the
    documented hazard ``lookup_join_on`` exists to tolerate) — the
    native aggregation emits fully-schemed partitions."""
    from ccnerx_ray.ops.join import derive_hash_partitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def side(event_type: str):
        # the trailing repartition physically rebuilds blocks, which
        # dissolves the ZERO-COLUMN empty blocks an aggregation over
        # filtered (partly empty) inputs leaves behind — acero inside
        # Dataset.join cannot unify those ("No match ... FieldRef")
        return (ev.filter(expr=f"event_type == '{event_type}' "
                               f"and value > 200")
                  .groupby("user_id").count().repartition(8))

    joined = side("click").join(
        side("purchase"), "full_outer",
        derive_hash_partitions(ev.size_bytes()),
        on=("user_id",), left_suffix="_c", right_suffix="_p")
    return joined.rename_columns({"count()_c": "n_clicks",
                                  "count()_p": "n_purchases"})


ORACLE_CLICKS_PURCHASES_OUTER = """
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks
  FROM events WHERE event_type = 'click' AND value > 200 GROUP BY 1
), p AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase' AND value > 200 GROUP BY 1
)
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       c.n_clicks, p.n_purchases
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
"""

RELATIONAL4_QUERIES["key_skew"] = q_key_skew
RELATIONAL4_ORACLE["key_skew"] = ORACLE_KEY_SKEW
RELATIONAL4_QUERIES["clicks_purchases_outer"] = q_clicks_purchases_outer
RELATIONAL4_ORACLE["clicks_purchases_outer"] = ORACLE_CLICKS_PURCHASES_OUTER


# ------------------------------------------------- retention cohorts
def q_user_retention(sf_dir: str):
    """Cohort retention matrix over the event stream: users grouped by
    their FIRST-event epoch-week, counted distinct in every later week
    they return → ``(cohort_week, week_offset, n_users)`` — the
    daily-health table every activity pipeline derives.

    Week grain is pure integer arithmetic (``epoch_us // 604800000000``
    — no calendar library on either engine). Shape: one combiner scan
    to distinct ``(user, week)`` pairs (occurrences never cross the
    shuffle), a user-keyed min-reduce for the cohort, one adaptive join
    to attach it, and a partial-count reduce per (cohort, offset) —
    the pair table is globally distinct BEFORE counting, so per-batch
    partial counts sum exactly."""
    from ccnerx_ray.ops import join as joinmod

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_weeks(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        wk = us // 604_800_000_000
        out = pd.DataFrame({
            "user_id": batch.column("user_id").to_numpy(
                zero_copy_only=False),
            "wk": wk}).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = drop_duplicate_rows(
        ds.map_batches(to_weeks, batch_format="pyarrow"),
        ["user_id", "wk"], num_buckets=64)
    pairs = pairs.materialize()      # two consumers: cohort min + join
    cohort = grouped_reduce(pairs, ["user_id"], {"wk": "min"},
                            num_buckets=64,
                            out_dtypes={"user_id": "int64",
                                        "wk": "int64"})
    cohort = cohort.map_batches(
        lambda b: b.rename_columns(["user_id", "cohort_week"]),
        batch_format="pyarrow")
    j = joinmod.adaptive_join(pairs, cohort, on="user_id")

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cohort_week": batch.column("cohort_week").to_numpy(
                zero_copy_only=False),
            "week_offset": (batch.column("wk").to_numpy(
                zero_copy_only=False)
                - batch.column("cohort_week").to_numpy(
                    zero_copy_only=False)),
        })
        out = (df.groupby(["cohort_week", "week_offset"], sort=False)
               .size().rename("n_users").reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = j.map_batches(partial_counts, batch_format="pyarrow")
    return grouped_reduce(parts, ["cohort_week", "week_offset"],
                          {"n_users": "sum"}, num_buckets=16,
                          out_dtypes={"cohort_week": "int64",
                                      "week_offset": "int64",
                                      "n_users": "int64"})


ORACLE_USER_RETENTION = """
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
  FROM events
), f AS (
  SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id
), a AS (
  SELECT DISTINCT e.user_id, f.cohort_week, e.wk
  FROM e JOIN f USING (user_id)
)
SELECT cohort_week, CAST(wk - cohort_week AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY cohort_week, wk
"""

RELATIONAL4_QUERIES["user_retention"] = q_user_retention
RELATIONAL4_ORACLE["user_retention"] = ORACLE_USER_RETENTION
