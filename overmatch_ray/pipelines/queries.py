"""The driver-facing query suite: every operator family from SURVEY.md §2
expressed through this engine's Ray Data operators, each paired (where SQL
can express it) with a DuckDB oracle over the same parquet tables.

Conventions (driver contract):
- each query fn takes ``sf_dir`` and returns a Dataset / pyarrow Table
- output column names match the oracle SQL exactly
- float aggregates are rounded identically on both sides (the driver
  value-hashes; unrounded float reductions are order-sensitive)

The oracle SQL strings live in ``ORACLE_SQL`` next to their queries so the
pair stays in sync.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

ORACLE_SQL: dict[str, str] = {}


def _read(sf_dir: str, table: str, columns=None):
    """Row-aware read: block count sized from the parquet footer's row
    count (one metadata read, no data pass). Ray's default split hands a
    5000-row table 64 blocks, and every downstream all-to-all then pays
    ~2s of pure per-block coordination (measured: priority_revenue 5.3s →
    2.8s, pack_sequences Sort 1.9s → sub-second after coalescing). Results
    are partitioning-invariant by contract, so block count is a pure
    performance knob."""
    from ..sources import read_parquet_clean

    path = f"{sf_dir}/{table}.parquet"
    nb = None
    try:
        import pyarrow.parquet as pq

        rows = pq.ParquetFile(path).metadata.num_rows
        nb = max(4, min(64, -(-rows // 20_000)))
    except Exception:
        pass
    return read_parquet_clean(path, columns=columns, override_num_blocks=nb)


def _round_col(t: pa.Table, col: str, nd: int) -> pa.Table:
    i = t.schema.get_field_index(col)
    return t.set_column(i, col, pc.round(t[col], ndigits=nd))


def _cents(x) -> np.ndarray:
    """Exact int64 cents from a 2-decimal float dollar column. Money sums
    run in INTEGER cents (and 1e-4 units for price×rate products) so the
    engine's result is exact at any SF — float summation error at 1e9+
    magnitudes exceeds half a cent and makes round(sum(...), 2) disagree
    between engines; the DuckDB oracles use DECIMAL sums for the same
    reason."""
    return np.rint(np.asarray(x, np.float64) * 100.0).astype(np.int64)


def _half_away_cents(units_1e4: np.ndarray) -> np.ndarray:
    """1e-4-dollar integer units → cents, rounding half AWAY from zero
    (DuckDB DECIMAL round semantics; numpy would round half-even)."""
    u = np.asarray(units_1e4, np.int64)
    return np.sign(u) * ((np.abs(u) * 2 + 100) // 200)


# ---------------------------------------------------------------------------
# 1. pricing_summary — A2-style grouped aggregate with partial pre-agg
# ---------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    """Grouped aggregate with per-batch PARTIAL pre-aggregation (combiner)
    before the shuffle — the scale pattern for A2/A4 (ray_guide §agg)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us")))
        )
        base_c = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        disc_h = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                "qty": _cents(batch["l_quantity"].to_numpy(zero_copy_only=False)),
                "base": base_c,
                "disc": base_c * (100 - disc_h),  # exact 1e-4 dollars
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base=("base", "sum"),
            sum_disc=("disc", "sum"),
            n=("qty", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base", alias_name="sum_base"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("n", alias_name="count_order"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["count_order"].to_numpy(zero_copy_only=False)
        qty_c = batch["sum_qty"].to_numpy(zero_copy_only=False)
        base_c = batch["sum_base"].to_numpy(zero_copy_only=False)
        disc4 = batch["sum_disc"].to_numpy(zero_copy_only=False)
        # avg in exact integer 1e-4 units with half-away rounding — a float
        # quotient CAN land exactly on a representable 4-decimal midpoint
        # (e.g. 805/32), where np.round (half-even) and the oracle's round
        # (half-away) would disagree; the oracle mirrors this integer form
        avg4 = (qty_c * 100 * 2 + n) // (2 * n)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pa.array(qty_c / 100.0),
                "sum_base_price": pa.array(base_c / 100.0),
                "sum_disc_price": pa.array(_half_away_cents(disc4) / 100.0),
                "avg_qty": pa.array(avg4 / 10000.0),
                "count_order": batch["count_order"],
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


# money sums in DECIMAL (exact at any SF; see _cents)
ORACLE_SQL["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
                                                                   AS sum_disc_price,
       (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) * 200
        + count(*)) // (2 * count(*)) / 10000.0                    AS avg_qty,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# 2. revenue_filter — M5/M23-style predicate + projection (TPC-H Q6 shape)
# ---------------------------------------------------------------------------


def q_revenue_filter(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity",
                                    "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"]
        disc = batch["l_discount"]
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(sd, pa.scalar(np.datetime64("1996-01-01", "us"))),
                pc.less(sd, pa.scalar(np.datetime64("1997-01-01", "us"))),
            ),
            pc.and_(
                pc.and_(pc.greater_equal(disc, pa.scalar(0.05)),
                        pc.less_equal(disc, pa.scalar(0.07))),
                pc.less(batch["l_quantity"], pa.scalar(24.0)),
            ),
        )
        f = batch.filter(mask)
        units4 = int(
            np.sum(
                _cents(f["l_extendedprice"].to_numpy(zero_copy_only=False))
                * _cents(f["l_discount"].to_numpy(zero_copy_only=False))
            )
        )  # exact 1e-4 dollars
        return pa.table(
            {"revenue": pa.array([units4], pa.int64()),
             "n_items": pa.array([f.num_rows])}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .sum(["revenue", "n_items"])
    )
    cents = _half_away_cents(np.array([out["sum(revenue)"]]))[0]
    return pa.table(
        {
            "revenue": pa.array([cents / 100.0]),
            "n_items": pa.array([int(out["sum(n_items)"])], pa.int64()),
        }
    )


ORACLE_SQL["revenue_filter"] = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# 3. segment_orders — broadcast join (J2 pattern)
# ---------------------------------------------------------------------------


def q_segment_orders(sf_dir: str):
    from ..stages.joins import broadcast_join

    cust = pa.concat_tables(
        [pa.table(b) for b in
         _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).iter_batches(
             batch_format="pyarrow")]
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("o_totalprice"),
            "o_totalprice",
            pa.array(_cents(b["o_totalprice"].to_numpy(zero_copy_only=False))),
        ),
        batch_format="pyarrow",
    )
    joined = broadcast_join(orders, cust, "o_custkey", "c_custkey")
    agg = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_price")
    )
    return agg.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("total_price"),
            "total_price",
            pa.array(b["total_price"].to_numpy(zero_copy_only=False) / 100.0),
        ),
        batch_format="pyarrow",
    )


ORACLE_SQL["segment_orders"] = """
SELECT c_mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# 4. priority_revenue — bucketed co-shuffle hash join (both sides large)
# ---------------------------------------------------------------------------


def q_priority_revenue(sf_dir: str):
    from ..stages.joins import bucket_hash_join

    # block widths come row-aware from _read (the join's sort-shuffle paid
    # per-block coordination far above compute at the default 64+64 split;
    # measured at sf0.1: 5.3s -> 2.8s)
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def rev(batch: pa.Table) -> pa.Table:
        r = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False)) * (
            100 - _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        )  # exact 1e-4 dollars
        return pa.table(
            {"l_orderkey": batch["l_orderkey"], "rev": pa.array(r)}
        )

    li_rev = li.map_batches(rev, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = bucket_hash_join(li_rev, orders, "l_orderkey", "o_orderkey", num_buckets=32)

    # partial pre-aggregation per block (combiner) — the final groupby then
    # shuffles ≤ 5 rows per block instead of the full join output
    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": batch["o_orderpriority"].to_pandas(),
                "rev": batch["rev"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("o_orderpriority", as_index=False).agg(
            rev=("rev", "sum"), n=("rev", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("rev", alias_name="revenue"), Sum("n", alias_name="n_items"))
    )
    return agg.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("revenue"),
            "revenue",
            pa.array(
                _half_away_cents(b["revenue"].to_numpy(zero_copy_only=False)) / 100.0
            ),
        ),
        batch_format="pyarrow",
    )


ORACLE_SQL["priority_revenue"] = """
SELECT o_orderpriority,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# 5/6. semi + anti joins (J3/J4/J5 pattern)
# ---------------------------------------------------------------------------


# Above this many (upper-bound) right-side rows, the key set is not
# broadcast: the semi/anti join runs as a partitioned co-shuffle instead
# (stages.joins.semi_join_shuffled). The bound comes from parquet metadata
# (count of the projected read), so choosing the path costs no data pass.
SEMI_JOIN_BROADCAST_LIMIT = 5_000_000


def _custkeys_with_orders(sf_dir: str, urgent_only: bool = False) -> set:
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    if urgent_only:
        ds = ds.filter(expr="o_orderpriority == '1-URGENT'")
    return set(ds.unique("o_custkey"))


def _customers_semi(sf_dir: str, urgent_only: bool, anti: bool):
    from ..stages.joins import semi_join_filter, semi_join_shuffled

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    # raw read (no metadata-strip stage) so count() stays the parquet-
    # metadata fast path — no data pass to choose the join strategy
    if ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).count() <= SEMI_JOIN_BROADCAST_LIMIT:
        keys = _custkeys_with_orders(sf_dir, urgent_only=urgent_only)
        return semi_join_filter(cust, keys, "c_custkey", anti=anti)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    if urgent_only:
        orders = orders.filter(expr="o_orderpriority == '1-URGENT'")
    orders = orders.select_columns(["o_custkey"])
    return semi_join_shuffled(cust, orders, "c_custkey", "o_custkey", anti=anti)


def q_customers_with_orders(sf_dir: str):
    return _customers_semi(sf_dir, urgent_only=False, anti=False).groupby(
        "c_mktsegment"
    ).aggregate(Count(alias_name="n_customers"))


ORACLE_SQL["customers_with_orders"] = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
"""


def q_customers_without_orders(sf_dir: str):
    return _customers_semi(sf_dir, urgent_only=True, anti=True).groupby(
        "c_mktsegment"
    ).aggregate(Count(alias_name="n_customers"))


ORACLE_SQL["customers_without_orders"] = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def q_purchase_attribution(sf_dir: str):
    """As-of join (the brief's canonical custom operator): each click event
    attributed to the user's most recent at-or-before purchase. LEFT
    semantics — clicks with no prior purchase keep nulls. Timestamps are
    emitted as epoch microseconds for engine/oracle bit-parity."""
    from ..stages.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "ts", "user_id"]
    )

    def rn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_user": batch["user_id"],
                "p_ts": batch["ts"],
                "p_value": batch["value"],
            }
        )

    purchases = ev.filter(expr="event_type == 'purchase'").map_batches(
        rn, batch_format="pyarrow"
    )
    joined = asof_join(
        clicks, purchases, on="ts", right_on="p_ts", by="user_id",
        right_by="p_user", direction="backward",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "last_purchase_us": batch["p_ts"]
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "last_purchase_value": batch["p_value"],
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["purchase_attribution"] = """
SELECT e.event_id AS event_id,
       e.user_id AS user_id,
       epoch_us(e.ts) AS ts_us,
       epoch_us(p.ts) AS last_purchase_us,
       p.value AS last_purchase_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') e
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def q_error_window_events(sf_dir: str):
    """Interval (range-containment) join — each non-error event attributed
    to every 30-minute incident window opened by an 'error' event of the
    same user (stages.joins.interval_join: granule co-shuffle, intervals
    replicated ≤2×, one equi-merge + range filter per bucket)."""
    from ..stages.joins import interval_join

    MIN30_US = 1800 * 1_000_000
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    left = ev.filter(expr="event_type != 'error'").select_columns(
        ["event_id", "ts", "user_id"]
    )

    def to_windows(batch: pa.Table) -> pa.Table:
        f = batch.filter(pc.equal(batch["event_type"], "error"))
        end = pc.add(f["ts"].cast(pa.int64()), MIN30_US).cast(
            pa.timestamp("us")
        )
        return pa.table(
            {
                "window_id": f["event_id"],
                "w_user": f["user_id"],
                "w_start": f["ts"],
                "w_end": end,
            }
        )

    windows = ev.map_batches(to_windows, batch_format="pyarrow")
    out = interval_join(
        left,
        windows,
        on="ts",
        start_col="w_start",
        end_col="w_end",
        by="user_id",
        right_by="w_user",
        granule=MIN30_US,
    )
    return out.select_columns(["event_id", "window_id"])


ORACLE_SQL["error_window_events"] = """
SELECT e.event_id AS event_id, w.event_id AS window_id
FROM events e JOIN events w
  ON e.user_id = w.user_id
 AND w.event_type = 'error'
 AND e.event_type != 'error'
 AND e.ts >= w.ts AND e.ts < w.ts + INTERVAL 30 MINUTE
"""


# ---------------------------------------------------------------------------
# 7. top_orders — global top-k (O2/O3)
# ---------------------------------------------------------------------------


def q_top_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    # distributed top-k: per-batch partial top-10 → tiny global sort
    K = 10

    def partial(batch: pa.Table) -> pa.Table:
        # the partial MUST rank by the same (price desc, orderkey asc)
        # tie-break as the final sort, or rows tied at the k-th price are
        # dropped before the global merge can break the tie
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        k = min(K, len(tp))
        if k == 0:
            return batch
        order = np.lexsort((ok, -tp))[:k]
        return batch.take(pa.array(order))

    top = (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(K)
    )
    return top


ORACLE_SQL["top_orders"] = """
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# 8. distinct_flags (A5/D2)
# ---------------------------------------------------------------------------


def q_distinct_flags(sf_dir: str):
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count(alias_name="n")
    ).select_columns(["l_returnflag", "l_linestatus"])


ORACLE_SQL["distinct_flags"] = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


# ---------------------------------------------------------------------------
# 9. priority_top3 — per-group top-k (O1/O2 pattern)
# ---------------------------------------------------------------------------


def q_priority_top3(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(3)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return ds.groupby("o_orderpriority").map_groups(topk, batch_format="pandas")


ORACLE_SQL["priority_top3"] = """
SELECT o_orderkey, o_orderpriority, o_totalprice, rank FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# 10. hourly_events — tumbling window (§2.9 streaming analog)
# ---------------------------------------------------------------------------


def q_hourly_events(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def hour(batch: pa.Table) -> pa.Table:
        micros = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour_id": pa.array(micros // 3_600_000_000),
                "value": batch["value"],
            }
        )

    agg = (
        ds.map_batches(hour, batch_format="pyarrow")
        .groupby(["event_type", "hour_id"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return agg.map_batches(lambda b: _round_col(b, "sum_value", 2), batch_format="pyarrow")


ORACLE_SQL["hourly_events"] = """
SELECT event_type,
       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# 11. user_sessions — session windows (gap > 30 min) per user
# ---------------------------------------------------------------------------


def q_user_sessions(sf_dir: str):
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized across all users in the bucket: sort by (user, ts),
        # a session break = same-user gap > 1800 s
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        s = g["ts"].astype("int64").to_numpy() // 1_000_000
        u = g["user_id"].to_numpy()
        same_user = u[1:] == u[:-1]
        gap_break = same_user & (np.diff(s) > 1800)
        users, starts = np.unique(u, return_index=True)
        breaks_cum = np.concatenate([[0], np.cumsum(gap_break)])
        ends = np.concatenate([starts[1:], [len(u)]])
        n_sessions = 1 + (breaks_cum[ends - 1] - breaks_cum[starts])
        return pd.DataFrame(
            {"user_id": users, "n_sessions": n_sessions.astype(np.int64)}
        )

    return bucketed_group_apply(ds, ["user_id"], sessions_bucket, num_buckets=16)


ORACLE_SQL["user_sessions"] = """
WITH t AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         lag(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts) AS p
  FROM events)
SELECT user_id,
       count(CASE WHEN p IS NULL OR s - p > 1800 THEN 1 END) AS n_sessions
FROM t GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# 12. tracking_upsert — D1 first_seen/last_seen merge over events
# ---------------------------------------------------------------------------


def q_tracking_upsert(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_track(batch: pa.Table) -> pa.Table:
        micros = batch["ts"].cast(pa.int64())
        return pa.table(
            {
                "element_id": batch["user_id"],
                "first_seen": micros,
                "last_seen": micros,
            }
        )

    return (
        ds.map_batches(to_track, batch_format="pyarrow")
        .groupby("element_id")
        .aggregate(
            Min("first_seen", alias_name="first_seen"),
            Max("last_seen", alias_name="last_seen"),
        )
    )


ORACLE_SQL["tracking_upsert"] = """
SELECT user_id AS element_id,
       min(CAST(epoch_us(ts) AS BIGINT)) AS first_seen,
       max(CAST(epoch_us(ts) AS BIGINT)) AS last_seen
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# 13. match_stats — A2 aggregate-of-aggregate
# ---------------------------------------------------------------------------


def q_match_stats(sf_dir: str):
    from ..stages.groupops import bucketed_aggregate

    ds = _read(sf_dir, "orders", ["o_custkey"])
    # bucketed: one group per CUSTOMER (corpus-scale at real size; Ray's
    # native aggregate reduce pays ~30 µs of Python per group)
    per_cust = bucketed_aggregate(
        ds, ["o_custkey"], {"n_orders": ("o_custkey", "size")}
    )
    stats = per_cust.aggregate(
        Count(alias_name="n_customers"),
        Sum("n_orders", alias_name="total_orders"),
        Min("n_orders", alias_name="min_orders"),
        Max("n_orders", alias_name="max_orders"),
    )
    avg = round(stats["total_orders"] / stats["n_customers"], 6)
    return pa.table(
        {
            "n_customers": pa.array([int(stats["n_customers"])], pa.int64()),
            "avg_orders": pa.array([avg]),
            "min_orders": pa.array([int(stats["min_orders"])], pa.int64()),
            "max_orders": pa.array([int(stats["max_orders"])], pa.int64()),
        }
    )


ORACLE_SQL["match_stats"] = """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1)
SELECT count(*) AS n_customers,
       round(sum(n) / count(*), 6) AS avg_orders,
       min(n) AS min_orders,
       max(n) AS max_orders
FROM per_cust
"""


# ---------------------------------------------------------------------------
# 14. brand_dist — A6 category distribution analog
# ---------------------------------------------------------------------------


def q_brand_dist(sf_dir: str):
    return _read(sf_dir, "part", ["p_brand"]).groupby("p_brand").aggregate(
        Count(alias_name="n")
    )


ORACLE_SQL["brand_dist"] = """
SELECT p_brand, count(*) AS n FROM part GROUP BY 1
"""


# ---------------------------------------------------------------------------
# 15. region_balance — multi-way broadcast join chain (J2 over dimensions)
# ---------------------------------------------------------------------------


def q_region_balance(sf_dir: str):
    """customer ⋈ nation ⋈ region via chained broadcast joins (both
    dimension tables are tiny — the canonical star-schema pattern)."""
    from ..stages.joins import broadcast_join

    nation = pa.concat_tables(
        [pa.table(b) for b in _read(sf_dir, "nation").iter_batches(batch_format="pyarrow")]
    )
    region = pa.concat_tables(
        [pa.table(b) for b in _read(sf_dir, "region").iter_batches(batch_format="pyarrow")]
    )
    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("c_acctbal"),
            "c_acctbal",
            pa.array(_cents(b["c_acctbal"].to_numpy(zero_copy_only=False))),
        ),
        batch_format="pyarrow",
    )
    j1 = broadcast_join(cust, nation, "c_nationkey", "n_nationkey")
    j2 = broadcast_join(j1, region, "n_regionkey", "r_regionkey")
    agg = j2.groupby("r_name").aggregate(
        Count(alias_name="n_customers"), Sum("c_acctbal", alias_name="total_balance")
    )
    return agg.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("total_balance"),
            "total_balance",
            pa.array(b["total_balance"].to_numpy(zero_copy_only=False) / 100.0),
        ),
        batch_format="pyarrow",
    )


ORACLE_SQL["region_balance"] = """
SELECT r_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# 16. props_extract — JSON field extraction (§2.8 array/map/json family)
# ---------------------------------------------------------------------------


def q_props_extract(sf_dir: str):
    """Extract the integer 'k' field from the events props JSON with a
    vectorized regex (pc.extract_regex) and aggregate — the engine-side
    nested-JSON access pattern (names.primary / addresses[0] analog)."""
    ds = _read(sf_dir, "events", ["props", "value"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table(
            {
                "k_bucket": pc.cast(
                    pc.bit_wise_and(k, pa.scalar(7, pa.int64())), pa.int64()
                ),
                "value": batch["value"],
            }
        )

    agg = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("k_bucket")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return agg.map_batches(lambda b: _round_col(b, "sum_value", 2), batch_format="pyarrow")


ORACLE_SQL["props_extract"] = """
SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) & 7 AS k_bucket,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# 17. yearly_orders — date/time scalar family (§2.8)
# ---------------------------------------------------------------------------


def q_yearly_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def years(batch: pa.Table) -> pa.Table:
        micros = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = (
            micros.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        # Sum in exact integer cents: float64 accumulation order diverges from
        # the oracle at ~1e9 magnitude (order-dependent ulps flip round(...,2)).
        cents = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        return pa.table({"year": pa.array(y), "cents": pa.array(cents)})

    agg = (
        ds.map_batches(years, batch_format="pyarrow")
        .groupby("year")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="cents_sum"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        total = np.round(
            batch["cents_sum"].to_numpy(zero_copy_only=False) / 100.0, 2
        )
        return pa.table(
            {
                "year": batch["year"],
                "n_orders": batch["n_orders"],
                "total": pa.array(total),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["yearly_orders"] = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
       count(*) AS n_orders,
       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS total
FROM orders GROUP BY 1
"""


def q_value_quantiles(sf_dir: str):
    """A-family: exact distributed quantiles of the events value measure
    (value-count collapse + driver interpolation — stages.groupops)."""
    from ..stages.groupops import exact_quantiles

    ev = _read(sf_dir, "events", ["value"])
    return exact_quantiles(ev, "value", [0.5, 0.95, 0.99])


ORACLE_SQL["value_quantiles"] = """
SELECT 0.5 AS p, round(quantile_cont(value, 0.5), 6) AS q FROM events
UNION ALL
SELECT 0.95 AS p, round(quantile_cont(value, 0.95), 6) AS q FROM events
UNION ALL
SELECT 0.99 AS p, round(quantile_cont(value, 0.99), 6) AS q FROM events
"""


def q_hopping_events(sf_dir: str):
    """Hopping (sliding) windows: 1 h windows every 15 min — each event
    belongs to 4 overlapping windows. Explode inside the batch with a
    per-batch partial combiner (4× row fan-out never crosses the shuffle
    unaggregated), then a small grouped sum."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    HOP_US = 900 * 1_000_000
    K = 4  # window_size / hop

    def partial(batch: pa.Table) -> pa.Table:
        micros = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = micros // HOP_US
        et = batch["event_type"].to_pylist()
        val = batch["value"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "window_id": np.concatenate([base - i for i in range(K)]),
                "event_type": np.tile(np.array(et, dtype=object), K),
                "value": np.tile(val, K),
            }
        )
        g = df.groupby(["window_id", "event_type"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_id", "event_type"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
    )
    # round via NUMPY, to 6 decimals: np.round (like DuckDB's round) snaps
    # to the canonical double of the decimal, while pc.round preserves
    # ulp-level differences from summation order; and the 6-decimal
    # boundary is never hit because true sums are exact multiples of 0.01
    def finish(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("sum_value")
        return b.set_column(
            i, "sum_value",
            pa.array(np.round(b["sum_value"].to_numpy(zero_copy_only=False), 6)),
        )

    return agg.map_batches(finish, batch_format="pyarrow")


ORACLE_SQL["hopping_events"] = """
SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) - i AS window_id,
       event_type,
       count(*) AS n,
       round(sum(value), 6) AS sum_value
FROM events, (SELECT unnest(range(4)) AS i) hops
GROUP BY 1, 2
"""


def q_user_running_value(sf_dir: str):
    """Window-function family: per-user cumulative value over event time
    (SUM OVER PARTITION BY ... ORDER BY ...). Bucketed by user hash; one
    sorted cumsum per bucket recovered with numpy run boundaries — no
    per-user dispatch."""
    from ..stages.groupops import bucketed_group_apply

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def cum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        v = g["value"].to_numpy()
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        ends = np.concatenate([starts[1:], [len(g)]])
        # cumsum PER RUN (not global-cumsum-minus-base): the subtraction
        # trick leaks float error proportional to the bucket's global
        # prefix magnitude, while the oracle's SUM OVER (PARTITION BY)
        # accumulates only the user's own values — per-run accumulation is
        # the bit-parity-safe formulation
        running = np.empty(len(g))
        for s, e in zip(starts, ends):
            running[s:e] = np.cumsum(v[s:e])
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "running_value": np.round(running, 6),
            }
        )

    return bucketed_group_apply(ds, ["user_id"], cum_bucket, num_buckets=32)


ORACLE_SQL["user_running_value"] = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS running_value
FROM events
"""


def q_daily_type_pivot(sf_dir: str):
    """Pivot/crosstab family: events pivoted to one column per event_type
    with daily counts — per-batch crosstab partials, then one grouped sum
    (conditional aggregation, the scale-stable pivot plan)."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])
    TYPES = ["click", "error", "purchase", "signup", "view"]
    DAY_US = 86400 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        micros = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"day_id": micros // DAY_US, "event_type": batch["event_type"].to_pylist()}
        )
        ct = pd.crosstab(df["day_id"], df["event_type"])
        for t in TYPES:
            if t not in ct.columns:
                ct[t] = 0
        ct = ct[TYPES].reset_index()
        return pa.Table.from_pandas(ct, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day_id")
        .aggregate(*[Sum(t, alias_name=t) for t in TYPES])
    )
    return agg


ORACLE_SQL["daily_type_pivot"] = """
SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'view')     AS view
FROM events GROUP BY 1
"""


def q_type_value_quantiles(sf_dir: str):
    """A-family: per-event-type exact value quantiles (grouped variant of
    value_quantiles — stages.groupops.exact_quantiles_by)."""
    from ..stages.groupops import exact_quantiles_by

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return exact_quantiles_by(ev, "event_type", "value", [0.5, 0.95])


ORACLE_SQL["type_value_quantiles"] = """
SELECT event_type, 0.5 AS p, round(quantile_cont(value, 0.5), 6) AS q
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.95 AS p, round(quantile_cont(value, 0.95), 6) AS q
FROM events GROUP BY event_type
"""


def q_value_outliers(sf_dir: str):
    """IQR-rule outlier detection (the standard data-cleaning filter):
    events whose value falls outside [q1 − 1.5·IQR, q3 + 1.5·IQR]. Two
    passes: the exact_quantiles (value, count) collapse gives q1/q3, then
    a pure broadcast-bound filter map — no second shuffle. Float parity
    is by AUTHORED-IDENTICAL interpolation on both engines (element picks
    at floor((n−1)p) and +1, then lo + (hi−lo)·frac in the same literal
    order), not by trusting quantile_cont internals — so the strict bound
    comparisons agree bit-for-bit even when a bound lands on the value
    grid."""
    from ray.data.aggregate import Count

    ev = _read(sf_dir, "events", ["event_id", "value"])

    counts = ev.groupby("value").aggregate(Count(alias_name="__n")).take_all()
    vals = np.array([r["value"] for r in counts], dtype=np.float64)
    ns = np.array([r["__n"] for r in counts], dtype=np.int64)
    order = np.argsort(vals, kind="mergesort")
    vals, ns = vals[order], ns[order]
    cum = np.cumsum(ns)
    n = int(cum[-1])

    def elem(rank: int) -> float:
        rank = min(max(rank, 0), n - 1)
        return float(vals[np.searchsorted(cum, rank, side="right")])

    def quant(p: float) -> float:
        h = (n - 1) * p
        fl = np.floor(h)
        lo = elem(int(fl))
        hi = elem(int(fl) + 1) if fl + 1 <= n - 1 else lo
        return lo + (hi - lo) * (h - fl)

    q1, q3 = quant(0.25), quant(0.75)
    low_b = q1 - 1.5 * (q3 - q1)
    up_b = q3 + 1.5 * (q3 - q1)

    def flag(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        m = (v < low_b) | (v > up_b)
        return batch.filter(pa.array(m))

    return (
        ev.map_batches(flag, batch_format="pyarrow")
        .select_columns(["event_id", "value"])
        .sort("event_id")
    )


def _iqr_oracle_sql() -> str:
    pick = """
    max(CASE WHEN r = CAST(floor((nn - 1) * {p}) AS BIGINT) THEN value END)
        AS {name}lo,
    max(CASE WHEN r = CAST(floor((nn - 1) * {p}) AS BIGINT) + 1 THEN value END)
        AS {name}hi"""
    return f"""
WITH s AS (
  SELECT value, row_number() OVER (ORDER BY value) - 1 AS r,
         count(*) OVER () AS nn
  FROM events),
pick AS (
  SELECT max(nn) AS nn,{pick.format(p="0.25", name="q1")},{pick.format(p="0.75", name="q3")}
  FROM s),
b AS (
  SELECT
    q1lo + (COALESCE(q1hi, q1lo) - q1lo)
        * ((nn - 1) * 0.25 - floor((nn - 1) * 0.25)) AS q1,
    q3lo + (COALESCE(q3hi, q3lo) - q3lo)
        * ((nn - 1) * 0.75 - floor((nn - 1) * 0.75)) AS q3
  FROM pick)
SELECT e.event_id, e.value
FROM events e, b
WHERE e.value < b.q1 - 1.5 * (b.q3 - b.q1)
   OR e.value > b.q3 + 1.5 * (b.q3 - b.q1)
ORDER BY e.event_id
"""


ORACLE_SQL["value_outliers"] = _iqr_oracle_sql()


def q_lineitem_profile(sf_dir: str):
    """Data profiler over the lineitem numeric measures
    (stages.groupops.profile_columns — one pass, column-bounded
    partials)."""
    from ..stages.groupops import profile_columns

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", cols)
    return profile_columns(ds, cols).sort("column_name")


ORACLE_SQL["lineitem_profile"] = " UNION ALL ".join(
    f"""SELECT '{c}' AS column_name, count(*) AS n_rows,
        count(*) - count({c}) AS n_nulls,
        min({c}) AS min_v, max({c}) AS max_v FROM lineitem"""
    for c in ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
)


def q_kanon_release(sf_dir: str):
    """k-anonymity release filter (privacy screen before corpus export):
    rows whose quasi-identifier combination (priority, status, order
    year) occurs < 10 times are SUPPRESSED; the rest are released. Plan:
    one pre-combined groupby over the QI tuple (cardinality-bounded:
    5×3×7 groups), released set broadcast once, then a pure filter map —
    rows never shuffle."""
    import ray as _ray

    ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderstatus",
                           "o_orderdate"]
    )

    def qi(batch: pa.Table) -> pa.Table:
        yr = pc.year(batch["o_orderdate"])
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_orderpriority": batch["o_orderpriority"],
                "o_orderstatus": batch["o_orderstatus"],
                "order_year": yr.cast(pa.int64()),
            }
        )

    t = ds.map_batches(qi, batch_format="pyarrow")
    groups = t.groupby(
        ["o_orderpriority", "o_orderstatus", "order_year"]
    ).count().take_all()
    released = {
        (r["o_orderpriority"], r["o_orderstatus"], int(r["order_year"]))
        for r in groups
        if r["count()"] >= 10
    }
    ref = _ray.put(released)

    def keep(batch: pa.Table) -> pa.Table:
        rel = _ray.get(ref)
        p = batch["o_orderpriority"].to_pylist()
        s = batch["o_orderstatus"].to_pylist()
        y = batch["order_year"].to_numpy(zero_copy_only=False)
        mask = [(pi, si, int(yi)) in rel for pi, si, yi in zip(p, s, y)]
        return batch.filter(pa.array(mask))

    return t.map_batches(keep, batch_format="pyarrow").sort("o_orderkey")


ORACLE_SQL["kanon_release"] = """
SELECT o_orderkey, o_orderpriority, o_orderstatus,
       CAST(year(o_orderdate) AS BIGINT) AS order_year
FROM orders
QUALIFY count(*) OVER (
    PARTITION BY o_orderpriority, o_orderstatus, year(o_orderdate)) >= 10
ORDER BY o_orderkey
"""
