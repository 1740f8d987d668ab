"""General relational operators over the testdata tables — the
grouped-aggregate / join / top-k / window surface the reference lacks
entirely (SURVEY §2.5), built scale-idiomatically:

- grouped aggregates go through Ray's aggregate machinery (per-block
  partial reduction before the hash shuffle);
- small-side joins are broadcast (``ray.put`` the dimension dict once,
  vectorized pandas/numpy lookup per batch) — NO shuffle;
- top-k is per-block truncation (sort+limit pushes a per-block head);
- event-time windows are a computed window column + grouped aggregate
  (Ray Data has no watermarks; the input is a bounded log — see
  ray_guide "Streaming-shaped workloads").

Float outputs that are true aggregations are emitted as integer cents
(``CAST(ROUND(x*100) AS BIGINT)``) on BOTH sides so summation order
can't flip a value-hash comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from geomedea_ray.sources import tables



def _cents(x):
    """Sum-of-doubles → integer cents: CAST(ROUND(x*100) AS BIGINT).
    Summation-order float drift (~1e-12) cannot flip an integer cent,
    so value-hash comparisons against any oracle are exact."""
    return pc.round(pc.multiply(x, pa.scalar(100.0))).cast(pa.int64())


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary over lineitem (groupby 2 keys,
    4 sums + count), filter pushed to the read."""
    from ray.data.aggregate import Count, Sum

    ds = tables.read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def _pre(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(batch["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02")))
        batch = batch.filter(keep)
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "l_quantity": batch["l_quantity"],
                "l_extendedprice": batch["l_extendedprice"],
                "disc_price": disc_price,
            }
        )

    out = (
        ds.map_batches(_pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
    )

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": _cents(batch["sum_qty"]),
                "sum_base_price": _cents(batch["sum_base_price"]),
                "sum_disc_price": _cents(batch["sum_disc_price"]),
                "count_order": batch["count_order"],
            }
        )

    return out.map_batches(_fin, batch_format="pyarrow")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT)      AS sum_qty,
       CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT)  AS sum_base_price,
       CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_disc_price,
       COUNT(*)                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def top_orders(sf_dir: str, k: int = 10):
    """Top-k orders by total price (sort desc + limit; per-block
    truncation happens inside Ray's sort). Deterministic tiebreak on
    o_orderkey."""
    ds = tables.read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


TOP_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def revenue_by_nation(sf_dir: str):
    """orders ⋈ customer ⋈ nation revenue rollup — both dimension
    sides broadcast (customer→nation map + nation→name map built on
    the driver from the small tables, shipped once via ray.put)."""
    import ray
    from ray.data.aggregate import Count, Sum

    import pyarrow.parquet as pq

    cust = pq.read_table(tables.path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(tables.path(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    c_key = cust["c_custkey"].to_numpy()
    c_nat = cust["c_nationkey"].to_numpy()
    order_ = np.argsort(c_key)
    n_key = nat["n_nationkey"].to_numpy()
    n_order = np.argsort(n_key)  # searchsorted needs BOTH lookups sorted
    lookup_ref = ray.put(
        {
            "cust_keys": c_key[order_],
            "cust_nat": c_nat[order_],
            "nat_keys": n_key[n_order],
            "nat_names": np.asarray(nat["n_name"].to_pylist(), dtype=object)[n_order],
        }
    )

    from geomedea_ray.util import get_once

    def _attach_nation(batch: pa.Table) -> pa.Table:
        # task fn + per-process broadcast fetch (util.get_once): fuses
        # with the read — an actor pool here can't fuse and its spawn
        # latency dwarfs this 150k-row job
        lk = get_once(lookup_ref)
        ck = batch["o_custkey"].to_numpy()
        pos = np.searchsorted(lk["cust_keys"], ck)
        nk = lk["cust_nat"][pos]
        npos = np.searchsorted(lk["nat_keys"], nk)
        names = lk["nat_names"][npos]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "o_totalprice": batch["o_totalprice"],
            }
        )

    ds = tables.read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    out = (
        ds.map_batches(_attach_nation, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(
            Sum("o_totalprice", alias_name="revenue"), Count(alias_name="n_orders")
        )
    )
    return out.map_batches(
        lambda b: pa.table(
            {"n_name": b["n_name"], "revenue": _cents(b["revenue"]), "n_orders": b["n_orders"]}
        ),
        batch_format="pyarrow",
    )


REVENUE_BY_NATION_SQL = """
SELECT n_name, CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS revenue, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def brand_revenue_by_region(sf_dir: str):
    """lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ region revenue rollup
    (TPC-H Q9 flavor) — ALL four dimension tables broadcast as sorted
    lookup arrays (largest is part; at 100 TB the fact side streams
    and the dimensions still fit one ray.put), revenue pre-aggregated
    per block so the exchange moves ~125 partial rows per block, then
    one small combine."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    from geomedea_ray.util import get_once

    def _sorted_lookup(table: str, key: str, val: str):
        t = pq.read_table(tables.path(sf_dir, table), columns=[key, val])
        k = t[key].to_numpy()
        order = np.argsort(k)
        v = t[val].to_numpy(zero_copy_only=False)
        return k[order], v[order]

    pk, pbrand = _sorted_lookup("part", "p_partkey", "p_brand")
    sk, snat = _sorted_lookup("supplier", "s_suppkey", "s_nationkey")
    nk, nreg = _sorted_lookup("nation", "n_nationkey", "n_regionkey")
    rk, rname = _sorted_lookup("region", "r_regionkey", "r_name")
    ref = ray.put({"pk": pk, "pbrand": pbrand, "sk": sk, "snat": snat,
                   "nk": nk, "nreg": nreg, "rk": rk, "rname": rname})

    def _partial(batch: pa.Table) -> pa.Table:
        lk = get_once(ref)
        brand = lk["pbrand"][np.searchsorted(lk["pk"], batch["l_partkey"].to_numpy())]
        natk = lk["snat"][np.searchsorted(lk["sk"], batch["l_suppkey"].to_numpy())]
        regk = lk["nreg"][np.searchsorted(lk["nk"], natk)]
        region = lk["rname"][np.searchsorted(lk["rk"], regk)]
        # exact integer money: price and discount are 2-decimal, so
        # price_cents × (100 - disc_pct) is an exact int64 in 1e-4 $
        # units — sums are bit-exact in ANY order (no float-boundary
        # cent flips between engine and oracle)
        price_c = np.rint(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        keep_pct = np.rint((1.0 - batch["l_discount"].to_numpy()) * 100).astype(np.int64)
        rev_e4 = price_c * keep_pct
        part = (
            pd.DataFrame({"r_name": region, "p_brand": brand, "revenue_e4": rev_e4})
            .groupby(["r_name", "p_brand"], as_index=False)
            .agg(revenue_e4=("revenue_e4", "sum"), n_items=("revenue_e4", "size"))
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    partials = tables.read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    # ≤ regions × brands distinct keys — kilobyte partials, TREE combine
    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["r_name", "p_brand"], as_index=False).agg(
            {"revenue_e4": "sum", "n_items": "sum"}
        )

    return partials.repartition(8).map_batches(
        _combine, batch_format="pandas", batch_size=None
    ).repartition(1).map_batches(_combine, batch_format="pandas", batch_size=None)


BRAND_REVENUE_SQL = """
SELECT r_name, p_brand,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


def events_tumbling_window(sf_dir: str, window_s: int = 3600):
    """Tumbling event-time window aggregate: window = epoch // size
    (integer floor on microseconds — exact), grouped count + rounded
    sum per (event_type, window)."""
    from ray.data.aggregate import Count, Sum

    ds = tables.read(sf_dir, "events", columns=["ts", "event_type", "value"])
    win_us = window_s * 1_000_000

    def _win(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        w = ts // win_us
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_id": pa.array(w, pa.int64()),
                "value": batch["value"],
            }
        )

    out = (
        ds.map_batches(_win, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_id"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "window_id": b["window_id"],
                "n": b["n"],
                "sum_value": _cents(b["sum_value"]),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_WINDOW_SQL = """
SELECT event_type,
       CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS window_id,
       COUNT(*) AS n,
       CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value
FROM events
GROUP BY event_type, window_id
"""


def distinct_users_by_type(sf_dir: str):
    """Distinct aggregation: number of distinct users per event type
    (two-level groupby — dedup pairs, then count)."""
    from ray.data.aggregate import Count

    ds = tables.read(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="_n"))
    out = pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))
    return out.select_columns(["event_type", "n_users"])


DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------- joins

def purchase_asof_signup(sf_dir: str):
    """As-of join (stages/joins.py): each purchase event attached to
    the user's LATEST signup-or-earlier event. Oracle = DuckDB's
    native ASOF JOIN. (No reference counterpart — SURVEY §2.5.)"""
    from geomedea_ray.stages.joins import asof_join_single

    ev = tables.read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    # both sides carved from ONE read — no Dataset.union branch
    # serialization (round-1 VERDICT item 7)
    out = asof_join_single(
        ev, on="ts", by="user_id",
        left_filter=lambda df: df["event_type"].to_numpy() == "purchase",
        right_filter=lambda df: df["event_type"].to_numpy() == "signup",
        right_cols=["event_id", "value"],
    )

    def _fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "signup_event_id": b["event_id_r"],
                "value_cents": _cents(b["value"]),
                "signup_value_cents": _cents(b["value_r"]),
            }
        )

    return out.map_batches(_fin, batch_format="pyarrow")


PURCHASE_ASOF_SQL = """
SELECT l.event_id AS event_id,
       l.user_id AS user_id,
       r.event_id AS signup_event_id,
       CAST(ROUND(l.value * 100) AS BIGINT) AS value_cents,
       CAST(ROUND(r.value * 100) AS BIGINT) AS signup_value_cents
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def purchases_after_signup(sf_dir: str, window_h: int = 24):
    """Range join (stages/joins.py): (purchase, signup) pairs of the
    same user with 0 <= purchase.ts - signup.ts <= window. Gap emitted
    in integer microseconds (exact in float64)."""
    from geomedea_ray.stages.joins import range_join_pairs

    ev = tables.read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    out = range_join_pairs(
        ev,
        on="ts",
        by="user_id",
        left_filter=lambda df: df["event_type"] == "purchase",
        right_filter=lambda df: df["event_type"] == "signup",
        window=f"{window_h}h",
        id_col="event_id",
    )

    def _fin(b: pa.Table) -> pa.Table:
        gap_us = (b["gap"].to_numpy() / 1000.0)  # ns → µs; inputs are µs-granular
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id_l": b["event_id_l"],
                "event_id_r": b["event_id_r"],
                "gap_us": pa.array(gap_us, pa.float64()),
            }
        )

    return out.map_batches(_fin, batch_format="pyarrow")


PURCHASES_AFTER_SIGNUP_SQL = """
SELECT l.user_id AS user_id,
       l.event_id AS event_id_l,
       r.event_id AS event_id_r,
       CAST(date_diff('microsecond', r.ts, l.ts) AS DOUBLE) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
JOIN (SELECT * FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id
 AND l.ts >= r.ts
 AND l.ts <= r.ts + INTERVAL 24 HOUR
 AND l.event_id != r.event_id
"""


def top_events_per_user(sf_dir: str, k: int = 3):
    """Windowed top-k (ROW_NUMBER pattern, stages/joins.py): each
    user's k highest-value events."""
    from geomedea_ray.stages.joins import top_k_per_group

    ev = tables.read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = top_k_per_group(ev, by="user_id", order_col="value", k=k, tiebreak="event_id")

    def _fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "value_cents": _cents(b["value"]),
                "rank": b["rank"],
            }
        )

    return out.map_batches(_fin, batch_format="pyarrow")


TOP_EVENTS_SQL = """
SELECT user_id, event_id,
       CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS "rank"
FROM events
QUALIFY "rank" <= 3
"""


def customers_with_orders(sf_dir: str):
    """Broadcast SEMI join: customers having at least one order. The
    distinct ``o_custkey`` set (dimension-sized by construction) is
    built with per-block partial uniques and broadcast once; the
    customer side streams through one vectorized membership filter —
    no shuffle."""
    from geomedea_ray.stages.joins import distinct_keys, semi_anti_filter

    keys = distinct_keys(
        tables.read(sf_dir, "orders", columns=["o_custkey"]), "o_custkey"
    )
    cust = tables.read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    return semi_anti_filter(cust, "c_custkey", keys, anti=False)


CUSTOMERS_WITH_ORDERS_SQL = """
SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


def customers_without_orders(sf_dir: str):
    """Broadcast ANTI join: customers with NO urgent order (the fact
    side is filtered AT THE READ to '1-URGENT' before the partial
    distinct, so the build set never sees non-qualifying rows; the
    unfiltered variant is empty at every sf — a vacuous gate row)."""
    from geomedea_ray.stages.joins import distinct_keys, semi_anti_filter

    orders = tables.read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda b: b.filter(pc.equal(b["o_orderpriority"], pa.scalar("1-URGENT"))).select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    keys = distinct_keys(urgent, "o_custkey")
    cust = tables.read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    return semi_anti_filter(cust, "c_custkey", keys, anti=True)


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_nationkey, c_mktsegment FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def lineitem_order_join(sf_dir: str):
    """Fact×fact SHUFFLE hash join (stages/joins.hash_join — the one
    row-level large×large join in the suite; every other join is
    broadcast by design because its small side is dimension-sized).
    Every lineitem row picks up its order's status/priority; revenue
    is exact int64 1e-4-$ units fixed per row BEFORE the join."""
    from geomedea_ray.stages.joins import hash_join

    li = tables.read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )

    def _pre(b: pa.Table) -> pa.Table:
        price_c = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0))).cast(pa.int64())
        disc_pct = pc.round(pc.multiply(b["l_discount"], pa.scalar(100.0))).cast(pa.int64())
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_linenumber": b["l_linenumber"].cast(pa.int64()),
                "revenue_e4": pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct)),
            }
        )

    ords = tables.read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_orderpriority"]
    )
    out = hash_join(
        li.map_batches(_pre, batch_format="pyarrow", zero_copy_batch=True),
        ords, "l_orderkey", "o_orderkey", ["o_orderstatus", "o_orderpriority"],
        broadcast_bytes=0,  # pin the co-shuffle plan: this query IS the
        # suite's large×large exercise; at fixture scale the adaptive
        # join would (correctly) demote orders to a broadcast side
    )

    # left int payloads crossed the union as nullable (float) columns —
    # restore exact int64 (values ≤ ~1e9, exactly representable)
    def _fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].cast(pa.int64()),
                "l_linenumber": t["l_linenumber"].cast(pa.int64()),
                "revenue_e4": t["revenue_e4"].cast(pa.int64()),
                "o_orderstatus": t["o_orderstatus"],
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    return out.map_batches(_fin, batch_format="pyarrow")


LINEITEM_ORDER_JOIN_SQL = """
SELECT l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
       o_orderstatus, o_orderpriority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def urgent_order_lineitems(sf_dir: str):
    """Bloom-pruned shuffle hash join: the right side is the SELECTIVE
    order subset ('1-URGENT', ~20%), so the stages/bloom bitmap built
    over its keys drops ~80% of lineitem probe rows map-side BEFORE
    the exchange — the 100 TB shuffle-volume lever. broadcast_bytes=0
    pins the shuffle plan so the bloom path itself is what the oracle
    verifies (the adaptive join would broadcast at fixture scale)."""
    from geomedea_ray.stages.joins import hash_join

    li = tables.read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )

    def _pre(b: pa.Table) -> pa.Table:
        price_c = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0))).cast(pa.int64())
        disc_pct = pc.round(pc.multiply(b["l_discount"], pa.scalar(100.0))).cast(pa.int64())
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_linenumber": b["l_linenumber"].cast(pa.int64()),
                "revenue_e4": pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct)),
            }
        )

    ords = tables.read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(pc.equal(b["o_orderpriority"], pa.scalar("1-URGENT"))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = hash_join(
        li.map_batches(_pre, batch_format="pyarrow", zero_copy_batch=True),
        ords, "l_orderkey", "o_orderkey", ["o_orderpriority"],
        broadcast_bytes=0, bloom=True,
    )

    def _fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].cast(pa.int64()),
                "l_linenumber": t["l_linenumber"].cast(pa.int64()),
                "revenue_e4": t["revenue_e4"].cast(pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    return out.map_batches(_fin, batch_format="pyarrow")


URGENT_ORDER_LINEITEMS_SQL = """
SELECT l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
       o_orderpriority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
"""


def user_cumulative_spend(sf_dir: str):
    """Running per-user purchase total in event-time order — the
    distributed SUM() OVER (PARTITION BY user ORDER BY ts) window
    (stages/joins.cumulative_sum). Cents are fixed per ROW before the
    running sum so every prefix is integer-exact vs the oracle."""
    from geomedea_ray.stages.joins import cumulative_sum

    ev = tables.read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])

    def _pre(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["event_type"], pa.scalar("purchase"))
        b = batch.filter(keep)
        return pa.table(
            {
                "event_id": b["event_id"],
                "ts": b["ts"],
                "user_id": b["user_id"],
                "value_cents": _cents(b["value"]),
            }
        )

    out = cumulative_sum(
        ev.map_batches(_pre, batch_format="pyarrow", zero_copy_batch=True),
        by="user_id", on="ts", val_col="value_cents", id_col="event_id",
        out_col="cum_spend_cents",
    )
    return out.select_columns(["user_id", "event_id", "value_cents", "cum_spend_cents"])


#: window SUM over BIGINT yields HUGEINT in DuckDB — CAST keeps the
#: compare frame int64 (CLAUDE.md round-3 rule)
USER_CUMULATIVE_SPEND_SQL = """
SELECT user_id, event_id,
       CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS cum_spend_cents
FROM events WHERE event_type = 'purchase'
"""


def lineitem_sample(sf_dir: str, fraction: float = 0.1):
    """Deterministic hash sample of lineitem rows (stages/joins.py
    sample_fraction — pure function of the row key, engine-portable)."""
    from geomedea_ray.pipelines.geo_queries import linepoints_batch
    from geomedea_ray.stages.joins import sample_fraction

    ds = tables.read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
    pts = ds.map_batches(linepoints_batch, batch_format="pyarrow", zero_copy_batch=True)
    return sample_fraction(pts, "pid", fraction).select_columns(["pid"])


def lineitem_sample_sql(fraction: float = 0.1) -> str:
    from geomedea_ray.pipelines.geo_queries import LINEPOINTS_CTE
    from geomedea_ray.stages.joins import sample_fraction_sql

    return (
        LINEPOINTS_CTE
        + "SELECT pid FROM pts WHERE " + sample_fraction_sql("pid", fraction)
    )


def user_sessions(sf_dir: str, gap_min: int = 30):
    """Gap-based sessionization of the event stream (stages/joins.py
    sessionize): 30-minute inactivity starts a new session. Oracle =
    DuckDB LAG + cumulative-sum window."""
    from geomedea_ray.stages.joins import sessionize

    ev = tables.read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    out = sessionize(ev, on="ts", by="user_id", gap=f"{gap_min}min", id_col="event_id")
    return out.select_columns(["user_id", "event_id", "session_seq", "event_seq"])


USER_SESSIONS_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, event_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_seq
  FROM o
)
SELECT user_id, event_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS BIGINT) AS event_seq
FROM s
"""


def late_events_by_type(sf_dir: str, delay_h: int = 1):
    """Watermark/late-data accounting (stages/joins.watermark_late_flags):
    processing events in arrival order (event_id), watermark =
    running_max(ts) - delay; count late vs total per event type.
    Oracle = the same running max as a SQL window function."""
    from geomedea_ray.stages.joins import watermark_late_flags

    ev = tables.read(sf_dir, "events", columns=["event_id", "ts", "event_type"])
    flagged = watermark_late_flags(ev, ts_col="ts", arrival_col="event_id",
                                   delay=f"{delay_h}h")

    # event_type cardinality is tiny → per-batch partial counts + a
    # two-level TREE combine instead of a groupby sort-exchange (the
    # sort machinery costs seconds on kilobyte partials; tiles.py
    # tile_aggregate pattern, measured ~3× there)
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "event_type": df["event_type"],
            "n_late": df["is_late"].to_numpy().astype(np.int64),
        })
        out = g.groupby("event_type", as_index=False).agg(
            n_late=("n_late", "sum"), n_total=("n_late", "size"))
        out["n_total"] = out["n_total"].astype(np.int64)
        return out

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(
            n_late=("n_late", "sum"), n_total=("n_total", "sum"))

    partials = flagged.map_batches(_partial, batch_format="pandas")
    level1 = partials.repartition(4).map_batches(
        _combine, batch_format="pandas", batch_size=None)
    out = level1.repartition(1).map_batches(
        _combine, batch_format="pandas", batch_size=None)
    return out.select_columns(["event_type", "n_late", "n_total"])


LATE_EVENTS_SQL = """
WITH w AS (
  SELECT event_id, event_type, epoch_ns(ts) AS tns,
         MAX(epoch_ns(ts)) OVER (ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - 3600000000000 AS wm
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN wm IS NOT NULL AND tns < wm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       COUNT(*) AS n_total
FROM w GROUP BY event_type
"""


def ship_in_order_windows(sf_dir: str, window_days: int = 3):
    """RANGE JOIN (brief "custom operators"): per distinct order date
    ``d``, count/sum lineitems shipped in ``[d, d + window_days)`` —
    the interval side (distinct dates, dimension-sized) is broadcast
    and stabbed per batch (stages/joins.interval_aggregate_broadcast);
    the fact side streams with NO shuffle. Sum is exact (quantity is
    integral)."""
    from geomedea_ray.stages.joins import (distinct_keys,
                                           interval_aggregate_broadcast)

    dates = distinct_keys(
        tables.read(sf_dir, "orders", columns=["o_orderdate"]), "o_orderdate")
    date_ns = np.sort(dates.astype("datetime64[ns]").astype(np.int64))
    day_ns = 86_400_000_000_000
    starts, ends = date_ns, date_ns + window_days * day_ns

    li = tables.read(sf_dir, "lineitem", columns=["l_shipdate", "l_quantity"])

    def _cast(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_shipdate": b["l_shipdate"],
            "qty": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
        })

    agg = interval_aggregate_broadcast(
        li.map_batches(_cast, batch_format="pyarrow", zero_copy_batch=True),
        starts, ends, point_col="l_shipdate", value_col="qty")

    def _label(df: pd.DataFrame) -> pd.DataFrame:
        iv = df["interval_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "o_orderdate": pd.to_datetime(date_ns[iv]),
            "n_ship": df["n"].to_numpy(np.int64),
            "sum_qty": df["sum_qty"].to_numpy(np.int64),
        })

    return agg.map_batches(_label, batch_format="pandas", batch_size=None)


SHIP_IN_ORDER_WINDOWS_SQL = """
SELECT d.o_orderdate,
       CAST(COUNT(*) AS BIGINT) AS n_ship,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM (SELECT DISTINCT o_orderdate FROM orders) d
JOIN lineitem ON l_shipdate >= d.o_orderdate
             AND l_shipdate < d.o_orderdate + INTERVAL 3 DAY
GROUP BY d.o_orderdate
"""


def events_hopping_window(sf_dir: str, hop_min: int = 30, k: int = 2):
    """HOPPING (sliding) window aggregate — window = k × hop, so each
    event lands in exactly k windows: the window ids are computed
    per batch (k vectorized replicas, no join), partial counts/cents
    reduce per block, and the window×type-cardinality partial stream
    TREE-combines. At planet scale window cardinality grows with the
    time span — swap the tree tail for the hash groupby (tiles.py
    tile_aggregate's fall-through) past ~1e6 windows."""
    hop_ns = hop_min * 60 * 1_000_000_000
    ev = tables.read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        ws0 = (t // hop_ns) * hop_ns
        cents = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
        et = df["event_type"].to_numpy()
        frames = [pd.DataFrame({"window_start": ws0 - i * hop_ns,
                                "event_type": et, "cents": cents})
                  for i in range(k)]
        g = pd.concat(frames, ignore_index=True)
        return g.groupby(["window_start", "event_type"], as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum"))

    def _combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["window_start", "event_type"], as_index=False).agg(
            n=("n", "sum"), sum_cents=("sum_cents", "sum"))
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = ev.map_batches(_partial, batch_format="pandas")
    level1 = partials.repartition(8).map_batches(
        _combine, batch_format="pandas", batch_size=None)
    return level1.repartition(1).map_batches(
        _combine, batch_format="pandas", batch_size=None)


EVENTS_HOPPING_SQL = """
WITH h AS (
  SELECT (epoch_ns(ts) // 1800000000000) * 1800000000000
           - i.i * 1800000000000 AS window_start,
         event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS i) i
)
SELECT window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM h GROUP BY window_start, event_type
"""


#: bottom-k sample size (shared with the SQL LIMIT)
BOTTOMK = 200


def events_sample_bottomk(sf_dir: str):
    """Fixed-size uniform event sample via bottom-k hashing
    (stages/joins.sample_bottomk) — the fixed-budget cousin of the
    fraction sampler: per-block partial bottom-k, one k-row-per-block
    exchange, deterministic under any partitioning."""
    from geomedea_ray.stages.joins import sample_bottomk

    ds = tables.read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    return sample_bottomk(ds, "event_id", BOTTOMK)


EVENTS_SAMPLE_BOTTOMK_SQL = f"""
SELECT event_id, user_id, event_type,
       (event_id * 2654435761) % 4294967296 AS h_sample
FROM events ORDER BY h_sample LIMIT {BOTTOMK}
"""


def orders_upsert(sf_dir: str):
    """CDC newest-wins merge (stages/joins.upsert_latest): the orders
    table plus a derived change stream (every 10th order re-stated
    with status 'U' and a $10 adjustment, version 1) collapse to the
    latest version per key. ONE scan emits base+changes in-map (no
    Dataset.union — branch replication serializes); the merge itself
    moves only per-block key partials."""
    from geomedea_ray.stages.joins import upsert_latest

    ds = tables.read(sf_dir, "orders",
                     columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    both = ds.map_batches(_orders_with_changes, batch_format="pyarrow",
                          zero_copy_batch=True)
    return upsert_latest(both, "o_orderkey", "version")


def _orders_with_changes(batch: pa.Table) -> pa.Table:
    import pyarrow as pa_

    key = batch["o_orderkey"].to_numpy()
    cents = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
    chg = key % 10 == 0
    out_key = np.concatenate([key, key[chg]])
    out_ver = np.concatenate(
        [np.zeros(len(key), np.int64), np.ones(int(chg.sum()), np.int64)]
    )
    status = batch["o_orderstatus"].to_numpy(zero_copy_only=False)
    out_status = np.concatenate([status, np.full(int(chg.sum()), "U", object)])
    out_cents = np.concatenate([cents, cents[chg] + 1000])
    return pa_.table(
        {
            "o_orderkey": pa_.array(out_key, pa_.int64()),
            "version": pa_.array(out_ver, pa_.int64()),
            "o_orderstatus": pa_.array(out_status, pa_.string()),
            "totalprice_cents": pa_.array(out_cents, pa_.int64()),
        }
    )


ORDERS_UPSERT_SQL = """
WITH all_rows AS (
  SELECT o_orderkey, 0 AS version, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents
  FROM orders
  UNION ALL
  SELECT o_orderkey, 1, 'U',
         CAST(ROUND(o_totalprice * 100) AS BIGINT) + 1000
  FROM orders WHERE o_orderkey % 10 = 0)
SELECT o_orderkey, version, o_orderstatus, totalprice_cents
FROM all_rows
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) = 1
"""


#: moving-window width (shared with the SQL ROWS BETWEEN)
MOVSUM_WINDOW = 3


def user_spend_movsum(sf_dir: str):
    """3-event moving purchase total per user in event-time order —
    the ROWS-window cousin of user_cumulative_spend
    (stages/joins.rolling_sum; integer cents, order-exact)."""
    from geomedea_ray.stages.joins import rolling_sum

    ev = tables.read(sf_dir, "events",
                     columns=["event_id", "ts", "user_id", "event_type", "value"])

    def _pre(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["event_type"], pa.scalar("purchase")))
        return pa.table(
            {
                "event_id": b["event_id"],
                "ts": b["ts"],
                "user_id": b["user_id"],
                "value_cents": _cents(b["value"]),
            }
        )

    out = rolling_sum(
        ev.map_batches(_pre, batch_format="pyarrow", zero_copy_batch=True),
        by="user_id", on="ts", val_col="value_cents", id_col="event_id",
        window=MOVSUM_WINDOW, out_col="movsum_cents",
    )
    return out.select_columns(["user_id", "event_id", "value_cents", "movsum_cents"])


USER_SPEND_MOVSUM_SQL = f"""
SELECT user_id, event_id,
       CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN {MOVSUM_WINDOW - 1} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS movsum_cents
FROM events WHERE event_type = 'purchase'
"""


def price_quantiles(sf_dir: str):
    """EXACT quantiles of a CONTINUOUS column (l_extendedprice) per
    return flag — distributed radix selection over the IEEE-ordered
    bits (stages/sketch.quantile_select): 4 counting rounds, no raw
    value ever collected; the histogram method (lang_token_quantiles)
    would ship one row per distinct price here."""
    from geomedea_ray.stages.sketch import quantile_select

    ds = tables.read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    return quantile_select(ds, "l_returnflag", "l_extendedprice")


def price_quantiles_sql() -> str:
    from geomedea_ray.stages.sketch import quantiles_sql

    return quantiles_sql(
        "lineitem", by="l_returnflag", val_expr="l_extendedprice",
        cast_type="DOUBLE",
    )


def hot_user_events_join(sf_dir: str):
    """SKEW-handled shuffle join (stages/joins.hash_join skew_den):
    every even user_id collapses onto cohort key 0 — ~50% of all event
    rows land on ONE join key, the classic hot-key pathology that
    turns a hash exchange into a single straggler reducer. The MG
    candidate pass detects the hot key and joins it fragment-and-
    replicate (hot probe rows spread round-robin, hot dimension rows
    replicated per shard); the oracle recomputes the identical cohort
    mapping in SQL. broadcast_bytes=0 pins the shuffle+skew plan."""
    import ray.data

    from geomedea_ray.stages.joins import distinct_keys, hash_join

    ev = tables.read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def _cohort(b: pa.Table) -> pa.Table:
        u = b["user_id"].cast(pa.int64())
        k = pc.if_else(
            pc.equal(pc.bit_wise_and(u, pa.scalar(1, pa.int64())), pa.scalar(0, pa.int64())),
            pa.scalar(0, pa.int64()), u,
        )
        return pa.table(
            {
                "event_id": b["event_id"].cast(pa.int64()),
                "cohort": k,
                "value_c": pc.round(pc.multiply(b["value"], pa.scalar(100.0))).cast(pa.int64()),
            }
        )

    left = ev.map_batches(_cohort, batch_format="pyarrow", zero_copy_batch=True)
    # dimension side: one row per cohort key with a derived weight —
    # built FROM the same mapping so the join domain always matches
    ks = np.sort(distinct_keys(left, "cohort"))
    dim = ray.data.from_arrow(
        pa.table({"cohort_k": pa.array(ks, pa.int64()),
                  "weight": pa.array(ks * 7 + 3, pa.int64())})
    )
    out = hash_join(
        left, dim, "cohort", "cohort_k", ["weight"],
        broadcast_bytes=0, skew_den=32,
    )

    def _fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "cohort": t["cohort"].cast(pa.int64()),
                "value_c": t["value_c"].cast(pa.int64()),
                "weight": t["weight"].cast(pa.int64()),
            }
        )

    return out.map_batches(_fin, batch_format="pyarrow")


HOT_USER_EVENTS_JOIN_SQL = """
WITH e AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CASE WHEN user_id % 2 = 0 THEN 0 ELSE CAST(user_id AS BIGINT) END AS cohort,
         CAST(ROUND(value * 100) AS BIGINT) AS value_c
  FROM events
),
d AS (SELECT DISTINCT cohort AS cohort_k, cohort * 7 + 3 AS weight FROM e)
SELECT e.event_id, e.cohort, e.value_c, d.weight
FROM e JOIN d ON e.cohort = d.cohort_k
"""


def order_customer_bbox_join(sf_dir: str):
    """Distributed rect×rect spatial join (stages/rect_join — PBSM
    grid partitioning, reference-point dedup): orders and customers
    are scattered deterministically onto a 1000×1000 plane (modular
    arithmetic the oracle reproduces) and boxed ±3 / ±5; every
    intersecting pair comes back exactly once from ONE co-shuffle —
    no distinct pass, no all-pairs scan."""
    from geomedea_ray.stages.rect_join import bbox_intersect_join

    ords = tables.read(sf_dir, "orders", columns=["o_orderkey"])
    cust = tables.read(sf_dir, "customer", columns=["c_custkey"])

    def _orect(df):
        k = df["o_orderkey"].to_numpy(np.int64)
        x = (k % 1000).astype(np.float64)
        y = ((k // 7) % 1000).astype(np.float64)
        import pandas as pd

        return pd.DataFrame({"o_orderkey": k, "ax0": x - 3, "ay0": y - 3,
                             "ax1": x + 3, "ay1": y + 3})

    def _crect(df):
        k = df["c_custkey"].to_numpy(np.int64)
        x = ((k * 7) % 1000).astype(np.float64)
        y = ((k * 13) % 1000).astype(np.float64)
        import pandas as pd

        return pd.DataFrame({"c_custkey": k, "bx0": x - 5, "by0": y - 5,
                             "bx1": x + 5, "by1": y + 5})

    out = bbox_intersect_join(
        ords.map_batches(_orect, batch_format="pandas"),
        cust.map_batches(_crect, batch_format="pandas"),
        ("ax0", "ay0", "ax1", "ay1"), ("bx0", "by0", "bx1", "by1"),
        ["o_orderkey"], ["c_custkey"], cell=16.0,
    )

    def _fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "c_custkey": t["c_custkey"].cast(pa.int64()),
        })

    return out.map_batches(_fin, batch_format="pyarrow")


ORDER_CUSTOMER_BBOX_JOIN_SQL = """
WITH a AS (
  SELECT o_orderkey,
         CAST(o_orderkey % 1000 AS DOUBLE) AS x,
         CAST((o_orderkey // 7) % 1000 AS DOUBLE) AS y
  FROM orders
),
b AS (
  SELECT c_custkey,
         CAST((c_custkey * 7) % 1000 AS DOUBLE) AS x,
         CAST((c_custkey * 13) % 1000 AS DOUBLE) AS y
  FROM customer
)
SELECT a.o_orderkey, b.c_custkey
FROM a, b
WHERE a.x - 3 <= b.x + 5 AND b.x - 5 <= a.x + 3
  AND a.y - 3 <= b.y + 5 AND b.y - 5 <= a.y + 3
"""


#: ordered funnel steps over the events log
FUNNEL_STEPS = ["view", "click", "purchase"]


def user_funnel(sf_dir: str):
    """Funnel / ordered-sequence match (stages/funnel.funnel_match):
    how far each user got through view→click→purchase with
    earliest-greedy semantics — one user-hash co-shuffle, per-shard
    vectorized step resolution; nested-MIN SQL oracle."""
    from geomedea_ray.stages.funnel import funnel_match

    ds = tables.read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    out = funnel_match(ds, "user_id", "ts", "event_type", FUNNEL_STEPS)

    def _fin(df):
        return df.rename(columns={"u": "user_id"})

    return out.map_batches(_fin, batch_format="pandas")


def user_funnel_sql() -> str:
    from geomedea_ray.stages.funnel import funnel_match_sql

    inner = funnel_match_sql("events", "user_id", "ts", "event_type", FUNNEL_STEPS)
    return f"SELECT u AS user_id, stage, t_view, t_click, t_purchase FROM ({inner})"


def orders_profile(sf_dir: str):
    """One-pass data-quality profile of orders (stages/profile):
    per-column counts / nulls / min / max / exact domain cardinality,
    kilobyte partials + TREE combine — the expectations gate a 100 TB
    ingest runs before anything trains on it."""
    from geomedea_ray.stages.profile import profile_table

    ds = tables.read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"],
    )
    return profile_table(
        ds, num_cols=["o_orderkey", "o_totalprice"],
        cat_cols=["o_orderstatus", "o_orderpriority"],
    )


def orders_profile_sql() -> str:
    from geomedea_ray.stages.profile import profile_table_sql

    return profile_table_sql(
        "orders", num_cols=["o_orderkey", "o_totalprice"],
        cat_cols=["o_orderstatus", "o_orderpriority"],
    )


def customer_last_urgent_order(sf_dir: str):
    """LEFT OUTER shuffle hash join (stages/joins.hash_join
    how='left'): every customer keeps their row whether or not an
    urgent order exists; unmatched payloads surface as a -1 sentinel
    on BOTH sides so the hash compare is null-free.
    broadcast_bytes=0 pins the distributed left-merge path."""
    from ray.data.aggregate import Max

    from geomedea_ray.stages.joins import hash_join

    urgent = (
        tables.read(sf_dir, "orders",
                    columns=["o_custkey", "o_orderkey", "o_orderpriority"])
        .map_batches(
            lambda b: b.filter(pc.equal(b["o_orderpriority"],
                                        pa.scalar("1-URGENT")))
                       .select(["o_custkey", "o_orderkey"]),
            batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8)  # kilobyte partials: shuffle machinery is per-block
        .groupby("o_custkey")
        .aggregate(Max("o_orderkey", alias_name="last_urgent"))
    )
    cust = tables.read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    out = hash_join(cust, urgent, "c_custkey", "o_custkey",
                    ["last_urgent"], broadcast_bytes=0, how="left")

    def _fin(df):
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].astype(np.int64),
            "c_mktsegment": df["c_mktsegment"],
            "last_urgent": df["last_urgent"].fillna(-1).astype(np.int64),
        })

    return out.map_batches(_fin, batch_format="pandas")


CUSTOMER_LAST_URGENT_ORDER_SQL = """
WITH u AS (
  SELECT o_custkey, MAX(o_orderkey) AS last_urgent
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
)
SELECT c_custkey, c_mktsegment,
       CAST(COALESCE(u.last_urgent, -1) AS BIGINT) AS last_urgent
FROM customer LEFT JOIN u ON c_custkey = u.o_custkey
"""


def lineitem_unpivot(sf_dir: str):
    """Wide→long UNPIVOT (stages/pivot.unpivot): each lineitem row
    explodes into one (measure, value) row per numeric column —
    stateless per-block melt, zero exchange. Values pass through
    untouched so the float hash matches the UNION-ALL oracle
    bit-for-bit."""
    from geomedea_ray.stages.pivot import unpivot

    ds = tables.read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
    )

    def _ids(b: pa.Table) -> pa.Table:
        return b.set_column(1, "l_linenumber", b["l_linenumber"].cast(pa.int64()))

    return unpivot(
        ds.map_batches(_ids, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        var_name="measure", value_name="value",
    )


def lineitem_unpivot_sql() -> str:
    from geomedea_ray.stages.pivot import unpivot_sql

    inner = unpivot_sql(
        "(SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, "
        "l_quantity, l_discount, l_tax FROM lineitem)",
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        var_name="measure", value_name="value",
    )
    return inner


def price_moments(sf_dir: str):
    """Parallel moments (the Chan/Welford class, done the shuffle-free
    way): per return flag the EXACT integer zeroth/first/second
    moments of the floor-dollar price — per-block partials, TREE
    combine; variance/stddev derive downstream without ever shipping
    row-level data. Dollars (not cents) keep Σx² < 2^63 at any sf;
    FLOOR, not ROUND (numpy rounds half-even, DuckDB half-away)."""
    ds = tables.read(sf_dir, "lineitem",
                     columns=["l_returnflag", "l_extendedprice"])

    def _partial(df):
        x = np.floor(df["l_extendedprice"].to_numpy(np.float64)).astype(np.int64)
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"], "x": x, "x2": x * x})
        out = g.groupby("l_returnflag", as_index=False).agg(
            n=("x", "size"), sum_x=("x", "sum"), sum_x2=("x2", "sum"))
        out["n"] = out["n"].astype(np.int64)
        return out

    def _combine(df):
        return df.groupby("l_returnflag", as_index=False)[["n", "sum_x", "sum_x2"]].sum()

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(8)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
    )


PRICE_MOMENTS_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_x,
       CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)
                * CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_x2
FROM lineitem
GROUP BY l_returnflag
"""


def price_qty_corr(sf_dir: str):
    """Grouped Pearson CORRELATION the shuffle-free way: per return
    flag the exact integer co-moments (n, Σx, Σy, Σx², Σy², Σxy) of
    floor-dollar price × quantity — per-block partials, TREE combine —
    then corr from one float64 expression evaluated in the IDENTICAL
    operation order as the SQL mirror (*, −, /, sqrt are all
    correctly-rounded IEEE ops, so identical integer inputs + identical
    association ⇒ bit-identical doubles; the n·Σ products stay in
    float64 because n·Σx² exceeds int64 at sf ≥ 0.1). Row-level data
    never shuffles."""
    ds = tables.read(sf_dir, "lineitem",
                     columns=["l_returnflag", "l_extendedprice",
                              "l_quantity"])

    def _partial(df):
        x = np.floor(df["l_extendedprice"].to_numpy(np.float64)).astype(np.int64)
        y = np.floor(df["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"],
                          "x": x, "y": y, "x2": x * x, "y2": y * y,
                          "xy": x * y})
        out = g.groupby("l_returnflag", as_index=False).agg(
            n=("x", "size"), sum_x=("x", "sum"), sum_y=("y", "sum"),
            sum_x2=("x2", "sum"), sum_y2=("y2", "sum"), sum_xy=("xy", "sum"))
        out["n"] = out["n"].astype(np.int64)
        return out

    _COLS = ["n", "sum_x", "sum_y", "sum_x2", "sum_y2", "sum_xy"]

    def _combine(df):
        return df.groupby("l_returnflag", as_index=False)[_COLS].sum()

    def _corr(df):
        n = df["n"].to_numpy(np.float64)
        sx = df["sum_x"].to_numpy(np.float64)
        sy = df["sum_y"].to_numpy(np.float64)
        sx2 = df["sum_x2"].to_numpy(np.float64)
        sy2 = df["sum_y2"].to_numpy(np.float64)
        sxy = df["sum_xy"].to_numpy(np.float64)
        corr = (n * sxy - sx * sy) / np.sqrt(
            (n * sx2 - sx * sx) * (n * sy2 - sy * sy))
        return df.assign(corr_xy=corr)

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(8)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
        .map_batches(_corr, batch_format="pandas", batch_size=None)
    )


PRICE_QTY_CORR_SQL = """
WITH b AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice) AS BIGINT) AS x,
         CAST(FLOOR(l_quantity) AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sum_x,
         CAST(SUM(y) AS BIGINT) AS sum_y,
         CAST(SUM(x * x) AS BIGINT) AS sum_x2,
         CAST(SUM(y * y) AS BIGINT) AS sum_y2,
         CAST(SUM(x * y) AS BIGINT) AS sum_xy
  FROM b GROUP BY l_returnflag
)
SELECT l_returnflag, n, sum_x, sum_y, sum_x2, sum_y2, sum_xy,
       (CAST(n AS DOUBLE) * CAST(sum_xy AS DOUBLE)
        - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sum_x2 AS DOUBLE)
               - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sum_y2 AS DOUBLE)
                 - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)))
           AS corr_xy
FROM m
"""


def events_props_agg(sf_dir: str):
    """Semi-structured log parsing, the hot-path way: the JSON ``props``
    column is parsed with ONE compiled vectorized regex per batch (no
    per-row json.loads, no Python loop) and aggregated per event type —
    n / Σk / max k as exact int64 partials, TREE combine. The oracle is
    genuinely differential: DuckDB parses the same strings with its
    REAL JSON parser (json_extract), so a regex that misread even one
    row hash-mismatches.

    NULL semantics mirror DuckDB's (round-4 ADVICE): the regex is
    anchored to a TOP-LEVEL key position (``[{,]\\s*"k"``, so a
    ``"k":`` embedded inside a string value can't false-match a
    brace-adjacent position), and a row where it misses counts in
    ``n`` (COUNT(*)) but is EXCLUDED from sum/max (SUM/MAX skip NULL;
    an all-null group yields null, via nullable Int64 + min_count).
    Matched values go through ``astype(int64)`` directly from the
    digit strings — never a float intermediate."""
    ds = tables.read(sf_dir, "events", columns=["event_type", "props"])

    def _partial(df):
        s = df["props"].str.extract(r'[{,]\s*"k"\s*:\s*(-?\d+)',
                                    expand=False)
        m = s.notna().to_numpy()
        et = df["event_type"].to_numpy()
        n = (pd.DataFrame({"event_type": et})
             .groupby("event_type", as_index=False).size()
             .rename(columns={"size": "n"}))
        agg = (pd.DataFrame({"event_type": et[m],
                             "k": s[m].astype(np.int64).to_numpy()})
               .groupby("event_type", as_index=False)
               .agg(sum_k=("k", "sum"), max_k=("k", "max")))
        out = n.merge(agg, on="event_type", how="left")
        out["n"] = out["n"].astype(np.int64)
        out["sum_k"] = out["sum_k"].astype("Int64")
        out["max_k"] = out["max_k"].astype("Int64")
        return out

    def _combine(df):
        out = df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"),
            sum_k=("sum_k", lambda v: v.sum(min_count=1)),
            max_k=("max_k", "max"))
        out["n"] = out["n"].astype(np.int64)
        out["sum_k"] = out["sum_k"].astype("Int64")
        out["max_k"] = out["max_k"].astype("Int64")
        return out

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(8)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
    )


EVENTS_PROPS_AGG_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


def user_hourly_dense(sf_dir: str):
    """Gap-filled hourly activity matrix (stages/resample.
    densify_counts): every user × every hour of the event range with
    explicit zero rows — the resample-and-fill step before any
    windowed/retention model; one min/max pass + one key co-shuffle,
    in-shard vectorized reindex densify."""
    from geomedea_ray.stages.resample import densify_counts

    ds = tables.read(sf_dir, "events", columns=["user_id", "ts"])
    out = densify_counts(ds, "user_id", "ts")

    def _fin(df):
        return df.rename(columns={"k": "user_id", "b": "hour_bucket"})

    return out.map_batches(_fin, batch_format="pandas")


def user_hourly_dense_sql() -> str:
    from geomedea_ray.stages.resample import densify_counts_sql

    inner = densify_counts_sql("events", "user_id", "ts")
    return f"SELECT k AS user_id, b AS hour_bucket, n FROM ({inner})"


def user_retention(sf_dir: str):
    """Weekly cohort-retention triangle over the event log
    (stages/resample.cohort_retention): users bucketed by first-active
    week, counted once per week-offset they return in."""
    from geomedea_ray.stages.resample import cohort_retention

    ds = tables.read(sf_dir, "events", columns=["user_id", "ts"])
    return cohort_retention(ds, "user_id", "ts")


def user_retention_sql() -> str:
    from geomedea_ray.stages.resample import cohort_retention_sql

    return cohort_retention_sql("events", "user_id", "ts")


def orders_scd2(sf_dir: str):
    """SCD Type-2 dimension history (stages/joins.scd2_intervals) over
    the same base+change stream orders_upsert merges: instead of
    keeping only the newest version, EVERY version becomes a validity
    interval (valid_to = next version, -1 + is_current flag on the
    open one) — LEAD-window oracle hash-verified."""
    from geomedea_ray.stages.joins import scd2_intervals

    ds = tables.read(sf_dir, "orders",
                     columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    both = ds.map_batches(_orders_with_changes, batch_format="pyarrow",
                          zero_copy_batch=True)
    return scd2_intervals(both, "o_orderkey", "version")


ORDERS_SCD2_SQL = """
WITH all_rows AS (
  SELECT o_orderkey, 0 AS version, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents
  FROM orders
  UNION ALL
  SELECT o_orderkey, 1, 'U',
         CAST(ROUND(o_totalprice * 100) AS BIGINT) + 1000
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT o_orderkey, version, o_orderstatus, totalprice_cents,
       CAST(COALESCE(LEAD(version) OVER (PARTITION BY o_orderkey ORDER BY version), -1) AS BIGINT) AS valid_to,
       CAST(CASE WHEN LEAD(version) OVER (PARTITION BY o_orderkey ORDER BY version) IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM all_rows
"""


def hopping_distinct_users(sf_dir: str, hop_min: int = 30, k: int = 2):
    """EXACT distinct users per hopping window — distinct is NOT
    algebraic, so unlike events_hopping's partial counts this
    co-shuffles the exploded (window, user) pairs ONCE on the window
    hash: every window lands whole in one shard, where a vectorized
    drop_duplicates + size finishes — counts leave the shard final,
    no second combine."""
    from geomedea_ray.stages.joins import _shard_of

    hop_ns = hop_min * 60 * 1_000_000_000
    ev = tables.read(sf_dir, "events", columns=["ts", "user_id"])
    shards = 8

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        ws0 = (t // hop_ns) * hop_ns
        u = df["user_id"].to_numpy(np.int64)
        g = pd.concat(
            [pd.DataFrame({"window_start": ws0 - i * hop_ns, "user_id": u})
             for i in range(k)], ignore_index=True,
        ).drop_duplicates()
        g["_shard"] = _shard_of(g["window_start"], shards)
        return g

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["window_start", "user_id"])
        out = (d.groupby("window_start", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return (
        ev.map_batches(_pairs, batch_format="pandas")
        .groupby("_shard")
        .map_groups(_count, batch_format="pandas")
    )


HOPPING_DISTINCT_USERS_SQL = """
WITH h AS (
  SELECT (epoch_ns(ts) // 1800000000000) * 1800000000000
           - i.i * 1800000000000 AS window_start,
         user_id
  FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS i) i
)
SELECT window_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM h GROUP BY window_start
"""


def revenue_by_status_ivm(sf_dir: str):
    """INCREMENTAL VIEW MAINTENANCE: the per-status revenue aggregate
    is updated from the CDC change stream ALGEBRAICALLY — one map pass
    emits a retraction (-1, -old_cents) and an insertion (+1,
    +new_cents) per changed key, kilobyte delta partials TREE-combine,
    and the base aggregate absorbs the delta on the driver. Never
    recomputes the base. The oracle DOES the full recompute over the
    newest-wins merged table — an independent derivation, so a
    hash-match proves the maintenance algebra, not just the plumbing."""
    ds = tables.read(sf_dir, "orders",
                     columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def _base_partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "o_orderstatus": b["o_orderstatus"].to_numpy(zero_copy_only=False),
            "cents": _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False),
        })
        out = df.groupby("o_orderstatus", as_index=False).agg(
            n=("cents", "size"), revenue_cents=("cents", "sum"))
        return pa.Table.from_pandas(out, preserve_index=False)

    def _delta_partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        key = b["o_orderkey"].to_numpy()
        chg = key % 10 == 0
        status = b["o_orderstatus"].to_numpy(zero_copy_only=False)[chg]
        cents = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)[chg]
        df = pd.DataFrame({
            "o_orderstatus": np.concatenate([status, np.full(len(cents), "U", object)]),
            "n": np.concatenate([np.full(len(cents), -1, np.int64),
                                 np.ones(len(cents), np.int64)]),
            "revenue_cents": np.concatenate([-cents, cents + 1000]),
        })
        out = df.groupby("o_orderstatus", as_index=False)[["n", "revenue_cents"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    def _combine(df):
        return df.groupby("o_orderstatus", as_index=False)[["n", "revenue_cents"]].sum()

    def _tree(stream):
        return (stream.repartition(4)
                .map_batches(_combine, batch_format="pandas", batch_size=None)
                .repartition(1)
                .map_batches(_combine, batch_format="pandas", batch_size=None)
                .to_pandas())

    base = _tree(ds.map_batches(_base_partial, batch_format="pyarrow",
                                zero_copy_batch=True))
    delta = _tree(ds.map_batches(_delta_partial, batch_format="pyarrow",
                                 zero_copy_batch=True))
    merged = (pd.concat([base, delta], ignore_index=True)
              .groupby("o_orderstatus", as_index=False)[["n", "revenue_cents"]]
              .sum())
    merged = merged[merged["n"] > 0].sort_values("o_orderstatus").reset_index(drop=True)
    merged["n"] = merged["n"].astype(np.int64)
    merged["revenue_cents"] = merged["revenue_cents"].astype(np.int64)
    return merged


REVENUE_BY_STATUS_IVM_SQL = """
WITH all_rows AS (
  SELECT o_orderkey, 0 AS version, o_orderstatus,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents
  FROM orders
  UNION ALL
  SELECT o_orderkey, 1, 'U',
         CAST(ROUND(o_totalprice * 100) AS BIGINT) + 1000
  FROM orders WHERE o_orderkey % 10 = 0),
latest AS (
  SELECT o_orderstatus, totalprice_cents FROM all_rows
  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) = 1
)
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(totalprice_cents) AS BIGINT) AS revenue_cents
FROM latest GROUP BY o_orderstatus
"""


def events_customer_outer(sf_dir: str):
    """FULL OUTER equi-join (stages/joins.hash_join how='outer'):
    events keyed on user_id+1400 against the customer dimension —
    the shifted domain overlaps [1400, 1499] and leaves unmatched
    rows on BOTH sides (events with key > 1499, customers below
    1400), so every outer branch is exercised. One key co-shuffle;
    each shard owns all rows of its keys, so the per-shard outer
    merge is globally correct (no broadcast plan can express this).
    Unmatched payloads are sentinel-filled to stay integer-exact:
    event_id/acctbal_c -1, value_c 0."""
    from geomedea_ray.stages.joins import hash_join

    ev = tables.read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def _shift(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"].cast(pa.int64()),
            "ckey": pc.add(b["user_id"].cast(pa.int64()),
                           pa.scalar(1400, pa.int64())),
            "value_c": _cents(b["value"]),
        })

    left = ev.map_batches(_shift, batch_format="pyarrow", zero_copy_batch=True)
    cust = tables.read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def _cust(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["c_custkey"].cast(pa.int64()),
            "acctbal_c": _cents(b["c_acctbal"]),
        })

    right = cust.map_batches(_cust, batch_format="pyarrow", zero_copy_batch=True)
    out = hash_join(left, right, "ckey", "c_custkey", ["acctbal_c"],
                    how="outer", left_cols=["event_id", "value_c"])

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ckey": df["ckey"].astype(np.int64),
            "event_id": df["event_id"].fillna(-1).astype(np.int64),
            "value_c": df["value_c"].fillna(0).astype(np.int64),
            "acctbal_c": df["acctbal_c"].fillna(-1).astype(np.int64),
        })

    return out.map_batches(_fin, batch_format="pandas")


EVENTS_CUSTOMER_OUTER_SQL = """
WITH e AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(user_id AS BIGINT) + 1400 AS ckey,
         CAST(ROUND(value * 100) AS BIGINT) AS value_c
  FROM events),
c AS (
  SELECT CAST(c_custkey AS BIGINT) AS ck,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_c
  FROM customer)
SELECT COALESCE(e.ckey, c.ck)     AS ckey,
       COALESCE(e.event_id, -1)  AS event_id,
       COALESCE(e.value_c, 0)    AS value_c,
       COALESCE(c.acctbal_c, -1) AS acctbal_c
FROM e FULL OUTER JOIN c ON e.ckey = c.ck
"""


def price_zscore(sf_dir: str, max_key: int = 2000):
    """Per-group FEATURE NORMALIZATION (the standardize-before-training
    step) without shuffling rows: the exact integer moments per return
    flag (one TREE-combined partials pass, shared shape with
    price_moments) broadcast back over a second streaming pass that
    emits each row's z-score. The per-row float expression is
    evaluated in the IDENTICAL operation order as the SQL mirror —
    μ = sx/n and σ = sqrt(sx2/n − μ·μ) from the same int64 moments,
    then (x − μ)/σ — so correctly-rounded IEEE ops make the doubles
    bit-identical, and the emitted value is FLOOR(z·1e6) (an int64 —
    floor of identical doubles cannot disagree, unlike round-to-even
    vs round-half-away). Gate output is capped to l_orderkey < max_key to
    keep the compare frame small; the operator itself streams the full
    table."""
    import ray

    from geomedea_ray.util import get_once

    ds = tables.read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_linenumber",
                              "l_returnflag", "l_extendedprice"])

    def _partial(df):
        x = np.floor(df["l_extendedprice"].to_numpy(np.float64)).astype(np.int64)
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"],
                          "x": x, "x2": x * x})
        out = g.groupby("l_returnflag", as_index=False).agg(
            n=("x", "size"), sum_x=("x", "sum"), sum_x2=("x2", "sum"))
        out["n"] = out["n"].astype(np.int64)
        return out

    def _combine(df):
        return df.groupby("l_returnflag", as_index=False)[
            ["n", "sum_x", "sum_x2"]].sum()

    moments = (
        ds.map_batches(_partial, batch_format="pandas")
        .repartition(8)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(_combine, batch_format="pandas", batch_size=None)
    ).to_pandas()  # one row per return flag — driver-small by domain
    mom = {
        r.l_returnflag: (float(r.n), float(r.sum_x), float(r.sum_x2))
        for r in moments.itertuples()
    }
    ref = ray.put(mom)

    def _z(df):
        df = df[df["l_orderkey"].to_numpy() < max_key]
        if len(df) == 0:
            return pd.DataFrame({"l_orderkey": pd.Series([], dtype=np.int64),
                                 "l_linenumber": pd.Series([], dtype=np.int32),
                                 "z_micro": pd.Series([], dtype=np.int64)})
        m = get_once(ref)
        x = np.floor(df["l_extendedprice"].to_numpy(np.float64))
        flags = df["l_returnflag"].to_numpy()
        z = np.empty(len(df), np.float64)
        for f, (n, sx, sx2) in m.items():
            sel = flags == f
            mu = sx / n
            sigma = np.sqrt(sx2 / n - mu * mu)
            z[sel] = (x[sel] - mu) / sigma
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64),
            "l_linenumber": df["l_linenumber"].to_numpy(np.int32),
            "z_micro": np.floor(z * 1e6).astype(np.int64),
        })

    return ds.map_batches(_z, batch_format="pandas")


def price_zscore_sql(max_key: int = 2000) -> str:
    return f"""
WITH b AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         CAST(FLOOR(l_extendedprice) AS BIGINT) AS x
  FROM lineitem
),
m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sum_x,
         CAST(SUM(x * x) AS BIGINT) AS sum_x2
  FROM b GROUP BY l_returnflag
)
SELECT b.l_orderkey, b.l_linenumber,
       CAST(FLOOR(((CAST(b.x AS DOUBLE)
              - CAST(m.sum_x AS DOUBLE) / CAST(m.n AS DOUBLE))
             / sqrt(CAST(m.sum_x2 AS DOUBLE) / CAST(m.n AS DOUBLE)
                    - (CAST(m.sum_x AS DOUBLE) / CAST(m.n AS DOUBLE))
                      * (CAST(m.sum_x AS DOUBLE) / CAST(m.n AS DOUBLE))))
             * 1e6) AS BIGINT) AS z_micro
FROM b JOIN m USING (l_returnflag)
WHERE b.l_orderkey < {max_key}
"""


def order_value_ntile(sf_dir: str, n_buckets: int = 4):
    """Quantile-bucket assignment (NTILE) per order priority — the
    percentile-feature step before stratified policies: ONE key
    co-shuffle (each priority's rows land whole in a shard via
    hash(priority) % shards), in-shard vectorized sort + the exact
    NTILE fill rule (the first count % n buckets take the ceil size).
    Deterministic total order: (o_totalprice, o_orderkey) — mirrored
    verbatim by the SQL window ORDER BY."""
    ds = tables.read(sf_dir, "orders",
                     columns=["o_orderkey", "o_orderpriority",
                              "o_totalprice"])
    num_shards = 32

    def _tag(df):
        from geomedea_ray.functions.text import stable_hash64

        h = stable_hash64(df["o_orderpriority"].astype(str))
        return df.assign(_shard=(h % np.uint64(num_shards)).astype(np.int64))

    def _ntile(df):
        if "o_orderkey" not in df.columns or len(df) == 0:
            return pd.DataFrame({
                "o_orderkey": pd.Series([], dtype=np.int64),
                "o_orderpriority": pd.Series([], dtype=object),
                "tile": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["o_orderpriority", "o_totalprice",
                             "o_orderkey"], kind="mergesort")
        out_tiles = np.empty(len(df), np.int64)
        sizes = df.groupby("o_orderpriority", sort=False).size().to_numpy()
        pos = 0
        for c in sizes:
            r = np.arange(c, dtype=np.int64)
            small = c // n_buckets
            big = c % n_buckets
            cut = big * (small + 1)
            tile = np.where(
                r < cut,
                r // (small + 1),
                big + (r - cut) // max(small, 1),
            ) + 1
            out_tiles[pos: pos + c] = tile
            pos += c
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "o_orderpriority": df["o_orderpriority"].to_numpy(object),
            "tile": out_tiles,
        })

    return (
        ds.map_batches(_tag, batch_format="pandas")
        .groupby("_shard").map_groups(_ntile, batch_format="pandas")
    )


ORDER_VALUE_NTILE_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS BIGINT)
           AS tile
FROM orders
"""


def lineitem_order_sortmerge(sf_dir: str):
    """The SAME fact×fact join as lineitem_order_join, through the
    RANGE-partitioned SORT-MERGE plan (stages/joins.sort_merge_join):
    quantile splits from a bounded sampling pass, one range co-shuffle,
    vectorized searchsorted merge kernel in-shard — no hash table
    anywhere, output clustered by key per shard. Shares the hash
    join's oracle: identical rows prove the two physical plans agree."""
    from geomedea_ray.stages.joins import sort_merge_join

    li = tables.read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )

    def _pre(b: pa.Table) -> pa.Table:
        price_c = pc.round(pc.multiply(b["l_extendedprice"], pa.scalar(100.0))).cast(pa.int64())
        disc_pct = pc.round(pc.multiply(b["l_discount"], pa.scalar(100.0))).cast(pa.int64())
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_linenumber": b["l_linenumber"].cast(pa.int64()),
                "revenue_e4": pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct)),
            }
        )

    ords = tables.read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_orderpriority"]
    )
    out = sort_merge_join(
        li.map_batches(_pre, batch_format="pyarrow", zero_copy_batch=True),
        ords, "l_orderkey", "o_orderkey",
        ["o_orderstatus", "o_orderpriority"],
    )
    return out.map_batches(
        lambda df: df[["l_orderkey", "l_linenumber", "revenue_e4",
                       "o_orderstatus", "o_orderpriority"]],
        batch_format="pandas", batch_size=None)


def price_quantiles_kll(sf_dir: str):
    """Approximate price quantiles via the mergeable KLL sketch
    (stages/sketch.KLLSketch) — the UNBOUNDED-domain scale path next
    to the exact histogram/radix operators: per-block kilobyte
    sketches, one deterministic-order merge. Rows-only gate entry
    (sketch by design); rank-error bound, mergeability and
    byte-determinism are pytest-asserted."""
    from geomedea_ray.stages.sketch import kll_quantiles

    ds = tables.read(sf_dir, "lineitem", columns=["l_extendedprice"])
    return kll_quantiles(ds, "l_extendedprice",
                         [0.01, 0.25, 0.50, 0.75, 0.99])
