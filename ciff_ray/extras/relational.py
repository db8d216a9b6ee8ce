"""Broadcast hash join over the relational testdata tables — the
dimension-join operator class, shaped exactly as the 100 TB doctrine
prescribes: the fact table STREAMS, the dimension tables are read once,
`ray.put` once, and looked up inside every map_batches task (no shuffle
join; the only exchange is the final tiny per-key aggregate).

`q_nation_revenue`: orders ⋈ customer ⋈ nation -> revenue per nation.
customer/nation are the broadcast small sides (sorted-key arrays +
searchsorted — no Python dicts); each orders batch emits per-nation
PARTIAL sums, so the groupby moves one row per (batch, nation).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Sum


def _dim_tables(sf_dir: str):
    """(sorted custkey -> nationkey, nationkey -> name) small sides."""
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nk = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ck)
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    n_keys = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    names = np.array(nation["n_name"].to_pylist(), dtype=object)
    norder = np.argsort(n_keys)
    return ck[order], nk[order], n_keys[norder], names[norder]


class _RevenuePartials:
    """orders batches -> per-nation partial (revenue, order count); the
    broadcast dims are fetched once per actor (__init__)."""

    def __init__(self, dims_ref):
        self.ck, self.nk, self.n_keys, self.n_names = ray.get(dims_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cust = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        # sum in integer CENTS: order-independent and exact, so the
        # nondeterministic partial-sum order can never flip a rounding
        # boundary in the cross-engine hash compare
        cents = np.round(price * 100.0).astype(np.int64)
        pos = np.searchsorted(self.ck, cust)
        ok = (pos < self.ck.size) & (self.ck[np.minimum(pos, max(self.ck.size - 1, 0))] == cust)
        if not ok.all():
            # inner-join semantics: drop orders without a customer row
            pos, cents = pos[ok], cents[ok]
        nkey = self.nk[pos]
        npos = np.searchsorted(self.n_keys, nkey)
        npos_c = np.minimum(npos, max(self.n_keys.size - 1, 0))
        if npos_c.size and (self.n_keys[npos_c] != nkey).any():
            # a dangling c_nationkey would otherwise be silently
            # misattributed to the nearest nation — fail fast instead
            raise KeyError("c_nationkey missing from nation table")
        k = self.n_keys.size
        rev = np.bincount(npos_c, weights=cents.astype(np.float64), minlength=k)
        cnt = np.bincount(npos_c, minlength=k)
        present = np.flatnonzero(cnt)
        return pa.table(
            {
                "n_name": pa.array(
                    self.n_names[present].tolist(), type=pa.string()
                ),
                "rev_cents": pa.array(
                    rev[present].astype(np.int64), type=pa.int64()
                ),
                "n_orders": pa.array(cnt[present], type=pa.int64()),
            }
        )


def q_nation_revenue(sf_dir: str) -> ray.data.Dataset:
    """Revenue and order count per nation: broadcast-join the streamed
    orders fact to the customer/nation dims, pre-aggregate per batch,
    one tiny groupby(n_name).  Revenue is aggregated in integer CENTS
    (order-independent, exact — no float partial-sum jitter in the
    cross-engine compare; the oracle sums the same way)."""
    dims_ref = ray.put(_dim_tables(sf_dir))
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )

    def _final(t: pa.Table) -> pa.Table:
        cents = t["rev_cents"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": t["n_name"],
                "revenue_r": pa.array(
                    np.round(cents / 100.0, 4), type=pa.float64()
                ),
                "n_orders": t["n_orders"],
            }
        )

    return (
        orders.map_batches(
            _RevenuePartials,
            fn_constructor_args=(dims_ref,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .groupby("n_name")
        .aggregate(
            Sum("rev_cents", alias_name="rev_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .map_batches(_final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# large-large hash equi-join (orders x lineitem, both sides stream)

_JOIN_PARTS = 64


def _order_side(batch: pa.Table) -> pa.Table:
    key = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "part": pa.array((key % _JOIN_PARTS).astype(np.int32)),
            "side": pa.array(np.zeros(key.size, dtype=np.int8)),
            "key": pa.array(key),
            "prio": batch["o_orderpriority"],
            "cents": pa.array(np.zeros(key.size, dtype=np.int64)),
        }
    )


def _lineitem_side(batch: pa.Table) -> pa.Table:
    key = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
    disc = batch["l_discount"].to_numpy(zero_copy_only=False)
    # integer 1/10000ths: price has 2 decimals and discount 2, so the
    # product has EXACTLY 4 — x10000 lands ~1e-7 from an integer, never
    # near a .5 boundary, so np.round (half-to-even) and DuckDB round
    # (half-away-from-zero) agree.  Plain cents (x100) sit exactly ON
    # half-cent boundaries and the two rounding modes diverge.
    cents = np.round(price * (1 - disc) * 10000).astype(np.int64)
    return pa.table(
        {
            "part": pa.array((key % _JOIN_PARTS).astype(np.int32)),
            "side": pa.array(np.ones(key.size, dtype=np.int8)),
            "key": pa.array(key),
            "prio": pa.array([""] * key.size, type=pa.string()),
            "cents": pa.array(cents),
        }
    )


def _join_in_part(group: pa.Table) -> pa.Table:
    """One key-hash partition holding BOTH sides: sort the order keys,
    searchsorted every lineitem into them, bincount/add.at the
    aggregates — a fully vectorized per-partition hash-join kernel
    (inner join: orders without items drop out via the cnt>0 mask,
    dangling lineitems via the key-match mask)."""
    empty = pa.table(
        {
            "o_orderkey": pa.array([], type=pa.int64()),
            "o_orderpriority": pa.array([], type=pa.string()),
            "n_items": pa.array([], type=pa.int64()),
            "revenue_r": pa.array([], type=pa.float64()),
        }
    )
    if len(group) == 0:
        return empty
    side = group["side"].to_numpy(zero_copy_only=False)
    key = group["key"].to_numpy(zero_copy_only=False)
    o_mask = side == 0
    okey = key[o_mask]
    if okey.size == 0:
        return empty
    oorder = np.argsort(okey, kind="stable")
    okey_s = okey[oorder]
    prio = group["prio"].to_numpy(zero_copy_only=False)[o_mask][oorder]
    lkey = key[~o_mask]
    cents = group["cents"].to_numpy(zero_copy_only=False)[~o_mask]
    pos = np.searchsorted(okey_s, lkey)
    pos_c = np.minimum(pos, okey_s.size - 1)
    hit = okey_s[pos_c] == lkey
    rev = np.zeros(okey_s.size, dtype=np.int64)
    np.add.at(rev, pos_c[hit], cents[hit])
    cnt = np.bincount(pos_c[hit], minlength=okey_s.size)
    present = np.flatnonzero(cnt)
    return pa.table(
        {
            "o_orderkey": pa.array(okey_s[present], type=pa.int64()),
            "o_orderpriority": pa.array(
                prio[present].tolist(), type=pa.string()
            ),
            "n_items": pa.array(cnt[present].astype(np.int64)),
            "revenue_r": pa.array(
                np.round(rev[present] / 10000.0, 4), type=pa.float64()
            ),
        }
    )


def q_order_lineitem_join(sf_dir: str) -> ray.data.Dataset:
    """Per-order item count + revenue: a LARGE-LARGE hash equi-join
    where neither side fits a broadcast — both sides map to one narrow
    tagged schema, union into a SINGLE key-hash exchange, and a
    vectorized per-partition kernel joins and aggregates (the
    co-partitioned shuffle-join class, complementing the broadcast
    dimension join above).  Revenue sums in integer 1/10000ths
    (order-independent, exact vs the oracle)."""
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(_order_side, batch_format="pyarrow")
    items = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(_lineitem_side, batch_format="pyarrow")
    return (
        orders.union(items)
        .groupby("part")
        .map_groups(_join_in_part, batch_format="pyarrow")
    )


ORACLE_SQLS = {
    "order_lineitem_join": """SELECT o.o_orderkey AS o_orderkey,
       o.o_orderpriority AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       round(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                      AS BIGINT)) / 10000.0, 4) AS revenue_r
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderpriority""",
    "nation_revenue": """SELECT n.n_name AS n_name,
       round(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0, 4)
         AS revenue_r,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name""",
}

QUERIES = {
    "nation_revenue": q_nation_revenue,
    "order_lineitem_join": q_order_lineitem_join,
}
