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
        ok = (pos < self.ck.size) & (self.ck[np.minimum(pos, self.ck.size - 1)] == cust)
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


ORACLE_SQLS = {
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
}
