"""Distributed PageRank over the event-succession graph — the
iterative graph-analytics family member (alongside k-means and the
connected-components BSP in extras.graph).

Graph definition (deterministic, SQL-derivable): within each
``event_type`` stream, order events by (ts, event_id); every pair of
CONSECUTIVE events with different users contributes a directed edge
``user_i -> user_{i+1}`` (multi-edges fold into an integer weight).
Nodes are ALL distinct users in `events` (isolated users keep
receiving teleport + dangling mass).

Standard PageRank: d = 0.85, ITERS = 10 synchronous power iterations,
dangling mass redistributed uniformly.

Scale shape (mirrors extras.graph's CC): edges and node/outdeg lists
are written ONCE into hash(node)-bucketed parquet under the
cluster-visible cache root and stay STATIONARY; each iteration moves
only rank/contribution rows through ONE groupby(part) pair (scatter by
src part -> contribution rows keyed by dst part -> per-part reduce
against the node bucket), plus one tiny dangling-mass aggregate.  The
per-event_type consecutive-pair emit assumes one type's stream fits a
worker (the same per-key assumption sessionize documents); a
range-partitioned sort with boundary stitching generalizes it.

Rows-only driver entry (iterative — not SQL-expressible); pinned to a
dense numpy power-iteration oracle in tests/test_pagerank.py.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ciff_ray.layout import atomic_write_parquet, cache_root

PR_D = 0.85
PR_ITERS = 10
PR_PARTS = 16


def _pr_root(tag: str) -> str:
    d = os.path.join(cache_root(), "pagerank", tag)
    os.makedirs(d, exist_ok=True)
    return d


def _edges_from_events(sf_dir: str) -> ray.data.Dataset:
    """events -> (src, dst, w) succession edges per event_type."""

    def _pairs(group: pa.Table) -> pa.Table:
        ts = group["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts))
        u = uid[order]
        src, dst = u[:-1], u[1:]
        keep = src != dst
        src, dst = src[keep], dst[keep]
        if src.size == 0:
            return pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                    "w": pa.array([], type=pa.int64()),
                }
            )
        key = src * (np.int64(1) << np.int64(32)) + dst
        ks, w = np.unique(key, return_counts=True)
        return pa.table(
            {
                "src": pa.array(ks >> np.int64(32), type=pa.int64()),
                "dst": pa.array(
                    ks & np.int64(0xFFFFFFFF), type=pa.int64()
                ),
                "w": pa.array(w.astype(np.int64), type=pa.int64()),
            }
        )

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return ev.groupby("event_type").map_groups(_pairs, batch_format="pyarrow")


def _write_buckets(sf_dir: str, root: str) -> int:
    """Edge buckets (by src % PR_PARTS, weights merged across
    event_type streams) + node buckets (node, outdeg; nodes = all users
    in events), one atomic parquet per part.  Returns N (node count)."""
    edges = _edges_from_events(sf_dir)

    def _tag(batch: pa.Table) -> pa.Table:
        if "src" not in batch.schema.names:
            return pa.table(
                {
                    "part": pa.array([], type=pa.int32()),
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                    "w": pa.array([], type=pa.int64()),
                }
            )
        src = batch["src"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((src % PR_PARTS).astype(np.int32))
        ).select(["part", "src", "dst", "w"])

    def _write(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"part": pa.array([], type=pa.int32())})
        pid = int(group["part"][0].as_py())
        src = group["src"].to_numpy(zero_copy_only=False)
        dst = group["dst"].to_numpy(zero_copy_only=False)
        w = group["w"].to_numpy(zero_copy_only=False)
        # merge duplicate (src, dst) across event_type streams
        key = src * (np.int64(1) << np.int64(32)) + dst
        order = np.argsort(key)
        key, src, dst, w = key[order], src[order], dst[order], w[order]
        new = np.concatenate([[True], key[1:] != key[:-1]])
        idx = np.flatnonzero(new)
        wsum = np.add.reduceat(w, idx)
        tbl = pa.table(
            {
                "src": pa.array(src[idx], type=pa.int64()),
                "dst": pa.array(dst[idx], type=pa.int64()),
                "w": pa.array(wsum.astype(np.int64), type=pa.int64()),
            }
        )
        atomic_write_parquet(tbl, os.path.join(root, f"edges-{pid:04d}.parquet"))
        return pa.table({"part": pa.array([pid], type=pa.int32())})

    seen_parts: set[int] = set()
    for ref in (
        edges.map_batches(_tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_write, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        t = ray.get(ref)
        if t.num_columns and "part" in t.schema.names:
            seen_parts.update(t["part"].to_pylist())
    empty_e = pa.table(
        {
            "src": pa.array([], type=pa.int64()),
            "dst": pa.array([], type=pa.int64()),
            "w": pa.array([], type=pa.int64()),
        }
    )
    for pid in range(PR_PARTS):
        if pid not in seen_parts:
            atomic_write_parquet(
                empty_e, os.path.join(root, f"edges-{pid:04d}.parquet")
            )

    # node buckets: every user in events, with outdeg from edge buckets
    def _users(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["user_id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "part": pa.array((u % PR_PARTS).astype(np.int32)),
                "node": pa.array(u.astype(np.int64), type=pa.int64()),
            }
        )

    def _write_nodes(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"part": pa.array([], type=pa.int32()), "n": pa.array([], type=pa.int64())})
        pid = int(group["part"][0].as_py())
        nodes = np.unique(group["node"].to_numpy(zero_copy_only=False))
        et = pq.read_table(
            os.path.join(root, f"edges-{pid:04d}.parquet"),
            columns=["src", "w"],
        )
        esrc = et["src"].to_numpy(zero_copy_only=False)
        ew = et["w"].to_numpy(zero_copy_only=False)
        out = np.zeros(nodes.size, dtype=np.int64)
        if esrc.size:
            pos = np.searchsorted(nodes, esrc)
            np.add.at(out, pos, ew)
        atomic_write_parquet(
            pa.table(
                {
                    "node": pa.array(nodes, type=pa.int64()),
                    "outdeg": pa.array(out, type=pa.int64()),
                }
            ),
            os.path.join(root, f"nodes-{pid:04d}.parquet"),
        )
        return pa.table(
            {
                "part": pa.array([pid], type=pa.int32()),
                "n": pa.array([nodes.size], type=pa.int64()),
            }
        )

    n_total = 0
    node_parts: set[int] = set()
    for ref in (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
        )
        .map_batches(_users, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_write_nodes, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        t = ray.get(ref)
        if t.num_columns and "part" in t.schema.names:
            node_parts.update(t["part"].to_pylist())
            n_total += int(sum(t["n"].to_pylist()))
    empty_n = pa.table(
        {
            "node": pa.array([], type=pa.int64()),
            "outdeg": pa.array([], type=pa.int64()),
        }
    )
    for pid in range(PR_PARTS):
        if pid not in node_parts:
            atomic_write_parquet(
                empty_n, os.path.join(root, f"nodes-{pid:04d}.parquet")
            )
    return n_total


_RANK_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("node", pa.int64()),
        ("r", pa.float64()),
        ("outdeg", pa.int64()),
    ]
)

_CONTRIB_SCHEMA = pa.schema(
    [("part", pa.int32()), ("node", pa.int64()), ("val", pa.float64())]
)


def _make_scatter(root: str):
    """Kernel A: one part's rank rows -> damped contribution rows keyed
    by the DESTINATION's part (edge bucket read once per group call)."""

    def _scatter(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _CONTRIB_SCHEMA.empty_table()
        pid = int(group["part"][0].as_py())
        et = pq.read_table(os.path.join(root, f"edges-{pid:04d}.parquet"))
        esrc = et["src"].to_numpy(zero_copy_only=False)
        if esrc.size == 0:
            return _CONTRIB_SCHEMA.empty_table()
        edst = et["dst"].to_numpy(zero_copy_only=False)
        ew = et["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        nodes = group["node"].to_numpy(zero_copy_only=False)
        r = group["r"].to_numpy(zero_copy_only=False)
        out = group["outdeg"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(nodes)
        nodes, r, out = nodes[order], r[order], out[order]
        pos = np.searchsorted(nodes, esrc)
        if (pos >= nodes.size).any() or (nodes[np.minimum(pos, nodes.size - 1)] != esrc).any():
            raise KeyError("edge source missing from its node partition")
        val = PR_D * r[pos] / out[pos] * ew
        return pa.table(
            {
                "part": pa.array((edst % PR_PARTS).astype(np.int32)),
                "node": pa.array(edst, type=pa.int64()),
                "val": pa.array(val, type=pa.float64()),
            }
        )

    return _scatter


def _make_gather(root: str, n_total: int, dangling: float, teleport: float):
    """Kernel B: one part's contribution rows -> next rank rows over
    the part's FULL node bucket (zero-inbound nodes included)."""

    base = teleport + PR_D * dangling / n_total

    def _gather(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _RANK_SCHEMA.empty_table()
        pid = int(group["part"][0].as_py())
        nt = pq.read_table(os.path.join(root, f"nodes-{pid:04d}.parquet"))
        nodes = nt["node"].to_numpy(zero_copy_only=False)
        outdeg = nt["outdeg"].to_numpy(zero_copy_only=False)
        acc = np.zeros(nodes.size, dtype=np.float64)
        cn = group["node"].to_numpy(zero_copy_only=False)
        cv = group["val"].to_numpy(zero_copy_only=False)
        real = cn >= 0  # node -1 rows are the part-presence sentinels
        if real.any():
            pos = np.searchsorted(nodes, cn[real])
            np.add.at(acc, pos, cv[real])
        return pa.table(
            {
                "part": pa.array(
                    np.full(nodes.size, pid, dtype=np.int32)
                ),
                "node": pa.array(nodes, type=pa.int64()),
                "r": pa.array(base + acc, type=pa.float64()),
                "outdeg": pa.array(outdeg, type=pa.int64()),
            }
        )

    return _gather


def _sentinels() -> pa.Table:
    """One node=-1 row per part so every partition appears in the
    contribution groupby even when it received no mass."""
    return pa.table(
        {
            "part": pa.array(np.arange(PR_PARTS, dtype=np.int32)),
            "node": pa.array(np.full(PR_PARTS, -1, dtype=np.int64)),
            "val": pa.array(np.zeros(PR_PARTS), type=pa.float64()),
        }
    )


def pagerank(sf_dir: str, iters: int = PR_ITERS) -> ray.data.Dataset:
    """(user_id, pr) after ``iters`` synchronous power iterations."""
    from ciff_ray.layout import stable_hash

    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    key = f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}"
    # stable_hash, NOT builtin hash(): the builtin is salted per
    # process, which would orphan the bucket store every run
    tag = format(stable_hash(key.encode()), "x")
    root = _pr_root(tag)
    n_total = _write_buckets(sf_dir, root)
    if n_total == 0:
        return ray.data.from_arrow(
            pa.schema([("user_id", pa.int64()), ("pr_r", pa.float64())]).empty_table()
        )
    teleport = (1.0 - PR_D) / n_total
    # initial ranks straight from the node buckets
    node_files = [
        os.path.join(root, f"nodes-{p:04d}.parquet") for p in range(PR_PARTS)
    ]

    def _init(batch: pa.Table) -> pa.Table:
        nodes = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((nodes % PR_PARTS).astype(np.int32)),
                "node": pa.array(nodes, type=pa.int64()),
                "r": pa.array(
                    np.full(nodes.size, 1.0 / n_total), type=pa.float64()
                ),
                "outdeg": batch["outdeg"],
            }
        )

    ranks = ray.data.read_parquet(node_files).map_batches(
        _init, batch_format="pyarrow"
    ).materialize()
    scatter = _make_scatter(root)
    for _ in range(iters):
        # dangling mass: one streaming partial-sum pass (tiny rows)
        def _dang(batch: pa.Table) -> pa.Table:
            r = batch["r"].to_numpy(zero_copy_only=False)
            o = batch["outdeg"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"s": pa.array([float(r[o == 0].sum())], type=pa.float64())}
            )

        dangling = float(
            ranks.map_batches(_dang, batch_format="pyarrow").sum("s") or 0.0
        )
        contribs = ranks.groupby("part").map_groups(
            scatter, batch_format="pyarrow"
        )
        contribs = contribs.union(ray.data.from_arrow(_sentinels()))
        gather = _make_gather(root, n_total, dangling, teleport)
        ranks = (
            contribs.groupby("part")
            .map_groups(gather, batch_format="pyarrow")
            .materialize()
        )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["node"],
                "pr_r": pa.array(
                    np.round(
                        batch["r"].to_numpy(zero_copy_only=False), 9
                    ),
                    type=pa.float64(),
                ),
            }
        )

    return ranks.map_batches(_final, batch_format="pyarrow")


def q_pagerank(sf_dir: str) -> ray.data.Dataset:
    """Rows-only driver entry: PageRank over the event-succession
    graph (d=0.85, 10 iterations); numpy dense oracle in tests."""
    return pagerank(sf_dir)


QUERIES = {"pagerank": q_pagerank}  # rows-only (iterative)
ORACLE_SQLS: dict[str, str] = {}
