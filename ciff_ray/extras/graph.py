"""Near-duplicate graph clustering: distributed connected components
over the near-dup pair graph — the "pairs -> clusters -> canonical
doc" step every dedup pipeline runs after candidate verification
(reference scope: the dedup family of the driver brief; no analogue in
/root/reference, which stops at the index format).

Scale design (the part that matters at 100 TB, where verified near-dup
pairs are O(corpus), not driver-small):

* The edge list is written ONCE into hash(src)-bucketed parquet under
  the cluster-visible cache root (`CIFF_RAY_CACHE_ROOT`), with
  deterministic per-bucket filenames + atomic rename (retry-safe,
  resume-safe).  Edges are STATIONARY: iterations never re-shuffle
  them.
* Each BSP iteration moves only label rows: ONE groupby(part) per
  iteration co-locates a node's incoming label candidates with its
  outgoing edge bucket; the kernel min-reduces per node (vectorized
  lexsort + reduceat-style first-per-run) and emits new candidates for
  the next round.
* Frontier propagation: after round 1 only nodes whose label CHANGED
  re-emit their edges, so late rounds ship a vanishing fraction of E.
* Convergence detection is a monotone invariant: per-node labels only
  ever decrease, so Sum(label) over the per-node rows strictly
  decreases until the fixed point — one tiny `aggregate(Sum)` per
  round, no driver-side label table at any point.

Min-label propagation converges in O(graph diameter) rounds; near-dup
components are overwhelmingly cliques/short chains (diameter <= 3).
A pathological million-hop chain would want pointer-jumping
(large-star/small-star) — noted here, not needed for this graph class.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Sum

from ciff_ray.layout import atomic_write_parquet, cache_root

CC_PARTS = 32
CC_MAX_ITERS = 64


def _edge_root(tag: str) -> str:
    d = os.path.join(cache_root(), "ccgraph", tag)
    os.makedirs(d, exist_ok=True)
    return d


def _bucket_path(root: str, pid: int) -> str:
    return os.path.join(root, f"part-{pid:04d}.parquet")


_EDGE_EMPTY = pa.table(
    {
        "part": pa.array([], type=pa.int32()),
        "n": pa.array([], type=pa.int64()),
    }
)


def _write_edge_buckets(pairs: ray.data.Dataset, root: str, parts: int) -> None:
    """(a, b) pairs -> symmetric (src, dst) rows bucketed by
    hash(src) % parts, one sorted parquet file per bucket (deterministic
    name, atomic rename — a retried task overwrites, never duplicates)."""

    def _sym(batch: pa.Table) -> pa.Table:
        if "a" not in batch.schema.names:  # zero-column empty block
            batch = pa.table(
                {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
            )
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pa.table(
            {
                "part": pa.array((src % parts).astype(np.int32)),
                "src": pa.array(src),
                "dst": pa.array(dst),
            }
        )

    def _write(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _EDGE_EMPTY
        pid = int(group["part"][0].as_py())
        src = group["src"].to_numpy(zero_copy_only=False)
        dst = group["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        tbl = pa.table(
            {
                "src": pa.array(src[order], type=pa.int64()),
                "dst": pa.array(dst[order], type=pa.int64()),
            }
        )
        atomic_write_parquet(tbl, _bucket_path(root, pid))
        return pa.table(
            {
                "part": pa.array([pid], type=pa.int32()),
                "n": pa.array([len(tbl)], type=pa.int64()),
            }
        )

    written = (
        pairs.map_batches(_sym, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_write, batch_format="pyarrow")
        .to_arrow_refs()
    )
    # buckets with no edges still need a (empty) file so the kernel's
    # read never depends on which parts appeared in the data
    seen: set[int] = set()
    for ref in written:
        t = ray.get(ref)
        if t.num_columns and "part" in t.schema.names:
            seen.update(t["part"].to_pylist())
    empty = pa.table(
        {"src": pa.array([], type=pa.int64()), "dst": pa.array([], type=pa.int64())}
    )
    for pid in range(parts):
        if pid not in seen:
            atomic_write_parquet(empty, _bucket_path(root, pid))


_LAB_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("node", pa.int64()),
        ("label", pa.int64()),
        ("orig", pa.int8()),  # 1 = the node's own row, 0 = a candidate
    ]
)


def _min_reduce(node: np.ndarray, label: np.ndarray):
    """Per-node min label: (unique_nodes, min_labels) — vectorized."""
    if node.size == 0:
        return node.astype(np.int64), label.astype(np.int64)
    order = np.lexsort((label, node))
    n_s, l_s = node[order], label[order]
    first = np.concatenate([[True], n_s[1:] != n_s[:-1]])
    return n_s[first], l_s[first]


def _make_cc_kernel(root: str, parts: int, propagate_all: bool):
    """One BSP round for one hash partition: min-reduce incoming label
    rows per node, then emit (a) each node's own new row and (b)
    candidates along the partition's stationary edge bucket — for all
    nodes in round 1, only for changed nodes (the frontier) after."""

    def _kernel(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _LAB_SCHEMA.empty_table()
        pid = int(group["part"][0].as_py())
        node = group["node"].to_numpy(zero_copy_only=False)
        label = group["label"].to_numpy(zero_copy_only=False)
        orig = group["orig"].to_numpy(zero_copy_only=False)
        nodes_u, new_lab = _min_reduce(node, label)
        # prior label per node = the orig rows' min (a node has >= 1
        # orig row in its home partition every round)
        pn, pl = _min_reduce(node[orig == 1], label[orig == 1])
        # pn == nodes_u by construction (candidates only target nodes
        # that have orig rows here); align defensively anyway
        pos = np.searchsorted(pn, nodes_u)
        pos = np.minimum(pos, max(pn.size - 1, 0))
        aligned = pn.size > 0 and bool((pn[pos] == nodes_u).all())
        prior = pl[pos] if aligned else new_lab
        changed = new_lab < prior if aligned else np.ones(nodes_u.size, bool)

        frontier = nodes_u if propagate_all else nodes_u[changed]
        flab = new_lab if propagate_all else new_lab[changed]
        out_node = [nodes_u]
        out_lab = [new_lab]
        out_orig = [np.ones(nodes_u.size, np.int8)]
        if frontier.size:
            edges = pq.read_table(_bucket_path(root, pid))
            src = edges["src"].to_numpy(zero_copy_only=False)
            dst = edges["dst"].to_numpy(zero_copy_only=False)
            # edges sorted by src: slice out the frontier's runs
            lo = np.searchsorted(src, frontier, side="left")
            hi = np.searchsorted(src, frontier, side="right")
            cnt = hi - lo
            keep = cnt > 0
            if keep.any():
                lo, cnt, flab2 = lo[keep], cnt[keep], flab[keep]
                idx = np.repeat(lo, cnt) + (
                    np.arange(int(cnt.sum())) - np.repeat(np.cumsum(cnt) - cnt, cnt)
                )
                out_node.append(dst[idx])
                out_lab.append(np.repeat(flab2, cnt))
                out_orig.append(np.zeros(idx.size, np.int8))
        nn = np.concatenate(out_node)
        ll = np.concatenate(out_lab)
        oo = np.concatenate(out_orig)
        return pa.table(
            {
                "part": pa.array((nn % parts).astype(np.int32)),
                "node": pa.array(nn, type=pa.int64()),
                "label": pa.array(ll, type=pa.int64()),
                "orig": pa.array(oo, type=pa.int8()),
            },
            schema=_LAB_SCHEMA,
        )

    return _kernel


def connected_components(
    pairs: ray.data.Dataset, tag: str, parts: int = CC_PARTS
) -> ray.data.Dataset:
    """(a, b) undirected pair Dataset -> (doc_id, cluster_id) with
    cluster_id = min doc_id of the component.  Only nodes appearing in
    >= 1 pair are labeled (singletons are trivially their own cluster
    and never shuffled)."""
    root = _edge_root(tag)
    _write_edge_buckets(pairs, root, parts)

    def _init(batch: pa.Table) -> pa.Table:
        if "a" not in batch.schema.names:  # zero-column empty block
            # (the Ray 2.49 race _sym already guards; same dataset)
            return _LAB_SCHEMA.empty_table()
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.concatenate([a, b])
        return pa.table(
            {
                "part": pa.array((n % parts).astype(np.int32)),
                "node": pa.array(n, type=pa.int64()),
                "label": pa.array(n, type=pa.int64()),
                "orig": pa.array(np.ones(n.size, np.int8)),
            },
            schema=_LAB_SCHEMA,
        )

    lab = pairs.map_batches(_init, batch_format="pyarrow")
    prev_sum: int | None = None
    for it in range(CC_MAX_ITERS):
        kernel = _make_cc_kernel(root, parts, propagate_all=(it == 0))
        lab = (
            lab.groupby("part")
            .map_groups(kernel, batch_format="pyarrow")
            .materialize()
        )
        # monotone invariant: per-node labels only decrease, so the sum
        # over orig rows strictly decreases until the fixed point
        # (vectorized per-batch partial -> one tiny Sum)
        def _lab_sum(batch: pa.Table) -> pa.Table:
            m = batch.filter(pc.equal(batch["orig"], 1))
            s = int(m["label"].to_numpy(zero_copy_only=False).sum()) if len(m) else 0
            return pa.table({"s": pa.array([s], type=pa.int64())})

        agg = lab.map_batches(_lab_sum, batch_format="pyarrow").aggregate(
            Sum("s", alias_name="s")
        )
        cur = int(agg["s"]) if agg and agg.get("s") is not None else 0
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur

    def _final(batch: pa.Table) -> pa.Table:
        m = batch.filter(pc.equal(batch["orig"], 1))
        node = m["node"].to_numpy(zero_copy_only=False)
        label = m["label"].to_numpy(zero_copy_only=False)
        nodes_u, lab_u = _min_reduce(node, label)
        return pa.table(
            {
                "doc_id": pa.array(nodes_u, type=pa.int64()),
                "cluster_id": pa.array(lab_u, type=pa.int64()),
            }
        )

    return lab.map_batches(_final, batch_format="pyarrow")


def q_dup_clusters(sf_dir: str) -> ray.data.Dataset:
    """Connected components over the MinHash-verified near-dup pairs
    (exact word-3-gram Jaccard >= 0.8): (doc_id, cluster_id), with
    cluster_id = the component's minimum doc_id — the canonical
    keep-one-per-cluster assignment."""
    from ciff_ray.extras.dedup import q_dedup_minhash

    pairs = q_dedup_minhash(sf_dir).select_columns(["a", "b"]).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("doc_id", pa.int64()), ("cluster_id", pa.int64())]
            ).empty_table()
        )
    # content-keyed (path + size + mtime), like every other derived
    # store: a path-only tag would let a run over a REGENERATED corpus
    # share and mutate the bucket files a concurrent run still reads
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    tag = hashlib.sha1(
        f"minhash:{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    return connected_components(pairs, tag)


def _with_pairs_cte(pairs_sql: str) -> str:
    """Wrap a pair-producing SQL (columns a, b) in the recursive
    min-label closure; DuckDB evaluates the fixpoint exactly."""
    return f"""WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (SELECT a AS u, b AS v FROM pairs
          UNION ALL SELECT b, a FROM pairs),
nodes AS (SELECT DISTINCT u FROM edges),
walk(u, lbl) AS (
  SELECT u, u FROM nodes
  UNION
  SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.u = e.v
)
SELECT u AS doc_id, MIN(lbl) AS cluster_id FROM walk GROUP BY u"""


def _oracle_sqls() -> dict[str, str]:
    from ciff_ray.extras.dedup import _SQL_JACCARD_PAIRS

    return {"dup_clusters": _with_pairs_cte(_SQL_JACCARD_PAIRS)}


ORACLE_SQLS = _oracle_sqls()

QUERIES = {"dup_clusters": q_dup_clusters}
