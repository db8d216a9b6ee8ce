"""Distributed PageRank vs a dense numpy power-iteration oracle
recomputed from raw events (graph build included)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _dense_oracle(sf: str, d: float, iters: int):
    ev = pq.read_table(
        f"{sf}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    ts = ev["ts"].to_numpy(zero_copy_only=False).view(np.int64)
    eid = ev["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    uid = ev["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    et = np.array(ev["event_type"].to_pylist(), dtype=object)
    nodes = np.unique(uid)
    idx = {u: i for i, u in enumerate(nodes)}
    n = nodes.size
    W = np.zeros((n, n))
    for t in np.unique(et):
        sel = et == t
        order = np.lexsort((eid[sel], ts[sel]))
        u = uid[sel][order]
        for a, b in zip(u[:-1], u[1:]):
            if a != b:
                W[idx[a], idx[b]] += 1.0
    out = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out == 0].sum()
        base = (1.0 - d) / n + d * dangling / n
        contrib = np.zeros(n)
        src_mask = out > 0
        contrib = (r[src_mask] / out[src_mask]) @ W[src_mask]
        r = base + d * contrib
    return nodes, r


def test_pagerank_matches_dense_oracle(ray_session):
    from ciff_ray.extras.pagerank import PR_D, PR_ITERS, q_pagerank

    got = q_pagerank(SF).to_pandas().sort_values("user_id", ignore_index=True)
    nodes, r = _dense_oracle(SF, PR_D, PR_ITERS)
    assert got["user_id"].tolist() == nodes.tolist()
    np.testing.assert_allclose(
        got["pr_r"].to_numpy(), r, rtol=0, atol=1e-9
    )
    # ranks are a probability distribution
    assert abs(got["pr_r"].sum() - 1.0) < 1e-6
