"""Connected components over near-dup pair graphs (extras.graph)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _uf_oracle(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node -> min node of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_cc(pairs: list[tuple[int, int]], tag: str, parts: int = 8):
    from ciff_ray.extras.graph import connected_components

    ds = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], type=pa.int64()),
                "b": pa.array([p[1] for p in pairs], type=pa.int64()),
            }
        )
    )
    out = connected_components(ds, tag=tag, parts=parts).to_pandas()
    return dict(zip(out["doc_id"], out["cluster_id"]))


def test_cc_chain_needs_many_rounds(ray_session):
    """A 40-hop chain: min-label needs ~diameter BSP rounds, so this
    exercises the iteration + frontier path, not just round 1."""
    chain = [(i * 7 + 3, (i + 1) * 7 + 3) for i in range(40)]
    got = _run_cc(chain, tag="test-chain")
    assert got == _uf_oracle(chain)
    assert set(got.values()) == {3}


def test_cc_mixed_topologies(ray_session):
    """Clique + star + isolated pairs + bridge-merged components."""
    rng = np.random.default_rng(7)
    clique = [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]
    star = [(500, 500 + i) for i in range(1, 9)]
    pairs2 = [(1000 + 2 * i, 1001 + 2 * i) for i in range(10)]
    bridge = [(105, 500)]  # merges clique and star into one component
    pairs = clique + star + pairs2 + bridge
    rng.shuffle(pairs)
    got = _run_cc(pairs, tag="test-mixed")
    exp = _uf_oracle(pairs)
    assert got == exp
    assert got[508] == 100  # star node reaches the clique's min via bridge


def test_cc_duplicate_and_reversed_edges(ray_session):
    pairs = [(2, 9), (9, 2), (2, 9), (9, 40), (40, 2)]
    got = _run_cc(pairs, tag="test-dupes")
    assert got == {2: 2, 9: 2, 40: 2}


def test_dup_clusters_oracle_sf0001(ray_session):
    """End-to-end vs the DuckDB recursive-CTE closure of the exact
    Jaccard pair oracle."""
    import duckdb

    from ciff_ray.extras.graph import ORACLE_SQLS, q_dup_clusters

    sf = "/root/testdata/sf0.001"
    got = (
        q_dup_clusters(sf).to_pandas().sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exp = (
        con.execute(ORACLE_SQLS["dup_clusters"])
        .fetchdf()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got.equals(exp)
    # cluster_id is always a member and the component minimum
    assert (got.groupby("cluster_id")["doc_id"].min().to_numpy()
            == sorted(got["cluster_id"].unique())).all()
