"""Positional store: extraction kernel + index-only phrase semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ciff_ray.positions import (
    PositionStore,
    _position_partials,
    build_positions,
)


def test_position_partials_kernel():
    batch = pa.table(
        {
            "doc_id": pa.array([7, 9], type=pa.int64()),
            "text": pa.array(
                ["The cat, the hat!", "  hat hat  "], type=pa.string()
            ),
        }
    )
    out = _position_partials(batch)
    rows = {
        (r["term"], r["doc_id"]): r["positions"] for r in out.to_pylist()
    }
    # doc 7 filtered tokens: the(0) cat(1) the(2) hat(3)
    assert rows[("the", 7)] == [0, 2]
    assert rows[("cat", 7)] == [1]
    assert rows[("hat", 7)] == [3]
    # doc 9: leading/trailing separators drop as empty tokens
    assert rows[("hat", 9)] == [0, 1]
    # partition ids in range and stable
    parts = out["part"].to_pylist()
    assert all(0 <= p < 32 for p in parts)


def test_phrase_docs_adjacency(ray_session, tmp_path):
    texts = [
        "the cat sat",          # 0: "the cat" matches
        "the, cat",             # 1: separator run still adjacent
        "the big cat",          # 2: NOT adjacent
        "cat the",              # 3: wrong order
        "the the the",          # 4: overlapping duplicate phrase
        "xthe cat",             # 5: token boundary respected
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    root = str(tmp_path / "pos")
    build_positions(ray.data.from_arrow(docs).repartition(2), root)
    store = PositionStore(root)
    cand = np.arange(len(texts), dtype=np.int64)
    assert store.phrase_docs(["the", "cat"], cand).tolist() == [0, 1]
    assert store.phrase_docs(["the", "the"], cand).tolist() == [4]
    assert store.phrase_docs(["the", "the", "the"], cand).tolist() == [4]
    assert store.phrase_docs(["cat", "sat"], cand).tolist() == [0]
    assert store.phrase_docs(["sat", "cat"], cand).tolist() == []
    # candidate mask is honored (doc 1 excluded)
    assert store.phrase_docs(
        ["the", "cat"], np.array([0, 2, 5], dtype=np.int64)
    ).tolist() == [0]


def test_positional_matches_regex_e2e(ray_session):
    """Index-only phrase match == the text-regex path on real data."""
    from ciff_ray.pipelines import q_phrase_match
    from ciff_ray.positions import q_phrase_match_positional

    sf = "/root/testdata/sf0.001"
    a = (
        q_phrase_match_positional(sf)
        .to_pandas()
        .sort_values(["query_id", "doc_id"], ignore_index=True)
    )
    b = (
        q_phrase_match(sf)
        .to_pandas()
        .sort_values(["query_id", "doc_id"], ignore_index=True)
    )
    assert a.equals(b)
