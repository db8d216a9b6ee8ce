"""Positional-store lifecycle parity with the frequency index:

* merge_positions(_for) must equal a from-scratch positional build
  over the merged corpus in the merged index's docID space;
* compact_positions must equal a from-scratch build over the
  surviving docs with the compacted index's dense remap;
* deletes need NO store transform (candidates come from the index,
  which filters tombstones) — asserted via phrase parity under
  tombstones.

fsck.check_positions(store, index) is the cross-audit after each op.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.fsck import check_positions
from ciff_ray.lifecycle import compact_index, delete_docs
from ciff_ray.merge import merge_indexes
from ciff_ray.positions import (
    PositionStore,
    build_positions,
    compact_positions,
    merge_positions_for,
)
from ciff_ray.synth import generate_transcripts

PARAMS = dict(num_partitions=4, heavy_df_frac=0.05, num_salts=3, sample_frac=1.0)


def _docid_space(table: pa.Table) -> pa.Table:
    """(doc_id, text) in the INDEX docID space: dense rank of the
    byte-ascending (conv_id, turn_idx) sort (ciff_ray.docids rule)."""
    order = pc.sort_indices(
        table,
        sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")],
    )
    sorted_tbl = table.take(order)
    return pa.table(
        {
            "doc_id": pa.array(
                np.arange(table.num_rows, dtype=np.int64), type=pa.int64()
            ),
            "text": sorted_tbl["text"],
        }
    )


def _canon(pos_root: str) -> list[tuple]:
    """Canonical (part, term, doc_id, positions) rows of a store."""
    t = (
        ray.data.read_parquet(pos_root, file_extensions=["parquet"])
        .to_pandas()
    )
    rows = [
        (int(p), term, int(d), tuple(np.asarray(pos)))
        for p, term, d, pos in zip(
            t["part"], t["term"], t["doc_id"], t["positions"]
        )
    ]
    rows.sort()
    return rows


@pytest.fixture(scope="module")
def roots(tmp_path_factory, ray_session):
    base = tmp_path_factory.mktemp("poslife")
    corpora = {
        "a": generate_transcripts(n_convs=40, max_turns=5, seed=57, mean_tokens=24),
        "b": generate_transcripts(n_convs=30, max_turns=5, seed=91, mean_tokens=24),
    }
    out = {"base": base}
    for name, tbl in corpora.items():
        idx = str(base / f"idx_{name}")
        build_index(
            ray.data.from_arrow(tbl).repartition(2), idx, BuildParams(**PARAMS)
        )
        docs = _docid_space(tbl)
        pos = str(base / f"pos_{name}")
        build_positions(ray.data.from_arrow(docs).repartition(2), pos)
        out[name] = {"corpus": tbl, "docs": docs, "idx": idx, "pos": pos}
    return out


def test_store_index_alignment(roots):
    """Sanity: the _docid_space rule above IS the index's docID
    assignment — the signed per-term df/cf cross-check passes."""
    for name in ("a", "b"):
        t = check_positions(roots[name]["pos"], index_dir=roots[name]["idx"])
        assert t.num_rows == 0, t.to_pylist()


def test_merge_positions_matches_scratch(roots):
    base = roots["base"]
    idx_m = str(base / "idx_merged")
    pos_m = str(base / "pos_merged")
    merge_indexes([roots["a"]["idx"], roots["b"]["idx"]], idx_m)
    merge_positions_for(
        [roots["a"]["idx"], roots["b"]["idx"]],
        [roots["a"]["pos"], roots["b"]["pos"]],
        pos_m,
    )
    # scratch truth: positions over the concatenated corpus in the
    # merged docID space (root A ids, then root B ids + num_docs(A))
    n_a = roots["a"]["docs"].num_rows
    docs_b = roots["b"]["docs"]
    shifted_b = pa.table(
        {
            "doc_id": pc.add(docs_b["doc_id"], pa.scalar(n_a, type=pa.int64())),
            "text": docs_b["text"],
        }
    )
    scratch = str(base / "pos_scratch_merged")
    build_positions(
        ray.data.from_arrow(
            pa.concat_tables([roots["a"]["docs"], shifted_b])
        ).repartition(3),
        scratch,
    )
    assert _canon(pos_m) == _canon(scratch)
    t = check_positions(pos_m, index_dir=idx_m)
    assert t.num_rows == 0, t.to_pylist()
    # idempotent re-entry: published store short-circuits
    assert (
        merge_positions_for(
            [roots["a"]["idx"], roots["b"]["idx"]],
            [roots["a"]["pos"], roots["b"]["pos"]],
            pos_m,
        )
        == pos_m
    )


def test_delete_then_compact_positions(roots):
    base = roots["base"]
    # work on a copy of index A so the module fixture stays pristine
    import shutil

    idx = str(base / "idx_del")
    shutil.copytree(roots["a"]["idx"], idx)
    n = roots["a"]["docs"].num_rows
    dead = np.arange(2, n, 13, dtype=np.int64)
    delete_docs(idx, dead)

    # deletes need no store transform: phrase candidates come from the
    # index, which filters tombstones — prove it on a frequent bigram
    store = PositionStore(roots["a"]["pos"])
    live = np.setdiff1d(np.arange(n, dtype=np.int64), dead)
    hits = store.phrase_docs(["the", "the"], live)
    assert not np.isin(hits, dead).any()

    idx_c = str(base / "idx_compacted")
    pos_c = str(base / "pos_compacted")
    compact_index(idx, idx_c)
    compact_positions(roots["a"]["pos"], idx, pos_c)

    # scratch truth: surviving docs, densely remapped ids
    docs = roots["a"]["docs"]
    ids = docs["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = ~np.isin(ids, dead)
    remapped = ids[keep] - np.searchsorted(dead, ids[keep])
    scratch = str(base / "pos_scratch_compacted")
    build_positions(
        ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(remapped, type=pa.int64()),
                    "text": docs["text"].combine_chunks().take(
                        pa.array(np.flatnonzero(keep))
                    ),
                }
            )
        ).repartition(2),
        scratch,
    )
    assert _canon(pos_c) == _canon(scratch)
    t = check_positions(pos_c, index_dir=idx_c)
    assert t.num_rows == 0, t.to_pylist()


def test_phrase_match_merged_e2e(ray_session):
    """Driver entry: phrase retrieval through merged index + merged
    positional store equals the monolithic text-regex phrase path."""
    from ciff_ray.pipelines import q_phrase_match
    from ciff_ray.positions import q_phrase_match_merged

    sf = "/root/testdata/sf0.001"
    a = (
        q_phrase_match_merged(sf)
        .to_pandas()
        .sort_values(["query_id", "doc_id"], ignore_index=True)
    )
    b = (
        q_phrase_match(sf)
        .to_pandas()
        .sort_values(["query_id", "doc_id"], ignore_index=True)
    )
    assert a.equals(b)


def test_merge_positions_arg_validation(roots, tmp_path):
    from ciff_ray.positions import merge_positions

    with pytest.raises(ValueError):
        merge_positions([roots["a"]["pos"]], [0], str(tmp_path / "x"))
    with pytest.raises(ValueError):
        merge_positions(
            [roots["a"]["pos"], roots["b"]["pos"]], [0], str(tmp_path / "y")
        )
    with pytest.raises(FileNotFoundError):
        merge_positions(
            [roots["a"]["pos"], str(tmp_path / "nope")],
            [0, 10],
            str(tmp_path / "z"),
        )
