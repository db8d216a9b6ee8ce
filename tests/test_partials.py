"""Property tests for the combiner wire format: pack_partial_runs /
unpack_partial_rows round-trip (packed varint d-gap + tf + doclength
streams sliced through Arrow binary offsets)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ciff_ray.build import pack_partial_runs, unpack_partial_rows


@st.composite
def runs(draw):
    n_runs = draw(st.integers(1, 8))
    docs_all, tfs_all, dls_all, counts = [], [], [], []
    for _ in range(n_runs):
        df = draw(st.integers(1, 50))
        gaps = draw(
            st.lists(st.integers(1, 10_000), min_size=df, max_size=df)
        )
        first = draw(st.integers(0, 2**40))
        docs = first + np.cumsum(np.asarray(gaps, dtype=np.int64)) - gaps[0]
        tfs = np.asarray(
            draw(st.lists(st.integers(1, 300), min_size=df, max_size=df)),
            dtype=np.int64,
        )
        dls = np.asarray(
            draw(st.lists(st.integers(0, 5000), min_size=df, max_size=df)),
            dtype=np.int64,
        )
        docs_all.append(docs)
        tfs_all.append(tfs)
        dls_all.append(dls)
        counts.append(df)
    return docs_all, tfs_all, dls_all, np.asarray(counts, dtype=np.int64)


@settings(max_examples=60, deadline=None)
@given(runs())
def test_pack_unpack_roundtrip(data):
    docs_all, tfs_all, dls_all, counts = data
    ends = np.cumsum(counts)
    starts = ends - counts
    docs = np.concatenate(docs_all)
    tfs = np.concatenate(tfs_all)
    dls = np.concatenate(dls_all)
    db, tb, lb = pack_partial_runs(docs, tfs, starts, ends, dls)
    group = pa.table(
        {
            "df": pa.array(counts, type=pa.int64()),
            "doc_bytes": db,
            "tf_bytes": tb,
            "dl_bytes": lb,
        }
    )
    lengths, d2, t2, l2 = unpack_partial_rows(group)
    assert lengths.tolist() == counts.tolist()
    assert d2.tolist() == docs.tolist()
    assert t2.tolist() == tfs.tolist()
    assert l2.tolist() == dls.tolist()


def test_pack_unpack_after_take():
    """Row reordering through Arrow take (what the writer does before
    decode) must still decode each row's payload correctly."""
    rng = np.random.default_rng(3)
    counts = rng.integers(1, 40, size=20).astype(np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    docs = np.sort(rng.choice(10**9, size=int(counts.sum()), replace=False))
    # make each run ascending within itself
    parts = np.split(docs, ends[:-1])
    docs = np.concatenate([np.sort(p) for p in parts])
    tfs = rng.integers(1, 9, size=docs.size).astype(np.int64)
    dls = rng.integers(0, 200, size=docs.size).astype(np.int64)
    db, tb, lb = pack_partial_runs(docs, tfs, starts, ends, dls)
    group = pa.table(
        {
            "df": pa.array(counts, type=pa.int64()),
            "doc_bytes": db,
            "tf_bytes": tb,
            "dl_bytes": lb,
        }
    )
    perm = rng.permutation(len(group))
    shuffled = group.take(pa.array(perm)).combine_chunks()
    lengths, d2, t2, l2 = unpack_partial_rows(shuffled)
    # reassemble expectations row by row
    exp_docs, exp_tfs, exp_dls = [], [], []
    for p in perm:
        exp_docs.extend(docs[starts[p] : ends[p]].tolist())
        exp_tfs.extend(tfs[starts[p] : ends[p]].tolist())
        exp_dls.extend(dls[starts[p] : ends[p]].tolist())
    assert d2.tolist() == exp_docs
    assert t2.tolist() == exp_tfs
    assert l2.tolist() == exp_dls


def test_term_stats_tree_single_shard(ray_session, tmp_path, monkeypatch):
    """_write_term_stats must work at _TERM_STATS_SHARDS == 1: with
    num_returns=1 Ray hands the level-1 1-tuple through a single ref,
    so the level-2 merge receives (Table,) and must unwrap it."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ciff_ray import build
    from ciff_ray.layout import IndexPaths

    paths = IndexPaths(str(tmp_path))
    paths.ensure_dirs()
    os.makedirs(paths.term_stats, exist_ok=True)
    td = pa.table(
        {
            "term": pa.array(["a", "b", "a"]),
            "df": pa.array([2, 1, 3], type=pa.int64()),
            "cf": pa.array([4, 1, 5], type=pa.int64()),
            "max_score": pa.array([1.0, 2.0, 3.0]),
        }
    )
    pq.write_table(td, paths.term_dict_part(0))
    monkeypatch.setattr(build, "_TERM_STATS_SHARDS", 1)
    n_lists = build._write_term_stats(paths)
    assert n_lists == 2  # terms a, b
    got = pq.read_table(paths.term_stats).to_pylist()
    by_term = {r["term"]: r for r in got}
    assert by_term["a"]["df"] == 5 and by_term["a"]["cf"] == 9
    assert by_term["a"]["max_score"] == 3.0
    assert by_term["b"]["df"] == 1


def test_pack_segment_empty_partition(tmp_path):
    """A partition that receives ZERO postings (fully-tombstoned
    compaction, sparse rebuild) must pack to a valid empty segment —
    _slice_encode previously crashed on gaps_full[0] of a size-0
    array."""
    import pyarrow as pa

    from ciff_ray.build import _pack_segment, _slice_encode
    from ciff_ray.layout import IndexPaths

    enc = _slice_encode(
        np.empty(0, np.int64), np.empty(0, np.int64),
        np.empty(0, np.int64), np.empty(0, np.int64),
    )
    assert enc["doc_bytes"] == [] and enc["gap_bounds"].tolist() == [0]

    paths = IndexPaths(str(tmp_path / "idx"))
    import os

    os.makedirs(paths.segments_dir, exist_ok=True)
    os.makedirs(paths.term_dict_dir, exist_ok=True)
    marker = _pack_segment(
        paths, 0,
        pa.array([], type=pa.string()),
        np.empty(0, np.int32),
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64),
        np.empty(0, np.int64), np.empty(0, np.int64),
        avgdl=5.0, k1=0.9, b=0.4, bs=128, fingerprint="t",
    )
    assert marker["n_postings"] == 0 and marker["n_slices"] == 0
