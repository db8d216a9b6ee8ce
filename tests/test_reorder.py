"""DocID reordering: serving parity (bit-identical ranking in the
original id space), mapping-store integrity, and the compression
observation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reordered(ray_session):
    from ciff_ray.reorder import ensure_reordered

    return ensure_reordered(SF)


def test_reordered_topk_identical_to_monolithic(reordered):
    from ciff_ray.pipelines import q_bm25_topk
    from ciff_ray.reorder import q_bm25_topk_reordered

    key = ["query_id", "rank", "doc_id"]
    a = (
        pd.concat(
            b.to_pandas()
            for b in q_bm25_topk_reordered(SF).iter_batches(
                batch_format="pyarrow"
            )
        )[key]
        .astype("int64")
        .sort_values(key)
        .reset_index(drop=True)
    )
    b = (
        pd.concat(
            x.to_pandas()
            for x in q_bm25_topk(SF).iter_batches(batch_format="pyarrow")
        )[key]
        .astype("int64")
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(a) > 0
    assert a.equals(b)


def test_mapping_store_is_a_permutation(reordered):
    from ciff_ray.layout import IndexPaths, Manifest
    from ciff_ray.reorder import OldIdStore

    idx, mapping = reordered
    n = Manifest.read(IndexPaths(idx).manifest).num_docs
    store = OldIdStore(mapping, n)
    old = store.gather_sorted(np.arange(n, dtype=np.int64))
    assert np.array_equal(np.sort(old), np.arange(n))


def test_reorder_preserves_postings_and_shrinks_gaps(reordered):
    """Same posting multiset; signature order must not INFLATE the
    d-gap payload (on template-clustered corpora it shrinks it — the
    op's purpose; on this random synthetic text the win is small, so
    only non-inflation + equality of content is asserted)."""
    from ciff_ray.pipelines import ensure_index
    from ciff_ray.report import index_report

    idx, _ = reordered
    a = index_report(ensure_index(SF))
    b = index_report(idx)
    assert a["postings"] == b["postings"]
    assert b["doc_bytes"] <= a["doc_bytes"] * 1.02


def test_mapping_fsck_clean_and_detects_corruption(reordered, tmp_path):
    import glob
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ciff_ray.fsck import check_mapping
    from ciff_ray.layout import IndexPaths, Manifest

    idx, mapping = reordered
    n = Manifest.read(IndexPaths(idx).manifest).num_docs
    assert check_mapping(mapping, n).num_rows == 0
    # corrupt: duplicate one old_id (no longer a permutation; count and
    # min/max stay right, Σ/Σ² catch it)
    bad = str(tmp_path / "map")
    shutil.copytree(mapping, bad)
    f = sorted(glob.glob(os.path.join(bad, "*.parquet")))[0]
    t = pq.read_table(f)
    vals = t["old_id"].to_pylist()
    # replace one mid-range value with another existing one
    mid = sorted(vals)[len(vals) // 2]
    other = sorted(vals)[len(vals) // 3]
    vals[vals.index(mid)] = other
    t = t.set_column(
        t.schema.get_field_index("old_id"), "old_id",
        pa.array(vals, type=pa.int64()),
    )
    pq.write_table(t, f)
    checks = {r["check"] for r in check_mapping(bad, n).to_pylist()}
    assert "mapping_old_id_moments" in checks
