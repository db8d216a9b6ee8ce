"""DocID reordering: serving parity (bit-identical ranking in the
original id space), mapping-store integrity, and the compression
observation."""

from __future__ import annotations

import os

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


def test_permutation_build_no_driver_n_array(ray_session, tmp_path):
    """Round-4 verdict item 1's done-criterion: nothing O(num_docs)
    crosses the driver during the permutation build — only one int per
    sorted block (the _DIAG audit, sketch.py's device)."""
    import ray.data

    from ciff_ray import reorder
    from ciff_ray.reorder import write_permutation_stores

    docs = ray.data.read_parquet(
        SF + "/documents.parquet", columns=["doc_id", "text"]
    )
    n = write_permutation_stores(
        docs, str(tmp_path / "map"), str(tmp_path / "inv")
    )
    d = reorder._DIAG
    assert d["num_docs"] == n
    # driver touched one row-count per block, not one per doc
    assert d["driver_rows"] < n
    assert d["driver_rows"] <= 64
    assert d["max_block_rows"] < n


def test_bp_order_permutation_and_parity(ray_session):
    """BP ordering: valid permutation, same postings multiset, and
    serving in the original id space stays bit-identical."""
    import numpy as np
    import pandas as pd

    from ciff_ray.layout import IndexPaths, Manifest
    from ciff_ray.pipelines import q_bm25_topk
    from ciff_ray.reorder import (
        OldIdStore,
        ensure_reordered,
        q_bm25_topk_reordered,
    )
    from ciff_ray.report import index_report
    from ciff_ray.pipelines import ensure_index

    idx, mapping = ensure_reordered(SF, order="bp")
    n = Manifest.read(IndexPaths(idx).manifest).num_docs
    old = OldIdStore(mapping, n).gather_sorted(np.arange(n, dtype=np.int64))
    assert np.array_equal(np.sort(old), np.arange(n))
    a = index_report(ensure_index(SF))
    b = index_report(idx)
    assert a["postings"] == b["postings"]
    assert b["doc_bytes"] <= a["doc_bytes"]  # BP must not inflate

    key = ["query_id", "rank", "doc_id"]
    got = (
        pd.concat(
            t.to_pandas()
            for t in q_bm25_topk_reordered(SF, order="bp").iter_batches(
                batch_format="pyarrow"
            )
        )[key]
        .astype("int64")
        .sort_values(key)
        .reset_index(drop=True)
    )
    want = (
        pd.concat(
            t.to_pandas()
            for t in q_bm25_topk(SF).iter_batches(batch_format="pyarrow")
        )[key]
        .astype("int64")
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(got) > 0 and got.equals(want)


def test_bp_local_bisection_reduces_loggap_cost(ray_session):
    """_local_bp on a planted two-cluster bucket must separate the
    clusters (the paper's objective: co-occurring docs adjacent)."""
    import numpy as np
    import pyarrow as pa

    from ciff_ray.bporder import _local_bp

    rng = np.random.default_rng(7)
    n = 120
    # two vocab-disjoint clusters, interleaved doc ids
    terms = []
    for i in range(n):
        base = 0 if i % 2 == 0 else 1000
        terms.append((base + rng.choice(40, size=8, replace=False)).tolist())
    g = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "bucket": pa.array(np.zeros(n, dtype=np.int64)),
            "terms": pa.array(terms, type=pa.large_list(pa.int64())),
        }
    )
    out = _local_bp(g)
    pos = np.array(out["pos"].to_pylist())
    doc = np.array(out["doc_id"].to_pylist())
    order = np.empty(n, dtype=np.int64)
    order[pos] = doc
    # cluster labels along the BP order: the two halves must be pure
    labels = (order % 2)[: n // 2]
    purity = max(labels.mean(), 1 - labels.mean())
    assert purity >= 0.95


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


def test_mapping_pair_roundtrip_audit(reordered, tmp_path):
    """check_mapping_pair: clean on a real pair; a SWAP of two new_ids
    in the inverse store keeps both stores valid permutations (moments
    can't see it) but breaks new->old->new — only the sampled
    round-trip catches it."""
    import glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ciff_ray.fsck import check_mapping_pair
    from ciff_ray.layout import IndexPaths, Manifest

    idx, mapping = reordered
    inv = mapping + "-inv"
    n = Manifest.read(IndexPaths(idx).manifest).num_docs
    assert check_mapping_pair(mapping, inv, n).num_rows == 0

    bad = str(tmp_path / "inv")
    shutil.copytree(inv, bad)
    f = sorted(glob.glob(os.path.join(bad, "*.parquet")))[0]
    t = pq.read_table(f)
    vals = t["new_id"].to_pylist()
    assert len(vals) >= 2
    vals[0], vals[1] = vals[1], vals[0]  # still a permutation
    pq.write_table(
        t.set_column(
            t.schema.get_field_index("new_id"),
            "new_id",
            pa.array(vals, type=pa.int64()),
        ),
        f,
    )
    checks = {r["check"] for r in check_mapping_pair(mapping, bad, n, sample=n).to_pylist()}
    assert checks == {"mapping_roundtrip"}


def test_bp_oversized_bucket_is_salted(ray_session):
    """SimHash collisions (identical/near-identical docs) must not pile
    one map_groups task above cap: bp_keys salts oversized prefix
    buckets into ~cap-sized sub-buckets while emitting every doc
    exactly once (round-5 review finding)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ciff_ray.bporder import bp_keys

    n, cap = 240, 32
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            # identical text -> identical simhash -> ONE prefix bucket
            "text": pa.array(["the same template text here"] * n),
        }
    )
    keys = pa.concat_tables(
        list(
            bp_keys(
                ray.data.from_arrow(docs).repartition(4), cap=cap
            ).iter_batches(batch_format="pyarrow")
        )
    )
    assert keys.num_rows == n
    assert sorted(keys["doc_id"].to_pylist()) == list(range(n))
    counts: dict[int, int] = {}
    for b in keys["bucket"].to_pylist():
        counts[b] = counts.get(b, 0) + 1
    assert len(counts) >= n // cap  # actually split
    # hash imbalance allowed, but no sub-bucket may approach the
    # un-split size
    assert max(counts.values()) <= 2 * cap


def test_bp_wins_big_on_template_clustered_corpus(ray_session, tmp_path):
    """The op's raison d'être (Dhulipala et al. report 2-3x d-gap wins
    on real clustered text): on a template-clustered corpus whose
    ORIGINAL order interleaves templates round-robin, BP must shrink
    the doc-gap payload by at least 2x, beat the SimHash order, and
    keep the postings multiset identical.  (Measured here: base ->
    0.379x under SimHash, 0.263x under BP.)"""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from ciff_ray.build import BuildParams, build_index
    from ciff_ray.reorder import build_reordered
    from ciff_ray.report import index_report
    from ciff_ray.synth import transcripts_from_documents

    rng = np.random.default_rng(5)
    n_docs, n_templates, vocab = 3000, 40, 5000
    words = np.array([f"w{i}" for i in range(vocab)])
    templates = [
        rng.choice(words, size=60, replace=False) for _ in range(n_templates)
    ]
    texts = []
    for i in range(n_docs):
        t = templates[i % n_templates].copy()
        t[rng.integers(0, 60, size=3)] = rng.choice(words, size=3)
        texts.append(" ".join(t))
    root = str(tmp_path)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    pq.write_table(docs, f"{root}/documents.parquet")

    base_idx = f"{root}/base"
    build_index(
        ray.data.from_arrow(transcripts_from_documents(docs)).repartition(4),
        base_idx,
        BuildParams(num_partitions=8, sample_frac=1.0),
    )
    sh_idx, _ = build_reordered(root, f"{root}/sh", f"{root}/shmap", "simhash")
    bp_idx, _ = build_reordered(root, f"{root}/bp", f"{root}/bpmap", "bp")
    b, s, p = (index_report(x) for x in (base_idx, sh_idx, bp_idx))
    assert b["postings"] == s["postings"] == p["postings"]
    assert p["doc_bytes"] <= 0.5 * b["doc_bytes"]  # >= 2x win
    assert p["doc_bytes"] < s["doc_bytes"]  # BP beats the heuristic
