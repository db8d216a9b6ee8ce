"""Index integrity checker: clean index ⇒ 0 findings; seeded
corruptions (segment stats, docmap lengths, bound violations) ⇒ the
matching finding — and ONLY while the corruption is present."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.fsck import check_index
from ciff_ray.synth import generate_transcripts


@pytest.fixture(scope="module")
def clean_index(tmp_path_factory):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=17, mean_tokens=20)
    out = str(tmp_path_factory.mktemp("fsckidx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(3),
        out,
        BuildParams(
            num_partitions=4, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0
        ),
    )
    return out


def _copy(src: str, tmp_path) -> str:
    dst = str(tmp_path / "idx")
    shutil.copytree(src, dst)
    return dst


def test_clean_index_has_no_findings(clean_index):
    t = check_index(clean_index)
    assert t.num_rows == 0, t.to_pylist()


def test_detects_segment_stat_corruption(clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path)
    seg_path = sorted(glob.glob(os.path.join(idx, "segments", "*.parquet")))[0]
    seg = pq.read_table(seg_path)
    cf = seg["cf"].to_pylist()
    cf[0] += 1  # stored cf no longer equals the decoded Σtf
    seg = seg.set_column(
        seg.schema.get_field_index("cf"), "cf", pa.array(cf, type=pa.int64())
    )
    pq.write_table(seg, seg_path)
    checks = {r["check"] for r in check_index(idx).to_pylist()}
    assert "cf_mismatch" in checks
    assert "term_stats_mismatch" in checks  # Σcf no longer matches stats


def test_detects_docmap_corruption(clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path)
    dm_path = sorted(glob.glob(os.path.join(idx, "docmap", "*.parquet")))[0]
    dm = pq.read_table(dm_path)
    dl = dm["doclength"].to_pylist()
    dl[0] += 5  # Σ doclength drifts from the manifest total
    dm = dm.set_column(
        dm.schema.get_field_index("doclength"),
        "doclength",
        pa.array(dl, type=pa.int32()),
    )
    pq.write_table(dm, dm_path)
    checks = {r["check"] for r in check_index(idx).to_pylist()}
    assert "total_terms_mismatch" in checks
    assert "avgdl_mismatch" in checks


def test_detects_invalid_block_bound(clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path)
    seg_path = sorted(glob.glob(os.path.join(idx, "segments", "*.parquet")))[0]
    seg = pq.read_table(seg_path)
    bms = seg["block_max_score"].to_pylist()
    bms[0] = [v / 2.0 for v in bms[0]]  # bound now UNDER the true max
    col = pa.array(bms, type=pa.large_list(pa.float32()))
    seg = seg.set_column(
        seg.schema.get_field_index("block_max_score"), "block_max_score", col
    )
    pq.write_table(seg, seg_path)
    checks = {r["check"] for r in check_index(idx).to_pylist()}
    assert "block_max_bound" in checks


def test_detects_missing_segment(clean_index, tmp_path):
    idx = _copy(clean_index, tmp_path)
    os.remove(sorted(glob.glob(os.path.join(idx, "segments", "*.parquet")))[0])
    checks = {r["check"] for r in check_index(idx).to_pylist()}
    assert "segment_missing" in checks


# -- positional store ---------------------------------------------------------


@pytest.fixture(scope="module")
def pos_pair(tmp_path_factory):
    """Index + positional store over the SAME dense-docid corpus."""
    from ciff_ray.positions import build_positions
    from ciff_ray.synth import transcripts_from_documents

    base = generate_transcripts(n_convs=30, max_turns=6, seed=23, mean_tokens=18)
    texts = base["text"].to_pylist()
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    root = tmp_path_factory.mktemp("posfsck")
    idx = str(root / "idx")
    build_index(
        ray.data.from_arrow(docs_tbl)
        .repartition(3)
        .map_batches(transcripts_from_documents, batch_format="pyarrow"),
        idx,
        BuildParams(num_partitions=3, sample_frac=1.0),
    )
    pos = build_positions(
        ray.data.from_arrow(docs_tbl).repartition(3), str(root / "pos")
    )
    return idx, pos


def test_positions_clean(pos_pair):
    from ciff_ray.fsck import check_positions

    idx, pos = pos_pair
    t = check_positions(pos, index_dir=idx)
    assert t.num_rows == 0, t.to_pylist()


def test_positions_detects_missing_rows(pos_pair, tmp_path):
    import shutil

    from ciff_ray.fsck import check_positions

    idx, pos = pos_pair
    bad = str(tmp_path / "pos")
    shutil.copytree(pos, bad)
    f = sorted(glob.glob(os.path.join(bad, "part=*", "*.parquet")))[0]
    t = pq.read_table(f)
    pq.write_table(t.slice(1), f)  # drop one (term, doc) row
    checks = {r["check"] for r in check_positions(bad, index_dir=idx).to_pylist()}
    assert "positions_index_mismatch" in checks


def test_positions_detects_disorder(pos_pair, tmp_path):
    import shutil

    from ciff_ray.fsck import check_positions

    idx, pos = pos_pair
    bad = str(tmp_path / "pos")
    shutil.copytree(pos, bad)
    for f in sorted(glob.glob(os.path.join(bad, "part=*", "*.parquet"))):
        t = pq.read_table(f)
        rows = t.to_pylist()
        victim = next((r for r in rows if len(r["positions"]) >= 2), None)
        if victim is None:
            continue
        victim["positions"] = victim["positions"][::-1]  # not ascending
        pq.write_table(pa.Table.from_pylist(rows, schema=t.schema), f)
        break
    else:
        pytest.skip("no multi-position row in store")
    checks = {r["check"] for r in check_positions(bad).to_pylist()}
    assert "positions_not_ascending" in checks


# -- pruned-index tau audit ---------------------------------------------------


@pytest.fixture(scope="module")
def pruned_pair(tmp_path_factory, clean_index):
    from ciff_ray.pruned import prune_index

    out = str(tmp_path_factory.mktemp("prfsck") / "pruned")
    prune_index(clean_index, out, lam=3)  # tiny lambda: most terms truncate
    return clean_index, out


def test_pruned_clean(pruned_pair):
    from ciff_ray.fsck import check_pruned

    full, pruned = pruned_pair
    t = check_pruned(pruned, full)
    assert t.num_rows == 0, t.to_pylist()


def test_pruned_detects_understated_tau(pruned_pair, tmp_path):
    from ciff_ray.fsck import check_pruned

    full, pruned = pruned_pair
    bad = str(tmp_path / "pruned")
    shutil.copytree(pruned, bad)
    meta_path = os.path.join(bad, "prune_meta.parquet")
    meta = pq.read_table(meta_path)
    taus = meta["tau"].to_pylist()
    assert taus, "fixture must truncate at least one term"
    taus[0] = taus[0] / 10.0  # understate: certificate would over-certify
    pq.write_table(
        pa.table({"term": meta["term"], "tau": pa.array(taus, type=pa.float64())}),
        meta_path,
    )
    checks = {r["check"] for r in check_pruned(bad, full).to_pylist()}
    assert "tau_bound_violation" in checks


def test_check_index_clean_on_truncated_pruned(pruned_pair):
    """A pruned index keeps the SOURCE's term_stats by design; the
    stats cross-check must not flag the (intentional) deficit — only a
    surplus would be corruption."""
    _, pruned = pruned_pair
    t = check_index(pruned)
    assert t.num_rows == 0, t.to_pylist()


def test_detects_salt_range_overlap(clean_index, tmp_path):
    """Shift a salted slice's first_doc into its predecessor's range:
    the interleave invariant postings() relies on must be flagged."""
    idx = _copy(clean_index, tmp_path)
    for seg_path in sorted(glob.glob(os.path.join(idx, "segments", "*.parquet"))):
        seg = pq.read_table(seg_path)
        salts = seg["salt"].to_pylist()
        victim = next((i for i, s in enumerate(salts) if s > 0), None)
        if victim is None:
            continue
        firsts = seg["first_doc"].to_pylist()
        firsts[victim] = 0  # salt>0 slice now starts at docID 0: overlap
        seg = seg.set_column(
            seg.schema.get_field_index("first_doc"),
            "first_doc",
            pa.array(firsts, type=pa.int64()),
        )
        pq.write_table(seg, seg_path)
        break
    else:
        pytest.skip("no salted slice in fixture")
    checks = {r["check"] for r in check_index(idx).to_pylist()}
    assert "salt_range_overlap" in checks


# -- doc-norms store audit (ciff_ray.tfidf + fsck.check_norms) -------------


@pytest.fixture(scope="module")
def norms_pair(clean_index, tmp_path_factory, ray_session):
    """(index, norms_dir) — norms built over the SAME corpus in docid
    order (generate_transcripts permutes rows; docid = byte-ascending
    (conv_id, turn_idx) rank)."""
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=17, mean_tokens=20)
    conv, turn = tbl["conv_id"].to_pylist(), tbl["turn_idx"].to_pylist()
    order = sorted(range(len(conv)), key=lambda i: (conv[i].encode(), turn[i]))
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(tbl)), type=pa.int64()),
            "text": tbl["text"].take(pa.array(order)).combine_chunks(),
        }
    )
    from ciff_ray.tfidf import build_docnorms

    root = tmp_path_factory.mktemp("norms")
    norms = build_docnorms(
        ray.data.from_arrow(docs).repartition(2), clean_index, str(root / "n")
    )
    return clean_index, norms


def test_norms_clean(norms_pair):
    from ciff_ray.fsck import check_norms

    idx, norms = norms_pair
    t = check_norms(norms, idx)
    assert t.num_rows == 0, t.to_pylist()


def _copy_norms(norms: str, tmp_path) -> str:
    dst = str(tmp_path / "norms")
    shutil.copytree(norms, dst)
    return dst


def test_norms_detects_value_corruption(norms_pair, tmp_path):
    from ciff_ray.fsck import check_norms

    idx, norms = norms_pair
    bad = _copy_norms(norms, tmp_path)
    f = sorted(glob.glob(os.path.join(bad, "*.parquet")))[0]
    t = pq.read_table(f)
    vals = t["norm"].to_pylist()
    vals[0] += 0.5  # silently wrong norm: density intact, energy broken
    t = t.set_column(
        t.schema.get_field_index("norm"), "norm",
        pa.array(vals, type=pa.float64()),
    )
    pq.write_table(t, f)
    checks = {r["check"] for r in check_norms(bad, idx).to_pylist()}
    assert checks == {"norms_energy_mismatch"}


def test_norms_detects_missing_rows(norms_pair, tmp_path):
    from ciff_ray.fsck import check_norms

    idx, norms = norms_pair
    bad = _copy_norms(norms, tmp_path)
    f = sorted(glob.glob(os.path.join(bad, "*.parquet")))[0]
    t = pq.read_table(f)
    pq.write_table(t.slice(1), f)  # drop one doc
    checks = {r["check"] for r in check_norms(bad, idx).to_pylist()}
    assert "norms_row_count" in checks
    assert "norms_docid_moments" in checks


def test_norms_detects_negative_value(norms_pair, tmp_path):
    from ciff_ray.fsck import check_norms

    idx, norms = norms_pair
    bad = _copy_norms(norms, tmp_path)
    f = sorted(glob.glob(os.path.join(bad, "*.parquet")))[0]
    t = pq.read_table(f)
    vals = t["norm"].to_pylist()
    vals[0] = -vals[0] if vals[0] else -1.0
    t = t.set_column(
        t.schema.get_field_index("norm"), "norm",
        pa.array(vals, type=pa.float64()),
    )
    pq.write_table(t, f)
    checks = {r["check"] for r in check_norms(bad, idx).to_pylist()}
    assert "norms_value_domain" in checks
