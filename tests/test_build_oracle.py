"""End-to-end build correctness: Ray pipeline vs single-process oracle.

The Ray-built index must reproduce, exactly: the docmap (docids from the
stable (conv_id, turn_idx) sort), every posting list (terms, df, cf,
docIDs, tfs), and the CIFF-Header statistics — the distributed analogue
of the reference's golden toy test (/root/reference/tests/toy.rs)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.layout import IndexPaths
from ciff_ray.oracle import OracleIndex
from ciff_ray.query import LocalScorer
from ciff_ray.synth import generate_transcripts

MICRO_PARAMS = dict(n_convs=20, max_turns=6, seed=7, mean_tokens=12, empty_frac=0.1)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    tbl = generate_transcripts(**MICRO_PARAMS)
    out = str(tmp_path_factory.mktemp("idx"))
    ds = ray.data.from_arrow(tbl).repartition(5)
    manifest = build_index(
        ds, out, BuildParams(num_partitions=7, heavy_df_frac=0.2, num_salts=3,
                             sample_frac=1.0)
    )
    oracle = OracleIndex.build(tbl)
    return tbl, out, manifest, oracle


def test_manifest_stats(built):
    _, _, manifest, oracle = built
    om = oracle.manifest()
    assert manifest.num_docs == om["num_docs"]
    assert manifest.num_postings_lists == om["num_postings_lists"]
    assert manifest.total_terms_in_collection == om["total_terms_in_collection"]
    assert manifest.average_doclength == pytest.approx(om["average_doclength"], abs=0)


def test_docmap_matches_oracle(built):
    _, out, _, oracle = built
    dm = pq.read_table(IndexPaths(out).docmap_dir).sort_by("doc_id")
    assert dm["doc_id"].to_pylist() == list(range(oracle.num_docs))
    assert dm["collection_docid"].to_pylist() == oracle.collection_docids
    assert dm["doclength"].to_pylist() == oracle.doclengths


def test_posting_lists_match_oracle(built):
    _, out, _, oracle = built
    scorer = LocalScorer(out)
    assert scorer.vocabulary() == sorted(oracle.postings.keys())
    for term, plist in oracle.postings.items():
        docs, tfs = scorer.postings(term)
        exp_docs = [d for d, _ in plist]
        exp_tfs = [t for _, t in plist]
        assert docs.tolist() == exp_docs, term
        assert tfs.tolist() == exp_tfs, term
        df, cf, _ = scorer._term_stat(term)
        assert df == len(plist)
        assert cf == sum(exp_tfs)


def test_heavy_terms_salted(built):
    """The Zipf head ('the') must be split into multiple docID-range
    slices, and still decode to the exact global list (tested above)."""
    _, out, manifest, _ = built
    assert "the" in manifest.heavy_terms
    scorer = LocalScorer(out)
    assert len(scorer._slices_for("the")) > 1


def test_input_order_irrelevance(built, tmp_path):
    """Same rows in a different input order -> byte-identical postings
    (docid rule depends only on (conv_id, turn_idx))."""
    tbl, out, _, oracle = built
    perm = np.random.default_rng(99).permutation(len(tbl))
    ds = ray.data.from_arrow(tbl.take(perm)).repartition(3)
    out2 = str(tmp_path / "idx2")
    build_index(ds, out2, BuildParams(num_partitions=4, heavy_df_frac=0.0))
    s1, s2 = LocalScorer(out), LocalScorer(out2)
    for term in oracle.postings:
        d1, t1 = s1.postings(term)
        d2, t2 = s2.postings(term)
        assert d1.tolist() == d2.tolist()
        assert t1.tolist() == t2.tolist()


def test_empty_text_turns_have_zero_doclength(built):
    _, out, _, oracle = built
    assert 0 in oracle.doclengths  # generator guarantees some empty turns


def test_tree_gather_equals_flat(built, tmp_path, monkeypatch):
    """The two-level gather tree (blocks x partitions over threshold)
    must produce an index identical to the flat fan-in."""
    import ciff_ray.build as B

    tbl, _, _, oracle = built
    monkeypatch.setattr(B, "_TREE_FANIN_THRESHOLD", 1)
    monkeypatch.setattr(B, "_TREE_GROUP", 2)
    out = str(tmp_path / "tree_idx")
    build_index(
        ray.data.from_arrow(tbl).repartition(5),
        out,
        BuildParams(num_partitions=7, heavy_df_frac=0.2, num_salts=3,
                    sample_frac=1.0),
    )
    scorer = LocalScorer(out)
    assert scorer.vocabulary() == sorted(oracle.postings.keys())
    for term, exp in oracle.postings.items():
        docs, tfs = scorer.postings(term)
        assert docs.tolist() == [d for d, _ in exp], term
        assert tfs.tolist() == [t for _, t in exp], term


def test_doclength_store_sharding(built, monkeypatch):
    """DoclengthStore with tiny shards gathers identically to the flat
    array and fail-fasts on a corrupted (non-dense) docmap."""
    from ciff_ray.query import DoclengthStore

    tbl, out, manifest, oracle = built
    monkeypatch.setattr(DoclengthStore, "SHARD_BITS", 4)  # 16-doc shards
    store = DoclengthStore(IndexPaths(out).docmap_dir, manifest.num_docs)
    docs = np.arange(manifest.num_docs, dtype=np.int64)
    rng = np.random.default_rng(3)
    rng.shuffle(docs)
    got = store[docs]
    dm = pq.read_table(IndexPaths(out).docmap_dir, columns=["doc_id", "doclength"])
    flat = np.empty(manifest.num_docs, dtype=np.int64)
    flat[dm["doc_id"].to_numpy(zero_copy_only=False)] = dm[
        "doclength"
    ].to_numpy(zero_copy_only=False)
    assert np.array_equal(got, flat[docs])
    # multiple shards were actually materialized lazily
    assert len(store._shards) == -(-manifest.num_docs // 16)
    # wrong manifest count -> fail fast at init (metadata-only check)
    with pytest.raises(ValueError, match="dense"):
        DoclengthStore(IndexPaths(out).docmap_dir, manifest.num_docs + 1)


def test_postings_hash_partials_match_oracle(built):
    """The streamed per-slice content hashes (pipelines._postings_partials)
    must merge to the oracle's exact per-term (df, cf, dh, th) — covers
    salted multi-slice terms and whatever codec each slice chose."""
    import pyarrow as pa

    from ciff_ray.pipelines import _LIST_HASH_MOD, _postings_partials

    tbl, out, manifest, oracle = built
    paths = IndexPaths(out)
    merged: dict[str, list[int]] = {}
    for pid in range(manifest.num_partitions):
        seg = paths.segment(pid)
        import os

        if not os.path.exists(seg):
            continue
        part = _postings_partials(pq.read_table(seg))
        for r in part.to_pylist():
            acc = merged.setdefault(r["term"], [0, 0, 0, 0])
            acc[0] += r["df"]
            acc[1] += r["cf"]
            acc[2] += r["dh"]
            acc[3] += r["th"]
    assert set(merged) == set(oracle.postings)
    M = _LIST_HASH_MOD
    for term, exp in oracle.postings.items():
        df, cf, dh, th = merged[term]
        assert df == len(exp), term
        assert cf == sum(t for _, t in exp), term
        assert dh % M == sum(d * d % M for d, _ in exp) % M, term
        assert th % M == sum(d * t % M for d, t in exp) % M, term


def test_turn_window_kernel():
    """Clamped-prefix-sum window kernel: frame = WINDOW_TURNS preceding
    turns, clamped at each conversation start; unsorted input."""
    import pyarrow as pa

    from ciff_ray.pipelines import WINDOW_TURNS, _window_in_part

    assert WINDOW_TURNS == 3
    group = pa.table(
        {
            "conv": pa.array([1, 0, 0, 0, 0, 0, 1], type=pa.int64()),
            "turn": pa.array([1, 4, 3, 2, 1, 0, 0], type=pa.int64()),
            "doc_id": pa.array([61, 4, 3, 2, 1, 0, 60], type=pa.int64()),
            "ntok": pa.array([4, 7, 3, 2, 1, 5, 10], type=pa.int64()),
        }
    )
    out = {
        r["doc_id"]: r["win_tokens"] for r in _window_in_part(group).to_pylist()
    }
    # conv 0 ntok by turn: [5, 1, 2, 3, 7]
    assert out == {
        0: 0,          # first turn
        1: 5,          # turn 0
        2: 5 + 1,
        3: 5 + 1 + 2,
        4: 1 + 2 + 3,  # frame slides past turn 0
        60: 0,
        61: 10,
    }
    empty = _window_in_part(group.slice(0, 0))
    assert empty.num_rows == 0


def test_jsonl_transcripts_input_matches_parquet_build(ray_session, tmp_path):
    """input_jsonl builds a BIT-identical index to the parquet path
    over the same rows (and fails fast on missing columns)."""
    import json as _json

    import pytest

    from ciff_ray.build import IndexBuilder
    from ciff_ray.query import LocalScorer
    from ciff_ray.synth import generate_transcripts

    t = generate_transcripts(n_convs=25, seed=6)
    psrc = str(tmp_path / "t.parquet")
    pq.write_table(t, psrc)
    jsrc = str(tmp_path / "t.jsonl")
    with open(jsrc, "w") as f:
        for conv, idx, text in zip(
            t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist(),
            t["text"].to_pylist(),
        ):
            f.write(
                _json.dumps(
                    {"conv_id": conv, "turn_idx": idx, "text": text}
                )
                + "\n"
            )
    m1 = (
        IndexBuilder()
        .input_parquet(psrc)
        .output_dir(str(tmp_path / "ip"))
        .partitions(3)
        .convert()
    )
    m2 = (
        IndexBuilder()
        .input_jsonl(jsrc)
        .output_dir(str(tmp_path / "ij"))
        .partitions(3)
        .convert()
    )
    assert m1.num_docs == m2.num_docs
    assert m1.num_postings_lists == m2.num_postings_lists
    assert m1.total_terms_in_collection == m2.total_terms_in_collection
    s1, s2 = LocalScorer(str(tmp_path / "ip")), LocalScorer(str(tmp_path / "ij"))
    for q in ("the people time", "work years"):
        d1, sc1 = s1.topk(q, k=10)
        d2, sc2 = s2.topk(q, k=10)
        assert d1.tolist() == d2.tolist()
        assert sc1.tolist() == sc2.tolist()

    # fail fast on a missing column
    bad = str(tmp_path / "bad.jsonl")
    with open(bad, "w") as f:
        f.write('{"conv_id": "c", "text": "no turn idx"}\n')
    with pytest.raises(Exception, match="turn_idx"):
        (
            IndexBuilder()
            .input_jsonl(bad)
            .output_dir(str(tmp_path / "ib"))
            .partitions(2)
            .convert()
        )


def test_doclength_gather_sorted_and_hull(built, monkeypatch):
    """gather_sorted (the postings-contract fast path) and the bulk
    hull loader must agree with the checked __getitem__ gather for
    sorted spans of every width, including exact shard boundaries."""
    from ciff_ray.query import DoclengthStore

    tbl, out, manifest, oracle = built
    monkeypatch.setattr(DoclengthStore, "SHARD_BITS", 4)
    n = manifest.num_docs
    dm = pq.read_table(IndexPaths(out).docmap_dir, columns=["doc_id", "doclength"])
    flat = np.empty(n, dtype=np.int64)
    flat[dm["doc_id"].to_numpy(zero_copy_only=False)] = dm[
        "doclength"
    ].to_numpy(zero_copy_only=False)

    rng = np.random.default_rng(7)
    cases = [
        np.arange(n, dtype=np.int64),                       # all docs
        np.arange(16, min(32, n), dtype=np.int64),          # one full shard
        np.arange(15, min(33, n), dtype=np.int64),          # straddles edges
        np.sort(rng.choice(n, size=min(50, n), replace=False)),  # sparse wide
        np.array([n - 1], dtype=np.int64),                  # single doc
    ]
    for docs in cases:
        fresh = DoclengthStore(IndexPaths(out).docmap_dir, n)
        got = fresh.gather_sorted(docs)
        assert np.array_equal(got, flat[docs])
        # hull loader engaged for wide gathers builds every shard dense
        got2 = fresh.gather_sorted(docs)  # cached second pass
        assert np.array_equal(got2, flat[docs])
        # checked indexer agrees
        assert np.array_equal(fresh[docs], flat[docs])
