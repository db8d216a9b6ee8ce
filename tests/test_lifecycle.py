"""Deletes + compaction: tombstoned docs vanish from every scoring
mode while surviving docs keep their index-time scores; compaction
rewrites to an index that scores bit-identically to a from-scratch
build over the surviving corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.layout import IndexPaths, Manifest
from ciff_ray.lifecycle import compact_index, delete_docs
from ciff_ray.query import LocalScorer, QueryEngine

QUERIES = ["the", "time people", "state good very make", "year", "go go go came"]
PARAMS = dict(num_partitions=4, heavy_df_frac=0.05, num_salts=3, sample_frac=1.0)


@pytest.fixture(scope="module")
def corpus():
    from ciff_ray.synth import generate_transcripts

    return generate_transcripts(n_convs=80, max_turns=6, seed=57, mean_tokens=28)


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session, corpus):
    out = str(tmp_path_factory.mktemp("life") / "idx")
    build_index(ray.data.from_arrow(corpus).repartition(3), out, BuildParams(**PARAMS))
    return out


def test_deleted_docs_vanish_scores_unchanged(built):
    before = LocalScorer(built)
    n = before.N
    dead = np.arange(3, n, 17, dtype=np.int64)  # scattered deletes
    total = delete_docs(built, dead)
    assert total == dead.size
    after = LocalScorer(built)  # fresh scorer sees the tombstones
    for q in QUERIES:
        d0, s0 = before.score_all(q)
        d1, s1 = after.score_all(q)
        assert not np.isin(d1, dead).any(), q
        keep = ~np.isin(d0, dead)
        assert d1.tolist() == d0[keep].tolist(), q
        assert s1.tolist() == s0[keep].tolist(), q  # stats frozen until compaction


def test_modes_agree_under_tombstones(built):
    eng = QueryEngine(built)
    for q in QUERIES:
        d1, s1 = eng.topk(q, k=10, mode="exact")
        d2, s2 = eng.topk(q, k=10, mode="maxscore")
        d3, s3 = eng.topk(q, k=10, mode="bmw")
        assert d1.tolist() == d2.tolist() == d3.tolist(), q
        assert s1.tolist() == s2.tolist() == s3.tolist(), q


def test_delete_is_cumulative_and_validated(built):
    n1 = delete_docs(built, [3])  # already dead: no growth
    n2 = delete_docs(built, [4])  # new
    assert n2 == n1 + 1
    with pytest.raises(ValueError, match="out of range"):
        delete_docs(built, [10**9])


def test_compact_bit_identical_to_rebuild(tmp_path_factory, ray_session, corpus):
    """Delete whole conversations (keeps turn_idx dense for the
    rebuild), compact, compare: dense removal preserves byte-order
    ranks, so compacted docIDs == rebuild docIDs and scores must be
    bit-identical."""
    base = tmp_path_factory.mktemp("compact")
    idx = str(base / "idx")
    build_index(ray.data.from_arrow(corpus).repartition(3), idx, BuildParams(**PARAMS))

    convs = sorted(set(corpus["conv_id"].to_pylist()))
    dead_convs = set(convs[::5])
    # docids are byte-sorted conv rank + turn offset; recover them from
    # the docmap (collection_docid "conv#turn")
    import pyarrow.parquet as pq

    dm = pq.read_table(IndexPaths(idx).docmap_dir)
    cd = dm["collection_docid"].to_pylist()
    ids = dm["doc_id"].to_numpy(zero_copy_only=False)
    dead = np.sort(
        np.array(
            [i for i, c in zip(ids, cd) if c.rsplit("/", 1)[0] in dead_convs],
            dtype=np.int64,
        )
    )
    assert dead.size > 0
    delete_docs(idx, dead)
    compacted = str(base / "compacted")
    m_c = compact_index(idx, compacted)

    survivors = corpus.filter(
        pc.invert(
            pc.is_in(
                corpus["conv_id"],
                value_set=pa.array(sorted(dead_convs)),
            )
        )
    )
    rebuilt = str(base / "rebuilt")
    build_index(
        ray.data.from_arrow(survivors).repartition(3), rebuilt, BuildParams(**PARAMS)
    )
    m_r = Manifest.read(IndexPaths(rebuilt).manifest)
    assert m_c.num_docs == m_r.num_docs
    assert m_c.total_terms_in_collection == m_r.total_terms_in_collection
    assert m_c.average_doclength == m_r.average_doclength
    assert m_c.num_postings_lists == m_r.num_postings_lists

    sc, sr = LocalScorer(compacted), LocalScorer(rebuilt)
    for q in QUERIES:
        dc, vc = sc.score_all(q)
        dr, vr = sr.score_all(q)
        assert dc.tolist() == dr.tolist(), q
        assert vc.tolist() == vr.tolist(), q  # bit-identical f64
    # pruned modes exact on the compacted index
    eng = QueryEngine(compacted)
    for q in QUERIES:
        d1, s1 = eng.topk(q, k=10, mode="exact")
        d3, s3 = eng.topk(q, k=10, mode="bmw")
        assert d1.tolist() == d3.tolist() and s1.tolist() == s3.tolist(), q


def test_compact_scattered_postings_parity(tmp_path_factory, ray_session, corpus):
    """Scattered single-turn deletes: compacted postings == brute
    filter+remap of the original postings, for a vocab sample."""
    base = tmp_path_factory.mktemp("compact2")
    idx = str(base / "idx")
    build_index(ray.data.from_arrow(corpus).repartition(3), idx, BuildParams(**PARAMS))
    src = LocalScorer(idx)
    n = src.N
    dead = np.unique(np.arange(1, n, 7, dtype=np.int64))
    delete_docs(idx, dead)
    compacted = str(base / "cidx")
    m = compact_index(idx, compacted)
    assert m.num_docs == n - dead.size
    out = LocalScorer(compacted)
    heavy = sorted(Manifest.read(IndexPaths(idx).manifest).heavy_terms)
    for term in dict.fromkeys((heavy[:3] or []) + ["time", "year", "people"]):
        d0, t0 = src._plist_cache.get(term) or src.postings(term)
        # src scorer predates the tombstones, so filter manually
        keep = ~np.isin(d0, dead)
        exp_docs = d0[keep] - np.searchsorted(dead, d0[keep])
        gd, gt = out.postings(term)
        assert np.array_equal(gd, exp_docs), term
        assert np.array_equal(gt, t0[keep]), term
    # resume: second compaction run skips all partitions
    from ciff_ray.layout import read_lineage

    before = len(read_lineage(IndexPaths(compacted).lineage))
    compact_index(idx, compacted)
    rows = read_lineage(IndexPaths(compacted).lineage)[before:]
    assert rows and all(r["status"] == "skipped" for r in rows)


def test_compact_defragments_merged_slices(tmp_path, ray_session, corpus):
    """Zero-delete compaction of a 3-way merged index coalesces the
    per-root slice fragmentation: every NON-HEAVY term collapses to one
    slice; heavy (salted) terms keep their cross-partition shards; all
    postings and scores are unchanged."""
    import collections
    import os

    import pyarrow.parquet as pq2

    from ciff_ray.merge import merge_indexes

    convs = sorted(set(corpus["conv_id"].to_pylist()))
    roots = []
    for i, grp in enumerate([convs[:30], convs[30:55], convs[55:]]):
        part = corpus.filter(pc.is_in(corpus["conv_id"], value_set=pa.array(grp)))
        out = str(tmp_path / f"r{i}")
        build_index(ray.data.from_arrow(part), out, BuildParams(**PARAMS))
        roots.append(out)
    merged = str(tmp_path / "merged")
    merge_indexes(roots, merged)
    compacted = str(tmp_path / "cidx")
    compact_index(merged, compacted)  # no tombstones: pure defrag

    def slices_per_term(d):
        c = collections.Counter()
        for f in sorted(os.listdir(IndexPaths(d).term_dict_dir)):
            if f.endswith(".parquet"):
                t = pq2.read_table(os.path.join(IndexPaths(d).term_dict_dir, f))
                for term in t["term"].to_pylist():
                    c[term] += 1
        return c

    heavy = set(Manifest.read(IndexPaths(merged).manifest).heavy_terms or {})
    frag = slices_per_term(merged)
    defrag = slices_per_term(compacted)
    nonheavy_frag = {t: n for t, n in frag.items() if t not in heavy}
    assert max(nonheavy_frag.values()) >= 3  # the merge really fragmented
    for t, n in defrag.items():
        if t not in heavy:
            assert n == 1, t  # ...and compaction coalesced every one
    # every scoring mode still agrees, and postings survive verbatim
    s_m, s_c = LocalScorer(merged), LocalScorer(compacted)
    sample = list(heavy)[:3] + ["time", "year", "people"]
    for term in dict.fromkeys(sample):
        dm, tm = s_m.postings(term)
        dc, tc = s_c.postings(term)
        assert np.array_equal(dm, dc) and np.array_equal(tm, tc), term
    eng = QueryEngine(compacted)
    for q in QUERIES:
        d1, s1 = eng.topk(q, k=10, mode="exact")
        d3, s3 = eng.topk(q, k=10, mode="bmw")
        assert d1.tolist() == d3.tolist() and s1.tolist() == s3.tolist(), q
