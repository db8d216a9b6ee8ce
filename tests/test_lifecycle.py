"""Deletes + compaction: tombstoned docs vanish from every scoring
mode while surviving docs keep their index-time scores; compaction
rewrites to an index that scores bit-identically to a from-scratch
build over the surviving corpus."""

from __future__ import annotations

import os

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


# ---------------------------------------------------------------------------
# versioned catalog (publish / pinned reads / CAS swap)
# ---------------------------------------------------------------------------


def test_catalog_publish_pin_and_swap(ray_session, tmp_path):
    """Two generations: readers opened before a publish stay pinned to
    their generation; new opens see the new one; CURRENT never moves
    backwards under racing publishers; prune keeps the newest."""
    import concurrent.futures as cf

    import ray.data

    from ciff_ray import catalog
    from ciff_ray.build import BuildParams, build_index
    from ciff_ray.synth import generate_transcripts

    cat = str(tmp_path / "cat")
    idx1, idx2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    t1 = generate_transcripts(n_convs=20, max_turns=4, seed=1, mean_tokens=12)
    t2 = generate_transcripts(n_convs=25, max_turns=4, seed=2, mean_tokens=12)
    build_index(ray.data.from_arrow(t1).repartition(2), idx1,
                BuildParams(num_partitions=2))
    build_index(ray.data.from_arrow(t2).repartition(2), idx2,
                BuildParams(num_partitions=2))

    assert catalog.current(cat) is None
    with pytest.raises(FileNotFoundError):
        catalog.open_current(cat)
    with pytest.raises(FileNotFoundError):
        catalog.publish(cat, str(tmp_path / "not-an-index"))

    g1 = catalog.publish(cat, idx1)
    eng_old = catalog.open_current(cat)
    n_old = eng_old.manifest.num_docs

    g2 = catalog.publish(cat, idx2)
    assert g2 > g1
    assert catalog.current(cat) == (g2, os.path.abspath(idx2))
    # pinned: the already-open engine still serves generation 1
    assert eng_old.manifest.num_docs == n_old
    assert eng_old.index_dir == os.path.abspath(idx1) or eng_old.index_dir == idx1
    eng_new = catalog.open_current(cat)
    assert eng_new.manifest.num_docs != n_old
    # both engines answer queries against their own generation
    d_old, _ = eng_old.topk("the", k=3)
    d_new, _ = eng_new.topk("the", k=3)
    assert len(d_old) and len(d_new)

    # racing publishers: distinct generations, CURRENT = max
    with cf.ThreadPoolExecutor(8) as ex:
        gens = list(ex.map(lambda _: catalog.publish(cat, idx1), range(8)))
    assert len(set(gens)) == 8
    assert catalog.current(cat)[0] == max(gens)
    assert len(catalog.generations(cat)) == 10

    pruned = catalog.prune(cat, keep=2)
    assert len(catalog.generations(cat)) == 2
    assert max(gens) not in pruned
    # pruning registrations never touches index data
    assert os.path.exists(os.path.join(idx1, "manifest.json"))


# ---------------------------------------------------------------------------
# static (top-lambda) index pruning
# ---------------------------------------------------------------------------


def test_static_pruning_exact_single_term_and_smaller(ray_session, tmp_path):
    """Top-64 pruned index: single-term top-10 bit-identical to the
    full index in every mode (the per-slice top-lambda guarantee),
    payload strictly smaller, multi-term overlap@10 high, and global
    stats (N, avgdl, term df) preserved verbatim."""
    import random

    from ciff_ray.pruned import index_postings_bytes, prune_index
    from ciff_ray.query import QueryEngine
    from ciff_ray.synth import generate_transcripts

    tbl = generate_transcripts(n_convs=300, max_turns=8, seed=21, mean_tokens=30)
    idx, pidx = str(tmp_path / "full"), str(tmp_path / "top64")
    build_index(
        ray.data.from_arrow(tbl).repartition(4), idx, BuildParams(num_partitions=4)
    )
    m = prune_index(idx, pidx, lam=64)
    full, pruned = QueryEngine(idx), QueryEngine(pidx)
    assert m.num_docs == full.manifest.num_docs
    assert m.average_doclength == full.manifest.average_doclength
    vocab = full._local.vocabulary()
    random.seed(3)
    for t in random.sample(vocab, min(30, len(vocab))) + ["the", "a"]:
        for mode in ("exact", "bmw", "auto"):
            d1, s1 = full.topk(t, k=10, mode=mode)
            d2, s2 = pruned.topk(t, k=10, mode=mode)
            assert d1.tolist() == d2.tolist(), (t, mode)
            assert s1.tolist() == s2.tolist(), (t, mode)
    assert index_postings_bytes(pidx) < index_postings_bytes(idx)
    # term stats preserved verbatim (idf identical by construction)
    assert full._local._term_stat("the") == pruned._local._term_stat("the")
    hits = tot = 0
    for q in ("the time people", "state good very make", "know while last"):
        d1, _ = full.topk(q, k=10)
        d2, _ = pruned.topk(q, k=10)
        hits += len(set(d1) & set(d2))
        tot += len(d1)
    assert hits / tot >= 0.8, hits / tot
    # resume: a second prune skips every partition
    prune_index(idx, pidx, lam=64)
    import json as _json

    from ciff_ray.layout import read_lineage

    rows = read_lineage(str(tmp_path / "top64" / "lineage.jsonl"))
    assert [r["status"] for r in rows[-4:]] == ["skipped"] * 4


def test_tiered_engine_exact_with_certificate(ray_session, tmp_path):
    """TieredEngine must return bit-identical results to the full index
    on EVERY query (certificate only picks the tier), and must actually
    serve a meaningful share from the pruned tier."""
    import random

    from ciff_ray.pruned import TieredEngine, prune_index
    from ciff_ray.query import QueryEngine
    from ciff_ray.synth import generate_transcripts

    tbl = generate_transcripts(n_convs=400, max_turns=8, seed=33, mean_tokens=30)
    idx, pidx = str(tmp_path / "full"), str(tmp_path / "top64")
    build_index(
        ray.data.from_arrow(tbl).repartition(4), idx, BuildParams(num_partitions=4)
    )
    prune_index(idx, pidx, lam=64)
    tier = TieredEngine(idx, pidx)
    full = QueryEngine(idx)
    vocab = full._local.vocabulary()
    random.seed(5)
    queries = (
        random.sample(vocab, 15)
        + [
            "the time people",
            "state good very",
            "know while last might us",
            "zzznotaterm",
            "the zzz year",
            " ".join(random.sample(vocab, 4)),
        ]
    )
    ncert = ntotal = 0
    for q in queries:
        for k in (1, 5, 10):
            d1, s1 = full.topk(q, k=k)
            d2, s2, cert = tier.topk(q, k=k, return_certificate=True)
            assert d1.tolist() == d2.tolist(), (q, k)
            assert s1.tolist() == s2.tolist(), (q, k)
            ncert += cert
            ntotal += 1
    assert ncert > ntotal // 4, (ncert, ntotal)  # pruned tier really serves
    assert ncert < ntotal  # and the fallback path is exercised too


def test_prune_resume_requires_meta_part(ray_session, tmp_path):
    """A done marker alone must not satisfy resume: deleting a
    partition's prune_meta part (tau rows feed TieredEngine's soundness
    bound M) forces that partition to re-run, and stale part files from
    a prior layout are cleared before the merge."""
    import os

    from ciff_ray.layout import read_lineage
    from ciff_ray.pruned import prune_index
    from ciff_ray.synth import generate_transcripts

    tbl = generate_transcripts(n_convs=200, max_turns=6, seed=7, mean_tokens=25)
    idx, pidx = str(tmp_path / "full"), str(tmp_path / "top64")
    build_index(
        ray.data.from_arrow(tbl).repartition(4), idx, BuildParams(num_partitions=4)
    )
    prune_index(idx, pidx, lam=64)
    meta_dir = os.path.join(pidx, "prune_meta")
    victim = os.path.join(meta_dir, "part-00002.parquet")
    os.remove(victim)
    stale = os.path.join(meta_dir, "part-00099.parquet")  # bogus pid
    import shutil

    shutil.copy2(os.path.join(meta_dir, "part-00001.parquet"), stale)
    import pyarrow.parquet as pq_mod

    before = pq_mod.read_table(os.path.join(pidx, "prune_meta.parquet"))
    prune_index(idx, pidx, lam=64)
    rows = read_lineage(os.path.join(pidx, "lineage.jsonl"))[-4:]
    statuses = {r["partition_id"]: r["status"] for r in rows}
    assert statuses[2] == "pruned"  # re-ran the damaged partition
    assert all(v == "skipped" for p, v in statuses.items() if p != 2)
    assert os.path.exists(victim)
    assert not os.path.exists(stale)  # stale part cleared pre-merge
    after = pq_mod.read_table(os.path.join(pidx, "prune_meta.parquet"))
    assert after.equals(before)  # merged taus unchanged by the repair


def test_tiered_scorer_actor_dataset_path(ray_session, tmp_path):
    """TieredScorerActor (the map_batches serving stage) must equal
    QueryEngine.topk on the full index for every query in the batch."""
    import pyarrow as pa

    from ciff_ray.pruned import TieredScorerActor, prune_index
    from ciff_ray.query import QueryEngine
    from ciff_ray.synth import generate_transcripts

    tbl = generate_transcripts(n_convs=200, max_turns=6, seed=9, mean_tokens=25)
    idx, pidx = str(tmp_path / "full"), str(tmp_path / "top64")
    build_index(
        ray.data.from_arrow(tbl).repartition(4), idx, BuildParams(num_partitions=4)
    )
    prune_index(idx, pidx, lam=64)
    queries = ["the", "time", "the time people", "zzznotaterm", "state good"]
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(range(len(queries)), type=pa.int64()),
                "query": pa.array(queries),
            }
        )
    )
    out = qds.map_batches(
        TieredScorerActor,
        fn_constructor_args=(idx, pidx, 10),
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    full = QueryEngine(idx)
    for qid, q in enumerate(queries):
        d, s = full.topk(q, k=10)
        got = out[out.query_id == qid].sort_values("rank")
        assert got.doc_id.tolist() == d.tolist(), q
        assert got.score.tolist() == s.tolist(), q
