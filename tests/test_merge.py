"""Segment merge (incremental ingest): merging R independently built
indexes must score bit-identically to a monolithic build over the
concatenated corpus (FIXTURES.md §5 invariants carry over: df/cf/
avgdl/num_docs are sums, BM25 is permutation-invariant per document),
and the avgdl-rescaled pruning bounds must keep MaxScore/BMW results
identical to exhaustive scoring on the merged index."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.layout import IndexPaths, Manifest, read_lineage
from ciff_ray.merge import merge_indexes
from ciff_ray.query import LocalScorer

QUERIES = [
    "the",
    "time people",
    "the of and to in",
    "zzzznotaterm",
    "state good very make",
    "Life BEING under",
    "go go go came",
]

# aggressive salting so the merge's salt-renumbering path is exercised
PARAMS = dict(num_partitions=5, heavy_df_frac=0.05, num_salts=3, sample_frac=1.0)


def _slice_convs(tbl: pa.Table, conv_ids: list[str]) -> pa.Table:
    import pyarrow.compute as pc

    return tbl.filter(pc.is_in(tbl["conv_id"], value_set=pa.array(conv_ids)))


@pytest.fixture(scope="module")
def merged_and_mono(tmp_path_factory, ray_session):
    from ciff_ray.synth import generate_transcripts

    tbl = generate_transcripts(n_convs=90, max_turns=6, seed=29, mean_tokens=30)
    convs = sorted(set(tbl["conv_id"].to_pylist()))
    groups = [convs[0:30], convs[30:55], convs[55:90]]
    base = tmp_path_factory.mktemp("merge")
    roots = []
    parts = []
    for i, g in enumerate(groups):
        part = _slice_convs(tbl, g)
        parts.append(part)
        out = str(base / f"root{i}")
        build_index(
            ray.data.from_arrow(part).repartition(3),
            out,
            BuildParams(**PARAMS),
        )
        roots.append(out)
    mono_dir = str(base / "mono")
    build_index(
        ray.data.from_arrow(pa.concat_tables(parts)).repartition(4),
        mono_dir,
        BuildParams(**PARAMS),
    )
    merged_dir = str(base / "merged")
    merge_indexes(roots, merged_dir)
    return roots, merged_dir, mono_dir


def _title_scores(scorer: LocalScorer, index_dir: str, q: str) -> dict[str, float]:
    docs, scores = scorer.score_all(q)
    dm = pq.read_table(
        IndexPaths(index_dir).docmap_dir, columns=["doc_id", "collection_docid"]
    )
    ids = dm["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    titles = dm["collection_docid"].combine_chunks().take(pa.array(order[docs]))
    return dict(zip(titles.to_pylist(), scores.tolist()))


def test_manifest_is_the_sum(merged_and_mono):
    roots, merged_dir, mono_dir = merged_and_mono
    mm = Manifest.read(IndexPaths(merged_dir).manifest)
    mo = Manifest.read(IndexPaths(mono_dir).manifest)
    assert mm.num_docs == mo.num_docs
    assert mm.total_terms_in_collection == mo.total_terms_in_collection
    assert mm.average_doclength == mo.average_doclength  # exact f64
    assert mm.num_postings_lists == mo.num_postings_lists


def test_term_stats_match_monolithic(merged_and_mono):
    _, merged_dir, mono_dir = merged_and_mono

    def stats(d):
        t = pq.read_table(IndexPaths(d).term_stats, columns=["term", "df", "cf"])
        return {
            r["term"]: (r["df"], r["cf"]) for r in t.to_pylist()
        }

    assert stats(merged_dir) == stats(mono_dir)


def test_scores_bit_identical_to_monolithic(merged_and_mono):
    _, merged_dir, mono_dir = merged_and_mono
    s_m = LocalScorer(merged_dir)
    s_o = LocalScorer(mono_dir)
    for q in QUERIES:
        got = _title_scores(s_m, merged_dir, q)
        exp = _title_scores(s_o, mono_dir, q)
        assert got == exp, q  # same doc set AND bit-identical f64 scores


def test_postings_concat_with_offsets(merged_and_mono):
    """Merged postings(term) == per-root postings shifted by the docID
    base, concatenated in root order — for every term of root0's vocab
    sample including salted heavy hitters."""
    roots, merged_dir, _ = merged_and_mono
    manifests = [Manifest.read(IndexPaths(r).manifest) for r in roots]
    bases, acc = [], 0
    for m in manifests:
        bases.append(acc)
        acc += m.num_docs
    merged = LocalScorer(merged_dir)
    scorers = [LocalScorer(r) for r in roots]
    heavy = sorted(Manifest.read(IndexPaths(merged_dir).manifest).heavy_terms)
    sample = (heavy[:5] or []) + ["time", "people", "year", "the"]
    for term in dict.fromkeys(sample):
        exp_docs, exp_tfs = [], []
        for base, sc in zip(bases, scorers):
            d, t = sc.postings(term)
            exp_docs.append(d + base)
            exp_tfs.append(t)
        gd, gt = merged.postings(term)
        assert np.array_equal(gd, np.concatenate(exp_docs)), term
        assert np.array_equal(gt, np.concatenate(exp_tfs)), term


def test_pruned_modes_identical_on_merged(merged_and_mono):
    """The avgdl-rescaled block-max / max-score bounds must stay valid:
    MaxScore and BMW top-k on the merged index == exhaustive."""
    from ciff_ray.query import QueryEngine

    _, merged_dir, _ = merged_and_mono
    eng = QueryEngine(merged_dir)
    for q in QUERIES:
        for k in (1, 5, 20):
            d1, s1 = eng.topk(q, k=k, mode="exact")
            d2, s2 = eng.topk(q, k=k, mode="maxscore")
            d3, s3 = eng.topk(q, k=k, mode="bmw")
            assert d1.tolist() == d2.tolist() == d3.tolist(), (q, k)
            assert s1.tolist() == s2.tolist() == s3.tolist(), (q, k)


def test_merge_is_resumable(merged_and_mono):
    roots, merged_dir, _ = merged_and_mono
    before = read_lineage(IndexPaths(merged_dir).lineage)
    merge_indexes(roots, merged_dir)  # second run: all partitions skip
    after = read_lineage(IndexPaths(merged_dir).lineage)
    new = after[len(before):]
    assert new and all(r["status"] == "skipped" for r in new)
    s = LocalScorer(merged_dir)
    d, _ = s.score_all("time people")
    assert d.size > 0


def test_merge_rejects_param_mismatch(tmp_path, ray_session):
    from ciff_ray.synth import generate_transcripts

    tbl = generate_transcripts(n_convs=6, max_turns=3, seed=3, mean_tokens=10)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(ray.data.from_arrow(tbl), a, BuildParams(num_partitions=2))
    build_index(ray.data.from_arrow(tbl), b, BuildParams(num_partitions=3))
    with pytest.raises(ValueError, match="num_partitions"):
        merge_indexes([a, b], str(tmp_path / "out"))


def test_ingest_increment(tmp_path, ray_session):
    """ingest = delta build + fold: queries over base+delta match a
    monolithic build over the union (bit-identical scores by title)."""
    from ciff_ray.merge import ingest
    from ciff_ray.synth import generate_transcripts

    tbl = generate_transcripts(n_convs=50, max_turns=5, seed=77, mean_tokens=25)
    convs = sorted(set(tbl["conv_id"].to_pylist()))
    base_part = _slice_convs(tbl, convs[:35])
    new_part = _slice_convs(tbl, convs[35:])
    base_dir = str(tmp_path / "base")
    build_index(
        ray.data.from_arrow(base_part).repartition(2), base_dir, BuildParams(**PARAMS)
    )
    out_dir = str(tmp_path / "merged")
    m = ingest(base_dir, ray.data.from_arrow(new_part), out_dir)
    assert m.num_docs == len(tbl)
    mono_dir = str(tmp_path / "mono")
    build_index(
        ray.data.from_arrow(tbl).repartition(2), mono_dir, BuildParams(**PARAMS)
    )
    s_m, s_o = LocalScorer(out_dir), LocalScorer(mono_dir)
    for q in ("time people", "the", "year"):
        assert _title_scores(s_m, out_dir, q) == _title_scores(s_o, mono_dir, q)


def test_merge_propagates_tombstones(tmp_path, ray_session):
    """Deferred deletes in a root must survive the fold: merged scorers
    never return a doc tombstoned in its source index."""
    from ciff_ray.lifecycle import delete_docs
    from ciff_ray.synth import generate_transcripts

    tbl = generate_transcripts(n_convs=40, max_turns=4, seed=91, mean_tokens=20)
    convs = sorted(set(tbl["conv_id"].to_pylist()))
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(
        ray.data.from_arrow(_slice_convs(tbl, convs[:20])), a_dir, BuildParams(**PARAMS)
    )
    build_index(
        ray.data.from_arrow(_slice_convs(tbl, convs[20:])), b_dir, BuildParams(**PARAMS)
    )
    s_a = LocalScorer(a_dir)
    d_a, _ = s_a.score_all("the")
    kill_a = d_a[:3]
    delete_docs(a_dir, kill_a)
    s_b = LocalScorer(b_dir)
    d_b, _ = s_b.score_all("the")
    kill_b = d_b[:2]
    delete_docs(b_dir, kill_b)
    merged = str(tmp_path / "m")
    merge_indexes([a_dir, b_dir], merged)
    base_b = Manifest.read(IndexPaths(a_dir).manifest).num_docs
    dead_global = set(kill_a.tolist()) | {d + base_b for d in kill_b.tolist()}
    s_m = LocalScorer(merged)
    for q in ("the", "time people"):
        d, _ = s_m.score_all(q)
        assert not (set(d.tolist()) & dead_global), q
