"""Property test over the full index lifecycle: for ANY (seeded)
corpus, ANY split into roots, and ANY whole-conversation delete set,
build-per-root → merge → delete → compact must score bit-identically
to a from-scratch build over the surviving corpus.  Complements the
deterministic tests in test_merge.py / test_lifecycle.py with
randomized structure (uneven splits, empty-ish roots, heavy salting)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.layout import IndexPaths, Manifest
from ciff_ray.lifecycle import compact_index, delete_docs
from ciff_ray.merge import merge_indexes
from ciff_ray.query import LocalScorer

QUERIES = ["the", "time people", "year go"]


def _title_scores(scorer, index_dir, q):
    docs, scores = scorer.score_all(q)
    dm = pq.read_table(
        IndexPaths(index_dir).docmap_dir, columns=["doc_id", "collection_docid"]
    )
    ids = dm["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    titles = dm["collection_docid"].combine_chunks().take(pa.array(order[docs]))
    return dict(zip(titles.to_pylist(), scores.tolist()))


@pytest.mark.usefixtures("ray_session")
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    cut1=st.integers(5, 20),
    cut2=st.integers(21, 30),
    del_stride=st.integers(3, 9),
)
def test_lifecycle_equals_rebuild(tmp_path_factory, seed, cut1, cut2, del_stride):
    from ciff_ray.synth import generate_transcripts

    base = tmp_path_factory.mktemp("prop")
    tbl = generate_transcripts(n_convs=34, max_turns=5, seed=seed, mean_tokens=18)
    convs = sorted(set(tbl["conv_id"].to_pylist()))
    groups = [convs[:cut1], convs[cut1:cut2], convs[cut2:]]
    params = BuildParams(
        num_partitions=3, heavy_df_frac=0.05, num_salts=2, sample_frac=1.0
    )
    roots = []
    for i, g in enumerate(groups):
        part = tbl.filter(pc.is_in(tbl["conv_id"], value_set=pa.array(g)))
        out = str(base / f"r{i}")
        build_index(ray.data.from_arrow(part), out, params)
        roots.append(out)
    merged = str(base / "m")
    merge_indexes(roots, merged)

    dead_convs = set(convs[::del_stride])
    dm = pq.read_table(IndexPaths(merged).docmap_dir)
    ids = dm["doc_id"].to_numpy(zero_copy_only=False)
    cd = dm["collection_docid"].to_pylist()
    dead = np.sort(
        np.array(
            [i for i, c in zip(ids, cd) if c.rsplit("/", 1)[0] in dead_convs],
            dtype=np.int64,
        )
    )
    if dead.size:
        delete_docs(merged, dead)
    compacted = str(base / "c")
    m_c = compact_index(merged, compacted)

    survivors = tbl.filter(
        pc.invert(pc.is_in(tbl["conv_id"], value_set=pa.array(sorted(dead_convs))))
    )
    rebuilt = str(base / "rb")
    build_index(ray.data.from_arrow(survivors), rebuilt, params)
    m_r = Manifest.read(IndexPaths(rebuilt).manifest)
    assert m_c.num_docs == m_r.num_docs
    assert m_c.total_terms_in_collection == m_r.total_terms_in_collection
    assert m_c.average_doclength == m_r.average_doclength
    assert m_c.num_postings_lists == m_r.num_postings_lists
    sc, sr = LocalScorer(compacted), LocalScorer(rebuilt)
    for q in QUERIES:
        assert _title_scores(sc, compacted, q) == _title_scores(sr, rebuilt, q), (
            q,
            seed,
        )
