"""LTR feature extraction: composition invariants against the
individual scoring-family kernels (each family's own correctness is
pinned by its module tests; here we verify the pool selection, the
per-family lookup alignment, and the rank column)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.ltr import POOL_K, _LTRFeatureActor
from ciff_ray.oracle import OracleIndex
from ciff_ray.query import LocalScorer
from ciff_ray.synth import generate_transcripts
from ciff_ray.tfidf import DocnormStore, build_docnorms, tfidf_score_all

QUERIES = ["the", "time people", "zzzznotaterm", "Life BEING under year"]


@pytest.fixture(scope="module")
def ltr_fixture(tmp_path_factory, ray_session):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=13, mean_tokens=25)
    root = tmp_path_factory.mktemp("ltr")
    idx = str(root / "idx")
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        idx,
        BuildParams(num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    conv = tbl["conv_id"].to_pylist()
    turn = tbl["turn_idx"].to_pylist()
    order = sorted(range(len(conv)), key=lambda i: (conv[i].encode(), turn[i]))
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(tbl)), type=pa.int64()),
            "text": tbl["text"].take(pa.array(order)).combine_chunks(),
        }
    )
    norms = build_docnorms(
        ray.data.from_arrow(docs).repartition(3), idx, str(root / "norms")
    )
    return idx, norms, OracleIndex.build(tbl)


def test_ltr_features_align_with_family_kernels(ltr_fixture):
    idx, norms_dir, oracle = ltr_fixture
    actor = _LTRFeatureActor(idx, norms_dir, POOL_K)
    batch = pa.table(
        {
            "query_id": pa.array(range(len(QUERIES)), type=pa.int64()),
            "query": pa.array(QUERIES),
        }
    )
    out = actor(batch)
    scorer = LocalScorer(idx)
    norms = DocnormStore(norms_dir, scorer.N)

    from ciff_ray.dfr import pl2_score_all
    from ciff_ray.lmdir import lm_jm_score_all, lm_score_all

    fams = {
        "bm25_r": lambda q: scorer.score_all(q),
        "lmdir_r": lambda q: lm_score_all(scorer, q),
        "lmjm_r": lambda q: lm_jm_score_all(scorer, q),
        "pl2_r": lambda q: pl2_score_all(scorer, q),
        "tfidf_r": lambda q: tfidf_score_all(scorer, norms, q),
    }
    qids = out["query_id"].to_pylist()
    docs = out["doc_id"].to_pylist()
    for col, fn in fams.items():
        vals = out[col].to_pylist()
        for qid, q in enumerate(QUERIES):
            u, s = fn(q)
            lut = dict(zip(u.tolist(), np.round(s, 6).tolist()))
            for d, v, qq in zip(docs, vals, qids):
                if qq == qid:
                    assert v == lut[d], (col, qid, d)


def test_ltr_rank_matches_bm25_topk(ltr_fixture):
    idx, norms_dir, oracle = ltr_fixture
    actor = _LTRFeatureActor(idx, norms_dir, POOL_K)
    batch = pa.table(
        {
            "query_id": pa.array([0], type=pa.int64()),
            "query": pa.array(["time people"]),
        }
    )
    out = actor(batch)
    exp = [d for d, _ in oracle.bm25_topk("time people", POOL_K)]
    got = dict(zip(out["rank"].to_pylist(), out["doc_id"].to_pylist()))
    assert [got[r] for r in sorted(got)] == exp
    # dl column is the true doclength
    dls = dict(zip(out["doc_id"].to_pylist(), out["dl"].to_pylist()))
    for d, dl in dls.items():
        assert dl == oracle.doclengths[d]


def test_ltr_no_match_query_emits_nothing(ltr_fixture):
    idx, norms_dir, oracle = ltr_fixture
    actor = _LTRFeatureActor(idx, norms_dir, POOL_K)
    batch = pa.table(
        {
            "query_id": pa.array([0], type=pa.int64()),
            "query": pa.array(["zzzznotaterm"]),
        }
    )
    assert actor(batch).num_rows == 0


def test_ltr_zero_norm_pool_doc_gets_zero_tfidf(ray_session, tmp_path):
    """A pool doc whose every term has df == N (tf-idf drops it as
    zero-norm) must still emit a feature row — tfidf_r = 0.0, not an
    AssertionError (round-5 review finding)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ciff_ray.build import BuildParams, build_index
    from ciff_ray.ltr import _LTRFeatureActor, POOL_K
    from ciff_ray.tfidf import build_docnorms

    tbl = pa.table(
        {
            "conv_id": pa.array(["c0", "c1", "c2", "c3"]),
            "turn_idx": pa.array([0, 0, 0, 0], type=pa.int32()),
            "role": pa.array(["user"] * 4),
            "text": pa.array(
                ["common common", "common alpha", "common beta",
                 "common gamma"]
            ),
            "tool": pa.array([""] * 4),
        }
    )
    idx = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(tbl), idx,
        BuildParams(num_partitions=2, sample_frac=1.0),
    )
    docs = pa.table(
        {"doc_id": pa.array(range(4), type=pa.int64()), "text": tbl["text"]}
    )
    norms = build_docnorms(ray.data.from_arrow(docs), idx, str(tmp_path / "n"))
    actor = _LTRFeatureActor(idx, norms, POOL_K)
    out = actor(
        pa.table(
            {"query_id": pa.array([0], type=pa.int64()),
             "query": pa.array(["common"])}
        )
    )
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert 0 in rows  # the zero-norm doc stays in the pool
    assert rows[0]["tfidf_r"] == 0.0
    assert all(np.isfinite(r["tfidf_r"]) for r in rows.values())
    assert rows[1]["tfidf_r"] == 0.0  # its only scored term has idf 0


def test_ltr_all_zero_norm_candidates(ray_session, tmp_path):
    """Every doc matching the query is zero-norm: tfidf_score_all
    returns EMPTY candidates while BM25 still pools docs — feat_or_zero
    must emit all-zero features, not IndexError (second-pass review)."""
    import pyarrow as pa
    import ray.data

    from ciff_ray.build import BuildParams, build_index
    from ciff_ray.ltr import _LTRFeatureActor, POOL_K
    from ciff_ray.tfidf import build_docnorms

    tbl = pa.table(
        {
            "conv_id": pa.array(["c0", "c1", "c2"]),
            "turn_idx": pa.array([0, 0, 0], type=pa.int32()),
            "role": pa.array(["user"] * 3),
            # every doc is ONLY df==N terms -> every norm is 0
            "text": pa.array(["common", "common common", "common"]),
            "tool": pa.array([""] * 3),
        }
    )
    idx = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(tbl), idx,
        BuildParams(num_partitions=2, sample_frac=1.0),
    )
    docs = pa.table(
        {"doc_id": pa.array(range(3), type=pa.int64()), "text": tbl["text"]}
    )
    norms = build_docnorms(ray.data.from_arrow(docs), idx, str(tmp_path / "n"))
    out = _LTRFeatureActor(idx, norms, POOL_K)(
        pa.table(
            {"query_id": pa.array([0], type=pa.int64()),
             "query": pa.array(["common"])}
        )
    )
    assert out.num_rows == 3
    assert set(out["tfidf_r"].to_pylist()) == {0.0}
