"""TF-IDF cosine retrieval + doc-norms store vs an independent
pure-Python recompute over the OracleIndex."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.oracle import OracleIndex, tokenize
from ciff_ray.query import LocalScorer
from ciff_ray.synth import generate_transcripts
from ciff_ray.tfidf import (
    TOPK_K,
    DocnormStore,
    _TfidfScorerActor,
    build_docnorms,
    tfidf_score_all,
)

QUERIES = [
    "the", "time people", "zzzznotaterm", "the of and to in",
    "year", "go go go came", "Life BEING under",
]


@pytest.fixture(scope="module")
def tfidf_fixture(tmp_path_factory, ray_session):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=13, mean_tokens=25)
    root = tmp_path_factory.mktemp("tfidf")
    idx = str(root / "idx")
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        idx,
        BuildParams(num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    # docid = dense rank under byte-ascending (conv_id, turn_idx) — the
    # index's T1 assignment; generate_transcripts permutes rows, so the
    # norms input must be reordered to docid order first
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


def _brute_norms(oracle: OracleIndex) -> dict[int, float]:
    n = float(oracle.num_docs)
    sumsq: dict[int, float] = {}
    for t, plist in oracle.postings.items():
        idf = math.log(n / oracle.df(t))
        for doc_id, tf in plist:
            w = (1.0 + math.log(tf)) * idf
            sumsq[doc_id] = sumsq.get(doc_id, 0.0) + w * w
    return {d: math.sqrt(s) for d, s in sumsq.items()}


def _brute_tfidf(oracle: OracleIndex, query: str) -> dict[int, float]:
    norms = _brute_norms(oracle)
    terms = sorted(
        {t for t in tokenize(query) if oracle.df(t)}, key=lambda s: s.encode()
    )
    n = float(oracle.num_docs)
    sums: dict[int, float] = {}
    for t in terms:
        idf = math.log(n / oracle.df(t))
        for doc_id, tf in oracle.postings[t]:
            sums[doc_id] = sums.get(doc_id, 0.0) + (1.0 + math.log(tf)) * idf
    return {d: s / norms[d] for d, s in sums.items()}


def test_docnorm_store_matches_bruteforce(tfidf_fixture):
    idx, norms_dir, oracle = tfidf_fixture
    store = DocnormStore(norms_dir, oracle.num_docs)
    exp = _brute_norms(oracle)
    docs = np.arange(oracle.num_docs, dtype=np.int64)
    got = store.gather_sorted(docs)
    assert got.dtype == np.float64
    for d in docs.tolist():
        assert got[d] == pytest.approx(exp.get(d, 0.0), abs=1e-12), d


def test_docnorm_store_validates_density(tfidf_fixture, tmp_path):
    """A norms dir missing rows must fail fast at gather, not return
    silently wrong values."""
    import pyarrow.parquet as pq

    idx, norms_dir, oracle = tfidf_fixture
    bad = tmp_path / "bad_norms"
    bad.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "norm": pa.array([1.0, 2.0], type=pa.float64()),
            }
        ),
        bad / "part-0.parquet",
    )
    with pytest.raises(ValueError, match="dense"):
        DocnormStore(str(bad), oracle.num_docs)


def test_tfidf_score_all_matches_bruteforce(tfidf_fixture):
    idx, norms_dir, oracle = tfidf_fixture
    scorer = LocalScorer(idx)
    store = DocnormStore(norms_dir, oracle.num_docs)
    for q in QUERIES:
        exp = _brute_tfidf(oracle, q)
        u, sc = tfidf_score_all(scorer, store, q)
        got = dict(zip(u.tolist(), sc.tolist()))
        assert set(got) == set(exp), q
        for d in exp:
            assert got[d] == pytest.approx(exp[d], abs=1e-12), (q, d)


def test_tfidf_actor_topk_rank_key(tfidf_fixture):
    idx, norms_dir, oracle = tfidf_fixture
    actor = _TfidfScorerActor(idx, norms_dir, TOPK_K)
    batch = pa.table(
        {
            "query_id": pa.array(range(len(QUERIES)), type=pa.int64()),
            "query": pa.array(QUERIES),
        }
    )
    out = actor(batch)
    per_q: dict[int, list[int]] = {}
    for qid, doc in zip(out["query_id"].to_pylist(), out["doc_id"].to_pylist()):
        per_q.setdefault(qid, []).append(doc)
    for qid, q in enumerate(QUERIES):
        exp = sorted(
            _brute_tfidf(oracle, q).items(),
            key=lambda kv: (-round(kv[1], 9), kv[0]),
        )
        assert per_q.get(qid, []) == [d for d, _ in exp[:TOPK_K]], q


def test_tfidf_zero_norm_doc_is_dropped(ray_session, tmp_path):
    """A doc whose every term has df == N has a zero weight vector —
    undefined cosine direction.  It must be DROPPED (not nan) and the
    oracle SQL mirrors the drop with `n.norm > 0` (r4 ADVICE item)."""
    import warnings

    tbl = pa.table(
        {
            "conv_id": pa.array(["c0", "c1", "c2", "c3"]),
            "turn_idx": pa.array([0, 0, 0, 0], type=pa.int32()),
            "role": pa.array(["user"] * 4),
            "text": pa.array(
                [
                    "common common",  # df(common)=4=N -> norm 0
                    "common alpha",
                    "common beta",
                    "common gamma",
                ]
            ),
            "tool": pa.array([""] * 4),
        }
    )
    idx = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(tbl),
        idx,
        BuildParams(num_partitions=2, sample_frac=1.0),
    )
    docs = pa.table(
        {
            "doc_id": pa.array(range(4), type=pa.int64()),
            "text": tbl["text"],
        }
    )
    norms_dir = build_docnorms(
        ray.data.from_arrow(docs), idx, str(tmp_path / "norms")
    )
    scorer = LocalScorer(idx)
    store = DocnormStore(norms_dir, 4)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # 0/0 would raise RuntimeWarning
        u, sc = tfidf_score_all(scorer, store, "common")
    assert 0 not in u.tolist()  # the zero-norm doc is gone
    assert set(u.tolist()) == {1, 2, 3}
    assert np.isfinite(sc).all()


def test_publish_dir_self_heals_markerless_partial(tmp_path):
    """A crash that left out_dir WITHOUT _DONE must not poison every
    future rebuild: publish_dir replaces the partial (round-5 review
    finding); a COMPLETE store (with _DONE) wins races instead."""
    import os

    from ciff_ray.layout import publish_dir

    out = tmp_path / "store"
    # partial: exists, no marker
    out.mkdir()
    (out / "part-0.parquet").write_bytes(b"junk")
    tmp = tmp_path / "store.tmp-1"
    tmp.mkdir()
    (tmp / "part-0.parquet").write_bytes(b"good")
    publish_dir(str(tmp), str(out))
    assert (out / "_DONE").exists()
    assert (out / "part-0.parquet").read_bytes() == b"good"
    assert not tmp.exists()

    # race: a COMPLETE store already there — the loser cleans up
    tmp2 = tmp_path / "store.tmp-2"
    tmp2.mkdir()
    (tmp2 / "part-0.parquet").write_bytes(b"later")
    publish_dir(str(tmp2), str(out))
    assert (out / "part-0.parquet").read_bytes() == b"good"
    assert not tmp2.exists()
