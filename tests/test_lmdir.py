"""Dirichlet / Jelinek-Mercer query-likelihood retrieval vs an
independent pure-Python recompute over the OracleIndex (tf/dl/cf/|C| ->
Zhai-Lafferty decompositions)."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.lmdir import (
    JM_MULT,
    MU,
    TOPK_K,
    _LMScorerActor,
    lm_jm_score_all,
    lm_score_all,
)
from ciff_ray.oracle import OracleIndex, tokenize
from ciff_ray.query import LocalScorer
from ciff_ray.synth import generate_transcripts

QUERIES = [
    "the", "time people", "zzzznotaterm", "the of and to in",
    "year", "go go go came", "Life BEING under",
]


@pytest.fixture(scope="module")
def lm_fixture(tmp_path_factory):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=13, mean_tokens=25)
    out = str(tmp_path_factory.mktemp("lmidx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        out,
        BuildParams(num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    return out, OracleIndex.build(tbl)


def _brute_lm(oracle: OracleIndex, query: str) -> dict[int, float]:
    """Plain-Python Dirichlet QL over the oracle's postings."""
    terms = sorted(
        {t for t in tokenize(query) if oracle.df(t)}, key=lambda s: s.encode()
    )
    total = float(oracle.total_terms)
    scores: dict[int, float] = {}
    for t in terms:
        cf = float(oracle.cf(t))
        for doc_id, tf in oracle.postings[t]:
            scores[doc_id] = scores.get(doc_id, 0.0) + math.log(
                1.0 + (tf * total) / (MU * cf)
            )
    return {
        d: s + len(terms) * math.log(MU / (oracle.doclengths[d] + MU))
        for d, s in scores.items()
    }


def test_lm_score_all_matches_bruteforce(lm_fixture):
    idx, oracle = lm_fixture
    scorer = LocalScorer(idx)
    for q in QUERIES:
        exp = _brute_lm(oracle, q)
        u, sc = lm_score_all(scorer, q)
        got = dict(zip(u.tolist(), sc.tolist()))
        assert set(got) == set(exp), q
        for d in exp:
            assert got[d] == pytest.approx(exp[d], abs=1e-12), (q, d)


def test_lm_actor_topk_rank_key(lm_fixture):
    """Actor output == brute-force ranking under (round9 desc, id asc)."""
    idx, oracle = lm_fixture
    actor = _LMScorerActor(idx, TOPK_K)
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
            _brute_lm(oracle, q).items(), key=lambda kv: (-round(kv[1], 9), kv[0])
        )
        assert per_q.get(qid, []) == [d for d, _ in exp[:TOPK_K]], q


def _brute_jm(oracle: OracleIndex, query: str) -> dict[int, float]:
    """Plain-Python Jelinek-Mercer QL over the oracle's postings."""
    terms = sorted(
        {t for t in tokenize(query) if oracle.df(t)}, key=lambda s: s.encode()
    )
    total = float(oracle.total_terms)
    scores: dict[int, float] = {}
    for t in terms:
        cf = float(oracle.cf(t))
        for doc_id, tf in oracle.postings[t]:
            dl = float(oracle.doclengths[doc_id])
            scores[doc_id] = scores.get(doc_id, 0.0) + math.log(
                1.0 + (JM_MULT * (tf / dl)) * (total / cf)
            )
    return scores


def test_lm_jm_score_all_matches_bruteforce(lm_fixture):
    idx, oracle = lm_fixture
    scorer = LocalScorer(idx)
    for q in QUERIES:
        exp = _brute_jm(oracle, q)
        u, sc = lm_jm_score_all(scorer, q)
        got = dict(zip(u.tolist(), sc.tolist()))
        assert set(got) == set(exp), q
        for d in exp:
            assert got[d] == pytest.approx(exp[d], abs=1e-12), (q, d)


def test_lm_jm_actor_topk_rank_key(lm_fixture):
    idx, oracle = lm_fixture
    actor = _LMScorerActor(idx, TOPK_K, "jm")
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
            _brute_jm(oracle, q).items(), key=lambda kv: (-round(kv[1], 9), kv[0])
        )
        assert per_q.get(qid, []) == [d for d, _ in exp[:TOPK_K]], q


def test_lm_jm_prefers_higher_density():
    """JM normalizes by tf/dl: the doc with higher term DENSITY wins
    even when raw tf ties."""
    tbl = pa.table(
        {
            "conv_id": pa.array(["c0", "c0"]),
            "turn_idx": pa.array([0, 1], type=pa.int32()),
            "text": pa.array(
                ["apple banana", "apple banana cherry date elder fig grape"]
            ),
        }
    )
    oracle = OracleIndex.build(tbl)
    s = _brute_jm(oracle, "apple")
    assert s[0] > s[1]


def test_lm_prefers_shorter_doc_at_equal_tf():
    """Length normalization: with equal tf, the shorter doc scores
    higher (the Dirichlet prior penalizes length)."""
    tbl = pa.table(
        {
            "conv_id": pa.array(["c0", "c0"]),
            "turn_idx": pa.array([0, 1], type=pa.int32()),
            "text": pa.array(
                ["apple banana", "apple banana cherry date elder fig grape"]
            ),
        }
    )
    oracle = OracleIndex.build(tbl)
    s = _brute_lm(oracle, "apple")
    assert s[0] > s[1]
