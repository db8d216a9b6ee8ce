"""Date-histogram and significant-terms aggregations vs independent
pure-Python recomputes over the OracleIndex."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ciff_ray.aggs import (
    HIST_BUCKET_SECONDS,
    POOL_K,
    SIG_K,
    _HistogramActor,
    _JLHScoreActor,
)
from ciff_ray.build import BuildParams, build_index
from ciff_ray.oracle import OracleIndex, tokenize
from ciff_ray.synth import generate_transcripts

QUERIES = [
    "the", "time people", "zzzznotaterm", "the of and to in",
    "year", "go go go came", "Life BEING under",
]


@pytest.fixture(scope="module")
def aggs_fixture(tmp_path_factory):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=13, mean_tokens=25)
    out = str(tmp_path_factory.mktemp("aggsidx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        out,
        BuildParams(num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    return out, OracleIndex.build(tbl)


def _brute_hist(oracle: OracleIndex, query: str) -> dict[int, int]:
    terms = sorted({t for t in tokenize(query) if oracle.df(t)})
    docs = sorted({d for t in terms for d, _ in oracle.postings[t]})
    out: dict[int, int] = {}
    for d in docs:
        b = d // HIST_BUCKET_SECONDS
        out[b] = out.get(b, 0) + 1
    return out


def test_histogram_actor_matches_bruteforce(aggs_fixture):
    idx, oracle = aggs_fixture
    actor = _HistogramActor(idx)
    batch = pa.table(
        {
            "query_id": pa.array(range(len(QUERIES)), type=pa.int64()),
            "query": pa.array(QUERIES),
        }
    )
    out = actor(batch)
    got: dict[int, dict[int, int]] = {}
    for qid, b, n in zip(
        out["query_id"].to_pylist(),
        out["ts_bucket"].to_pylist(),
        out["n_docs"].to_pylist(),
    ):
        got.setdefault(qid, {})[b] = n
    for qid, q in enumerate(QUERIES):
        assert got.get(qid, {}) == _brute_hist(oracle, q), q


def test_histogram_counts_sum_to_match_set(aggs_fixture):
    idx, oracle = aggs_fixture
    actor = _HistogramActor(idx)
    batch = pa.table(
        {
            "query_id": pa.array([0], type=pa.int64()),
            "query": pa.array(["time people"]),
        }
    )
    out = actor(batch)
    match = {
        d
        for t in ("time", "people")
        if oracle.df(t)
        for d, _ in oracle.postings[t]
    }
    assert sum(out["n_docs"].to_pylist()) == len(match)


def test_jlh_actor_matches_bruteforce(aggs_fixture):
    """The JLH scoring actor reproduces the hand-computed formula from
    the oracle's df — for a synthetic candidate table covering common
    and rare terms."""
    idx, oracle = aggs_fixture
    terms = sorted(oracle.postings, key=lambda t: oracle.df(t))
    cand_terms = [terms[0], terms[len(terms) // 2], terms[-1]]
    batch = pa.table(
        {
            "query_id": pa.array([0] * 3, type=pa.int64()),
            "term": pa.array(cand_terms, type=pa.string()),
            "fg_df": pa.array([3, 5, 9], type=pa.int64()),
            "pool_n": pa.array([10, 10, 10], type=pa.int64()),
        }
    )
    out = _JLHScoreActor(idx)(batch)
    for term, fg, score in zip(
        cand_terms, [3, 5, 9], out["score"].to_pylist()
    ):
        fg_pct = fg / 10.0
        bg_pct = oracle.df(term) / oracle.num_docs
        assert score == pytest.approx(
            (fg_pct - bg_pct) * (fg_pct / bg_pct), abs=1e-15
        ), term


def test_significant_terms_shape_and_ranks(aggs_fixture):
    """End-to-end shape invariants of q_significant_terms on testdata:
    ranks dense 1..<=SIG_K per query, pool terms only, query terms
    rank high for selective queries."""
    sf = "/root/testdata/sf0.001"
    from ciff_ray.aggs import q_significant_terms

    out = q_significant_terms(sf)
    qids = out["query_id"].to_pylist()
    ranks = out["rank"].to_pylist()
    per_q: dict[int, list[int]] = {}
    for q, r in zip(qids, ranks):
        per_q.setdefault(q, []).append(r)
    assert per_q, "no output"
    for q, rs in per_q.items():
        assert rs == list(range(1, len(rs) + 1)), q
        assert len(rs) <= SIG_K
    # the selective query "vector" (query_id 6) must surface its own
    # term as highly significant in its pool
    from ciff_ray.pipelines import QUERY_SET

    assert QUERY_SET[6] == "vector"
    top_terms_q6 = [
        t
        for t, q, r in zip(
            out["term"].to_pylist(), qids, ranks
        )
        if q == 6 and r <= 3
    ]
    assert "vector" in top_terms_q6


def test_match_stats_actor_matches_bruteforce(aggs_fixture):
    from ciff_ray.aggs import _MatchStatsActor

    idx, oracle = aggs_fixture
    actor = _MatchStatsActor(idx)
    batch = pa.table(
        {
            "query_id": pa.array(range(len(QUERIES)), type=pa.int64()),
            "query": pa.array(QUERIES),
        }
    )
    out = actor(batch)
    got = {
        r["query_id"]: r for r in out.to_pylist()
    }
    for qid, q in enumerate(QUERIES):
        terms = sorted({t for t in tokenize(q) if oracle.df(t)})
        docs = sorted({d for t in terms for d, _ in oracle.postings[t]})
        if not docs:
            assert qid not in got, q
            continue
        dls = [oracle.doclengths[d] for d in docs]
        r = got[qid]
        assert r["n_docs"] == len(docs), q
        assert r["min_dl"] == min(dls) and r["max_dl"] == max(dls), q
        assert r["sum_dl"] == sum(dls), q
        assert r["avg_dl_r"] == round(sum(dls) / len(docs), 6), q
