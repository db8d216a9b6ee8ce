"""PL2 divergence-from-randomness retrieval vs an independent
pure-Python recompute over the OracleIndex (tf/dl/cf/N/avgdl -> the
natural-log PL2 decomposition of ciff_ray.dfr)."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.dfr import (
    C_PARAM,
    TOPK_K,
    TWO_PI,
    _PL2ScorerActor,
    pl2_score_all,
)
from ciff_ray.oracle import OracleIndex, tokenize
from ciff_ray.query import LocalScorer
from ciff_ray.synth import generate_transcripts

QUERIES = [
    "the", "time people", "zzzznotaterm", "the of and to in",
    "year", "go go go came", "Life BEING under",
]


@pytest.fixture(scope="module")
def pl2_fixture(tmp_path_factory):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=13, mean_tokens=25)
    out = str(tmp_path_factory.mktemp("pl2idx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        out,
        BuildParams(num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    return out, OracleIndex.build(tbl)


def _brute_pl2(oracle: OracleIndex, query: str) -> dict[int, float]:
    """Plain-Python natural-log PL2 over the oracle's postings."""
    terms = sorted(
        {t for t in tokenize(query) if oracle.df(t)}, key=lambda s: s.encode()
    )
    n = float(oracle.num_docs)
    avgdl = oracle.avg_doclength
    scores: dict[int, float] = {}
    for t in terms:
        lam = float(oracle.cf(t)) / n
        for doc_id, tf in oracle.postings[t]:
            dl = float(oracle.doclengths[doc_id])
            tfn = tf * math.log(1.0 + (C_PARAM * avgdl) / dl)
            contrib = (
                tfn * math.log(tfn / lam)
                + (lam - tfn)
                + 0.5 * math.log(TWO_PI * tfn)
            ) / (tfn + 1.0)
            scores[doc_id] = scores.get(doc_id, 0.0) + contrib
    return scores


def test_pl2_score_all_matches_bruteforce(pl2_fixture):
    idx, oracle = pl2_fixture
    scorer = LocalScorer(idx)
    for q in QUERIES:
        exp = _brute_pl2(oracle, q)
        u, sc = pl2_score_all(scorer, q)
        got = dict(zip(u.tolist(), sc.tolist()))
        assert set(got) == set(exp), q
        for d in exp:
            assert got[d] == pytest.approx(exp[d], abs=1e-12), (q, d)


def test_pl2_discriminates_rare_from_stopword(pl2_fixture):
    """DFR sanity: a rare term's best single-occurrence contribution
    must dwarf a stopword's best score (informativeness ~ -ln P under
    the Poisson model), and every score must be finite — guards
    against a clamp or a domain error (ln of <= 0) creeping into the
    kernel or the oracle."""
    import numpy as np

    idx, oracle = pl2_fixture
    scorer = LocalScorer(idx)
    u_stop, sc_stop = pl2_score_all(scorer, "the")
    assert u_stop.size > 0 and np.isfinite(sc_stop).all()
    # pick the rarest indexed term from the oracle's vocabulary
    rare = min(oracle.postings, key=lambda t: (oracle.cf(t), t))
    u_rare, sc_rare = pl2_score_all(scorer, rare)
    assert u_rare.size > 0 and np.isfinite(sc_rare).all()
    assert sc_rare.max() > sc_stop.max(), (rare, sc_rare.max(), sc_stop.max())


def test_pl2_actor_topk_rank_key(pl2_fixture):
    """Actor output == brute-force ranking under (round9 desc, id asc)."""
    idx, oracle = pl2_fixture
    actor = _PL2ScorerActor(idx, TOPK_K)
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
            _brute_pl2(oracle, q).items(), key=lambda kv: (-round(kv[1], 9), kv[0])
        )
        assert per_q.get(qid, []) == [d for d, _ in exp[:TOPK_K]], q
