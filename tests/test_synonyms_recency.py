"""Round-4 continuation operators: query-time synonym expansion and
recency-decayed BM25 — kernel semantics plus end-to-end checks against
the independent pure-Python OracleIndex recompute."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.oracle import OracleIndex
from ciff_ray.query import QueryEngine
from ciff_ray.synth import generate_transcripts


@pytest.fixture(scope="module")
def idx_and_oracle(tmp_path_factory):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=13, mean_tokens=25)
    out = str(tmp_path_factory.mktemp("sridx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        out,
        BuildParams(num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    return out, OracleIndex.build(tbl)


def test_expand_query_semantics():
    from ciff_ray.synonyms import expand_query

    # OOV token pulls in its vocabulary synonym, original kept
    assert expand_query("quick scan") == "quick scan fast"
    # multi-synonym entry expands to every synonym
    assert expand_query("combine files") == "combine files merge join"
    # no entry -> unchanged; case-normalized before lookup
    assert expand_query("window key") == "window key"
    assert expand_query("QUICK") == "quick fast"
    # one-directional: the synonym itself does not back-expand
    assert expand_query("fast") == "fast"
    # duplicates in the raw query expand per occurrence but downstream
    # scoring dedups, so only the token multiset shape matters
    assert set(expand_query("quick quick").split()) == {"quick", "fast"}


def test_synonym_expansion_equals_union_scoring(idx_and_oracle):
    """Engine top-k over the expanded string == oracle BM25 over the
    same expanded term set (expansion-then-score is union scoring
    because duplicate terms count once)."""
    from ciff_ray.synonyms import SYNONYM_QUERY_SET, expand_query

    idx, oracle = idx_and_oracle
    eng = QueryEngine(idx)
    for q in SYNONYM_QUERY_SET:
        eq = expand_query(q)
        exp = oracle.bm25_topk(eq, k=10)
        docs, scores = eng.topk(eq, k=10, mode="exact")
        assert docs.tolist() == [d for d, _ in exp], q
        assert scores.tolist() == [s for _, s in exp], q


def test_decay_for_ages_values():
    from ciff_ray.recency import RECENCY_SCALE_DAYS, decay_for_ages

    ages = np.array([0.0, RECENCY_SCALE_DAYS * 86400.0], dtype=np.float64)
    d = decay_for_ages(ages)
    assert d[0] == 1.0            # newest doc keeps its raw score
    assert d[1] == 0.5            # a SCALE_DAYS-old doc scores half
    # strictly monotone decreasing in age
    many = decay_for_ages(np.arange(0, 10_000_000, 999_983, dtype=np.float64))
    assert np.all(np.diff(many) < 0)


def test_recency_scorer_matches_bruteforce(idx_and_oracle):
    """_RecencyScorer batch output == oracle scores * decay, ranked
    with the standard (round9 desc, doc_id asc) key."""
    from ciff_ray.recency import TOPK_K, _RecencyScorer, decay_for_ages

    idx, oracle = idx_and_oracle
    scorer = _RecencyScorer(idx, TOPK_K)
    queries = ["the", "time people", "zzzznotaterm", "the of and to in", "year"]
    batch = pa.table(
        {
            "query_id": pa.array(range(len(queries)), type=pa.int64()),
            "query": pa.array(queries),
        }
    )
    out = scorer(batch)
    got: dict[int, list[int]] = {}
    for qid, rk, doc in zip(
        out["query_id"].to_pylist(), out["rank"].to_pylist(), out["doc_id"].to_pylist()
    ):
        got.setdefault(qid, []).append((rk, doc))

    max_doc = oracle.num_docs - 1
    for qid, q in enumerate(queries):
        raw = oracle.bm25_scores(q)
        decayed = {
            d: s * float(decay_for_ages(np.array([float(max_doc - d)]))[0])
            for d, s in raw.items()
        }
        exp = sorted(decayed.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
        exp_docs = [d for d, _ in exp[:TOPK_K]]
        got_docs = [d for _, d in sorted(got.get(qid, []))]
        assert got_docs == exp_docs, q


def test_recency_changes_ranking_when_scores_tie(idx_and_oracle):
    """Sanity: the decay actually reorders at least one query's top list
    vs raw BM25 on this corpus (guards against a silently-identity
    decay)."""
    from ciff_ray.recency import TOPK_K, _RecencyScorer

    idx, oracle = idx_and_oracle
    scorer = _RecencyScorer(idx, TOPK_K)
    queries = ["the", "the of and to in", "time people", "year"]
    batch = pa.table(
        {
            "query_id": pa.array(range(len(queries)), type=pa.int64()),
            "query": pa.array(queries),
        }
    )
    out = scorer(batch)
    reordered = 0
    per_q: dict[int, list[int]] = {}
    for qid, doc in zip(out["query_id"].to_pylist(), out["doc_id"].to_pylist()):
        per_q.setdefault(qid, []).append(doc)
    for qid, q in enumerate(queries):
        raw = [d for d, _ in oracle.bm25_topk(q, k=TOPK_K)]
        if per_q.get(qid, []) != raw:
            reordered += 1
    assert reordered >= 1
