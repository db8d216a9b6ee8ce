"""Rank- AND score-identical top-k BM25 vs the oracle (FIXTURES.md §5),
including the MaxScore/block-max pruned path and the actor-pool serving
path."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.oracle import OracleIndex
from ciff_ray.query import LocalScorer, QueryEngine
from ciff_ray.synth import generate_transcripts

QUERIES = [
    "the",                      # single stopword-scale heavy hitter
    "time people",              # two mid-frequency terms
    "the of and to in",         # stopword-heavy disjunction
    "zzzznotaterm",             # no-hit
    "state good very make",     # 4-term
    "year",                     # single term
    "the zzzznotaterm world",   # mixed hit/no-hit
    "Life BEING under",         # case normalization
    "go go go came",            # duplicate query terms count once
    "99 numbers 42",            # digit tokens
]


@pytest.fixture(scope="module")
def engine_and_oracle(tmp_path_factory):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=13, mean_tokens=25)
    out = str(tmp_path_factory.mktemp("qidx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        out,
        BuildParams(num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    return QueryEngine(out), OracleIndex.build(tbl)


@pytest.mark.parametrize("k", [1, 5, 10, 100])
def test_topk_exact_matches_oracle(engine_and_oracle, k):
    engine, oracle = engine_and_oracle
    for q in QUERIES:
        exp = oracle.bm25_topk(q, k=k)
        docs, scores = engine.topk(q, k=k, mode="exact")
        assert docs.tolist() == [d for d, _ in exp], q
        assert scores.tolist() == [s for _, s in exp], q  # bit-identical f64


def test_maxscore_identical_to_exact(engine_and_oracle):
    engine, oracle = engine_and_oracle
    for q in QUERIES:
        for k in (1, 3, 10, 50):
            d1, s1 = engine.topk(q, k=k, mode="exact")
            d2, s2 = engine.topk(q, k=k, mode="maxscore")
            assert d1.tolist() == d2.tolist(), (q, k)
            assert s1.tolist() == s2.tolist(), (q, k)


def test_tie_break_by_doc_id(engine_and_oracle):
    engine, oracle = engine_and_oracle
    # single-term queries give many equal scores (same tf, same dl) ->
    # ties must resolve by ascending doc_id in both
    for q in ("year", "the"):
        docs, scores = engine.topk(q, k=20)
        exp = oracle.bm25_topk(q, k=20)
        assert docs.tolist() == [d for d, _ in exp]


def test_actor_pool_serving(engine_and_oracle):
    engine, oracle = engine_and_oracle
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(range(len(QUERIES)), type=pa.int64()),
                "query": pa.array(QUERIES),
            }
        )
    )
    out = engine.score_dataset(qds, k=5, concurrency=2).to_pandas()
    for qid, q in enumerate(QUERIES):
        got = out[out.query_id == qid].sort_values("rank")
        exp = oracle.bm25_topk(q, k=5)
        assert got.doc_id.tolist() == [d for d, _ in exp], q
        assert got.score.tolist() == [s for _, s in exp], q


def test_collection_docid_translation(engine_and_oracle):
    engine, oracle = engine_and_oracle
    docs, _ = engine.topk("people time", k=5)
    titles = engine._local.collection_docids(docs)
    assert titles == [oracle.collection_docids[d] for d in docs.tolist()]
