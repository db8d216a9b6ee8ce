"""Highlight spans: positional-store-backed match positions over the
BM25 top pool, vs a pure-Python recompute over the raw texts."""

from __future__ import annotations

import re

import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.highlight import _HighlightActor
from ciff_ray.oracle import OracleIndex, tokenize
from ciff_ray.positions import build_positions
from ciff_ray.synth import generate_transcripts

QUERIES = ["the", "time people", "zzzznotaterm", "Life BEING under year"]
K = 5


@pytest.fixture(scope="module")
def hl_fixture(tmp_path_factory, ray_session):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=17, mean_tokens=25)
    root = tmp_path_factory.mktemp("hl")
    idx = str(root / "idx")
    pos = str(root / "pos")
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        idx,
        BuildParams(num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    # docid = dense rank under byte-ascending (conv_id, turn_idx) — the
    # index's T1 assignment; generate_transcripts permutes rows, so the
    # positional-store input must be reordered to docid order first
    conv = tbl["conv_id"].to_pylist()
    turn = tbl["turn_idx"].to_pylist()
    order = sorted(range(len(conv)), key=lambda i: (conv[i].encode(), turn[i]))
    texts = tbl["text"].take(pa.array(order)).combine_chunks()
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(tbl)), type=pa.int64()),
            "text": texts,
        }
    )
    build_positions(ray.data.from_arrow(docs).repartition(2), pos)
    return idx, pos, OracleIndex.build(tbl), texts.to_pylist()


def _brute_spans(oracle: OracleIndex, texts, query: str) -> set:
    """Expected (doc_id, term, 1-based pos) spans over the exact BM25
    top-K pool, by re-tokenizing the raw text."""
    terms = sorted({t for t in tokenize(query) if oracle.df(t)})
    if not terms:
        return set()
    pool = [d for d, _ in oracle.bm25_topk(query, K)]
    out = set()
    for d in pool:
        toks = [t for t in re.split(r"[^a-z0-9]+", texts[d].lower()) if t]
        for i, t in enumerate(toks):
            if t in terms:
                out.add((d, t, i + 1))
    return out


def test_highlight_actor_matches_bruteforce(hl_fixture):
    idx, pos, oracle, texts = hl_fixture
    actor = _HighlightActor(idx, pos, K)
    batch = pa.table(
        {
            "query_id": pa.array(range(len(QUERIES)), type=pa.int64()),
            "query": pa.array(QUERIES),
        }
    )
    out = actor(batch)
    got: dict[int, set] = {}
    for qid, d, t, p in zip(
        out["query_id"].to_pylist(),
        out["doc_id"].to_pylist(),
        out["term"].to_pylist(),
        out["pos"].to_pylist(),
    ):
        got.setdefault(qid, set()).add((d, t, p))
    for qid, q in enumerate(QUERIES):
        assert got.get(qid, set()) == _brute_spans(oracle, texts, q), q


def test_highlight_pool_docs_only(hl_fixture):
    """Every emitted doc is in the query's top-K pool, and every pool
    doc containing a query term is present."""
    idx, pos, oracle, texts = hl_fixture
    actor = _HighlightActor(idx, pos, K)
    batch = pa.table(
        {
            "query_id": pa.array([0], type=pa.int64()),
            "query": pa.array(["time people"]),
        }
    )
    out = actor(batch)
    pool = {d for d, _ in oracle.bm25_topk("time people", K)}
    emitted = set(out["doc_id"].to_pylist())
    assert emitted <= pool
    assert emitted  # the pool must produce at least one span
