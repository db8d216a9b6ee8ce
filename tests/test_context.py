"""Hit-context expansion vs a pure-Python recompute (docid adjacency
within conversations under the T1 rank assignment)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.context import CTX, TOPK_K, _ContextActor
from ciff_ray.oracle import OracleIndex
from ciff_ray.synth import generate_transcripts

QUERIES = ["the", "time people", "zzzznotaterm", "Life BEING under year"]


@pytest.fixture(scope="module")
def ctx_fixture(tmp_path_factory, ray_session):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=17, mean_tokens=25)
    out = str(tmp_path_factory.mktemp("ctxidx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        out,
        BuildParams(num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    conv = tbl["conv_id"].to_pylist()
    turn = tbl["turn_idx"].to_pylist()
    order = sorted(range(len(conv)), key=lambda i: (conv[i].encode(), turn[i]))
    conv_of = [conv[i] for i in order]  # docid -> conv_id
    return out, OracleIndex.build(tbl), conv_of


def _brute_ctx(oracle: OracleIndex, conv_of: list[str], query: str) -> set:
    out = set()
    n = oracle.num_docs
    for r, (d, _) in enumerate(oracle.bm25_topk(query, TOPK_K), start=1):
        for off in range(-CTX, CTX + 1):
            c = d + off
            if 0 <= c < n and conv_of[c] == conv_of[d]:
                out.add((r, d, c, off))
    return out


def test_context_actor_matches_bruteforce(ctx_fixture):
    idx, oracle, conv_of = ctx_fixture
    actor = _ContextActor(idx, TOPK_K)
    batch = pa.table(
        {
            "query_id": pa.array(range(len(QUERIES)), type=pa.int64()),
            "query": pa.array(QUERIES),
        }
    )
    out = actor(batch)
    got: dict[int, set] = {}
    for qid, r, d, c, off in zip(
        out["query_id"].to_pylist(),
        out["rank"].to_pylist(),
        out["doc_id"].to_pylist(),
        out["ctx_doc_id"].to_pylist(),
        out["offset"].to_pylist(),
    ):
        got.setdefault(qid, set()).add((r, d, c, off))
    for qid, q in enumerate(QUERIES):
        assert got.get(qid, set()) == _brute_ctx(oracle, conv_of, q), q


def test_context_never_crosses_conversations(ctx_fixture):
    idx, oracle, conv_of = ctx_fixture
    actor = _ContextActor(idx, TOPK_K)
    batch = pa.table(
        {
            "query_id": pa.array([0], type=pa.int64()),
            "query": pa.array(["the"]),
        }
    )
    out = actor(batch)
    rows = list(
        zip(
            out["doc_id"].to_pylist(),
            out["ctx_doc_id"].to_pylist(),
            out["offset"].to_pylist(),
        )
    )
    assert rows, "stopword query must produce hits"
    for d, c, off in rows:
        assert c == d + off
        assert conv_of[c] == conv_of[d]
    # the hit itself is always present with offset 0
    hits = {d for d, c, off in rows if off == 0}
    assert hits == {d for d, _, _ in rows}
