"""Offline bulk retrieval (ciff_ray.bulk) and conversation-level BM25F
(ciff_ray.fielded) vs independent references.

* bulk_topk must be rank-identical to the serving engine's exact mode
  for every workload query (same round(score, 9) desc, docID asc key),
  including after tombstone deletes.
* bm25f_topk must match a from-scratch numpy BM25F computed directly
  from the texts (weights/lengths/idf all re-derived independently of
  the index code paths).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.bulk import bulk_topk
from ciff_ray.fielded import (
    BM25F_B,
    BM25F_K1,
    FIELD_WEIGHTS,
    bm25f_topk,
)
from ciff_ray.oracle import EPS_IDF, tokenize
from ciff_ray.query import QueryEngine
from ciff_ray.synth import (
    TURNS_PER_CONV_FROM_DOCS,
    generate_transcripts,
    transcripts_from_documents,
)

WORKLOAD = [
    "the",
    "time people",
    "the of and to in",
    "zzzznotaterm",
    "state good very make",
    "year",
    "the zzzznotaterm world",
    "Life BEING under",
    "go go go came",
    "way down should because",
]


@pytest.fixture(scope="module")
def salted_index(tmp_path_factory):
    tbl = generate_transcripts(n_convs=50, max_turns=8, seed=29, mean_tokens=25)
    out = str(tmp_path_factory.mktemp("bulkidx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        out,
        BuildParams(
            num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0
        ),
    )
    return out


def _topk_df(ds) -> dict[int, list[int]]:
    got: dict[int, list[int]] = {}
    for r in ds.take_all():
        got.setdefault(int(r["query_id"]), []).append(
            (int(r["rank"]), int(r["doc_id"]))
        )
    return {q: [d for _, d in sorted(v)] for q, v in got.items()}


def test_bulk_matches_engine_exact(salted_index):
    eng = QueryEngine(salted_index)
    got = _topk_df(bulk_topk(salted_index, WORKLOAD, k=10))
    for qid, q in enumerate(WORKLOAD):
        docs, _ = eng.topk(q, k=10, mode="exact")
        assert got.get(qid, []) == docs.tolist(), q


def test_bulk_respects_tombstones(salted_index, tmp_path):
    import shutil

    from ciff_ray.lifecycle import delete_docs

    idx = str(tmp_path / "tomb")
    shutil.copytree(salted_index, idx)
    eng0 = QueryEngine(salted_index)
    victims, _ = eng0.topk("the", k=3, mode="exact")
    delete_docs(idx, victims.tolist())
    got = _topk_df(bulk_topk(idx, ["the"], k=10))
    eng = QueryEngine(idx)
    docs, _ = eng.topk("the", k=10, mode="exact")
    assert got.get(0, []) == docs.tolist()
    assert not set(got.get(0, [])) & set(victims.tolist())


# -- BM25F ------------------------------------------------------------------


def _ref_bm25f(texts: list[str], queries: list[str], k: int):
    """From-scratch BM25F over the derived-transcripts shape
    (conv = doc // 8, role = doc % 4), independent of ciff_ray.fielded."""
    n_docs = len(texts)
    k_tpc = TURNS_PER_CONV_FROM_DOCS
    n_convs = -(-n_docs // k_tpc)
    tf: dict[tuple[str, int, int], int] = {}
    flen: dict[tuple[int, int], int] = {}
    role_tot = [0, 0, 0, 0]
    for d, text in enumerate(texts):
        toks = tokenize(text)
        conv, role = d // k_tpc, d % 4
        flen[(conv, role)] = flen.get((conv, role), 0) + len(toks)
        role_tot[role] += len(toks)
        for t in toks:
            tf[(t, conv, role)] = tf.get((t, conv, role), 0) + 1
    avglen = [s / n_convs for s in role_tot]
    wtf: dict[tuple[str, int], float] = {}
    for (t, conv, role), v in tf.items():
        part = (
            FIELD_WEIGHTS[role]
            * v
            / (1.0 - BM25F_B + BM25F_B * flen[(conv, role)] / avglen[role])
        )
        wtf[(t, conv)] = wtf.get((t, conv), 0.0) + part
    dfc: dict[str, int] = {}
    for (t, _conv) in wtf:
        dfc[t] = dfc.get(t, 0) + 1
    out = {}
    for qid, q in enumerate(queries):
        scores: dict[int, float] = {}
        for t in set(tokenize(q)):
            if t not in dfc:
                continue
            idf = max(np.log((n_convs - dfc[t] + 0.5) / (dfc[t] + 0.5)), EPS_IDF)
            for (tt, conv), w in wtf.items():
                if tt != t:
                    continue
                scores[conv] = scores.get(conv, 0.0) + idf * w * (
                    BM25F_K1 + 1.0
                ) / (BM25F_K1 + w)
        ranked = sorted(
            scores.items(), key=lambda cv: (-round(cv[1], 9), cv[0])
        )[:k]
        out[qid] = [c for c, _ in ranked]
    return out


def test_bm25f_matches_reference(tmp_path_factory):
    # derived-transcripts shape: dense doc_id, conv/role arithmetic
    base = generate_transcripts(n_convs=30, max_turns=6, seed=7, mean_tokens=20)
    texts = base["text"].to_pylist()
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = str(tmp_path_factory.mktemp("fidx"))
    build_index(
        ray.data.from_arrow(docs_tbl)
        .repartition(3)
        .map_batches(transcripts_from_documents, batch_format="pyarrow"),
        out,
        BuildParams(
            num_partitions=4, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0
        ),
    )
    queries = ["the", "time people", "zzzznotaterm", "the of and world", "year go"]
    got_rows = bm25f_topk(out, queries, k=5).take_all()
    got: dict[int, list[int]] = {}
    for r in got_rows:
        got.setdefault(int(r["query_id"]), []).append(
            (int(r["rank"]), int(r["conv"]))
        )
    got = {q: [c for _, c in sorted(v)] for q, v in got.items()}
    exp = _ref_bm25f(texts, queries, k=5)
    for qid in range(len(queries)):
        assert got.get(qid, []) == exp.get(qid, []), queries[qid]


# -- randomized property: bulk == engine for ANY corpus/workload -------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    range_docs=st.sampled_from([7, 64, 10_000]),  # many tiny / mixed / one range
    k=st.integers(1, 12),
)
def test_bulk_property_matches_engine(tmp_path_factory, seed, range_docs, k):
    """For ANY seeded corpus, ANY doc-range width (including ranges far
    smaller than a posting list and a single range covering the corpus),
    and ANY k, bulk_topk equals the serving engine's exact mode."""
    tbl = generate_transcripts(n_convs=20, max_turns=5, seed=seed, mean_tokens=15)
    out = str(tmp_path_factory.mktemp("bulkprop"))
    build_index(
        ray.data.from_arrow(tbl).repartition(2),
        out,
        BuildParams(
            num_partitions=3, heavy_df_frac=0.2, num_salts=2, sample_frac=1.0
        ),
    )
    rng = np.random.default_rng(seed)
    from ciff_ray.synth import _WORDS

    words = np.array(_WORDS)
    wl = [
        " ".join(rng.choice(words, size=int(rng.integers(1, 5)), replace=True))
        for _ in range(6)
    ] + ["zzzz nothing"]
    eng = QueryEngine(out)
    rows = bulk_topk(out, wl, k=k, range_docs=range_docs).take_all()
    got: dict[int, list[int]] = {}
    for r in rows:
        got.setdefault(int(r["query_id"]), []).append(
            (int(r["rank"]), int(r["doc_id"]))
        )
    for qid, q in enumerate(wl):
        docs, _ = eng.topk(q, k=k, mode="exact")
        assert [d for _, d in sorted(got.get(qid, []))] == docs.tolist(), (q, k)


def test_bulk_scores_full_dump(salted_index):
    """bulk_scores returns EVERY matching (query, doc) with the score
    the serving engine computes (same contributions, round-9 compare)."""
    from ciff_ray.bulk import bulk_scores

    eng = QueryEngine(salted_index)
    wl = ["the of", "time people year"]
    rows = bulk_scores(salted_index, wl).take_all()
    got: dict[int, dict[int, float]] = {}
    for r in rows:
        got.setdefault(int(r["query_id"]), {})[int(r["doc_id"])] = float(
            r["score"]
        )
    for qid, q in enumerate(wl):
        docs, scores = eng._local.score_all(q)
        exp = dict(zip(docs.tolist(), scores.tolist()))
        g = got.get(qid, {})
        assert set(g) == set(exp), q
        for d in exp:
            assert round(g[d], 9) == round(exp[d], 9), (q, d)


def test_empty_and_all_miss_workloads(salted_index):
    from ciff_ray.bulk import bulk_scores
    from ciff_ray.fielded import bm25f_topk

    assert bulk_topk(salted_index, [], k=5).take_all() == []
    assert bulk_topk(salted_index, ["", "  "], k=5).take_all() == []
    assert bulk_topk(salted_index, ["zzznever qqq"], k=5).take_all() == []
    assert bulk_scores(salted_index, []).take_all() == []
    assert bm25f_topk(salted_index, [], k=5).take_all() == []


def test_bulk_and_fsck_on_ciff_imported_index(tmp_path, ray_session):
    """Interop closure: the reference's toy CIFF file imported into an
    index dir serves bulk retrieval rank-identically to the engine and
    passes fsck."""
    from ciff_ray.fsck import check_index
    from ciff_ray.interop.bridge import ciff_to_index

    TOY = "/root/reference/tests/test_data/toy-complete-20200309.ciff"
    if not os.path.exists(TOY):
        pytest.skip("reference toy fixture unavailable")
    idx = str(tmp_path / "toyidx")
    from ciff_ray.build import BuildParams

    ciff_to_index(TOY, idx, BuildParams(num_partitions=2))
    eng = QueryEngine(idx)
    docs, _ = eng.topk("text content", k=3)
    rows = bulk_topk(idx, ["text content"], k=3, range_docs=2).take_all()
    assert [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])] == docs.tolist()
    assert check_index(idx).num_rows == 0
