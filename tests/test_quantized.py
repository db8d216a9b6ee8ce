"""Impact-quantized retrieval vs an independent pure-Python recompute:
the distributed range scan, the quantized scorer, and the integer rank
key."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from ciff_ray.build import BuildParams, build_index
from ciff_ray.interop.convert import ScoreQuantizer
from ciff_ray.oracle import OracleIndex, tokenize
from ciff_ray.query import LocalScorer
from ciff_ray.quantized import (
    TOPK_K,
    _QuantizedScorerActor,
    compute_score_range,
    quantized_score_all,
)
from ciff_ray.synth import generate_transcripts

QUERIES = [
    "the", "time people", "zzzznotaterm", "the of and to in",
    "year", "go go go came", "Life BEING under",
]


@pytest.fixture(scope="module")
def quant_fixture(tmp_path_factory, ray_session):
    tbl = generate_transcripts(n_convs=40, max_turns=8, seed=13, mean_tokens=25)
    out = str(tmp_path_factory.mktemp("qidx"))
    build_index(
        ray.data.from_arrow(tbl).repartition(4),
        out,
        BuildParams(num_partitions=5, heavy_df_frac=0.3, num_salts=2, sample_frac=1.0),
    )
    return out, OracleIndex.build(tbl)


def _brute_contribs(oracle: OracleIndex) -> list[float]:
    out = []
    for t, plist in oracle.postings.items():
        w = oracle.idf(t)
        for doc_id, tf in plist:
            dl = oracle.doclengths[doc_id]
            norm = tf + 0.9 * (1.0 - 0.4 + 0.4 * dl / oracle.avg_doclength)
            out.append(w * tf * (0.9 + 1.0) / norm)
    return out


def _brute_quantized(oracle: OracleIndex, qz: ScoreQuantizer, query: str):
    terms = sorted(
        {t for t in tokenize(query) if oracle.df(t)}, key=lambda s: s.encode()
    )
    sums: dict[int, int] = {}
    for t in terms:
        w = oracle.idf(t)
        for doc_id, tf in oracle.postings[t]:
            dl = oracle.doclengths[doc_id]
            norm = tf + 0.9 * (1.0 - 0.4 + 0.4 * dl / oracle.avg_doclength)
            c = w * tf * (0.9 + 1.0) / norm
            sums[doc_id] = sums.get(doc_id, 0) + qz.quantize(c)
    return sums


def test_range_scan_matches_bruteforce(quant_fixture):
    idx, oracle = quant_fixture
    lo, hi = compute_score_range(idx)
    contribs = [c for c in _brute_contribs(oracle) if c > 0]
    assert lo == pytest.approx(min(contribs), abs=1e-12)
    assert hi == pytest.approx(max(contribs), abs=1e-12)
    assert lo > 0  # floored idf keeps every contribution positive


def test_quantized_score_all_matches_bruteforce(quant_fixture):
    idx, oracle = quant_fixture
    scorer = LocalScorer(idx)
    lo, hi = compute_score_range(idx)
    qz = ScoreQuantizer(min=lo, max=hi)
    for q in QUERIES:
        exp = _brute_quantized(oracle, qz, q)
        u, s = quantized_score_all(scorer, qz, q)
        got = dict(zip(u.tolist(), s.tolist()))
        assert got == exp, q


def test_impacts_are_8bit(quant_fixture):
    """Every per-posting impact lands in [1, 255] (the M6 contract);
    summed impacts are bounded by 255 x |query terms|."""
    idx, oracle = quant_fixture
    scorer = LocalScorer(idx)
    lo, hi = compute_score_range(idx)
    qz = ScoreQuantizer(min=lo, max=hi)
    u, s = quantized_score_all(scorer, qz, "the of and to in")
    n_terms = len({t for t in tokenize("the of and to in") if oracle.df(t)})
    assert s.min() >= 1 and s.max() <= 255 * n_terms


def test_quantized_actor_topk_integer_rank(quant_fixture):
    idx, oracle = quant_fixture
    lo, hi = compute_score_range(idx)
    qz = ScoreQuantizer(min=lo, max=hi)
    actor = _QuantizedScorerActor(idx, lo, hi, TOPK_K)
    batch = pa.table(
        {
            "query_id": pa.array(range(len(QUERIES)), type=pa.int64()),
            "query": pa.array(QUERIES),
        }
    )
    out = actor(batch)
    per_q: dict[int, list[tuple[int, int]]] = {}
    for qid, doc, imp in zip(
        out["query_id"].to_pylist(),
        out["doc_id"].to_pylist(),
        out["impact"].to_pylist(),
    ):
        per_q.setdefault(qid, []).append((doc, imp))
    for qid, q in enumerate(QUERIES):
        exp = sorted(
            _brute_quantized(oracle, qz, q).items(),
            key=lambda kv: (-kv[1], kv[0]),
        )[:TOPK_K]
        assert per_q.get(qid, []) == exp, q


def test_range_scan_filters_tombstones(quant_fixture, tmp_path):
    """Deferred deletes: compute_score_range over a tombstoned index
    must equal the brute-force range over LIVE postings only — the
    same mask quantized_score_all serves through (r4 ADVICE item)."""
    import shutil

    from ciff_ray.lifecycle import delete_docs

    idx, oracle = quant_fixture
    copy = str(tmp_path / "idx")
    shutil.copytree(idx, copy)
    # kill the doc holding the global max contribution plus a spread
    contribs = []
    for t, plist in oracle.postings.items():
        w = oracle.idf(t)
        for doc_id, tf in plist:
            dl = oracle.doclengths[doc_id]
            norm = tf + 0.9 * (1.0 - 0.4 + 0.4 * dl / oracle.avg_doclength)
            contribs.append((w * tf * (0.9 + 1.0) / norm, doc_id))
    top_doc = max(contribs)[1]
    dead = {top_doc, 0, 7}
    delete_docs(copy, sorted(dead))
    lo, hi = compute_score_range(copy)
    live = [c for c, d in contribs if c > 0 and d not in dead]
    assert lo == pytest.approx(min(live), abs=1e-12)
    assert hi == pytest.approx(max(live), abs=1e-12)
    assert hi < max(c for c, _ in contribs)  # the dead max is excluded


def test_quantized_ciff_roundtrip(quant_fixture, tmp_path):
    """Verdict item 8: quantized index -> CIFF (impacts in the tf slot,
    the jsonl2ciff --quantize layout) -> re-import -> IDENTICAL impact
    ranking.  impact_score_all over the re-imported index must equal
    quantized_score_all over the original for every query."""
    import numpy as np

    from ciff_ray.interop.bridge import ciff_to_index
    from ciff_ray.quantized import (
        compute_score_range,
        export_quantized_ciff,
        impact_score_all,
    )

    idx, oracle = quant_fixture
    lo, hi = compute_score_range(idx)
    ciff = str(tmp_path / "quant.ciff")
    header = export_quantized_ciff(idx, ciff, lo, hi)
    assert header.num_docs == oracle.num_docs
    re_idx = str(tmp_path / "reidx")
    ciff_to_index(ciff, re_idx)

    s_orig = LocalScorer(idx)
    s_re = LocalScorer(re_idx)
    qz = ScoreQuantizer(min=lo, max=hi)
    nonempty = 0
    for q in QUERIES:
        u1, s1 = quantized_score_all(s_orig, qz, q)
        u2, s2 = impact_score_all(s_re, q)
        assert np.array_equal(u1, u2), q
        assert np.array_equal(s1, s2), q
        nonempty += u1.size > 0
    assert nonempty >= 5  # the workload actually exercises the path
