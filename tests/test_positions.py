"""Positional store: extraction kernel + index-only phrase semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ciff_ray.positions import (
    PositionStore,
    _position_partials,
    build_positions,
)


def test_position_partials_kernel():
    batch = pa.table(
        {
            "doc_id": pa.array([7, 9], type=pa.int64()),
            "text": pa.array(
                ["The cat, the hat!", "  hat hat  "], type=pa.string()
            ),
        }
    )
    out = _position_partials(batch)
    rows = {
        (r["term"], r["doc_id"]): r["positions"] for r in out.to_pylist()
    }
    # doc 7 filtered tokens: the(0) cat(1) the(2) hat(3)
    assert rows[("the", 7)] == [0, 2]
    assert rows[("cat", 7)] == [1]
    assert rows[("hat", 7)] == [3]
    # doc 9: leading/trailing separators drop as empty tokens
    assert rows[("hat", 9)] == [0, 1]
    # partition ids in range and stable
    parts = out["part"].to_pylist()
    assert all(0 <= p < 32 for p in parts)


def test_phrase_docs_adjacency(ray_session, tmp_path):
    texts = [
        "the cat sat",          # 0: "the cat" matches
        "the, cat",             # 1: separator run still adjacent
        "the big cat",          # 2: NOT adjacent
        "cat the",              # 3: wrong order
        "the the the",          # 4: overlapping duplicate phrase
        "xthe cat",             # 5: token boundary respected
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    root = str(tmp_path / "pos")
    build_positions(ray.data.from_arrow(docs).repartition(2), root)
    store = PositionStore(root)
    cand = np.arange(len(texts), dtype=np.int64)
    assert store.phrase_docs(["the", "cat"], cand).tolist() == [0, 1]
    assert store.phrase_docs(["the", "the"], cand).tolist() == [4]
    assert store.phrase_docs(["the", "the", "the"], cand).tolist() == [4]
    assert store.phrase_docs(["cat", "sat"], cand).tolist() == [0]
    assert store.phrase_docs(["sat", "cat"], cand).tolist() == []
    # candidate mask is honored (doc 1 excluded)
    assert store.phrase_docs(
        ["the", "cat"], np.array([0, 2, 5], dtype=np.int64)
    ).tolist() == [0]


def test_positional_matches_regex_e2e(ray_session):
    """Index-only phrase match == the text-regex path on real data."""
    from ciff_ray.pipelines import q_phrase_match
    from ciff_ray.positions import q_phrase_match_positional

    sf = "/root/testdata/sf0.001"
    a = (
        q_phrase_match_positional(sf)
        .to_pandas()
        .sort_values(["query_id", "doc_id"], ignore_index=True)
    )
    b = (
        q_phrase_match(sf)
        .to_pandas()
        .sort_values(["query_id", "doc_id"], ignore_index=True)
    )
    assert a.equals(b)


def test_min_dist_kernel():
    from ciff_ray.positions import _min_dist_per_doc

    def keys(pairs):  # (doc, pos) -> sorted uint64 keys
        return np.sort(
            np.array(
                [(d << 32) | p for d, p in pairs], dtype=np.uint64
            )
        )

    k1 = keys([(1, 5), (1, 20), (2, 0), (4, 7)])
    k2 = keys([(1, 8), (1, 19), (3, 2), (4, 7)])
    docs, mins = _min_dist_per_doc(k1, k2)
    assert docs.tolist() == [1, 4]
    assert mins.tolist() == [1, 0]  # doc1: |20-19|=1; doc4: same pos
    # empty sides
    d, m = _min_dist_per_doc(k1, np.empty(0, np.uint64))
    assert d.size == 0 and m.size == 0


def test_proximity_matches_bruteforce(ray_session):
    from ciff_ray.oracle import tokenize
    from ciff_ray.positions import (
        PROX_PAIRS,
        PROX_WINDOW,
        q_proximity_pairs,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        q_proximity_pairs(sf)
        .to_pandas()
        .sort_values(["query_id", "doc_id"], ignore_index=True)
    )
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    exp_rows = []
    for qid, (ta, tb) in enumerate(PROX_PAIRS):
        for d, text in zip(
            docs["doc_id"].to_pylist(), docs["text"].to_pylist()
        ):
            toks = tokenize(text)
            pa_pos = [i for i, t in enumerate(toks) if t == ta]
            pb_pos = [i for i, t in enumerate(toks) if t == tb]
            if not pa_pos or not pb_pos:
                continue
            m = min(abs(i - j) for i in pa_pos for j in pb_pos)
            if m <= PROX_WINDOW:
                exp_rows.append((qid, d, m))
    assert (
        list(map(tuple, got[["query_id", "doc_id", "min_dist"]].values))
        == exp_rows
    )


def test_bm25_proximity_matches_bruteforce_rescore(ray_session):
    """q_bm25_proximity == pure-Python rescore of the BM25 pool (pool by
    the engine's rounded key, beta/min_dist per adjacent pair from raw
    text positions), and the boost genuinely reorders at least one
    query vs plain BM25 — the entry must not be vacuously bm25_topk."""
    from ciff_ray.oracle import tokenize
    from ciff_ray.pipelines import TOPK_K, ensure_index
    from ciff_ray.positions import (
        PROX_BETA,
        PROX_POOL,
        PROX_WINDOW,
        PROXIMITY_QUERY_SET,
        adjacent_pairs,
        q_bm25_proximity,
    )
    from ciff_ray.query import LocalScorer

    sf = "/root/testdata/sf0.001"
    got = (
        q_bm25_proximity(sf)
        .to_pandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    # internal docid == documents.doc_id and turn text == document text
    # (synth.transcripts_from_documents is a deterministic reshape)
    docs_tbl = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    )
    text_by_doc = dict(
        zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist())
    )
    scorer = LocalScorer(ensure_index(sf))
    reordered = 0
    for qid, q in enumerate(PROXIMITY_QUERY_SET):
        docs, scores = scorer.topk(q, PROX_POOL)
        final = scores.astype(np.float64).copy()
        for i, d in enumerate(docs):
            toks = tokenize(text_by_doc[int(d)])
            for ta, tb in adjacent_pairs(q):
                pa_pos = [j for j, t in enumerate(toks) if t == ta]
                pb_pos = [j for j, t in enumerate(toks) if t == tb]
                if not pa_pos or not pb_pos:
                    continue
                m = min(abs(x - y) for x in pa_pos for y in pb_pos)
                if m <= PROX_WINDOW:
                    final[i] += PROX_BETA / m
        ed, _ = LocalScorer._rank(docs, final, TOPK_K)
        sub = got[got.query_id == qid]
        assert sub.doc_id.tolist() == ed.tolist(), q
        bd, _ = LocalScorer._rank(docs, scores, TOPK_K)
        reordered += bd.tolist() != ed.tolist()
    assert reordered >= 1  # the boost changes at least one ranking


def test_span_workload_no_driver_postings_decode(ray_session):
    """Round-4 verdict item 5's done-criterion: a workload-sized span
    run (>=10^3 queries) completes WITHOUT the driver decoding a single
    posting slice — candidate conjunction happens inside the verify
    actors (worker processes), pinned by query.DECODE_DIAG."""
    import itertools

    from ciff_ray import query as qmod
    from ciff_ray.positions import span_near_ds

    pool = [
        "the", "key", "merge", "join", "sort", "order", "table", "fast",
        "batch", "window", "stream", "filter", "customer", "index",
        "people", "time", "year", "go", "came", "life",
    ]
    pairs = list(itertools.permutations(pool, 2))
    qset = [
        ([a, b], 1 + (i % 10)) for i, (a, b) in enumerate(pairs)
    ][:1024]
    while len(qset) < 1024:
        qset.extend(qset[: 1024 - len(qset)])
    assert len(qset) >= 1024

    before = qmod.DECODE_DIAG["slices"]
    total = 0
    for t in span_near_ds("/root/testdata/sf0.001", qset).iter_batches(
        batch_format="pyarrow"
    ):
        total += t.num_rows
    after = qmod.DECODE_DIAG["slices"]
    assert total > 0  # the workload actually matched docs
    assert after == before, "driver process decoded posting slices"
