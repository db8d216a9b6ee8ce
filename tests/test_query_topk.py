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


def test_bmw_identical_to_exact(engine_and_oracle):
    """Block-max WAND pruning must stay score-identical to exhaustive
    scoring (it falls back to exact whenever pruning can't be proven)."""
    engine, oracle = engine_and_oracle
    for q in QUERIES:
        for k in (1, 3, 10, 50):
            d1, s1 = engine.topk(q, k=k, mode="exact")
            d2, s2 = engine.topk(q, k=k, mode="bmw")
            assert d1.tolist() == d2.tolist(), (q, k)
            assert s1.tolist() == s2.tolist(), (q, k)


def test_bmw_engages_and_prunes(tmp_path):
    """On data with tf variance the block-max sweep must actually prune
    (not fall back) and still match exhaustive scoring: a hot docID
    region with tf=6 sets a threshold the tf=1 blocks cannot reach."""
    n = 6000
    hot = range(3000, 3050)
    texts = [
        "aaa aaa aaa aaa aaa aaa bbb bbb bbb bbb bbb bbb" if i in hot
        else "aaa bbb"
        for i in range(n)
    ]
    tbl = pa.table(
        {
            "conv_id": pa.array([f"conv-{i:07d}" for i in range(n)]),
            "turn_idx": pa.array([0] * n, type=pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(texts),
            "tool": pa.array([""] * n),
            "ts": pa.array([0] * n, type=pa.timestamp("us")),
        }
    )
    out = str(tmp_path / "bmwidx")
    build_index(
        ray.data.from_arrow(tbl).repartition(3),
        out,
        BuildParams(num_partitions=4, heavy_df_frac=0.0),
    )
    scorer = LocalScorer(out)
    r = scorer._topk_bmw("aaa bbb", 10)
    assert r is not None, "block-max pruning should engage on skewed tf"
    d_exact, s_exact = scorer.topk("aaa bbb", k=10, mode="exact")
    assert r[0].tolist() == d_exact.tolist()
    assert r[1].tolist() == s_exact.tolist()
    assert set(d_exact.tolist()) <= set(hot)


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


def test_serving_pool_matches_local(ray_session, engine_and_oracle):
    """Persistent serving fleet: results identical to the local scorer;
    actors survive across calls (steady-state path)."""
    from ciff_ray.query import ServingPool

    eng, _ = engine_and_oracle
    idx = eng.index_dir
    queries = ["the time people", "world still own", "zzznotaterm", "year"]
    pool = ServingPool(idx, n_actors=2)
    try:
        got = pool.topk_table(queries, k=5, chunk=2)
        exp = eng.topk_table(queries, k=5)
        assert got.sort_by([("query_id", "ascending"), ("rank", "ascending")]).equals(
            exp.sort_by([("query_id", "ascending"), ("rank", "ascending")])
        )
        # second call reuses the SAME actors (caches warm, no rebuild)
        actors_before = list(pool._actors)
        got2 = pool.topk_table(queries, k=5, chunk=2)
        assert pool._actors == actors_before
        assert got2.equals(got)
    finally:
        pool.close()


def test_filtered_topk_matches_filtered_oracle(engine_and_oracle):
    """Metadata-filtered retrieval (doc predicate pushed into the
    scorer): results equal filter-then-rank over the oracle's
    collection-stat scores, and every pruning mode honors the filter
    with bit-identical scores."""
    import numpy as np

    eng, oracle = engine_and_oracle

    def keep_odd(docs):
        return docs % 2 == 1

    feng = QueryEngine(eng.index_dir, doc_filter=keep_odd)
    for q in QUERIES:
        scores = oracle.bm25_scores(q)
        exp = sorted(
            ((d, s) for d, s in scores.items() if d % 2 == 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:10]
        d1, s1 = feng.topk(q, k=10, mode="exact")
        assert d1.tolist() == [d for d, _ in exp], q
        assert s1.tolist() == [s for _, s in exp], q  # bit-identical f64
        assert (np.asarray(d1) % 2 == 1).all()
        for mode in ("maxscore", "bmw"):
            dm, sm = feng.topk(q, k=10, mode=mode)
            assert dm.tolist() == d1.tolist(), (q, mode)
            assert sm.tolist() == s1.tolist(), (q, mode)
    # the unfiltered engine is untouched (separate scorer state)
    du, _ = eng.topk("the", k=10)
    assert (np.asarray(du) % 2 == 0).any()


def test_boosted_topk_matches_weighted_oracle(engine_and_oracle):
    """Per-term boosts fold into the idf weight; results must equal a
    brute-force weighted BM25, and boosting must actually reorder at
    least one query (not a vacuous feature)."""
    import math

    from ciff_ray.oracle import (
        B_DEFAULT,
        EPS_IDF,
        K1_DEFAULT,
        tokenize,
    )

    engine, oracle = engine_and_oracle
    changed = False
    for q in QUERIES:
        toks = tokenize(q)
        boosts = {toks[-1]: 3.0} if toks else {}
        terms = sorted(set(toks), key=lambda s: s.encode())
        scores: dict[int, float] = {}
        for t in terms:
            plist = oracle.postings.get(t)
            if not plist:
                continue
            df = len(plist)
            w = max(
                math.log((oracle.num_docs - df + 0.5) / (df + 0.5)), EPS_IDF
            ) * boosts.get(t, 1.0)
            for doc_id, tf in plist:
                dl = oracle.doclengths[doc_id]
                norm = tf + K1_DEFAULT * (
                    1.0 - B_DEFAULT + B_DEFAULT * dl / oracle.avg_doclength
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + (
                    w * tf * (K1_DEFAULT + 1.0) / norm
                )
        exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        d, s = engine.topk(q, k=10, boosts=boosts)
        assert d.tolist() == [x for x, _ in exp], q
        assert s.tolist() == [x for _, x in exp], q  # bit-identical f64
        plain, _ = engine.topk(q, k=10)
        if plain.tolist() != d.tolist():
            changed = True
    assert changed


def test_rank_ties_collapse_at_9dp():
    """1-ulp score differences (the DuckDB parallel-SUM jitter scale)
    must NOT affect rank order: _rank keys on round(score, 9) with
    doc_id breaking the resulting ties, so both engines agree however
    the oracle's sum happened to associate."""
    import numpy as np

    from ciff_ray.query import LocalScorer

    scores = np.array([1.0 + 1e-15, 1.0, 0.5])
    docs = np.array([7, 3, 1], dtype=np.int64)
    d, s = LocalScorer._rank(docs, scores, 3)
    assert d.tolist() == [3, 7, 1]  # 9-dp tie -> doc_id asc
    # raw (unrounded) scores ride along in rank order
    assert s[0] == 1.0 and s[1] == 1.0 + 1e-15
    # genuine gaps (>= 1e-9) still rank by score
    d2, _ = LocalScorer._rank(
        np.array([9, 2], dtype=np.int64), np.array([1.0, 1.1]), 2
    )
    assert d2.tolist() == [2, 9]


def test_auto_identical_to_exact(engine_and_oracle):
    """mode="auto" only dispatches between score-identical modes, so
    its results must match exhaustive scoring bit-for-bit."""
    engine, oracle = engine_and_oracle
    for q in QUERIES:
        for k in (1, 3, 10, 50):
            d1, s1 = engine.topk(q, k=k, mode="exact")
            d2, s2 = engine.topk(q, k=k, mode="auto")
            assert d1.tolist() == d2.tolist(), (q, k)
            assert s1.tolist() == s2.tolist(), (q, k)


def test_auto_mode_policy(engine_and_oracle):
    """The cost model: uniform max_scores -> exhaustive (pruning can't
    establish a threshold); one dominant term over long weak lists ->
    pruned path; single indexed term -> pruned path."""
    sc = engine_and_oracle[0]._local
    n = sc.N

    # single indexed term (pruned paths decline <2 terms) -> exact
    some_term = sc.vocabulary()[0]
    assert sc._pick_mode(some_term) == "exact"
    assert sc._pick_mode(f"{some_term} zzzznotindexed") == "exact"

    # fabricated stats through the memo (dfs must stay <= N so the idf
    # the policy now applies is well-defined): uniform -> exact
    mid = max(2, n // 3)
    sc._stat_memo["unia"] = (mid, 2 * mid, 1.7)
    sc._stat_memo["unib"] = (mid, 2 * mid, 1.68)
    sc._stat_memo["unic"] = (mid, 2 * mid, 1.69)
    assert sc._pick_mode("unia unib unic") == "exact"

    # rare high-idf term + stopword-scale weak lists -> bmw: with the
    # idf factor the rare term's bound dwarfs the stopwords' (their raw
    # max_scores alone are near-uniform — the case that mis-classified
    # before the ub fix)
    stop_df = int(n * 0.8)
    sc._stat_memo["rarex"] = (2, 3, 2.0)
    sc._stat_memo["stopy"] = (stop_df, 4 * stop_df, 1.8)
    sc._stat_memo["stopz"] = (stop_df, 3 * stop_df, 1.7)
    assert sc._pick_mode("rarex stopy stopz") == "bmw"

    # no indexed terms at all -> exact fallback
    assert sc._pick_mode("zzz1 zzz2") == "exact"


def test_bitpacked_slices_engage_and_score_identically(tmp_path):
    """An index whose gap/tf shapes favor the bit-packed codec (term
    every ~150 docs -> gaps in varint's 2-byte band; tf cycling 1..10 ->
    4-bit blocks) must actually SELECT it in the segment, keep valid
    block offsets (no -1), and stay score-identical to the oracle in
    every mode including the block-targeted pruned paths."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from ciff_ray.schemas import CODEC_BP, CODEC_BPG

    n = 12_000
    texts = []
    for i in range(n):
        parts = ["common"] * (1 + (i * 7) % 10)  # tf in 1..10
        if i % 150 == 0:
            parts.append("needle")  # df=80, gaps=150 per partition band
        parts.append("filler")
        texts.append(" ".join(parts))
    tbl = pa.table(
        {
            "conv_id": pa.array([f"conv-{i:07d}" for i in range(n)]),
            "turn_idx": pa.array([0] * n, type=pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array(texts),
            "tool": pa.array([""] * n),
            "ts": pa.array([0] * n, type=pa.timestamp("us")),
        }
    )
    out = str(tmp_path / "bpidx")
    build_index(
        ray.data.from_arrow(tbl).repartition(2),
        out,
        BuildParams(num_partitions=2, heavy_df_frac=0.0),
    )
    codec_counts = {0: 0, 1: 0, 2: 0, 3: 0}
    bp_rows = []
    for f in glob.glob(out + "/segments/*.parquet"):
        t = pq.read_table(f)
        for r in range(t.num_rows):
            dc = t["doc_codec"][r].as_py()
            tc = t["tf_codec"][r].as_py()
            codec_counts[dc] += 1
            codec_counts[tc] += 1
            if dc in (CODEC_BP, CODEC_BPG):
                bp_rows.append(np.asarray(t["block_doc_off"][r].as_py()))
            if tc in (CODEC_BP, CODEC_BPG):
                bp_rows.append(np.asarray(t["block_tf_off"][r].as_py()))
    assert codec_counts[CODEC_BPG] > 0, codec_counts  # gap stream packed
    assert codec_counts[CODEC_BP] > 0, codec_counts  # tf stream packed
    for offs in bp_rows:  # block offsets valid (block decode engaged)
        assert (offs >= 0).all() and (np.diff(offs) > 0).all()

    from ciff_ray.oracle import OracleIndex

    eng = QueryEngine(out)
    oracle = OracleIndex.build(tbl)
    for q in ("common", "needle", "common needle", "needle filler zzz"):
        exp = oracle.bm25_topk(q, k=20)
        for mode in ("exact", "maxscore", "bmw", "auto"):
            d, s = eng.topk(q, k=20, mode=mode)
            assert d.tolist() == [x for x, _ in exp], (q, mode)
            assert s.tolist() == [x for _, x in exp], (q, mode)


def test_title_store_loads_only_touched_shards(engine_and_oracle, monkeypatch):
    """Result decoration must be doc-range-sharded like doclengths: with
    tiny shards forced, translating a handful of docids materializes
    exactly the shards they fall in — never the whole docmap."""
    import math

    import numpy as np

    from ciff_ray.query import TitleStore

    engine, oracle = engine_and_oracle
    num_docs = engine.manifest.num_docs
    monkeypatch.setattr(TitleStore, "SHARD_BITS", 4)  # 16-doc shards
    store = TitleStore(
        engine._local.paths.docmap_dir, num_docs
    )
    n_shards = math.ceil(num_docs / 16)
    assert n_shards > 4  # the test corpus really spans many shards
    docs = np.array([0, 1, 17, num_docs - 1], dtype=np.int64)
    titles = store.lookup(docs)
    assert titles == [oracle.collection_docids[d] for d in docs.tolist()]
    touched = len({int(d) >> 4 for d in docs})
    assert store.shard_loads == touched < n_shards
    # cache: a second lookup of the same docs loads nothing new
    assert store.lookup(docs) == titles
    assert store.shard_loads == touched


def test_explain_sums_to_score(engine_and_oracle):
    """explain's per-term contributions sum bit-identically to the
    score score_all assigns the doc, for every query with a hit."""
    engine, _oracle = engine_and_oracle
    for q in QUERIES:
        docs, scores = engine.topk(q, k=1)
        if docs.size == 0:
            continue
        rows = engine.explain(q, int(docs[0]))
        assert rows, q
        assert sum(r["contribution"] for r in rows) == scores[0], q


def test_dense_chunked_topk_matches_oracle(engine_and_oracle, monkeypatch):
    """Force the huge-index dense top-k path (chunked k-th threshold +
    cut, query.py:_topk_dense) on the small fixture: results must stay
    bit-identical to the oracle for every k, including tie boundaries."""
    import ciff_ray.query as qmod

    engine, oracle = engine_and_oracle
    monkeypatch.setattr(qmod, "_DENSE_TOPK_MIN_N", 1)
    monkeypatch.setattr(qmod, "_DENSE_TOPK_CHUNK", 64)  # many chunks
    for q in QUERIES:
        for k in (1, 3, 10, 100):
            exp = oracle.bm25_topk(q, k=k)
            docs, scores = engine.topk(q, k=k, mode="exact")
            assert docs.tolist() == [d for d, _ in exp], (q, k)
            assert scores.tolist() == [s for _, s in exp], (q, k)


def test_dense_cache_lru_eviction(engine_and_oracle):
    """A dense cache too small for the working set must EVICT (not stop
    admitting) and never change scores."""
    engine, oracle = engine_and_oracle
    sc = engine._local
    one_vec = sc.manifest.num_docs * 8
    sc._dense_cache.clear()
    sc._dense_cache_bytes = 0
    sc._dense_cache_cap = one_vec  # room for exactly one vector
    for _ in range(2):
        for q in ["the", "of and", "the of and to in"]:
            exp = oracle.bm25_topk(q, k=10)
            docs, scores = sc.topk(q, k=10, mode="exact")
            assert docs.tolist() == [d for d, _ in exp], q
            assert scores.tolist() == [s for _, s in exp], q
            assert sc._dense_cache_bytes <= sc._dense_cache_cap
            assert len(sc._dense_cache) <= 1


def test_corrupt_gap_fails_fast(engine_and_oracle):
    """A non-positive d-gap (duplicate/descending docID) must die at
    decode — gather_sorted and the sliced shard gathers TRUST ascending
    postings, so silent acceptance would mis-score downstream."""
    import numpy as np

    from ciff_ray import codecs

    engine, _oracle = engine_and_oracle
    sc = engine._local
    gaps = np.array([3, 0, 2], dtype=np.int64)  # zero gap
    row = {
        "df": pa.scalar(4),
        "first_doc": pa.scalar(10),
        "doc_bytes": pa.scalar(
            bytes(codecs.encode(gaps, codecs.CODEC_VARINT)), type=pa.binary()
        ),
        "doc_codec": pa.scalar(codecs.CODEC_VARINT),
        "tf_bytes": pa.scalar(
            bytes(codecs.encode(np.ones(4, dtype=np.int64), codecs.CODEC_VARINT)),
            type=pa.binary(),
        ),
        "tf_codec": pa.scalar(codecs.CODEC_VARINT),
    }
    with pytest.raises(AssertionError, match="non-positive d-gap"):
        sc._decode_slice(row)
