"""Dedup extras: planted near-dup recovery, simhash locality, keyed
dedup semantics (sf0.001 testdata)."""

from __future__ import annotations

import itertools
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from ciff_ray.extras import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_texts():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _shingles(s: str) -> set[tuple[str, str, str]]:
    w = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
    return set(zip(w, w[1:], w[2:]))


def brute_force_pairs(doc_texts, tau, df_cap=None):
    sh = {i: _shingles(t) for i, t in doc_texts.items()}
    if df_cap is not None:
        from collections import Counter

        df = Counter(s for S in sh.values() for s in S)
        sh = {i: {s for s in S if df[s] < df_cap} for i, S in sh.items()}
    out = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        A, B = sh[a], sh[b]
        if not A or not B:
            continue
        inter = len(A & B)
        if inter and inter / (len(A) + len(B) - inter) >= tau:
            out.add((a, b))
    return out


def test_minhash_equals_brute_force(ray_session, doc_texts):
    """LSH + distributed exact verify must equal exhaustive pairwise
    Jaccard."""
    got = dedup.q_dedup_minhash(SF).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    exp = brute_force_pairs(doc_texts, dedup.JACCARD_TAU)
    assert got_pairs == exp
    assert len(exp) > 0  # the corpus has planted near-dups


def test_ngram_jaccard_equals_brute_force(ray_session, doc_texts):
    """The inverted-index self-join path (no LSH, df-capped universe)
    must equal brute force over the same capped universe, including
    the Jaccard values."""
    cap = dedup.NGRAM_DF_CAP
    got = dedup.q_dedup_ngram_jaccard(SF).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    exp = brute_force_pairs(doc_texts, dedup.JACCARD_TAU, df_cap=cap)
    assert got_pairs == exp
    # values match the definitionally-exact capped jaccard
    from collections import Counter

    sh = {i: _shingles(t) for i, t in doc_texts.items()}
    df = Counter(s for S in sh.values() for s in S)
    sh = {i: {s for s in S if df[s] < cap} for i, S in sh.items()}
    for _, r in got.iterrows():
        A, B = sh[r["a"]], sh[r["b"]]
        inter = len(A & B)
        assert r["j_r"] == inter / (len(A) + len(B) - inter)


def test_ngram_df_cap_kills_quadratic_skew():
    """A stopword-scale shingle shared by 10k docs must emit ZERO pairs
    from that shingle (df >= cap) and finish without the k^2/2 blowup —
    unit-level on the partition kernel."""
    import time

    import pyarrow as pa

    n = 10_000
    # every doc holds the same hot shingle hash plus one unique hash
    h = np.concatenate(
        [np.full(n, 42, dtype=np.int64), np.arange(1000, 1000 + n)]
    )
    d = np.concatenate([np.arange(n), np.arange(n)]).astype(np.int64)
    group = pa.table(
        {
            "h": pa.array(h, type=pa.int64()),
            "doc_id": pa.array(d, type=pa.int64()),
            "part": pa.array(np.zeros(2 * n, dtype=np.int32)),
        }
    )
    # best-of-3 under a loose cap: a skew-bomb regression is orders of
    # magnitude slower, while a loaded box only doubles the constant
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = dedup._pairs_in_part(group)
        dt = min(dt, time.perf_counter() - t0)
    assert dt < 2.0
    a = np.array(out["a"].to_pylist())
    b = np.array(out["b"].to_pylist())
    i = np.array(out["i"].to_pylist())
    # no real pairs survive; sizes count only the surviving (unique) shingle
    assert (a == b).all()
    assert len(a) == n
    assert (i == 1).all()
    # uncapped, the same kernel DOES emit the quadratic pair set
    out2 = dedup._pairs_in_part(group.slice(0, 8), df_cap=1 << 30)
    a2 = np.array(out2["a"].to_pylist())
    b2 = np.array(out2["b"].to_pylist())
    assert ((a2 < b2).sum()) == 28  # 8 docs sharing h=42 -> C(8,2) pairs


def test_broadcast_refs_tolerate_zero_column_blocks(ray_session):
    """Ray 2.49 can propagate zero-column empty blocks from
    filter-pruned read fragments into materialized block lists without
    running the UDF; the broadcast consumers must skip them (the
    dedup_minhash num_cpus=32 regression)."""
    import pyarrow as pa
    import ray

    good = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "hashes": pa.array(
                [[10, 20, 30], [10, 20, 40]],
                type=pa.large_list(pa.int64()),
            ),
        }
    )
    schemaless = pa.table({})  # what a pruned fragment block looks like
    refs = [ray.put(schemaless), ray.put(good)]
    jv = dedup.JaccardVerify(refs, tau=0.5)
    pairs = pa.table(
        {"a": pa.array([1], type=pa.int64()), "b": pa.array([2], type=pa.int64())}
    )
    out = jv(pairs)
    assert out["a"].to_pylist() == [1]
    assert out["j_r"].to_pylist() == [0.5]

    sizes = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "n": pa.array([3, 3], type=pa.int64()),
        }
    )
    nf = dedup.NgramFinalize([ray.put(schemaless), ray.put(sizes)], tau=0.5)
    out2 = nf(
        pa.table(
            {
                "a": pa.array([1], type=pa.int64()),
                "b": pa.array([2], type=pa.int64()),
                "i": pa.array([2], type=pa.int64()),
            }
        )
    )
    assert out2["a"].to_pylist() == [1]


def test_minhash_at_driver_parallelism():
    """End-to-end q_dedup_minhash in a FRESH Ray at num_cpus=32 — the
    configuration where the zero-column-block race reproduced (green at
    4 cpus, ActorDiedError at 32 before the guard)."""
    import subprocess
    import sys

    code = """
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ciff_ray.extras import dedup
got = dedup.q_dedup_minhash("/root/testdata/sf0.001").to_pandas()
assert len(got) > 0
print("PAIRS", len(got))
ray.shutdown()
"""
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "PAIRS" in r.stdout


def test_simhash_locality(ray_session, doc_texts):
    sig = {
        r["doc_id"]: int(r["simhash"]) & 0xFFFFFFFFFFFFFFFF
        for r in dedup.q_dedup_simhash(SF).take_all()
    }
    near = brute_force_pairs(doc_texts, 0.9)
    assert near

    def hamming(a, b):
        return bin(int(a) ^ int(b)).count("1")

    near_d = [hamming(sig[a], sig[b]) for a, b in near]
    rng = np.random.default_rng(0)
    ids = sorted(sig)
    rand_d = []
    near_set = set(near)
    while len(rand_d) < 200:
        a, b = rng.choice(len(ids), 2, replace=False)
        p = (ids[min(a, b)], ids[max(a, b)])
        if p not in near_set:
            rand_d.append(hamming(sig[p[0]], sig[p[1]]))
    assert max(near_d) <= 12
    assert np.mean(rand_d) > 16


def test_simhash_deterministic_known_value():
    import pyarrow as pa

    batch = pa.table(
        {"doc_id": pa.array([7], type=pa.int64()), "text": pa.array(["a b a"])}
    )
    out1 = dedup.simhash_batch(batch)
    out2 = dedup.simhash_batch(batch)
    assert out1["simhash"].to_pylist() == out2["simhash"].to_pylist()
    # tf weights matter: "a a b" == "a b a" (bag semantics)
    batch2 = pa.table(
        {"doc_id": pa.array([7], type=pa.int64()), "text": pa.array(["a a b"])}
    )
    assert (
        dedup.simhash_batch(batch2)["simhash"].to_pylist()
        == out1["simhash"].to_pylist()
    )


def test_keyed_dedup_collapses_near_dups(ray_session, doc_texts):
    exact = dedup.q_dedup_exact(SF).to_pandas()
    keyed = dedup.q_dedup_by_key(SF).to_pandas()
    assert exact["n_dups"].sum() == len(doc_texts)
    assert keyed["n_dups"].sum() == len(doc_texts)
    # prefix-keyed dedup merges the planted near-dups; exact does not
    assert len(keyed) < len(exact)
    assert (keyed["n_dups"] > 1).any()


def test_embedding_pairs_match_numpy(ray_session):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist())
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    E = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = E @ E.T
    iu = np.triu_indices(len(ids), k=1)
    mask = S[iu] >= dedup.COSINE_TAU
    exp = set(zip(ids[iu[0][mask]].tolist(), ids[iu[1][mask]].tolist()))
    got = dedup.q_dedup_embedding(SF).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs == exp
    # multi-block sweep (forces cross-block cells) finds the same pairs
    small = dedup.q_dedup_embedding(SF, block_rows=60).to_pandas()
    assert set(zip(small["a"], small["b"])) == exp


def test_embedding_ann_recall_and_subquadratic(ray_session):
    """ANN-candidate near-dup: (1) output is a SUBSET of the exact
    pairs (verification is exact), (2) recall >= 0.9 on the isotropic
    worst case, (3) the scanned-candidate fraction FALLS as N grows
    with K ~ sqrt(N) — the sub-quadratic claim, pinned by deterministic
    pair accounting, not wall-clock."""
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist())
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = En @ En.T
    iu = np.triu_indices(len(ids), k=1)
    mask = S[iu] >= dedup.COSINE_TAU
    exact = set(zip(ids[iu[0][mask]].tolist(), ids[iu[1][mask]].tolist()))

    got = dedup.q_dedup_embedding_ann(SF).to_pandas()
    ann = set(zip(got["a"], got["b"]))
    assert ann <= exact  # no false positives: candidates are exact-verified
    assert len(ann) / len(exact) >= 0.9

    s_small = dedup.embedding_ann_scan_stats("/root/testdata/sf0.001")
    s_big = dedup.embedding_ann_scan_stats("/root/testdata/sf0.1")
    frac_small = s_small["scanned_pairs"] / s_small["exact_pairs"]
    frac_big = s_big["scanned_pairs"] / s_big["exact_pairs"]
    assert s_big["n"] > s_small["n"]
    assert s_big["k"] > s_small["k"]
    assert frac_big < frac_small  # scanned share shrinks with N
    assert frac_big < 0.75  # strictly below the exact sweep at N=2000


def test_dedup_incremental_matches_oracle(ray_session):
    """Ingest-time dedup (new batch vs corpus) vs the DuckDB oracle,
    plus the fan-out edge: duplicate new-batch contents must BOTH be
    reported (exercised via the stage kernel directly)."""
    import duckdb
    import pandas as pd

    from ciff_ray.extras.dedup import ORACLE_SQLS, q_dedup_incremental

    res = q_dedup_incremental(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    ora = con.execute(ORACLE_SQLS["dedup_incremental"]).df()
    canon = lambda df: df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )
    pd.testing.assert_frame_equal(canon(res), canon(ora), check_dtype=False)


def test_incr_stage_duplicate_new_keys(ray_session):
    """Two new docs with identical keys must both match a corpus hit,
    and per-batch partial mins must reduce globally."""
    import pyarrow as pa
    import ray

    from ciff_ray.extras.dedup import (
        INCR_BATCH_MOD,
        INCR_BATCH_REM,
        IncrDedupStage,
        _content_key,
    )

    text = "identical content here for the incremental dedup test"
    new_ids = np.array(
        [INCR_BATCH_REM, INCR_BATCH_MOD + INCR_BATCH_REM], dtype=np.int64
    )
    kt = pa.table({"doc_id": pa.array(new_ids), "text": pa.array([text, text])})
    keys = _content_key(kt)
    uniq = keys[:1]
    offsets = np.array([0, 2], dtype=np.int64)
    ref = ray.put((uniq, offsets, new_ids))
    stage = IncrDedupStage(ref)
    corpus = pa.table(
        {
            "doc_id": pa.array([4, 6], type=pa.int64()),
            "text": pa.array([text, text]),
        }
    )
    out = stage(corpus).to_pandas()
    # both new docs matched; per-batch min corpus id is 4
    assert sorted(out["new_doc_id"].tolist()) == new_ids.tolist()
    assert set(out["dup_of"]) == {4}


def test_substring_coverage_matches_oracle(ray_session):
    import duckdb
    import pandas as pd

    from ciff_ray.extras.dedup import ORACLE_SQLS, q_dup_substring_coverage

    res = q_dup_substring_coverage(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    ora = con.execute(ORACLE_SQLS["dup_substring_coverage"]).df()
    canon = lambda df: df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )
    pd.testing.assert_frame_equal(canon(res), canon(ora), check_dtype=False)
    # planted duplicates drive nonzero coverage somewhere
    assert (res["n_repeated"] > 0).any()


def test_window_hash_kernel_boundaries(ray_session):
    """Windows never cross document boundaries; per-doc window count
    equals len(norm) - L + 1 for clean docs."""
    import pyarrow as pa

    from ciff_ray.extras.dedup import SUBSTR_L, _window_hashes

    a = "a" * (SUBSTR_L + 5)  # 6 windows (all identical -> 1 unique)
    b = "b" * (SUBSTR_L - 1)  # too short -> 0 windows
    c = "xy" * SUBSTR_L  # 2L chars -> L+1 windows
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array([a, b, c]),
        }
    )
    h, parents = _window_hashes(batch)
    import numpy as np

    counts = np.bincount(parents, minlength=3)
    assert counts.tolist() == [6, 0, SUBSTR_L + 1]
    # all 6 windows of doc 0 are the same string -> same hash
    assert np.unique(h[parents == 0]).size == 1


def test_dedup_embedding_exact_scale_guard(ray_session, monkeypatch):
    """The exact Theta(N^2) entry must refuse to run past the row
    guard (pointing at the ANN path) unless forced."""
    import pytest as _pytest

    import ciff_ray.extras.dedup as dd

    monkeypatch.setattr(dd, "EMB_EXACT_MAX_ROWS", 10)  # testdata exceeds
    with _pytest.raises(ValueError, match="dedup_embedding_ann"):
        dd.q_dedup_embedding("/root/testdata/sf0.001")
    # force=True overrides and still runs the real sweep
    out = dd.q_dedup_embedding("/root/testdata/sf0.001", force=True)
    assert out.count() >= 0
