"""Round-3 corpus operators: sessionization, decontamination,
repetition signals, mixture sampling (kernel edges + sf0.001 e2e)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_session_kernel_edges():
    """Gap exactly == threshold stays one session, gap+1 breaks; users
    are isolated; per-user session ordinals restart at 1."""
    from ciff_ray.extras.eventjoin import SESSION_GAP_US, _sessions_in_part

    G = SESSION_GAP_US
    group = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
            "ts_us": pa.array([0, G, 2 * G + 1, 2 * G + 2, 5], type=pa.int64()),
            "cents": pa.array([100, 200, 300, 400, 500], type=pa.int64()),
            "part": pa.array([0] * 5, type=pa.int32()),
        }
    )
    rows = {
        (r["user_id"], r["session_id"]): r
        for r in _sessions_in_part(group).to_pylist()
    }
    # user 1: [0, G] one session (gap == G not >), then [2G+1, 2G+2]
    assert rows[(1, 1)]["n_events"] == 2
    assert rows[(1, 1)]["start_us"] == 0 and rows[(1, 1)]["end_us"] == G
    assert rows[(1, 1)]["value_r"] == 3.0
    assert rows[(1, 2)]["n_events"] == 2
    assert rows[(1, 2)]["value_r"] == 7.0
    # user 2 restarts at session 1, no leak from user 1
    assert rows[(2, 1)]["n_events"] == 1
    assert len(rows) == 3


def test_sessionize_covers_all_events(ray_session):
    from ciff_ray.extras.eventjoin import q_sessionize

    got = q_sessionize(SF).to_pandas()
    n_events = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert got["n_events"].sum() == n_events
    assert (got["start_us"] <= got["end_us"]).all()
    # ordinals are dense per user
    for _, sub in got.groupby("user_id"):
        assert sorted(sub["session_id"]) == list(range(1, len(sub) + 1))


def test_decon_stage_known_values(ray_session):
    import ray

    from ciff_ray.extras.dedup import DECON_BENCH_MOD, DeconStage, _shingle_u64

    bench_sh = _shingle_u64(pa.array(["alpha beta gamma"]))
    stage = DeconStage(ray.put(np.sort(bench_sh)))
    batch = pa.table(
        {
            # doc 0 is a benchmark doc (mod 20) -> excluded from output
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma raw",
                    "xx alpha beta gamma yy",  # contains the bench 3-gram
                    "totally unrelated words here",
                ]
            ),
        }
    )
    assert 0 % DECON_BENCH_MOD == 0
    out = stage(batch).to_pylist()
    assert out == [{"doc_id": 1, "n_hits": 1}]


def test_repetition_signals_known_values():
    from ciff_ray.extras.textstats import _rep_signals_batch

    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["a a a a b", "w x y z!"]),
        }
    )
    out = {r["doc_id"]: r for r in _rep_signals_batch(batch).to_pylist()}
    r1 = out[1]
    assert r1["top_tok_frac_r"] == 0.8  # 'a' 4 of 5
    # bigrams: aa aa aa ab -> 4 total, 2 unique -> 0.5
    assert r1["dup_bigram_frac_r"] == 0.5
    # trigrams: aaa aaa aab -> 3 total, 2 unique
    assert r1["dup_trigram_frac_r"] == 1 - 2 / 3
    assert r1["rep_flags"] == 3
    r2 = out[2]
    assert r2["top_tok_frac_r"] == 0.25
    assert r2["dup_bigram_frac_r"] == 0.0
    assert r2["symbol_ratio_r"] == 1 / 8  # the '!' of 8 chars
    assert r2["rep_flags"] == 0


def test_source_mixture_matches_direct_numpy(ray_session):
    from ciff_ray.extras import sampling

    got = sampling.q_source_mixture(SF).to_pandas().set_index("source")
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    did = np.array(t["doc_id"].to_pylist(), dtype=np.int64)
    src = np.array(t["source"].to_pylist())
    for s in np.unique(src):
        num = int(s[3:])
        rate = 25 * (1 + num % 4)
        ids = did[src == s]
        kept = (
            ((ids % 100) * np.int64(sampling.MIX_HASH_MULT % 100)) % 100 < rate
        ).sum()
        assert got.loc[s, "rate_pct"] == rate
        assert got.loc[s, "n_total"] == ids.size
        assert got.loc[s, "n_kept"] == kept
    # the row-level sample applies the same mask
    rows = sampling.sample_documents(SF).to_pandas()
    assert len(rows) == int(got["n_kept"].sum())


def test_pack_sequences_matches_serial_cumsum(ray_session):
    """Distributed range-prefix packing == a single-process exclusive
    cumsum over docID order; bins are contiguous and budget-aligned."""
    from ciff_ray.extras import sampling
    from ciff_ray.extras.textstats import _per_row_nonempty_counts
    from ciff_ray.tokenizer import tokenize_column

    got = (
        sampling.q_pack_sequences(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    order = np.argsort(np.array(t["doc_id"].to_pylist()))
    ntok = _per_row_nonempty_counts(tokenize_column(t["text"]), len(t))[order]
    prev = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    exp_bin = prev // sampling.PACK_BUDGET
    assert got["ntok"].to_numpy().tolist() == ntok.tolist()
    assert got["bin_id"].to_numpy().tolist() == exp_bin.tolist()
    # bins are monotone in docID and no bin exceeds budget by more than
    # one straddling document
    b = got["bin_id"].to_numpy()
    assert (np.diff(b) >= 0).all()


def test_pack_sequences_crosses_range_boundary(ray_session):
    """Docs straddling the 2^20 range boundary get globally-correct
    prefix sums (the driver-broadcast range offsets)."""
    import ray.data
    from ciff_ray.extras import sampling

    # patch a tiny range so multiple ranges exist at test scale
    old_bits = sampling.PACK_RANGE_BITS
    sampling.PACK_RANGE_BITS = 5  # ranges of 32 docs
    try:
        got = (
            sampling.q_pack_sequences(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        prev = np.concatenate([[0], np.cumsum(got["ntok"].to_numpy())[:-1]])
        assert (
            got["bin_id"].to_numpy() == prev // sampling.PACK_BUDGET
        ).all()
    finally:
        sampling.PACK_RANGE_BITS = old_bits


def test_pii_scan_counts(ray_session, tmp_path):
    from ciff_ray.extras.textstats import _pii_batch

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                [
                    "reach me at a.b@example.com or c@d.org via https://x.io/z",
                    "call 5551234567 now; backup 123456",
                    "clean text with short 123 numbers only",
                ]
            ),
        }
    )
    out = {r["doc_id"]: r for r in _pii_batch(batch).to_pylist()}
    assert out[0]["n_email"] == 2 and out[0]["n_url"] == 1
    assert out[0]["has_pii"] is True
    assert out[1]["n_digitrun"] == 2 and out[1]["n_email"] == 0
    assert out[2]["has_pii"] is False


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pushdown
# ---------------------------------------------------------------------------


def test_bloom_kernel_no_false_negatives():
    """Membership guarantee: every inserted key probes true; FP rate on
    disjoint keys stays near the 16-bits/key design point (~7e-4)."""
    from ciff_ray.extras.bloomjoin import bloom_build, bloom_probe

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**62, size=20_000, dtype=np.int64)
    others = rng.integers(0, 2**62, size=200_000, dtype=np.int64)
    others = np.setdiff1d(others, keys)
    m_bits = 1 << 19  # ~26 bits/key here
    words = bloom_build(keys, m_bits)
    assert bloom_probe(keys, words).all()
    fp = bloom_probe(others, words).mean()
    assert fp < 2e-3, fp
    # empty filter rejects everything; empty probe returns empty
    empty = bloom_build(np.array([], dtype=np.int64), m_bits)
    assert not bloom_probe(others[:100], empty).any()
    assert bloom_probe(np.array([], dtype=np.int64), words).size == 0


def test_bloom_semijoin_scan_reduction(ray_session):
    """The probe must never drop a true match (exactness depends on it)
    and the candidate stream must track the true selectivity — the scan
    reduction the pushdown exists for."""
    from ciff_ray.extras.bloomjoin import semijoin_scan_stats

    s = semijoin_scan_stats(SF)
    assert s["missed"] == 0
    assert s["n_true"] <= s["n_candidates"] <= s["n_fact"]
    # false positives add < 1% of the fact table on top of true matches
    assert s["fp_rows"] < 0.01 * s["n_fact"], s
    # and the candidate stream is a real reduction (selectivity ~20%)
    assert s["n_candidates"] < 0.35 * s["n_fact"], s


def test_bloom_semijoin_matches_duckdb(ray_session):
    import duckdb

    from ciff_ray.extras.bloomjoin import ORACLE_SQLS, q_semijoin_bloom

    got = (
        q_semijoin_bloom(SF)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    exp = (
        con.execute(ORACLE_SQLS["semijoin_bloom"])
        .df()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


# ---------------------------------------------------------------------------
# Sliding-window chunking
# ---------------------------------------------------------------------------


def test_chunk_kernel_vs_bruteforce():
    import re

    from ciff_ray.extras.chunking import CHUNK_STRIDE as S
    from ciff_ray.extras.chunking import CHUNK_TOKENS as C
    from ciff_ray.extras.chunking import chunk_batch

    texts = [
        "Hello, World! one two THREE.",
        " ".join(f"w{i}" for i in range(C)),       # exactly one window
        " ".join(f"t{i}" for i in range(C + 1)),   # one token over -> 2
        " ".join(f"x{i}" for i in range(200)),     # several windows
        "!!! ???",                                  # normalizes to empty
        "single",
        " ".join(f"y{i}" for i in range(C + S)),   # boundary: exact stride
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts),
        }
    )
    got = (
        chunk_batch(batch)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    rows = []
    for did, t in zip(range(1, len(texts) + 1), texts):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        n = len(toks)
        if n == 0:
            continue
        last = 0 if n <= C else int(np.ceil((n - C) / S))
        for k in range(last + 1):
            seg = toks[k * S : min(k * S + C, n)]
            rows.append((did, k, len(seg), " ".join(seg)))
    exp = pd.DataFrame(rows, columns=list(got.columns))
    pd.testing.assert_frame_equal(got, exp)
    # overlap property: consecutive windows share C - S tokens
    full = got[got.doc_id == 4].chunk_text.tolist()
    a, b = full[0].split(), full[1].split()
    assert a[S:] == b[: C - S]
    # empty normalization emits nothing, schema preserved
    empty = chunk_batch(batch.slice(4, 1))
    assert empty.num_rows == 0 and empty.schema.names == list(got.columns)


def test_chunk_docs_pipeline(ray_session):
    from ciff_ray.extras.chunking import CHUNK_TOKENS, q_chunk_docs

    out = q_chunk_docs(SF).to_pandas()
    assert len(out) > 0
    assert (out.n_tokens >= 1).all() and (out.n_tokens <= CHUNK_TOKENS).all()
    # every chunk's text has exactly n_tokens whitespace tokens
    assert (out.chunk_text.str.split().str.len() == out.n_tokens).all()


def test_bloom_sizing_single_pass_estimate(ray_session):
    """The sizing estimate must land within the design band (no full
    counting pre-scan): actual filtered keys get >= half the design
    bits/key from the first build pass on the driver corpus."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ciff_ray.extras.bloomjoin import (
        BLOOM_BITS_PER_KEY,
        SEMI_PRIORITY,
        _estimate_filtered_keys,
    )

    path = "/root/testdata/sf0.01/orders.parquet"
    est = _estimate_filtered_keys(path)
    actual = pc.sum(
        pc.equal(pq.read_table(path, columns=["o_orderpriority"])[
            "o_orderpriority"
        ], SEMI_PRIORITY)
    ).as_py()
    assert est >= actual  # 2x safety factor covers row-group variance
    assert est <= actual * 8  # and does not blow the broadcast budget
