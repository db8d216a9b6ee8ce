"""Round-3 corpus operators: sessionization, decontamination,
repetition signals, mixture sampling (kernel edges + sf0.001 e2e)."""

from __future__ import annotations

import numpy as np
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
    assert r1["dup_trigram_frac_r"] == round(1 - 2 / 3, 6)
    assert r1["rep_flags"] == 3
    r2 = out[2]
    assert r2["top_tok_frac_r"] == 0.25
    assert r2["dup_bigram_frac_r"] == 0.0
    assert r2["symbol_ratio_r"] == round(1 / 8, 6)  # the '!' of 8 chars
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
        kept = ((ids * np.int64(sampling.MIX_HASH_MULT)) % 100 < rate).sum()
        assert got.loc[s, "rate_pct"] == rate
        assert got.loc[s, "n_total"] == ids.size
        assert got.loc[s, "n_kept"] == kept
    # the row-level sample applies the same mask
    rows = sampling.sample_documents(SF).to_pandas()
    assert len(rows) == int(got["n_kept"].sum())
