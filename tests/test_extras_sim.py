"""Similarity-search extras: exact knn vs numpy oracle, IVF recall,
multimodal decode plumbing (sf0.001 testdata)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ciff_ray.extras import multimodal, simsearch

SF = "/root/testdata/sf0.001"


def _numpy_topk():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist())
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    E = E / np.linalg.norm(E, axis=1, keepdims=True)
    out = {}
    for qid in range(simsearch.N_QUERIES):
        q = E[ids == qid][0]
        sims = np.round(E @ q, 9)
        cand = [(s, v) for s, v in zip(sims, ids) if v != qid]
        cand.sort(key=lambda t: (-t[0], t[1]))
        out[qid] = [v for _, v in cand[: simsearch.TOP_K]]
    return out


def test_knn_brute_matches_numpy(ray_session):
    got = simsearch.q_knn_brute(SF).to_pandas()
    exp = _numpy_topk()
    for qid, vids in exp.items():
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert sub["vec_id"].tolist() == vids
        assert sub["rank"].tolist() == list(range(1, len(vids) + 1))


def test_ann_ivf_recall(ray_session):
    exact = _numpy_topk()
    got = simsearch.q_ann_ivf(SF).to_pandas()
    recalls = []
    for qid, vids in exact.items():
        approx = set(got[got["query_id"] == qid]["vec_id"])
        recalls.append(len(approx & set(vids)) / len(vids))
    assert np.mean(recalls) >= 0.75  # trained quantizer, 4/16 probes
    # (measured 0.89; the untrained first-k quantizer gave ~0.55)
    assert got.groupby("query_id")["rank"].is_monotonic_increasing.all()


def test_ivf_store_honors_cache_root(ray_session, tmp_path, monkeypatch):
    """The bucket store must root under CIFF_RAY_CACHE_ROOT (shared
    storage on a cluster) — no hardcoded /tmp — and a rebuild against
    the same root must be a done-marker no-op."""
    import os

    monkeypatch.setenv("CIFF_RAY_CACHE_ROOT", str(tmp_path))
    store = simsearch.build_ivf(f"{SF}/embeddings.parquet")
    assert store.startswith(str(tmp_path))
    assert os.path.exists(os.path.join(store, "_done.json"))
    buckets = [d for d in os.listdir(store) if d.startswith("bucket=")]
    assert buckets
    # deterministic part names: every file is part-<min vec_id>.parquet
    for b in buckets:
        for f in os.listdir(os.path.join(store, b)):
            assert f.startswith("part-") and f.endswith(".parquet")
    before = os.stat(store).st_mtime_ns
    assert simsearch.build_ivf(f"{SF}/embeddings.parquet") == store
    assert os.stat(store).st_mtime_ns == before
    # the full query path works against the redirected root
    got = simsearch.q_ann_ivf(SF).to_pandas()
    assert len(got) > 0


def test_media_pipeline_schema_and_values(ray_session):
    out = multimodal.q_media_features(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp_bytes = {
        r["doc_id"]: len(r["text"].encode())
        for r in docs.to_pylist()
    }
    assert len(out) == len(exp_bytes)
    for _, row in out.head(50).iterrows():
        nb = exp_bytes[row["doc_id"]]
        assert row["n_bytes"] == nb
        assert row["n_frames"] == 1 + nb // multimodal.FRAME_BYTES


def test_media_synthesis_schema():
    batch = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "text": pa.array(["hé"]),  # multi-byte utf-8
            "source": pa.array(["s"]),
        }
    )
    m = multimodal.synthesize_media(batch)
    assert m.schema.equals(multimodal.MEDIA_SCHEMA)
    assert m["media"][0].as_py() == "hé".encode()
    feats = multimodal.FakeDecoder()(m)
    assert feats["n_bytes"][0].as_py() == 3  # bytes, not chars


def test_real_decoder_is_marked_stub():
    with pytest.raises(NotImplementedError):
        multimodal.RealDecoder()


def test_kmeans_matches_numpy(ray_session):
    """Distributed Lloyd's iterations == single-process numpy oracle
    (same deterministic init, same iteration count)."""
    t = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.array(t["vec_id"].to_pylist())
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, E = ids[order], E[order]
    k, iters = simsearch.KMEANS_K, simsearch.KMEANS_ITERS
    C = E[ids < k].copy()
    for _ in range(iters):
        d2 = ((E[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        counts = np.bincount(assign, minlength=k)
        for c in range(k):
            if counts[c]:
                C[c] = E[assign == c].mean(axis=0)

    got = simsearch.q_kmeans(SF)
    got_counts = np.array(got["n"].to_pylist())
    got_C = np.array(got["centroid"].to_pylist())
    assert got_counts.tolist() == counts.tolist()
    assert np.allclose(got_C, C, atol=1e-9)
    assert got_counts.sum() == len(ids)


def test_asof_kernel_edges():
    """As-of forward-fill kernel: equal-ts match, no-ref user, and
    cross-user isolation (fills must not leak across user runs)."""
    from ciff_ray.extras.eventjoin import _asof_in_part

    group = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
            "ts_us": pa.array([10, 10, 5, 7, 6, 9], type=pa.int64()),
            "event_id": pa.array([100, 101, 102, 200, 201, 300], type=pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
            "is_ref": pa.array([False, True, False, False, True, False]),
        }
    )
    out = {
        r["event_id"]: (r["ref_event_id"], r["ref_value"])
        for r in _asof_in_part(group).to_pylist()
    }
    assert out[102] == (-1, 0.0)      # before user 1's only purchase
    assert out[100] == (101, 2.0)     # equal-ts purchase matches (>=)
    assert out[101] == (101, 2.0)     # a purchase matches itself
    assert out[200] == (201, 5.0)     # user 2's earlier purchase
    assert out[201] == (201, 5.0)
    assert out[300] == (-1, 0.0)      # user 3 has none; no leak from 2


def test_range_join_kernel_edges():
    """Range-count kernel: window inclusivity [start, start+R), users
    with no events, multiple orders per user."""
    from ciff_ray.extras.eventjoin import _RANGE_US, _range_count_in_part

    R = _RANGE_US
    group = pa.table(
        {
            # side 0 = orders, side 1 = events
            "key": pa.array([1, 1, 2, 1, 1, 1, 2], type=pa.int64()),
            "ts_us": pa.array(
                [0, 50, 10, 0, R - 1, R, 5], type=pa.int64()
            ),
            "row_id": pa.array([900, 901, 902, 10, 11, 12, 20], type=pa.int64()),
            "side": pa.array([0, 0, 0, 1, 1, 1, 1], type=pa.int8()),
        }
    )
    out = {
        r["o_orderkey"]: r["n_events"]
        for r in _range_count_in_part(group).to_pylist()
    }
    # order 900 (user 1, start 0): events at 0 (incl) and R-1 (incl),
    # R excluded -> 2
    assert out[900] == 2
    # order 901 (user 1, start 50): events at R-1 and R (50+R excl? R < 50+R yes) -> 2
    assert out[901] == 2
    # order 902 (user 2, start 10): event at 5 is before start -> 0
    assert out[902] == 0


def test_range_kernel_flat_in_distinct_keys():
    """The partition kernel must not degrade with distinct-key count
    (the old per-key-run loop did): 200k orders x 200k events over 200k
    DISTINCT keys, one event in-window each, in well under a second."""
    import time

    import numpy as np

    from ciff_ray.extras.eventjoin import _RANGE_US, _range_count_in_part

    n = 200_000
    keys = np.arange(n, dtype=np.int64)
    group = pa.table(
        {
            "key": pa.array(np.concatenate([keys, keys]), type=pa.int64()),
            "ts_us": pa.array(
                np.concatenate(
                    [np.zeros(n, np.int64), np.full(n, _RANGE_US - 1)]
                ),
                type=pa.int64(),
            ),
            "row_id": pa.array(
                np.concatenate([keys + 10_000_000, keys]), type=pa.int64()
            ),
            "side": pa.array(
                np.concatenate(
                    [np.zeros(n, np.int8), np.ones(n, np.int8)]
                ),
                type=pa.int8(),
            ),
        }
    )
    # Best-of-3 so a momentarily loaded box (e.g. the full suite running
    # alongside Ray workers) doesn't flake a kernel-speed assertion.
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = _range_count_in_part(group)
        dt = min(dt, time.perf_counter() - t0)
    assert dt < 2.0
    assert len(out) == n
    assert np.array(out["n_events"].to_pylist()).sum() == n  # one hit each


def test_knn_filtered_matches_numpy(ray_session):
    """Filtered search = brute-force restricted to the query's label."""
    t = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = np.array(t["vec_id"].to_pylist())
    lab = np.array(t["label"].to_pylist())
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    E = E / np.linalg.norm(E, axis=1, keepdims=True)
    got = simsearch.q_knn_filtered(SF).to_pandas()
    for qid in range(simsearch.N_QUERIES):
        q = E[ids == qid][0]
        ql = lab[ids == qid][0]
        sims = np.round(E @ q, 9)
        cand = [
            (s, v)
            for s, v, l in zip(sims, ids, lab)
            if v != qid and l == ql
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        want = [v for _, v in cand[: simsearch.TOP_K]]
        sub = got[got["query_id"] == qid].sort_values("rank")
        assert sub["vec_id"].tolist() == want
        # every neighbor shares the query's label
        assert all(lab[ids == v][0] == ql for v in sub["vec_id"])


def test_embedding_centroids_matches_numpy(ray_session):
    t = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["embedding", "label"]
    )
    lab = np.array(t["label"].to_pylist())
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    got = simsearch.q_embedding_centroids(SF).to_pandas()
    for label in np.unique(lab):
        want = np.round(E[lab == label].mean(axis=0), 6)
        sub = got[got["label"] == label].sort_values("dim")
        assert len(sub) == E.shape[1]
        assert np.allclose(sub["avg_r"], want, atol=1e-6)


def test_centroid_partials_splits_sum_correctly():
    """Partials from two disjoint batches reduce to the full mean."""
    from ciff_ray.extras.simsearch import _centroid_final, _centroid_partials

    rng = np.random.default_rng(7)
    V = rng.normal(size=(10, 4))
    lab = np.array([0, 1, 0, 1, 0, 1, 0, 1, 0, 1], dtype=np.int64)

    def mk(sl):
        return pa.table(
            {
                "embedding": pa.array(
                    [r.tolist() for r in V[sl]],
                    type=pa.large_list(pa.float64()),
                ),
                "label": pa.array(lab[sl], type=pa.int64()),
            }
        )

    parts = pa.concat_tables(
        [_centroid_partials(mk(slice(0, 6))), _centroid_partials(mk(slice(6, 10)))]
    )
    for label in (0, 1):
        sub = parts.filter(
            pa.compute.equal(parts["label"], label)
        )
        out = _centroid_final(sub)
        assert np.allclose(
            out["avg_r"].to_numpy(),
            np.round(V[lab == label].mean(axis=0), 6),
            atol=1e-12,
        )


def test_join_kernel_edges():
    """Orders without items drop (inner join); dangling lineitems drop;
    integer 1/10000ths aggregate exactly; an all-lineitem partition
    emits nothing."""
    from ciff_ray.extras.relational import _join_in_part

    group = pa.table(
        {
            "part": pa.array([0] * 6, type=pa.int32()),
            "side": pa.array([0, 0, 1, 1, 1, 1], type=pa.int8()),
            "key": pa.array([10, 20, 10, 10, 99, 20], type=pa.int64()),
            "prio": pa.array(["1-URGENT", "5-LOW", "", "", "", ""]),
            # `cents` carries integer 1/10000ths of the revenue unit
            "cents": pa.array(
                [0, 0, 15000, 25000, 99900, 10000], type=pa.int64()
            ),
        }
    )
    out = {r["o_orderkey"]: r for r in _join_in_part(group).to_pylist()}
    assert set(out) == {10, 20}  # key 99 dangles, both orders have items
    assert out[10]["n_items"] == 2 and out[10]["revenue_r"] == 4.0
    assert out[20]["n_items"] == 1 and out[20]["revenue_r"] == 1.0
    assert out[10]["o_orderpriority"] == "1-URGENT"
    only_items = group.filter(pa.compute.equal(group["side"], 1))
    assert len(_join_in_part(only_items)) == 0


def test_order_lineitem_join_e2e(ray_session):
    """Every order with >= 1 lineitem appears exactly once; item counts
    sum to the joined lineitem count."""
    from ciff_ray.extras.relational import q_order_lineitem_join

    got = q_order_lineitem_join(SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    ok = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey"])
    okeys = set(ok["o_orderkey"].to_pylist())
    lkeys = [k for k in li["l_orderkey"].to_pylist() if k in okeys]
    assert got["o_orderkey"].is_unique
    assert set(got["o_orderkey"]) == set(lkeys)
    assert got["n_items"].sum() == len(lkeys)


def test_order_lineitem_join_oracle_exact(ray_session):
    """revenue_r must be bit-exact vs the DuckDB oracle — guards the
    rounding-mode divergence (np.round is half-to-even, DuckDB round is
    half-away-from-zero) that plain-cents summing exposed at half-cent
    boundaries."""
    import duckdb

    from ciff_ray.extras.relational import ORACLE_SQLS, q_order_lineitem_join

    got = (
        q_order_lineitem_join(SF)
        .to_pandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    exp = (
        con.execute(ORACLE_SQLS["order_lineitem_join"])
        .fetchdf()
        .sort_values("o_orderkey", ignore_index=True)
    )
    assert len(got) == len(exp)
    assert (got["revenue_r"].to_numpy() == exp["revenue_r"].to_numpy()).all()
    assert (got["n_items"].to_numpy() == exp["n_items"].to_numpy()).all()


def test_mmr_diversify_matches_pure_python(ray_session):
    """Greedy-MMR re-rank pinned to an independent pure-Python oracle
    recomputed from the raw embeddings (pool generation included)."""
    import pyarrow.parquet as pq

    from ciff_ray.extras.dedup import _embedding_matrix
    from ciff_ray.extras.simsearch import (
        MMR_LAMBDA,
        MMR_POOL,
        N_QUERIES,
        TOP_K,
        q_mmr_diversify,
    )

    got = q_mmr_diversify(SF).to_pandas()

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    E = _embedding_matrix(tbl["embedding"])
    order = np.argsort(ids)
    ids, E = ids[order], E[order]
    norms = np.linalg.norm(E, axis=1)
    norms[norms == 0] = 1.0
    En = E / norms[:, None]

    for qid in range(N_QUERIES):
        qrow = int(np.searchsorted(ids, qid))
        sims = np.round(En @ En[qrow], 9)
        cand = [(float(-s), int(v)) for s, v in zip(sims, ids) if v != qid]
        cand.sort()
        pool = cand[:MMR_POOL]
        pool_ids = [v for _, v in pool]
        rel = {v: -s for s, v in pool}
        chosen: list[int] = []
        while len(chosen) < TOP_K and len(chosen) < len(pool_ids):
            best, best_score = None, None
            for v in pool_ids:
                if v in chosen:
                    continue
                vrow = int(np.searchsorted(ids, v))
                ms = 0.0
                if chosen:
                    ms = max(
                        float(np.round(En[vrow] @ En[int(np.searchsorted(ids, c))], 9))
                        for c in chosen
                    )
                sc = round(MMR_LAMBDA * rel[v] - (1 - MMR_LAMBDA) * ms, 9)
                if best_score is None or sc > best_score or (sc == best_score and v < best):
                    best, best_score = v, sc
            chosen.append(best)
        mine = got[got.query_id == qid].sort_values("rank")["vec_id"].tolist()
        assert mine == chosen, (qid, mine, chosen)


def test_ann_pq_recall_and_compression(ray_session):
    """PQ ANN: codes are PQ_M bytes per vector (32x for f32x64);
    recall@10 vs exact brute force stays high because the constant-depth
    ADC candidate pool is exactly re-ranked. Isotropic Gaussians are
    the worst case for quantization, so the floor is conservative."""
    from ciff_ray.extras.simsearch import (
        PQ_M,
        q_ann_pq,
        q_knn_brute,
        train_pq_codebooks,
    )

    got = q_ann_pq(SF).to_pandas()
    exact = q_knn_brute(SF).to_pandas()
    hits = 0
    for qid in exact.query_id.unique():
        a = set(got[got.query_id == qid].vec_id)
        b = set(exact[exact.query_id == qid].vec_id)
        hits += len(a & b)
    recall = hits / len(exact)
    assert recall >= 0.85, recall
    # deterministic ranks, dense 1..k per query
    for qid, grp in got.groupby("query_id"):
        assert grp.sort_values("rank")["rank"].tolist() == list(
            range(1, len(grp) + 1)
        )
    # compression accounting: 64 f32 dims -> PQ_M uint8 codes
    CB = train_pq_codebooks(f"{SF}/embeddings.parquet")
    d = CB.shape[0] * CB.shape[2]
    assert (d * 4) / PQ_M == 32.0


def test_media_frame_sample_resize_kernel():
    """FrameSampleResize vs a brute-force per-doc Python oracle, plus
    the zero-length-blob edge (no rows emitted, schema preserved)."""
    texts = ["a" * 700, "b" * 256, "c", "d" * 3000, "", "x" * 512]
    batch = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["src0"] * len(texts)),
        }
    )
    st = multimodal.FrameSampleResize()
    out = (
        st(multimodal.synthesize_media(batch))
        .to_pandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    rows = []
    fb, se, stride = (
        multimodal.FRAME_BYTES,
        multimodal.SAMPLE_EVERY,
        multimodal.RESIZE_STRIDE,
    )
    for did, t in zip(range(1, len(texts) + 1), texts):
        b = t.encode()
        for f in range(0, -(-len(b) // fb), se):
            fl = min(fb, len(b) - f * fb)
            taps = b[f * fb : f * fb + fl : stride]
            rows.append((did, f, fl, len(taps), sum(taps), taps.decode()))
    exp = pd.DataFrame(rows, columns=list(out.columns))
    pd.testing.assert_frame_equal(out, exp)
    assert 5 not in set(out.doc_id)  # empty blob -> zero frames
    # all-empty batch keeps the declared schema
    empty = st(multimodal.synthesize_media(batch.slice(4, 1)))
    assert empty.num_rows == 0
    assert empty.schema.names == list(out.columns)


def test_media_frames_pipeline(ray_session):
    out = multimodal.q_media_frames(SF).to_pandas()
    assert len(out) > 0
    assert (out.n_taps >= 1).all()
    assert (out.frame_idx % multimodal.SAMPLE_EVERY == 0).all()
    assert (out.resized.str.len() == out.n_taps).all()
