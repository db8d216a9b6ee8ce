"""HyperLogLog distinct-count sketches: error bound vs exact DuckDB
counts, register-merge associativity, and exact floor-log2 kernel."""

from __future__ import annotations

import duckdb
import numpy as np

SF = "/root/testdata/sf0.01"

_EXACT_SQL = {
    "terms": """WITH tok AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents)
SELECT count(DISTINCT term) FROM tok WHERE term <> ''""",
    "postings": """WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents)
SELECT count(DISTINCT (doc_id, term)) FROM tok WHERE term <> ''""",
    "shingles": """WITH tokl AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS t
  FROM documents),
tokpos AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokl)
SELECT count(DISTINCT a.term || ' ' || b.term || ' ' || c.term)
FROM tokpos a
JOIN tokpos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
JOIN tokpos c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2""",
}


def test_floor_log2_exact():
    from ciff_ray.extras.sketch import _floor_log2_u64

    # values where float64 log2 rounds across the power-of-2 boundary
    xs = np.array(
        [1, 2, 3, (1 << 53) - 1, (1 << 63) - 1, 1 << 63, (1 << 64) - 1],
        dtype=np.uint64,
    )
    got = _floor_log2_u64(xs)
    want = np.array([x.bit_length() - 1 for x in xs.tolist()])
    assert (got == want).all()


def test_hll_error_bound_vs_exact(ray_session):
    from ciff_ray.extras.sketch import q_approx_distinct

    got = {
        r["scope"]: r["n_est"]
        for r in q_approx_distinct(SF).take_all()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    for scope, sql in _EXACT_SQL.items():
        exact = con.execute(sql).fetchone()[0]
        err = abs(got[scope] - exact) / max(exact, 1)
        assert err < 0.05, (scope, got[scope], exact)


def test_hll_merge_associative():
    """max-merging per-half registers equals the single-pass sketch."""
    from ciff_ray.extras.sketch import HLL_M, _hll_update, hll_estimate

    rng = np.random.default_rng(11)
    h = rng.integers(0, 2**64, size=20000, dtype=np.uint64)
    full = np.zeros(HLL_M, dtype=np.uint8)
    _hll_update(full, h)
    a = np.zeros(HLL_M, dtype=np.uint8)
    b = np.zeros(HLL_M, dtype=np.uint8)
    _hll_update(a, h[:9999])
    _hll_update(b, h[9999:])
    assert (np.maximum(a, b) == full).all()
    # sanity: estimate of ~20k uniques within 5%
    est = hll_estimate(full)
    assert abs(est - 20000) / 20000 < 0.05


def test_mg_prune_invariants():
    """Subtract-rule prune: estimates only DECREASE (underestimate
    invariant), survivors <= cap, subtracted value reported."""
    from ciff_ray.extras.sketch import _mg_prune

    terms = np.array([f"t{i}" for i in range(10)], dtype=object)
    counts = np.arange(1, 11, dtype=np.int64)  # 1..10
    t2, c2, sub = _mg_prune(terms, counts, 4)
    assert t2.size <= 4
    assert sub == 6  # the 5th-largest count
    # survivors are the top-4 with 6 subtracted
    assert dict(zip(t2.tolist(), c2.tolist())) == {
        "t6": 1, "t7": 2, "t8": 3, "t9": 4
    }
    # no-op below cap
    t3, c3, sub3 = _mg_prune(terms[:3], counts[:3], 4)
    assert sub3 == 0 and t3.size == 3


def test_top_terms_matches_exact(ray_session):
    """Certified MG screen == brute-force exact top-K (and the
    certificate holds on this corpus)."""
    import duckdb

    from ciff_ray.extras.sketch import TOP_TERMS_SQL, q_top_terms

    got = q_top_terms("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = con.execute(TOP_TERMS_SQL).df()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["cf"].tolist() == want["cf"].tolist()


def test_top_terms_fallback_exactness(ray_session, monkeypatch):
    """Force the certificate to fail (cap K at a huge budget) — the
    fallback full aggregation must produce the identical result, and
    the per-block screen must bound what reaches the driver (no
    vocabulary-sized take_all)."""
    import ciff_ray.extras.sketch as sk

    normal = sk.q_top_terms("/root/testdata/sf0.001").to_pandas()
    monkeypatch.setattr(sk, "MG_CAP", 1)  # budget explodes -> fallback
    sk._DIAG["fallback_rows"] = None
    fell_back = sk.q_top_terms("/root/testdata/sf0.001").to_pandas()
    assert normal.equals(fell_back)
    assert sk._DIAG["fallback_rows"] is not None, "fallback did not run"


def test_top_terms_fallback_streams_bounded_rows(
    ray_session, monkeypatch, tmp_path
):
    """On a corpus whose vocabulary dwarfs K x blocks, the forced
    fallback's driver merge must receive a bounded row count (per-block
    top-K screen), not the vocabulary — and still be exact vs SQL."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ciff_ray.extras.sketch as sk

    # 400 docs x 24 tokens over a ~900-term vocab with a Zipf-ish head
    texts = []
    for i in range(400):
        toks = [f"w{(i * 24 + j) % 900:03d}" for j in range(20)]
        toks += [f"h{(i + j) % 7}" for j in range(4)]  # heavy head
        texts.append(" ".join(toks))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(400), type=pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    monkeypatch.setattr(sk, "MG_CAP", 1)  # force the fallback
    sk._DIAG["fallback_rows"] = None
    got = sk.q_top_terms(str(tmp_path)).to_pandas()
    rows = sk._DIAG["fallback_rows"]
    assert rows is not None, "fallback did not run"
    vocab = 900 + 7
    assert rows < vocab / 4, (rows, vocab)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet')"
    )
    want = con.execute(sk.TOP_TERMS_SQL).df()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["cf"].tolist() == want["cf"].tolist()


def test_block_top_terms_kernel():
    """Per-block cut applies the exact final key (cf desc, term asc)."""
    import pyarrow as pa

    from ciff_ray.extras.sketch import TOPK_TERMS, _block_top_terms

    n = TOPK_TERMS + 7
    batch = pa.table(
        {
            "term": pa.array([f"t{i:03d}" for i in range(n)]),
            "cf": pa.array([5] * 4 + list(range(6, 6 + n - 4))[::-1]),
        }
    )
    out = _block_top_terms(batch)
    assert out.num_rows == TOPK_TERMS
    pairs = list(zip(out["cf"].to_pylist(), out["term"].to_pylist()))
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
    assert min(out["cf"].to_pylist()) >= 5


# ---------------------------------------------------------------------------
# t-digest quantile sketch
# ---------------------------------------------------------------------------


def test_tdigest_rank_error_vs_exact(ray_session):
    """Distributed digest over events.value: every estimated quantile's
    TRUE rank must sit within 0.005 of the target (delta=200 gives
    ~1e-4 empirically; 50x margin keeps the pin partition-robust)."""
    import pyarrow.parquet as pq

    from ciff_ray.extras.sketch import q_quantile_sketch

    got = q_quantile_sketch(SF).to_pandas()
    ev = pq.read_table(
        SF + "/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    scopes = {"all": ev.value.to_numpy()}
    for t, grp in ev.groupby("event_type"):
        scopes[str(t)] = grp.value.to_numpy()
    assert set(got.scope) == set(scopes)
    for _, row in got.iterrows():
        vals = np.sort(scopes[row.scope])
        assert row.n == vals.size
        true_rank = np.searchsorted(vals, row.est) / vals.size
        assert abs(true_rank - row.q) <= 0.005, (
            row.scope,
            row.q,
            row.est,
            true_rank,
        )


def test_tdigest_merge_partition_invariance():
    """Same data through 1 vs 64 partition layouts: estimates agree to
    well inside the accuracy budget, centroid count stays O(delta)."""
    from ciff_ray.extras.sketch import (
        TDIGEST_DELTA,
        td_compress,
        td_quantiles,
    )

    rng = np.random.default_rng(11)
    data = rng.exponential(5.0, size=100_000)
    one_m, one_w = td_compress(data, np.ones_like(data))
    ms, ws = [], []
    for p in np.array_split(data, 64):
        gm, gw = td_compress(p, np.ones_like(p))
        ms.append(gm)
        ws.append(gw)
    many_m, many_w = td_compress(np.concatenate(ms), np.concatenate(ws))
    assert many_m.size <= 2 * TDIGEST_DELTA
    assert abs(many_w.sum() - data.size) < 1e-6  # weight conserved
    q1 = td_quantiles(one_m, one_w, data.min(), data.max())
    q2 = td_quantiles(many_m, many_w, data.min(), data.max())
    srt = np.sort(data)
    r1 = np.searchsorted(srt, q1) / data.size
    r2 = np.searchsorted(srt, q2) / data.size
    assert np.all(np.abs(r1 - r2) < 0.004)


def test_tdigest_edge_cases():
    from ciff_ray.extras.sketch import td_compress, td_quantiles

    m, w = td_compress(np.array([]), np.array([]))
    assert m.size == 0 and np.all(np.isnan(td_quantiles(m, w, 0, 0)))
    m, w = td_compress(np.array([3.0]), np.array([1.0]))
    assert list(m) == [3.0] and list(w) == [1.0]
    assert np.allclose(td_quantiles(m, w, 3.0, 3.0), 3.0)
    # constant column: every quantile is the constant
    m, w = td_compress(np.full(1000, 7.0), np.ones(1000))
    assert np.allclose(td_quantiles(m, w, 7.0, 7.0), 7.0)


def test_exact_quantiles_match_order_statistics(ray_session):
    """q_exact_quantiles returns EXACT elements (quantile_disc rank
    ceil(q*n)) — checked against numpy order statistics per scope."""
    import pyarrow.parquet as pq

    from ciff_ray.extras.sketch import EXACT_QS, q_exact_quantiles

    got = q_exact_quantiles(SF)
    ev = pq.read_table(
        SF + "/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    scopes = {"all": ev.value.to_numpy()}
    for t, grp in ev.groupby("event_type"):
        scopes[str(t)] = grp.value.to_numpy()
    assert len(got) == len(scopes) * len(EXACT_QS)
    for _, row in got.iterrows():
        srt = np.sort(scopes[row.scope])
        r = max(1, int(np.ceil(row.q * srt.size)))
        assert row.val == srt[r - 1], (row.scope, row.q)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_one_sided_error_bound(ray_session):
    """CMS guarantee vs exact DuckDB counts: never an underestimate,
    overestimate within eps*total (eps = e/W; generous 3x margin keeps
    the pin robust to seed choice)."""
    from ciff_ray.extras.sketch import CMS_W, cms_build, cms_query

    grid, total = cms_build(SF)
    con = duckdb.connect()
    exact = dict(
        con.execute(
            f"""WITH tok AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM read_parquet('{SF}/documents.parquet'))
SELECT term, count(*) FROM tok WHERE term <> '' GROUP BY term"""
        ).fetchall()
    )
    assert total == sum(exact.values())
    terms = list(exact)[:200] + ["zzznotaterm"]
    est = cms_query(grid, terms)
    eps = np.e / CMS_W
    for t, e in zip(terms, est):
        true = exact.get(t, 0)
        assert e >= true, (t, e, true)  # never underestimates
        assert e <= true + 3 * eps * total, (t, e, true)


def test_cms_merge_is_sum(ray_session):
    """Partial grids merge by elementwise sum: split-corpus estimates
    equal whole-corpus estimates (the distributed-merge contract)."""
    import pyarrow as pa

    from ciff_ray.extras.sketch import (
        _cms_partial,
        cms_query,
    )

    texts = ["the fast key the", "spark window merge spark", "the a a a"]
    whole = _cms_partial(pa.table({"text": pa.array([" ".join(texts)])}))
    parts = [_cms_partial(pa.table({"text": pa.array([t])})) for t in texts]
    g_whole = np.asarray(whole["grid"][0].as_py(), dtype=np.int64)
    g_sum = sum(
        np.asarray(p["grid"][0].as_py(), dtype=np.int64) for p in parts
    )
    assert np.array_equal(g_whole, g_sum)
    from ciff_ray.extras.sketch import CMS_D, CMS_W

    est = cms_query(g_sum.reshape(CMS_D, CMS_W), ["the", "a", "spark"])
    assert est.tolist() == [3, 3, 2]
