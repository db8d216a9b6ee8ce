"""Hypothesis property tests for the round-3 kernels — the engine's
analogue of the reference's quickcheck never-crash property
(/root/reference/src/binary_collection.rs:427-437)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

_token = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=24)


@given(_token)
@settings(max_examples=300, deadline=None)
def test_porter_total_and_closed(w):
    """Never crashes; output stays in the token alphabet and never
    grows by more than the one 'e' the 1b cleanup can append."""
    from ciff_ray.analysis import porter_stem

    out = porter_stem(w)
    assert isinstance(out, str)
    assert len(out) <= len(w) + 1
    assert all(c in "abcdefghijklmnopqrstuvwxyz0123456789" for c in out)


@given(st.lists(st.tuples(_token, _token), max_size=40))
@settings(max_examples=150, deadline=None)
def test_lev_le_matches_reference_dp(pairs):
    from ciff_ray.extras.fuzzy import _lev_le

    def ref(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    a = [x for x, _ in pairs]
    b = [y for _, y in pairs]
    for d in (0, 1, 2, 3):
        got = _lev_le(a, b, d)
        want = np.array([ref(x, y) <= d for x, y in pairs], dtype=bool)
        assert (got == want).all()


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(1, 30), st.integers(0, 50)
        ),
        max_size=60,
    ),
    st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(1, 30), st.integers(0, 50)
        ),
        max_size=60,
    ),
)
@settings(max_examples=100, deadline=None)
def test_fuse_matches_dict_reference(sp, dn):
    """_fuse == a dict-based RRF reference on arbitrary pools (pools
    may contain duplicate (query, doc) rows only once — dedupe first,
    keeping the best rank, as the real pools guarantee)."""
    from ciff_ray.hybrid import RRF_K, _fuse

    def dedupe(rows):
        best: dict[tuple[int, int], int] = {}
        for q, r, d in rows:
            k = (q, d)
            if k not in best or r < best[k]:
                best[k] = r
        return [(q, r, d) for (q, d), r in best.items()]

    sp, dn = dedupe(sp), dedupe(dn)

    def tbl(rows):
        q = [x[0] for x in rows]
        r = [x[1] for x in rows]
        d = [x[2] for x in rows]
        return pa.table(
            {
                "query_id": pa.array(q, type=pa.int64()),
                "rank": pa.array(r, type=pa.int64()),
                "doc_id": pa.array(d, type=pa.int64()),
            }
        )

    k = 5
    out = _fuse(tbl(sp), tbl(dn), k).to_pandas()

    scores: dict[tuple[int, int], float] = {}
    for q, r, d in sp:
        scores[(q, d)] = scores.get((q, d), 0.0) + 1.0 / (RRF_K + r)
    for q, r, d in dn:
        scores[(q, d)] = scores.get((q, d), 0.0) + 1.0 / (RRF_K + r)
    want: list[tuple[int, int, int, float]] = []
    for q in sorted({qq for qq, _ in scores}):
        cands = sorted(
            ((dd, s) for (qq, dd), s in scores.items() if qq == q),
            key=lambda t: (-t[1], t[0]),
        )[:k]
        for rank, (d, s) in enumerate(cands, 1):
            want.append((q, rank, d, round(s, 6)))
    got = [
        (int(r.query_id), int(r.rank), int(r.doc_id), float(r.rrf_r))
        for r in out.itertuples()
    ]
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),  # user
            st.integers(0, 20),  # ts
            st.integers(0, 2),  # step
        ),
        max_size=60,
    )
)
@settings(max_examples=150, deadline=None)
def test_funnel_kernel_matches_bruteforce(rows):
    """The masked-minimum funnel kernel == brute-force strictly-
    increasing subsequence matching, on arbitrary event soups."""
    import pyarrow as pa

    from ciff_ray.extras.eventjoin import FUNNEL_STEPS, _funnel_part_counts

    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.int64()),
            "step": pa.array([r[2] for r in rows], type=pa.int8()),
        }
    )
    got = dict(
        zip(
            _funnel_part_counts(tbl)["step"].to_pylist(),
            _funnel_part_counts(tbl)["n_users"].to_pylist(),
        )
    ) if rows else {}

    def depth(evts):
        t = -float("inf")
        d = 0
        for s in range(len(FUNNEL_STEPS)):
            nxt = [ts for ts, stp in evts if stp == s and ts > t]
            if not nxt:
                break
            t = min(nxt)
            d = s + 1
        return d

    users: dict[int, list] = {}
    for u, ts, s in rows:
        users.setdefault(u, []).append((ts, s))
    want = {k: 0 for k in (1, 2, 3)}
    for evts in users.values():
        for s in range(1, depth(evts) + 1):
            want[s] += 1
    if rows:
        assert got == want


# -- BP ordering kernels (ciff_ray.bporder) ---------------------------------


@given(
    st.lists(st.integers(0, 5), min_size=1, max_size=40).map(
        lambda lens: np.array(lens, dtype=np.int64)
    ),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_gather_ranges_matches_naive(lens, rnd):
    from ciff_ray.bporder import _gather_ranges

    n = lens.size
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=indptr[1:])
    docs = np.array(
        rnd.sample(range(n), rnd.randint(1, n)), dtype=np.int64
    )
    want = (
        np.concatenate(
            [np.arange(indptr[d], indptr[d + 1]) for d in docs]
        )
        if docs.size
        else np.empty(0, np.int64)
    )
    got = _gather_ranges(indptr, docs)
    assert np.array_equal(want, got)


@given(
    st.integers(2, 25),  # docs
    st.integers(1, 8),  # vocab
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_move_gains_matches_naive(n, vocab, rnd):
    from ciff_ray.bporder import _gather_ranges, _move_gains

    lens = np.array([rnd.randint(0, 6) for _ in range(n)], dtype=np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=indptr[1:])
    csr = np.array(
        [rnd.randrange(vocab) for _ in range(int(lens.sum()))],
        dtype=np.int64,
    )
    half = np.array(sorted(rnd.sample(range(n), max(1, n // 2))), dtype=np.int64)
    other = np.setdiff1d(np.arange(n), half)
    deg_s = np.bincount(csr[_gather_ranges(indptr, half)], minlength=vocab)
    deg_o = np.bincount(
        csr[_gather_ranges(indptr, other)]
        if other.size
        else np.empty(0, np.int64),
        minlength=vocab,
    )
    n1, n2 = half.size, max(other.size, 1)

    def naive(d):
        g = 0.0
        for t in csr[indptr[d] : indptr[d + 1]]:
            d1, d2 = float(deg_s[t]), float(deg_o[t])
            g += d1 * np.log2(n1 / (d1 + 1)) + d2 * np.log2(n2 / (d2 + 1))
            g -= (d1 - 1) * np.log2(n1 / max(d1, 1)) + (d2 + 1) * np.log2(
                n2 / (d2 + 2)
            )
        return g

    got = _move_gains(csr, indptr, half, deg_s, deg_o, n1, n2)
    want = np.array([naive(d) for d in half])
    assert np.allclose(got, want, equal_nan=True)


@given(st.integers(2, 60), st.randoms(use_true_random=False))
@settings(max_examples=25, deadline=None)
def test_local_bp_emits_a_permutation(n, rnd):
    """Whatever the gain iterations do, _local_bp must return each doc
    exactly once with pos forming 0..n-1 (the permutation invariant the
    reorder pipeline depends on)."""
    import pyarrow as pa

    from ciff_ray.bporder import _local_bp

    terms = [
        [rnd.randrange(30) for _ in range(rnd.randint(0, 6))]
        for _ in range(n)
    ]
    g = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64) * 3 + 1),
            "bucket": pa.array(np.full(n, 7, dtype=np.int64)),
            "terms": pa.array(terms, type=pa.large_list(pa.int64())),
        }
    )
    out = _local_bp(g)
    assert out.num_rows == n
    assert sorted(out["doc_id"].to_pylist()) == (
        np.arange(n, dtype=np.int64) * 3 + 1
    ).tolist()
    assert sorted(out["pos"].to_pylist()) == list(range(n))
    assert set(out["bucket"].to_pylist()) == {7}
