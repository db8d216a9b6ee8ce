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
