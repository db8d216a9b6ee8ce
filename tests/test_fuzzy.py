"""SymSpell fuzzy vocabulary pairs: DP-kernel exactness vs a pure
Python Levenshtein, deletion-neighborhood recall on a planted vocab,
and oracle match at sf0.001."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_lev_kernel_matches_reference():
    from ciff_ray.extras.fuzzy import _lev_le

    rng = np.random.default_rng(5)
    words = [
        "".join(rng.choice(list("abcd"), size=rng.integers(0, 9)))
        for _ in range(80)
    ]
    a = [words[i] for i in rng.integers(0, len(words), 300)]
    b = [words[i] for i in rng.integers(0, len(words), 300)]
    for d in (1, 2):
        got = _lev_le(a, b, d)
        want = np.array([_lev_ref(x, y) <= d for x, y in zip(a, b)])
        assert (got == want).all()


def test_deletion_neighborhood_complete():
    """Every lev<=2 pair of a planted vocab shares a deletion variant
    (the SymSpell invariant the bucketing relies on)."""
    from ciff_ray.extras.fuzzy import MAX_EDITS, _deletion_variants

    vocab = [
        "spark", "spars", "park", "sparks", "stark", "share", "shard",
        "chart", "chars", "a", "ab", "ba", "abc",
    ]
    for i, x in enumerate(vocab):
        for y in vocab[i + 1 :]:
            if _lev_ref(x, y) <= MAX_EDITS:
                assert _deletion_variants(x, MAX_EDITS) & _deletion_variants(
                    y, MAX_EDITS
                ), (x, y)


def test_fuzzy_terms_matches_oracle(ray_session):
    from ciff_ray.extras.fuzzy import ORACLE_SQLS, q_fuzzy_terms

    sf = "/root/testdata/sf0.001"
    res = q_fuzzy_terms(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'documents.parquet')}')"
    )
    ora = con.execute(ORACLE_SQLS["fuzzy_terms"]).df()
    assert len(res) > 0  # the fixed vocab has ed<=2 pairs
    canon = lambda df: df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )
    pd.testing.assert_frame_equal(
        canon(res), canon(ora), check_dtype=False
    )
