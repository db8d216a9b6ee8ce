"""Trending terms: partial-aggregation kernel + end-to-end lift
ranking vs a pure-Python recompute."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ciff_ray.trending import (
    BUCKET_SECONDS,
    MIN_FG,
    TOP_K,
    _bucket_term_partials,
    _rank_bucket,
)


def test_bucket_term_partials_kernel():
    batch = pa.table(
        {
            "doc_id": pa.array(
                [0, 1, BUCKET_SECONDS, BUCKET_SECONDS + 1], type=pa.int64()
            ),
            "text": pa.array(
                ["cat cat dog", "cat", "dog dog", "cat dog"], type=pa.string()
            ),
        }
    )
    out = _bucket_term_partials(batch)
    got = {
        (r["bucket"], r["term"]): r["cnt"] for r in out.to_pylist()
    }
    assert got == {
        (0, "cat"): 3, (0, "dog"): 1,
        (1, "cat"): 1, (1, "dog"): 3,
    }


def test_rank_bucket_key():
    g = pa.table(
        {
            "bucket": pa.array([0] * 4, type=pa.int64()),
            "term": pa.array(["b", "a", "c", "d"]),
            "fg": pa.array([5, 5, 5, 5], type=pa.int64()),
            "lift": pa.array([2.0, 2.0, 3.0, 1.0], type=pa.float64()),
        }
    )
    out = _rank_bucket(g)
    assert out["term"].to_pylist() == ["c", "a", "b", "d"]  # lift desc, term asc
    assert out["rank"].to_pylist() == [1, 2, 3, 4]


def test_trending_e2e_matches_oracle(ray_session):
    """q_trending_terms over sf0.001 == the DuckDB oracle (the gate the
    driver runs at sf0.01)."""
    import duckdb
    import pandas as pd

    from ciff_ray.trending import q_trending_terms, trending_terms_oracle_sql

    sf = "/root/testdata/sf0.001"
    t = pd.concat(
        b.to_pandas()
        for b in q_trending_terms(sf).iter_batches(batch_format="pyarrow")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    o = con.execute(trending_terms_oracle_sql()).df()
    key = ["bucket", "rank", "term"]
    a = t[key].sort_values(key).reset_index(drop=True)
    b = o[key].sort_values(key).reset_index(drop=True)
    assert len(a) > 0
    assert a.equals(b)
    # every bucket's ranks are dense 1..<=TOP_K
    for _, grp in a.groupby("bucket"):
        rs = sorted(grp["rank"].tolist())
        assert rs == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K


def test_min_fg_floor_is_enforced(ray_session):
    """No emitted term may have bucket frequency below MIN_FG."""
    import duckdb

    from ciff_ray.trending import q_trending_terms

    sf = "/root/testdata/sf0.001"
    rows = q_trending_terms(sf).take_all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    fg = {
        (b, t): c
        for b, t, c in con.execute(
            "SELECT doc_id // ? AS b, u.term, count(*) FROM ("
            "  SELECT doc_id, unnest(string_split_regex(lower(text),"
            "  '[^a-z0-9]+')) AS term FROM documents) u"
            " WHERE u.term <> '' GROUP BY b, u.term",
            [BUCKET_SECONDS],
        ).fetchall()
    }
    assert rows
    for r in rows:
        assert fg[(r["bucket"], r["term"])] >= MIN_FG
