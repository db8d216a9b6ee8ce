"""Next-term continuation suggestions: combiner kernel + e2e vs the
DuckDB oracle."""

from __future__ import annotations

import pyarrow as pa

from ciff_ray.nextterm import TOP_K, _continuation_partials


def test_continuation_partials_kernel():
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(
                ["the cat the dog", "dog the cat"], type=pa.string()
            ),
        }
    )
    out = _continuation_partials(batch, {"the"})
    got = {(r["lead"], r["term"]): r["cnt"] for r in out.to_pylist()}
    # "the cat" x2 (doc 0 + doc 1), "the dog" x1; non-lead pairs dropped
    assert got == {("the", "cat"): 2, ("the", "dog"): 1}


def test_continuation_respects_row_boundary():
    """The last token of one doc is NOT adjacent to the first of the
    next doc in the same batch."""
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["x the", "cat y"], type=pa.string()),
        }
    )
    out = _continuation_partials(batch, {"the"})
    assert out.num_rows == 0


def test_nextterm_e2e_matches_oracle(ray_session):
    import duckdb

    from ciff_ray.nextterm import (
        q_suggest_next_term,
        suggest_next_term_oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    t = q_suggest_next_term(sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    o = con.execute(suggest_next_term_oracle_sql()).df()
    key = ["query_id", "rank", "term", "cnt"]
    a = t[key].sort_values(key).reset_index(drop=True)
    b = o[key].sort_values(key).reset_index(drop=True)
    assert len(a) > 0
    assert a.equals(b)
    # per-query ranks dense, counts non-increasing (the suggest order)
    for _, g in a.groupby("query_id"):
        g = g.sort_values("rank")
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        cs = g["cnt"].tolist()
        assert all(x >= y for x, y in zip(cs, cs[1:]))
        assert len(g) <= TOP_K
