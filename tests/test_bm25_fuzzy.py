"""Spell-corrected retrieval: correction-rule unit semantics + oracle
match at sf0.001."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_correction_rule(ray_session):
    from ciff_ray.pipelines import _FuzzyCorrectScorer, ensure_index

    s = _FuzzyCorrectScorer(ensure_index(SF), 10)
    # in-vocab token self-corrects (d=0 beats any d=1 candidate)
    assert s._correct("table") == "table"
    # one-off misspelling lands on the obvious vocab term
    assert s._correct("tabel") == "table"
    assert s._correct("vectr") == "vector"
    # hopeless token drops
    assert s._correct("zzzzzzzzzz") is None


def test_bm25_fuzzy_matches_oracle(ray_session):
    from ciff_ray.pipelines import oracle_sqls, q_bm25_fuzzy

    res = q_bm25_fuzzy(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'documents.parquet')}')"
    )
    ora = con.execute(oracle_sqls()["bm25_fuzzy"]).df()
    canon = lambda df: df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )
    assert len(res) > 0
    pd.testing.assert_frame_equal(
        canon(res), canon(ora), check_dtype=False
    )
    # corrected queries rank the same docs as querying the corrected
    # text directly
    from ciff_ray.pipelines import FUZZY_QUERY_SET, TOPK_K, ensure_index
    from ciff_ray.query import LocalScorer

    s = LocalScorer(ensure_index(SF))
    docs, _ = s.topk("table vector", k=TOPK_K)
    got = res[res.query_id == 0].sort_values("rank")["doc_id"].tolist()
    assert got == docs.tolist()
