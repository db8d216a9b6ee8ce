"""Conversation-level retrieval (max-passage) and term-prefix
suggestions: oracle match at sf0.001 + kernel edge semantics."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _oracle(sf: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf, 'documents.parquet')}')"
    )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_conv_topk_matches_oracle(ray_session):
    from ciff_ray.pipelines import oracle_sqls, q_conv_topk

    res = q_conv_topk(SF).to_pandas()
    ora = _oracle(SF, oracle_sqls()["conv_topk"])
    pd.testing.assert_frame_equal(
        _canon(res), _canon(ora), check_dtype=False
    )
    # max-passage invariant: a conversation's score equals its best
    # turn's score, so every query's rank-1 conv score equals the
    # query's global best turn score
    from ciff_ray.pipelines import q_bm25_scores

    turns = q_bm25_scores(SF).to_pandas()
    for qid, grp in res[res["rank"] == 1].groupby("query_id"):
        best = turns[turns.query_id == qid]["score_r"].max()
        assert float(grp["score_r"].iloc[0]) == float(best)


def test_conv_max_partials_kernel():
    from ciff_ray.pipelines import _conv_max_partials
    from ciff_ray.synth import TURNS_PER_CONV_FROM_DOCS as TPC

    batch = pa.table(
        {
            "query_id": pa.array([0, 0, 0, 1], type=pa.int64()),
            "doc_id": pa.array([0, 1, TPC, 1], type=pa.int64()),
            "score_r": pa.array([1.5, 2.5, 9.0, 4.0], type=pa.float64()),
        }
    )
    out = _conv_max_partials(batch).to_pandas()
    got = {
        (int(r.query_id), int(r.conv)): float(r.ms)
        for r in out.itertuples()
    }
    # docs 0 and 1 share conv 0 -> max 2.5; doc TPC is conv 1
    assert got == {(0, 0): 2.5, (0, 1): 9.0, (1, 0): 4.0}


def test_term_suggest_matches_oracle(ray_session):
    from ciff_ray.pipelines import (
        SUGGEST_K,
        SUGGEST_PREFIXES,
        oracle_sqls,
        q_term_suggest,
    )

    res = q_term_suggest(SF).to_pandas()
    ora = _oracle(SF, oracle_sqls()["term_suggest"])
    pd.testing.assert_frame_equal(
        _canon(res), _canon(ora), check_dtype=False
    )
    # contract: <= K rows per prefix, ranks dense from 1, df descending
    for pid, grp in res.groupby("prefix_id"):
        grp = grp.sort_values("rank")
        assert len(grp) <= SUGGEST_K
        assert grp["rank"].tolist() == list(range(1, len(grp) + 1))
        assert (np.diff(grp["df"].to_numpy()) <= 0).all()
        assert all(
            t.startswith(SUGGEST_PREFIXES[pid]) for t in grp["term"]
        )
    # the no-hit prefix yields nothing
    zzz = [i for i, p in enumerate(SUGGEST_PREFIXES) if p == "zzz"][0]
    assert (res["prefix_id"] == zzz).sum() == 0


def test_bm25_facets_matches_oracle(ray_session):
    from ciff_ray.pipelines import oracle_sqls, q_bm25_facets, q_bm25_scores

    res = q_bm25_facets(SF).to_pandas()
    ora = _oracle(SF, oracle_sqls()["bm25_facets"])
    pd.testing.assert_frame_equal(
        _canon(res), _canon(ora), check_dtype=False
    )
    # facet counts sum to the full match-set size per query
    scores = q_bm25_scores(SF).to_pandas()
    got = res.groupby("query_id")["n_hits"].sum().to_dict()
    want = scores.groupby("query_id").size().to_dict()
    assert got == want
