"""Ranking-agreement eval: oracle match + set-identity edge."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ranking_eval_matches_oracle(ray_session):
    from ciff_ray.evaluation import q_ranking_eval, ranking_eval_oracle_sql

    res = q_ranking_eval(SF).to_pandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t)}.parquet')"
        )
    ora = con.execute(ranking_eval_oracle_sql()).df()
    canon = lambda df: df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )
    pd.testing.assert_frame_equal(canon(res), canon(ora), check_dtype=False)
    # invariants: overlap bounded by both sizes; jaccard in [0, 1]
    assert (res["n_common"] <= res[["n_a", "n_b"]].min(axis=1)).all()
    assert ((res["jaccard"] >= 0) & (res["jaccard"] <= 1)).all()
