"""Hybrid BM25 + cosine-kNN RRF fusion: oracle match at sf0.001, the
fusion kernel's edge semantics, and the pool contract."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_hybrid_matches_duckdb_oracle(ray_session):
    from ciff_ray.hybrid import hybrid_oracle_sql, q_hybrid_rrf

    res = q_hybrid_rrf(SF).to_pandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t)}.parquet')"
        )
    ora = con.execute(hybrid_oracle_sql()).df()
    pd.testing.assert_frame_equal(
        _canon(res), _canon(ora), check_dtype=False
    )


def test_fuse_kernel_edges():
    from ciff_ray.hybrid import RRF_K, _fuse

    def tbl(rows):
        q, r, d = zip(*rows) if rows else ((), (), ())
        return pa.table(
            {
                "query_id": pa.array(list(q), type=pa.int64()),
                "rank": pa.array(list(r), type=pa.int64()),
                "doc_id": pa.array(list(d), type=pa.int64()),
            }
        )

    # doc 7 in both pools beats doc 5 (sparse rank 1 only)
    sparse = tbl([(0, 1, 5), (0, 2, 7)])
    dense = tbl([(0, 1, 7), (0, 2, 9)])
    out = _fuse(sparse, dense, 10).to_pandas()
    assert out["doc_id"].tolist() == [7, 5, 9]
    assert out["rank"].tolist() == [1, 2, 3]
    want_top = 1.0 / (RRF_K + 2) + 1.0 / (RRF_K + 1)
    assert out["rrf_r"][0] == np.round(want_top, 6)

    # one-sided query (sparse empty for qid 1) still ranks
    sparse2 = tbl([(0, 1, 5)])
    dense2 = tbl([(1, 1, 3), (1, 2, 4)])
    out2 = _fuse(sparse2, dense2, 1).to_pandas()
    assert out2[out2.query_id == 1]["doc_id"].tolist() == [3]

    # equal-rrf tie breaks by ascending doc_id
    sparse3 = tbl([(0, 1, 50), (0, 1, 40)])  # same rank -> same rrf
    out3 = _fuse(sparse3, tbl([]), 2).to_pandas()
    assert out3["doc_id"].tolist() == [40, 50]


def test_dense_pool_excludes_query_vector(ray_session):
    from ciff_ray.hybrid import HYBRID_QUERY_VECS, _dense_pool

    pool = _dense_pool(SF).to_pandas()
    for qid, vec in enumerate(HYBRID_QUERY_VECS):
        got = pool[pool.query_id == qid]["doc_id"].tolist()
        assert vec not in got
        assert len(got) <= 20 and len(got) > 0
