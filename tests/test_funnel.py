"""Funnel conversion: kernel edge semantics + oracle match."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_funnel_kernel_strict_ordering():
    from ciff_ray.extras.eventjoin import _funnel_part_counts

    def tbl(rows):  # (user, ts, step)
        u, t, s = zip(*rows)
        return pa.table(
            {
                "user_id": pa.array(list(u), type=pa.int64()),
                "ts": pa.array(list(t), type=pa.int64()),
                "step": pa.array(list(s), type=pa.int8()),
            }
        )

    # user 1 completes; user 2 clicks BEFORE viewing (no chain past 1);
    # user 3 has view+click at the SAME ts (strict > blocks step 2)
    out = _funnel_part_counts(
        tbl(
            [
                (1, 10, 0), (1, 20, 1), (1, 30, 2),
                (2, 10, 1), (2, 20, 0),
                (3, 10, 0), (3, 10, 1),
            ]
        )
    ).to_pandas()
    assert out["n_users"].tolist() == [3, 1, 1]

    # out-of-order arrival must not matter (kernel sorts nothing — the
    # min-scan is order-free)
    out2 = _funnel_part_counts(
        tbl([(1, 30, 2), (1, 10, 0), (1, 20, 1)])
    ).to_pandas()
    assert out2["n_users"].tolist() == [1, 1, 1]


def test_funnel_matches_oracle(ray_session):
    from ciff_ray.extras.eventjoin import ORACLE_SQLS, q_funnel

    res = q_funnel(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'events.parquet')}')"
    )
    ora = con.execute(ORACLE_SQLS["funnel"]).df()
    canon = lambda df: df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )
    pd.testing.assert_frame_equal(canon(res), canon(ora), check_dtype=False)
    # funnel counts are monotone non-increasing
    s = res.sort_values("step")["n_users"].to_numpy()
    assert (np.diff(s) <= 0).all()
