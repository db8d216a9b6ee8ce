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


def test_week_start_day_matches_duckdb():
    import numpy as np

    from ciff_ray.extras.eventjoin import _week_start_day

    con = duckdb.connect()
    # probe across weekday space incl. the epoch (a Thursday)
    stamps = [
        "1970-01-01 00:00:00", "2020-01-05 23:59:59",
        "2024-01-01 00:00:00", "2024-01-07 12:00:00",
        "2024-01-08 00:00:00",
    ]
    for s in stamps:
        us = con.execute(
            f"SELECT epoch_us(TIMESTAMP '{s}')"
        ).fetchone()[0]
        want = con.execute(
            f"SELECT date_trunc('week', TIMESTAMP '{s}') - DATE '1970-01-01'"
        ).fetchone()[0]
        got = int(_week_start_day(np.array([us], dtype=np.int64))[0])
        assert got == want.days if hasattr(want, "days") else got == want, s


def test_cohort_retention_matches_oracle(ray_session):
    from ciff_ray.extras.eventjoin import ORACLE_SQLS, q_cohort_retention

    res = q_cohort_retention(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'events.parquet')}')"
    )
    ora = con.execute(ORACLE_SQLS["cohort_retention"]).df()
    canon = lambda df: df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )
    pd.testing.assert_frame_equal(canon(res), canon(ora), check_dtype=False)
    # offset-0 cell of a cohort counts the whole cohort
    for _, grp in res.groupby("cohort_week"):
        base = grp[grp.week_offset == 0]["n_users"].iloc[0]
        assert (grp["n_users"] <= base).all()
