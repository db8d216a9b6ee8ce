"""Composed cleaning pass: oracle match + bit semantics."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_clean_corpus_matches_oracle(ray_session):
    from ciff_ray.extras.cleaning import ORACLE_SQLS, q_clean_corpus

    res = q_clean_corpus(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'documents.parquet')}')"
    )
    ora = con.execute(ORACLE_SQLS["clean_corpus"]).df()
    canon = lambda df: df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True
    )
    pd.testing.assert_frame_equal(canon(res), canon(ora), check_dtype=False)


def test_clean_corpus_bits_consistent_with_parts(ray_session):
    """Every bit agrees with the standalone operator it composes."""
    from ciff_ray.extras.cleaning import (
        _BIT_DUP,
        _BIT_LANG,
        _BIT_QUALITY,
        _BIT_REP,
        QUALITY_MIN,
        q_clean_corpus,
    )
    from ciff_ray.extras.dedup import q_dedup_by_key
    from ciff_ray.extras.textstats import (
        q_doc_quality,
        q_lang_id,
        q_repetition_signals,
    )

    res = q_clean_corpus(SF).to_pandas().set_index("doc_id")
    q = q_doc_quality(SF).to_pandas().set_index("doc_id")
    l = q_lang_id(SF).to_pandas().set_index("doc_id")
    r = q_repetition_signals(SF).to_pandas().set_index("doc_id")
    keepers = set(q_dedup_by_key(SF).to_pandas()["keep_doc_id"])
    for doc in res.index:
        bits = int(res.loc[doc, "drop_reasons"])
        assert bool(bits & _BIT_QUALITY) == (
            int(q.loc[doc, "quality"]) < QUALITY_MIN
        )
        assert bool(bits & _BIT_LANG) == (l.loc[doc, "lang_pred"] != "en")
        assert bool(bits & _BIT_REP) == (int(r.loc[doc, "rep_flags"]) > 0)
        assert bool(bits & _BIT_DUP) == (doc not in keepers)
        assert int(res.loc[doc, "keep"]) == (1 if bits == 0 else 0)
    # the pass keeps most docs but drops some
    assert 0 < res["keep"].sum() < len(res)
