"""Retrieval evaluation — ranking agreement between two of the
engine's own rankers (BM25 top-k vs hybrid RRF top-k), the QC surface
a retrieval-backed training pipeline runs after every index or ranker
change.

Per query: overlap count and Jaccard of the two result SETS plus both
set sizes.  Jaccard ships UNROUNDED (exact int-ratio rule — see the
round-3 rounding-mode notes in PARITY.md).

Shape: both inputs are k-bounded per query by construction, so the
comparison kernel is O(queries x k) regardless of corpus size.

Oracle: composes the two entries' own oracle SQL verbatim as
subqueries, so the eval can never drift from what it evaluates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def q_ranking_eval(sf_dir: str) -> pa.Table:
    """(query_id, n_a, n_b, n_common, jaccard) for bm25_topk (a) vs
    hybrid_rrf (b) on the shared fixed query set."""
    from ciff_ray.hybrid import q_hybrid_rrf
    from ciff_ray.pipelines import q_bm25_topk

    a = q_bm25_topk(sf_dir).to_pandas()
    b = q_hybrid_rrf(sf_dir).to_pandas()
    qids = sorted(set(a["query_id"]) | set(b["query_id"]))
    out_q, out_na, out_nb, out_c, out_j = [], [], [], [], []
    for qid in qids:
        sa = set(a[a.query_id == qid]["doc_id"])
        sb = set(b[b.query_id == qid]["doc_id"])
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        out_q.append(int(qid))
        out_na.append(len(sa))
        out_nb.append(len(sb))
        out_c.append(inter)
        out_j.append(inter / union if union else 0.0)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "n_a": pa.array(out_na, type=pa.int64()),
            "n_b": pa.array(out_nb, type=pa.int64()),
            "n_common": pa.array(out_c, type=pa.int64()),
            "jaccard": pa.array(np.array(out_j), type=pa.float64()),
        }
    )


def ranking_eval_oracle_sql() -> str:
    from ciff_ray.hybrid import hybrid_oracle_sql
    from ciff_ray.pipelines import oracle_sqls

    a_sql = oracle_sqls()["bm25_topk"]
    b_sql = hybrid_oracle_sql()
    return f"""WITH a AS ({a_sql}),
b AS ({b_sql}),
qs AS (SELECT DISTINCT query_id FROM a UNION SELECT DISTINCT query_id FROM b),
na AS (SELECT query_id, count(*) AS n FROM a GROUP BY query_id),
nb AS (SELECT query_id, count(*) AS n FROM b GROUP BY query_id),
c AS (
  SELECT a.query_id, count(*) AS n
  FROM a JOIN b ON a.query_id = b.query_id AND a.doc_id = b.doc_id
  GROUP BY a.query_id
)
SELECT qs.query_id,
       CAST(coalesce(na.n, 0) AS BIGINT) AS n_a,
       CAST(coalesce(nb.n, 0) AS BIGINT) AS n_b,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_common,
       CASE WHEN coalesce(na.n, 0) + coalesce(nb.n, 0) - coalesce(c.n, 0) > 0
            THEN coalesce(c.n, 0) * 1.0
                 / (coalesce(na.n, 0) + coalesce(nb.n, 0) - coalesce(c.n, 0))
            ELSE 0.0 END AS jaccard
FROM qs
LEFT JOIN na ON qs.query_id = na.query_id
LEFT JOIN nb ON qs.query_id = nb.query_id
LEFT JOIN c ON qs.query_id = c.query_id"""
