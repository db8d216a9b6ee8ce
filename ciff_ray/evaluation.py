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


# ---------------------------------------------------------------------------
# ranking quality metrics (trec_eval analogue, self-contained qrels)

METRICS_K = 10
METRICS_GRADE_CAP = 12


class _RankingMetricsActor:
    """map_batches stage: (query_id, query) -> one metrics row per
    query.  Qrels are derived deterministically from the corpus itself
    (no external judgments): a doc's GRADE is its total term frequency
    over the query terms, capped at {METRICS_GRADE_CAP} (tf-weighted
    graded relevance — deliberately NOT the BM25 ordering, which adds
    idf and length normalization, so nDCG actually discriminates
    instead of saturating at 1.0); a doc is BINARY-relevant iff it
    contains every query term (the boolean AND set).  Metrics over the
    engine's own BM25 top-{METRICS_K}:

      ndcg10   graded nDCG@10, gain 2^grade - 1, log2 discount
      mrr10    1 / rank of the first binary-relevant doc in the top 10
      recall10 binary-relevant docs in the top 10 / n_rel

    Everything is computed from decoded posting lists inside the actor
    (grades are one np.unique over the query's concatenated docID
    lists — the same Σ df(t) bound the scoring pass pays; per query
    only the O(k) metrics row leaves the actor).  ndcg rounds to 9 dp
    on both sides (SUM-order jitter, same rule as the BM25 rank key);
    mrr/recall are single exact-integer divisions, bit-identical
    unrounded."""

    def __init__(self, index_dir: str):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)

    def _grades(
        self, terms: list[str]
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(docs, grade, matched-term count) over the union of the
        present terms' posting lists."""
        arrs, tfs = [], []
        for t in terms:
            if self.scorer._term_stat(t) is None:
                continue
            d, f = self.scorer.postings(t)
            arrs.append(d.astype(np.int64))
            tfs.append(f.astype(np.int64))
        if not arrs:
            e = np.empty(0, np.int64)
            return e, e, e
        u, inv, c = np.unique(
            np.concatenate(arrs), return_inverse=True, return_counts=True
        )
        gsum = np.bincount(inv, weights=np.concatenate(tfs)).astype(np.int64)
        return u, np.minimum(gsum, METRICS_GRADE_CAP), c.astype(np.int64)

    def _metrics_row(self, query: str) -> tuple[int, float, float, float]:
        from ciff_ray.oracle import tokenize

        terms = sorted(set(tokenize(query)))
        nt = len(terms)
        u, g, m = self._grades(terms)
        if u.size == 0:
            return 0, 0.0, 0.0, 0.0
        n_rel = int((m == nt).sum())
        d, _ = self.scorer.topk(query, k=METRICS_K)
        ranks = np.arange(1, d.size + 1, dtype=np.float64)
        pos = np.searchsorted(u, d)
        safe = np.minimum(pos, u.size - 1)
        found = (pos < u.size) & (u[safe] == d)
        gt = g[safe].astype(np.float64)
        gt[~found] = 0.0
        dcg = float(np.sum((2.0**gt - 1.0) / np.log2(ranks + 1.0)))
        ideal = np.sort(g)[::-1][:METRICS_K].astype(np.float64)
        ir = np.arange(1, ideal.size + 1, dtype=np.float64)
        idcg = float(np.sum((2.0**ideal - 1.0) / np.log2(ir + 1.0)))
        ndcg = round(dcg / idcg, 9) if idcg > 0 else 0.0
        mt = m[safe].astype(np.int64)
        mt[~found] = 0
        relmask = mt == nt
        first = np.flatnonzero(relmask)
        mrr = 1.0 / float(first[0] + 1) if first.size else 0.0
        recall = float(relmask.sum()) / n_rel if n_rel else 0.0
        return n_rel, ndcg, mrr, recall

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, nrels, ndcgs, mrrs, recalls = [], [], [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            n_rel, ndcg, mrr, recall = self._metrics_row(q)
            qids.append(int(qid))
            nrels.append(n_rel)
            ndcgs.append(ndcg)
            mrrs.append(mrr)
            recalls.append(recall)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "n_rel": pa.array(nrels, type=pa.int64()),
                "ndcg10": pa.array(ndcgs, type=pa.float64()),
                "mrr10": pa.array(mrrs, type=pa.float64()),
                "recall10": pa.array(recalls, type=pa.float64()),
            }
        )


def q_ranking_metrics(sf_dir: str):
    """Per-query retrieval-quality metrics for the fixed query set over
    the engine's own BM25 top-10 (see _RankingMetricsActor)."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index

    idx = ensure_index(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _RankingMetricsActor,
            fn_constructor_args=(idx,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def ranking_metrics_oracle_sql() -> str:
    """The same qrels + metrics in SQL: grades from a distinct
    (doc, term) join, BM25 top-10 from the shared scored CTE under the
    engine's exact round-9 rank key, DCG/IDCG as windowed sums."""
    from ciff_ray.pipelines import _bm25_scored_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    k = METRICS_K
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_scored_cte().lstrip()},
qn AS (SELECT query_id, count(*) AS nt FROM q GROUP BY query_id),
hit AS (
  -- tf (from the scored CTE block) is one row per (doc, term): the
  -- join count is the matched-term count, the capped tf sum the grade
  SELECT q.query_id, tf.doc_id, count(*) AS m,
         least(SUM(tf.tf), {METRICS_GRADE_CAP}) AS g
  FROM q JOIN tf USING (term) GROUP BY q.query_id, tf.doc_id
),
topk AS (
  SELECT query_id, doc_id, rnk FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 9) DESC, doc_id ASC)
             AS rnk
    FROM scored
  ) WHERE rnk <= {k}
),
dcg AS (
  SELECT t.query_id, SUM((pow(2, h.g) - 1) / log2(t.rnk + 1)) AS v
  FROM topk t JOIN hit h ON h.query_id = t.query_id AND h.doc_id = t.doc_id
  GROUP BY t.query_id
),
idcg AS (
  SELECT query_id, SUM((pow(2, g) - 1) / log2(rn + 1)) AS v FROM (
    SELECT query_id, g,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY g DESC, doc_id ASC) AS rn
    FROM hit
  ) WHERE rn <= {k} GROUP BY query_id
),
rel AS (
  SELECT h.query_id, h.doc_id
  FROM hit h JOIN qn USING (query_id) WHERE h.m = qn.nt
),
nrel AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY query_id),
firstrel AS (
  SELECT t.query_id, min(t.rnk) AS fr
  FROM topk t JOIN rel r ON r.query_id = t.query_id AND r.doc_id = t.doc_id
  GROUP BY t.query_id
),
relhits AS (
  SELECT t.query_id, count(*) AS nh
  FROM topk t JOIN rel r ON r.query_id = t.query_id AND r.doc_id = t.doc_id
  GROUP BY t.query_id
),
qs AS (SELECT DISTINCT query_id FROM q)
SELECT CAST(qs.query_id AS BIGINT) AS query_id,
       CAST(coalesce(n.n_rel, 0) AS BIGINT) AS n_rel,
       CASE WHEN coalesce(i.v, 0) > 0
            THEN round(d.v / i.v, 9) ELSE 0.0 END AS ndcg10,
       coalesce(1.0 / f.fr, 0.0) AS mrr10,
       CASE WHEN coalesce(n.n_rel, 0) > 0
            THEN coalesce(r.nh, 0) * 1.0 / n.n_rel ELSE 0.0 END AS recall10
FROM qs
LEFT JOIN nrel n ON n.query_id = qs.query_id
LEFT JOIN dcg d ON d.query_id = qs.query_id
LEFT JOIN idcg i ON i.query_id = qs.query_id
LEFT JOIN firstrel f ON f.query_id = qs.query_id
LEFT JOIN relhits r ON r.query_id = qs.query_id"""
