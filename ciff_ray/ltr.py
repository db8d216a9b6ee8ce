"""Learning-to-rank feature extraction: one pass that emits, for every
document in each query's BM25 top pool, the full scoring-family feature
vector — the training-data export step of an LTR stack (Elasticsearch
LTR / `sltr` feature logging; Lucene's FeatureField flow):

    (query_id, doc_id, rank, dl,
     bm25_r, lmdir_r, lmjm_r, pl2_r, tfidf_r)

Features are the engine's five scoring families computed on the SAME
index state the serving path uses (LocalScorer.score_all, lmdir.lm_*,
dfr.pl2, tfidf cosine over the doc-norms store), each rounded to 6 dp
(the bm25_scores cross-engine float-compare device).  The pool is the
exact BM25 top-POOL_K under the engine rank key, so the oracle can
reproduce it with the standard scored CTE.

Shape: one actor pool over the query set; per query each family is one
score_all (per-term decode + bincount over the shared candidate union)
and the feature lookup is a searchsorted into the family's candidate
array — pool-sized output, nothing corpus-sized on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

POOL_K = 10


class _LTRFeatureActor:
    """map_batches actor: (query_id, query) -> pool feature rows.
    Index + doc-norms state loads once per actor."""

    def __init__(self, index_dir: str, norms_dir: str, k: int):
        from ciff_ray.query import LocalScorer
        from ciff_ray.tfidf import DocnormStore

        self.scorer = LocalScorer(index_dir)
        self.norms = DocnormStore(norms_dir, self.scorer.N)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.dfr import pl2_score_all
        from ciff_ray.lmdir import lm_jm_score_all, lm_score_all
        from ciff_ray.query import LocalScorer
        from ciff_ray.tfidf import tfidf_score_all

        cols: dict[str, list] = {
            n: []
            for n in (
                "query_id", "doc_id", "rank", "dl",
                "bm25_r", "lmdir_r", "lmjm_r", "pl2_r", "tfidf_r",
            )
        }
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            u, s_bm = self.scorer.score_all(q)
            pool, _ = LocalScorer._rank(u, s_bm, self.k)
            if pool.size == 0:
                continue
            order = np.sort(pool)

            def feat(u_f: np.ndarray, s_f: np.ndarray) -> np.ndarray:
                # pool ⊆ candidates for every family (same disjunctive
                # candidate rule over the same query terms)
                idx = np.searchsorted(u_f, order)
                if idx.max(initial=-1) >= u_f.size or not np.array_equal(
                    u_f[idx], order
                ):
                    raise AssertionError("pool doc missing from family")
                return s_f[idx]

            def feat_or_zero(
                u_f: np.ndarray, s_f: np.ndarray
            ) -> np.ndarray:
                # tf-idf DROPS zero-norm docs (a doc whose every term
                # has df == N has no cosine direction) — such a doc can
                # still be in the BM25 pool (idf is floored), so its
                # tf-idf feature is 0.0, mirrored by the oracle's
                # LEFT JOIN + COALESCE
                from ciff_ray.query import sorted_member

                hit = sorted_member(u_f, order)
                out = np.zeros(order.size, dtype=np.float64)
                out[hit] = s_f[np.searchsorted(u_f, order[hit])]
                return out

            f_bm = feat(u, s_bm)
            f_lmd = feat(*lm_score_all(self.scorer, q))
            f_lmj = feat(*lm_jm_score_all(self.scorer, q))
            f_pl2 = feat(*pl2_score_all(self.scorer, q))
            f_tfi = feat_or_zero(*tfidf_score_all(self.scorer, self.norms, q))
            dl = self.scorer._dl.gather_sorted(order)
            rank_of = {int(d): r + 1 for r, d in enumerate(pool.tolist())}
            cols["query_id"].extend([qid] * order.size)
            cols["doc_id"].extend(order.tolist())
            cols["rank"].extend(rank_of[int(d)] for d in order)
            cols["dl"].extend(dl.tolist())
            for name, f in (
                ("bm25_r", f_bm), ("lmdir_r", f_lmd), ("lmjm_r", f_lmj),
                ("pl2_r", f_pl2), ("tfidf_r", f_tfi),
            ):
                cols[name].extend(np.round(f, 6).tolist())
        return pa.table(
            {
                "query_id": pa.array(cols["query_id"], type=pa.int64()),
                "doc_id": pa.array(cols["doc_id"], type=pa.int64()),
                "rank": pa.array(cols["rank"], type=pa.int32()),
                "dl": pa.array(cols["dl"], type=pa.int64()),
                "bm25_r": pa.array(cols["bm25_r"], type=pa.float64()),
                "lmdir_r": pa.array(cols["lmdir_r"], type=pa.float64()),
                "lmjm_r": pa.array(cols["lmjm_r"], type=pa.float64()),
                "pl2_r": pa.array(cols["pl2_r"], type=pa.float64()),
                "tfidf_r": pa.array(cols["tfidf_r"], type=pa.float64()),
            }
        )


def q_ltr_features(sf_dir: str) -> ray.data.Dataset:
    """Five-family LTR feature vectors over each query's BM25
    top-POOL_K pool."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index
    from ciff_ray.tfidf import ensure_docnorms

    idx = ensure_index(sf_dir)
    norms = ensure_docnorms(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _LTRFeatureActor,
            fn_constructor_args=(idx, norms, POOL_K),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def ltr_features_oracle_sql() -> str:
    from ciff_ray.dfr import C_PARAM, TWO_PI
    from ciff_ray.lmdir import JM_MULT, MU
    from ciff_ray.pipelines import _bm25_scored_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_scored_cte().lstrip()},
cf AS (SELECT term, count(*) AS cf FROM tok WHERE term <> '' GROUP BY term),
lmstats AS (
  SELECT (SELECT count(*) FROM tok WHERE term <> '') * 1.0 AS total_terms
),
nq AS (
  SELECT q.query_id, count(*) AS n FROM q JOIN cf USING (term)
  GROUP BY q.query_id
),
pool AS (
  SELECT query_id, doc_id, CAST(rnk AS INT) AS rank, round(score, 6) AS bm25_r
  FROM (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 9) DESC, doc_id ASC) AS rnk
    FROM scored
  ) WHERE rnk <= {POOL_K}
),
lmd_t AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id,
         SUM(ln(1.0 + (CAST(tf.tf AS DOUBLE) * s.total_terms)
                       / ({MU} * cf.cf))) AS tscore
  FROM q JOIN tf USING (term) JOIN cf USING (term) CROSS JOIN lmstats s
  GROUP BY q.query_id, tf.doc_id
),
lmd AS (
  SELECT m.query_id, m.doc_id,
         m.tscore + nq.n * ln({MU} / (dl.dl + {MU})) AS score
  FROM lmd_t m JOIN dl ON m.doc_id = dl.doc_id
  JOIN nq ON m.query_id = nq.query_id
),
lmj AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id,
         SUM(ln(1.0 + ({JM_MULT} * (CAST(tf.tf AS DOUBLE) / dl.dl))
                      * (s.total_terms / cf.cf))) AS score
  FROM q JOIN tf USING (term) JOIN cf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN lmstats s
  GROUP BY q.query_id, tf.doc_id
),
pl2n AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id,
         CAST(tf.tf AS DOUBLE)
           * ln(1.0 + ({C_PARAM} * s.avgdl) / dl.dl) AS tfn,
         CAST(cf.cf AS DOUBLE) / s.n_docs AS lam
  FROM q JOIN tf USING (term) JOIN cf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
),
pl2 AS (
  SELECT query_id, doc_id,
         SUM((tfn * ln(tfn / lam) + (lam - tfn)
              + 0.5 * ln({TWO_PI} * tfn)) / (tfn + 1.0)) AS score
  FROM pl2n GROUP BY query_id, doc_id
),
wt AS (
  SELECT tf.doc_id, tf.term,
         (1.0 + ln(tf.tf)) * ln(s.n_docs / df.df) AS w
  FROM tf JOIN df USING (term) CROSS JOIN stats s
),
nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS norm FROM wt GROUP BY doc_id),
tfi AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, wt.doc_id AS doc_id,
         SUM(wt.w) / n.norm AS score
  FROM q JOIN wt USING (term) JOIN nrm n ON wt.doc_id = n.doc_id
  WHERE n.norm > 0
  GROUP BY q.query_id, wt.doc_id, n.norm
)
SELECT p.query_id, p.doc_id, p.rank, dl.dl AS dl, p.bm25_r,
       round(lmd.score, 6) AS lmdir_r,
       round(lmj.score, 6) AS lmjm_r,
       round(pl2.score, 6) AS pl2_r,
       COALESCE(round(tfi.score, 6), 0.0) AS tfidf_r
FROM pool p
JOIN dl ON p.doc_id = dl.doc_id
JOIN lmd ON p.query_id = lmd.query_id AND p.doc_id = lmd.doc_id
JOIN lmj ON p.query_id = lmj.query_id AND p.doc_id = lmj.doc_id
JOIN pl2 ON p.query_id = pl2.query_id AND p.doc_id = pl2.doc_id
LEFT JOIN tfi ON p.query_id = tfi.query_id AND p.doc_id = tfi.doc_id"""
