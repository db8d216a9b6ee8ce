"""Language-model retrieval: Dirichlet and Jelinek-Mercer smoothing
(Zhai & Lafferty, SIGIR 2001) — the second classic scoring family next
to BM25.

The reference scores BM25 only (pisa-engine/ciff src/lib.rs stores
df/cf per list; cf exists precisely so LM scoring is possible
downstream); this module puts query-likelihood ranking directly on the
same index, using the rank-equivalent inverted-index decomposition:

    score(q, d) = sum_{t in q, tf>0} ln(1 + tf_{t,d} * |C| / (MU * cf_t))
                + n_q * ln(MU / (dl_d + MU))

where |C| = total terms in the collection, cf_t = collection frequency
of t, n_q = number of DISTINCT in-vocabulary query terms, and the
candidate set is docs matching >= 1 query term (the standard
disjunctive evaluation — a no-match doc's score has no tf part and is
never competitive at small k).  Every float op (cast, *, /, +, ln) is
mirrored 1:1 by the DuckDB oracle in the same order, so the gate stays
an exact hash compare: ln bit-matching between numpy and DuckDB is
already proven by the BM25 idf rows.

Scale shape: identical to BM25 score_all — per-term posting decode,
vectorized contribution, one bincount; the dl part is one gather over
the candidate set (DoclengthStore's doc-range-sharded lookup).  No new
index structure: cf comes from term_stats, |C| from the manifest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

MU = 2000.0
TOPK_K = 10
# Jelinek-Mercer: p = (1-l)*p_ml(t|d) + l*p(t|C) with collection weight
# l = 0.2, so the rank-equivalent multiplier (1-l)/l is EXACTLY 4.0 in
# binary float — the numpy kernel and the SQL oracle share the literal.
JM_MULT = 4.0


def lm_score_all(scorer, query: str) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, lm_scores) over docs matching >= 1 query term, for a
    ciff_ray.query.LocalScorer.  Summation in byte-sorted term order;
    the length-normalization part is added last (oracle-identical op
    order)."""
    terms = [
        t for t in scorer._query_terms(query) if scorer._term_stat(t) is not None
    ]
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    total_terms = float(scorer.manifest.total_terms_in_collection)
    doc_parts, contrib_parts = [], []
    for t in terms:
        docs, tfs = scorer.postings(t)
        if docs.size == 0:
            continue
        cf = float(scorer._term_stat(t)[1])
        x = tfs.astype(np.float64) * total_terms
        x /= MU * cf
        doc_parts.append(docs)
        contrib_parts.append(np.log(1.0 + x))
    if not doc_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    all_docs = np.concatenate(doc_parts)
    all_contrib = np.concatenate(contrib_parts)
    u, inv = np.unique(all_docs, return_inverse=True)
    scores = np.bincount(inv, weights=all_contrib)
    dl = scorer._dl.gather_sorted(u).astype(np.float64)
    scores = scores + float(len(terms)) * np.log(MU / (dl + MU))
    return u, scores


def lm_jm_score_all(scorer, query: str) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, scores) under Jelinek-Mercer smoothing for docs
    matching >= 1 query term:

        score(q, d) = sum_{t in q, tf>0}
                      ln(1 + JM_MULT * (tf_{t,d} / dl_d) * (|C| / cf_t))

    The doc-independent ``sum ln(l * p(t|C))`` part is constant per
    query and dropped (standard rank-equivalent form).  Unlike
    Dirichlet, dl enters every per-posting contribution, so the dl
    gather happens over the candidate union BEFORE the log — op order
    mirrored 1:1 by the oracle."""
    terms = [
        t for t in scorer._query_terms(query) if scorer._term_stat(t) is not None
    ]
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    total_terms = float(scorer.manifest.total_terms_in_collection)
    doc_parts, tf_parts, ratio_parts = [], [], []
    for t in terms:
        docs, tfs = scorer.postings(t)
        if docs.size == 0:
            continue
        cf = float(scorer._term_stat(t)[1])
        doc_parts.append(docs)
        tf_parts.append(tfs.astype(np.float64))
        ratio_parts.append(np.full(docs.size, total_terms / cf))
    if not doc_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    all_docs = np.concatenate(doc_parts)
    u, inv = np.unique(all_docs, return_inverse=True)
    dl = scorer._dl.gather_sorted(u).astype(np.float64)
    # JM_MULT * (tf / dl) * (total/cf), left-assoc like the SQL
    x = JM_MULT * (np.concatenate(tf_parts) / dl[inv])
    x = x * np.concatenate(ratio_parts)
    scores = np.bincount(inv, weights=np.log(1.0 + x))
    return u, scores


class _LMScorerActor:
    """map_batches actor: (query_id, query) -> top-k (query_id, rank,
    doc_id) under a smoothed-LM query likelihood (``smoothing`` picks
    Dirichlet or Jelinek-Mercer).  Index state loads once per actor;
    ranking uses the engine-standard (round9 desc, doc_id asc) key."""

    def __init__(self, index_dir: str, k: int, smoothing: str = "dirichlet"):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.k = k
        self.score_all = (
            lm_score_all if smoothing == "dirichlet" else lm_jm_score_all
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.query import LocalScorer

        qids, ranks, docs = [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            u, sc = self.score_all(self.scorer, q)
            d, _ = LocalScorer._rank(u, sc, self.k)
            qids.extend([qid] * len(d))
            ranks.extend(range(1, len(d) + 1))
            docs.extend(d.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(docs, type=pa.int64()),
            }
        )


def q_lm_dirichlet(sf_dir: str) -> ray.data.Dataset:
    """Top-k Dirichlet query-likelihood retrieval for the fixed query
    set — (query_id, rank, doc_id)."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index

    idx = ensure_index(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _LMScorerActor,
            fn_constructor_args=(idx, TOPK_K),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def q_lm_jm(sf_dir: str) -> ray.data.Dataset:
    """Top-k Jelinek-Mercer query-likelihood retrieval for the fixed
    query set — (query_id, rank, doc_id)."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index

    idx = ensure_index(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _LMScorerActor,
            fn_constructor_args=(idx, TOPK_K, "jm"),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def lm_jm_oracle_sql() -> str:
    from ciff_ray.oracle import tokenize
    from ciff_ray.pipelines import QUERY_SET, _bm25_base_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    q_vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in enumerate(QUERY_SET)
        for t in sorted(set(tokenize(q)))
    )
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_base_cte().lstrip()},
cf AS (SELECT term, count(*) AS cf FROM tok WHERE term <> '' GROUP BY term),
lmstats AS (
  SELECT (SELECT count(*) FROM tok WHERE term <> '') * 1.0 AS total_terms
),
q(query_id, term) AS (VALUES {q_vals}),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id,
         SUM(ln(1.0 + ({JM_MULT} * (CAST(tf.tf AS DOUBLE) / dl.dl))
                      * (s.total_terms / cf.cf))) AS score
  FROM q
  JOIN tf USING (term)
  JOIN cf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN lmstats s
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, CAST(rnk AS INT) AS rank, doc_id FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 9) DESC, doc_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOPK_K}"""


def lm_dirichlet_oracle_sql() -> str:
    from ciff_ray.oracle import tokenize
    from ciff_ray.pipelines import QUERY_SET, _bm25_base_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    q_vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in enumerate(QUERY_SET)
        for t in sorted(set(tokenize(q)))
    )
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_base_cte().lstrip()},
cf AS (SELECT term, count(*) AS cf FROM tok WHERE term <> '' GROUP BY term),
lmstats AS (
  SELECT (SELECT count(*) FROM tok WHERE term <> '') * 1.0 AS total_terms
),
q(query_id, term) AS (VALUES {q_vals}),
nq AS (
  SELECT q.query_id, count(*) AS n FROM q JOIN cf USING (term)
  GROUP BY q.query_id
),
matched AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id,
         SUM(ln(1.0 + (CAST(tf.tf AS DOUBLE) * s.total_terms)
                       / ({MU} * cf.cf))) AS tscore
  FROM q
  JOIN tf USING (term)
  JOIN cf USING (term)
  CROSS JOIN lmstats s
  GROUP BY q.query_id, tf.doc_id
),
scored AS (
  SELECT m.query_id, m.doc_id,
         m.tscore + nq.n * ln({MU} / (dl.dl + {MU})) AS score
  FROM matched m
  JOIN dl ON m.doc_id = dl.doc_id
  JOIN nq ON m.query_id = nq.query_id
)
SELECT query_id, CAST(rnk AS INT) AS rank, doc_id FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 9) DESC, doc_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOPK_K}"""
