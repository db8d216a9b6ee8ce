"""Divergence-from-randomness retrieval: the PL2 model (Amati & van
Rijsbergen, TOIS 2002 — Poisson randomness, Laplace aftereffect,
normalization 2) — the third classic scoring family next to BM25 and
the smoothed language models (ciff_ray.lmdir).

PL2 needs exactly the statistics the index already stores (tf per
posting, doclength, cf per term, N, avgdl — the reference's CIFF
format carries df/cf per list precisely so downstream engines can
score beyond BM25; pisa-engine/ciff src/lib.rs PostingsList), so this
is pure scoring logic on the existing structure — no new index state.

Natural-log variant: the classic PL2 is written in log2.  Here BOTH
logs use ln — the outer rescale (every log2 -> ln multiplies each
contribution by the constant ln 2, rank-preserving) and, deliberately,
the tf normalization too:

    tfn      = tf * ln(1 + c * avgdl / dl)            (c = C_PARAM)
    lambda_t = cf_t / N
    score(q, d) = sum_{t in q, tf>0}
        (tfn * ln(tfn / lambda_t) + (lambda_t - tfn)
         + 0.5 * ln(TWO_PI * tfn)) / (tfn + 1.0)

Using ln inside tfn is a reparametrization of the same model family
(it scales tfn by ln 2, i.e. shifts the effective c), chosen so every
float op here is one of {+, -, *, /, ln} — the set the DuckDB oracle
mirrors bit-exactly (ln bit-matching between numpy and DuckDB is
already proven by the BM25 idf rows).  exp/log2/lgamma are NOT
bit-reproducible across libm implementations and never appear.

Candidate set: docs matching >= 1 query term (standard disjunctive
evaluation).  Contributions are signed as the model dictates — no
clamping anywhere (BM25's floored idf has no analogue here), and the
SQL oracle computes the identical values; stopword-scale terms score
near-flat across documents (lambda large, tfn small), rare terms
spike, which is the Poisson-divergence behaviour the model is for.

Scale shape: identical to BM25 score_all — per-term posting decode,
vectorized contribution over the posting array, one bincount over the
candidate union; dl enters every contribution (like JM), so the
doc-range-sharded doclength gather happens over the union BEFORE the
per-term loop's math.  No driver work beyond the k-row result.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

C_PARAM = 1.0
TWO_PI = 6.283185307179586  # shared literal with the SQL oracle
TOPK_K = 10


def pl2_score_all(scorer, query: str) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, pl2_scores) over docs matching >= 1 query term, for a
    ciff_ray.query.LocalScorer.  Per-term contributions are summed in
    byte-sorted term order; every float op is mirrored 1:1 (same op,
    same order) by the DuckDB oracle."""
    terms = [
        t for t in scorer._query_terms(query) if scorer._term_stat(t) is not None
    ]
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    n_docs = float(scorer.N)
    avgdl = float(scorer.avgdl)
    doc_parts, tf_parts, lam_parts = [], [], []
    for t in terms:
        docs, tfs = scorer.postings(t)
        if docs.size == 0:
            continue
        cf = float(scorer._term_stat(t)[1])
        doc_parts.append(docs)
        tf_parts.append(tfs.astype(np.float64))
        lam_parts.append(np.full(docs.size, cf / n_docs))
    if not doc_parts:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    all_docs = np.concatenate(doc_parts)
    u, inv = np.unique(all_docs, return_inverse=True)
    dl = scorer._dl.gather_sorted(u).astype(np.float64)
    # tfn = tf * ln(1 + (c * avgdl) / dl)   (left-assoc, oracle order)
    tfn = np.concatenate(tf_parts) * np.log(1.0 + (C_PARAM * avgdl) / dl[inv])
    lam = np.concatenate(lam_parts)
    contrib = (
        tfn * np.log(tfn / lam) + (lam - tfn) + 0.5 * np.log(TWO_PI * tfn)
    ) / (tfn + 1.0)
    scores = np.bincount(inv, weights=contrib)
    return u, scores


class _PL2ScorerActor:
    """map_batches actor: (query_id, query) -> top-k (query_id, rank,
    doc_id) under PL2.  Index state loads once per actor; ranking uses
    the engine-standard (round9 desc, doc_id asc) key."""

    def __init__(self, index_dir: str, k: int):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.query import LocalScorer

        qids, ranks, docs = [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            u, sc = pl2_score_all(self.scorer, q)
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


def q_dfr_pl2(sf_dir: str) -> ray.data.Dataset:
    """Top-k PL2 divergence-from-randomness retrieval for the fixed
    query set — (query_id, rank, doc_id)."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index

    idx = ensure_index(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _PL2ScorerActor,
            fn_constructor_args=(idx, TOPK_K),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def dfr_pl2_oracle_sql() -> str:
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
q(query_id, term) AS (VALUES {q_vals}),
normed AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id AS doc_id,
         CAST(tf.tf AS DOUBLE)
           * ln(1.0 + ({C_PARAM} * s.avgdl) / dl.dl) AS tfn,
         CAST(cf.cf AS DOUBLE) / s.n_docs AS lam
  FROM q
  JOIN tf USING (term)
  JOIN cf USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT query_id, doc_id,
         SUM(
           (tfn * ln(tfn / lam) + (lam - tfn)
            + 0.5 * ln({TWO_PI} * tfn)) / (tfn + 1.0)
         ) AS score
  FROM normed
  GROUP BY query_id, doc_id
)
SELECT query_id, CAST(rnk AS INT) AS rank, doc_id FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 9) DESC, doc_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOPK_K}"""
