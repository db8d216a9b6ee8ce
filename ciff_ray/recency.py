"""Recency-decayed BM25: freshness-aware ranking over the `ts` column.

Transcript turns carry a timestamp (input_hint schema `(conv_id,
turn_idx, role, text, tool, ts)`); a search over an ever-growing
transcript log almost always wants newer turns ranked ahead of equally
relevant old ones.  This stage rescales every BM25 score by an
age-dependent decay before the final top-k:

    final(q, d) = bm25(q, d) * (1 / (1 + (age_seconds_d / 86400) / SCALE_DAYS))

i.e. a document SCALE_DAYS old scores half its raw BM25.  The decay is
the RATIONAL hyperbola rather than the textbook exp(-age/tau) ON
PURPOSE: the correctness gate compares float VALUES against a DuckDB
oracle, and `exp` is not bit-reproducible across libm implementations,
while +,-,*,/ are IEEE-exact — both engines compute the identical
doubles in the identical op order, so the gate stays a hash compare.
Swapping the hyperbola for an exponential is a one-line change with
the same plumbing.

Age reference: the newest turn in the collection (age 0), so the
ranking is input-deterministic — no wall clock anywhere.

Scale shape: decay is a vectorized O(|candidates|) multiply inside the
scorer actor, after score_all and before the top-k cut — no extra
shuffle, no side scan.  Doc timestamps here derive arithmetically from
doc_id (synth.transcripts_from_documents assigns ts = EPOCH + doc_id
seconds), mirroring how the facets stage resolves roles; a real
deployment stores ts as a docmap metadata column and the actor would
gather it exactly like doclengths (DoclengthStore's doc-range-sharded
lookup), an O(|candidates|) gather with no scan either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

RECENCY_SCALE_DAYS = 30.0
TOPK_K = 10


def decay_for_ages(age_seconds: np.ndarray) -> np.ndarray:
    """Vectorized hyperbolic decay; op order mirrored by the oracle."""
    return 1.0 / (1.0 + (age_seconds / 86400.0) / RECENCY_SCALE_DAYS)


class _RecencyScorer:
    """map_batches actor: (query_id, query) -> top-k (query_id, rank,
    doc_id) under recency-decayed BM25.  Index loads once per actor;
    per-query work is score_all (the exhaustive path — stored pruning
    bounds don't survive a score-dependent rescale) plus one decay
    multiply and the standard (round9 desc, doc_id asc) rank."""

    def __init__(self, index_dir: str, k: int):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.k = k
        # newest doc = highest docID under the synth ts rule
        self._max_doc = self.scorer.manifest.num_docs - 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.query import LocalScorer

        qids, ranks, docs = [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            u, sc = self.scorer.score_all(q)
            if u.size:
                age = (self._max_doc - u).astype(np.float64)
                sc = sc * decay_for_ages(age)
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


def q_bm25_recency(sf_dir: str) -> ray.data.Dataset:
    """Top-k under recency-decayed BM25 for the fixed query set —
    (query_id, rank, doc_id)."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index

    idx = ensure_index(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _RecencyScorer,
            fn_constructor_args=(idx, TOPK_K),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def bm25_recency_oracle_sql() -> str:
    from ciff_ray.pipelines import TOPK_K as _K
    from ciff_ray.pipelines import _bm25_scored_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    assert _K == TOPK_K
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_scored_cte().lstrip()},
aged AS (
  SELECT query_id, doc_id,
         score * (1.0 / (1.0 + ((((SELECT max(doc_id) FROM transcripts)
                                   - doc_id) / 86400.0)
                                 / {RECENCY_SCALE_DAYS}))) AS score
  FROM scored
)
SELECT query_id, CAST(rnk AS INT) AS rank, doc_id FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 9) DESC, doc_id ASC) AS rnk
  FROM aged
) WHERE rnk <= {TOPK_K}"""
