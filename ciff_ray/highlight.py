"""Positional highlighting: for each query, the token positions of
every query term inside the query's BM25 top pool — the data a result
highlighter needs to mark up snippets (Lucene's unified-highlighter
"offsets from postings" strategy, over this engine's positional store
instead of re-analyzing document text at query time).

The reference's positional zips (J1/J2, pisa-engine/ciff positional
lists) exist precisely so consumers can light up match positions
without touching the raw text; this entry is that consumer: the pool
comes from the frequency index (exact BM25 top-POOL_K), the spans come
from the positional store (ciff_ray.positions.PositionStore.keys —
term-hash-partitioned parquet, term + candidate-doc pushdown), and no
document text is read anywhere.

Output positions are 1-based token ordinals so the oracle can mirror
them verbatim with DuckDB's 1-based ``generate_subscripts`` (the store
itself is 0-based; the +1 happens at emit).  All output columns are
integers/strings — the gate stays an exact hash compare.

Scale shape: per query the work is one top-k evaluation plus
|query terms| candidate-filtered store reads over <= POOL_K docs —
the same read pattern as phrase/proximity verification.  Nothing is
corpus-sized; the result is O(POOL_K x query length x tf) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

POOL_K = 10  # highlight the standard top-k page


class _HighlightActor:
    """map_batches actor: (query_id, query) -> (query_id, doc_id,
    term, pos) match spans over the query's exact BM25 top-POOL_K
    pool.  Index + positional-store state loads once per actor."""

    def __init__(self, index_dir: str, store_root: str, k: int):
        from ciff_ray.positions import PositionStore
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.store = PositionStore(store_root)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.query import LocalScorer

        qids, docs, terms_out, poss = [], [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            terms = sorted(
                {
                    t
                    for t in self.scorer._query_terms(q)
                    if self.scorer._term_stat(t) is not None
                }
            )
            if not terms:
                continue
            u, sc = self.scorer.score_all(q)
            pool, _ = LocalScorer._rank(u, sc, self.k)
            if pool.size == 0:
                continue
            cand = np.sort(pool)
            for t in terms:
                keys = self.store.keys(t, cand)
                if keys.size == 0:
                    continue
                d = (keys >> np.uint64(32)).astype(np.int64)
                # store positions are 0-based; emit 1-based ordinals
                # (the oracle's generate_subscripts convention)
                p = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64) + 1
                qids.extend([qid] * d.size)
                docs.extend(d.tolist())
                terms_out.extend([t] * d.size)
                poss.extend(p.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "term": pa.array(terms_out, type=pa.string()),
                "pos": pa.array(poss, type=pa.int64()),
            }
        )


def q_highlight_spans(sf_dir: str) -> ray.data.Dataset:
    """Match spans (query_id, doc_id, term, pos) of every query term
    over the query's BM25 top-POOL_K pool, from the positional store."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index
    from ciff_ray.positions import ensure_positions

    idx = ensure_index(sf_dir)
    store = ensure_positions(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _HighlightActor,
            fn_constructor_args=(idx, store, POOL_K),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def highlight_spans_oracle_sql() -> str:
    from ciff_ray.pipelines import _bm25_scored_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_scored_cte().lstrip()},
pool AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 9) DESC, doc_id ASC) AS rnk
    FROM scored
  ) WHERE rnk <= {POOL_K}
),
tokl AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM transcripts
),
tokpos AS (
  SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos FROM tokl
)
SELECT p.query_id, p.doc_id, tp.term, CAST(tp.pos AS BIGINT) AS pos
FROM pool p
JOIN q USING (query_id)
JOIN tokpos tp ON tp.doc_id = p.doc_id AND tp.term = q.term"""
