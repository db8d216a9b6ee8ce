"""Query-time synonym expansion (thesaurus rewrite) ahead of BM25.

The classic search-engine rewrite layer the reference leaves to
callers (pisa-engine/ciff src/lib.rs materializes one posting list per
term and performs no query analysis): each query token is looked up in
a fixed synonym table and the query is EXPANDED with every synonym
before retrieval, so out-of-vocabulary words ("quick") still reach the
documents that say "fast", and vocabulary words widen recall to their
equivalents.  Expansion-then-score equals scoring the UNION of the
term sets, because BM25 here sums one contribution per DISTINCT term
(LocalScorer._query_terms dedups) — which is exactly what the SQL
oracle computes from the same expanded strings.

Scale shape: the rewrite is a driver-side O(|query|) dictionary lookup
per query string; retrieval itself is the unchanged actor-pool serving
path (index loads once per actor, queries stream through in batches).
A production thesaurus would be a broadcast `ray.put` table read in
the scorer actor's __init__ — the expansion cost never touches the
corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ciff_ray.oracle import tokenize

# Fixed thesaurus: OOV -> vocabulary (the recall-repair case), and
# vocabulary -> vocabulary (the recall-widening case).  One-directional
# on purpose: "sort" pulls in "order", but "order" queries stay as
# written (asymmetric expansion is the common production setup, cf.
# Lucene SynonymGraphFilter with expand=false).
SYNONYMS: dict[str, tuple[str, ...]] = {
    "quick": ("fast",),
    "huge": ("big",),
    "tiny": ("small",),
    "combine": ("merge", "join"),
    "sort": ("order",),
    "tuple": ("row", "line"),
}

# OOV-only, mixed, vocab->vocab, multi-expansion, no-expansion, and a
# total-miss query — every branch of the rewrite.
SYNONYM_QUERY_SET = [
    "quick scan",
    "huge table sort",
    "combine the stream",
    "tiny tuple batch",
    "window key",
    "zzznotaterm quick",
]

TOPK_K = 10


def expand_query(query: str) -> str:
    """Original tokens plus every synonym, space-joined in first-seen
    order (order is irrelevant downstream: both the engine and the
    oracle reduce the string to a sorted distinct-term set)."""
    toks = tokenize(query)
    out = list(toks)
    for t in toks:
        out.extend(SYNONYMS.get(t, ()))
    return " ".join(out)


def _synonym_query_set_ds() -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(
                    np.arange(len(SYNONYM_QUERY_SET), dtype=np.int64)
                ),
                "query": pa.array(
                    [expand_query(q) for q in SYNONYM_QUERY_SET]
                ),
            }
        )
    )


def q_bm25_synonyms(sf_dir: str) -> ray.data.Dataset:
    """Top-k BM25 over the synonym-EXPANDED fixed query set —
    (query_id, rank, doc_id), rank-identical to the oracle's BM25 over
    the same expanded term sets."""
    from ciff_ray.pipelines import ensure_index
    from ciff_ray.query import QueryEngine

    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    return eng.score_dataset(
        _synonym_query_set_ds().repartition(4), k=TOPK_K, concurrency=(1, 4)
    ).select_columns(["query_id", "rank", "doc_id"])


def bm25_synonyms_oracle_sql() -> str:
    from ciff_ray.pipelines import _bm25_scored_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    expanded = [expand_query(q) for q in SYNONYM_QUERY_SET]
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_scored_cte(queries=expanded).lstrip()}
SELECT query_id, CAST(rnk AS INT) AS rank, doc_id FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 9) DESC, doc_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOPK_K}"""
