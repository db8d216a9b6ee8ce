"""Hit-context expansion: for every top-k hit, the hit turn plus its
adjacent turns FROM THE SAME CONVERSATION — the "show surrounding
messages" primitive of a transcript-search UI (chat search result
context windows).

The engine exploits the docID assignment invariant (T1: docid = dense
rank under byte-ascending (conv_id, turn_idx)): a conversation's turns
are CONTIGUOUS docids, so the candidate context of hit d is exactly
{d-1, d, d+1} clipped to [0, N), filtered to the hit's conversation.
The conversation check reads the docmap's collection_docid through the
doc-range-sharded TitleStore — O(k) shards per query batch, never the
docmap (the invariant the decoration path is built on).

Output: (query_id, rank, doc_id, ctx_doc_id, offset) with offset in
{-1, 0, +1} — integer columns only, exact hash compare.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

TOPK_K = 10
CTX = 1  # turns of context on each side


def _conv_of(collection_docid: str) -> str:
    """conv prefix of a 'conv-XXXXXXX/turn' collection docid."""
    return collection_docid.rsplit("/", 1)[0]


class _ContextActor:
    """map_batches actor: (query_id, query) -> context rows of the
    exact BM25 top-k."""

    def __init__(self, index_dir: str, k: int):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.query import LocalScorer

        n = self.scorer.N
        cols: dict[str, list] = {
            c: [] for c in ("query_id", "rank", "doc_id", "ctx_doc_id", "offset")
        }
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            u, s = self.scorer.score_all(q)
            pool, _ = LocalScorer._rank(u, s, self.k)
            if pool.size == 0:
                continue
            # one decoration lookup for hits + both neighbor candidates
            cand = np.unique(
                np.clip(
                    np.concatenate([pool - CTX, pool, pool + CTX]), 0, n - 1
                )
            )
            titles = dict(
                zip(cand.tolist(), self.scorer.collection_docids(cand))
            )
            for r, d in enumerate(pool.tolist(), start=1):
                conv = _conv_of(titles[d])
                for off in range(-CTX, CTX + 1):
                    c = d + off
                    if c < 0 or c >= n:
                        continue
                    if _conv_of(titles[c]) != conv:
                        continue
                    cols["query_id"].append(qid)
                    cols["rank"].append(r)
                    cols["doc_id"].append(d)
                    cols["ctx_doc_id"].append(c)
                    cols["offset"].append(off)
        return pa.table(
            {
                "query_id": pa.array(cols["query_id"], type=pa.int64()),
                "rank": pa.array(cols["rank"], type=pa.int32()),
                "doc_id": pa.array(cols["doc_id"], type=pa.int64()),
                "ctx_doc_id": pa.array(cols["ctx_doc_id"], type=pa.int64()),
                "offset": pa.array(cols["offset"], type=pa.int32()),
            }
        )


def q_hit_context(sf_dir: str) -> ray.data.Dataset:
    """±1-turn same-conversation context of each BM25 top-k hit —
    (query_id, rank, doc_id, ctx_doc_id, offset)."""
    from ciff_ray.pipelines import _query_set_ds, ensure_index

    idx = ensure_index(sf_dir)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _ContextActor,
            fn_constructor_args=(idx, TOPK_K),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )


def hit_context_oracle_sql() -> str:
    from ciff_ray.pipelines import _bm25_scored_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_scored_cte().lstrip()},
pool AS (
  SELECT query_id, doc_id, CAST(rnk AS INT) AS rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 9) DESC, doc_id ASC) AS rnk
    FROM scored
  ) WHERE rnk <= {TOPK_K}
)
SELECT p.query_id, p.rank, p.doc_id,
       tc.doc_id AS ctx_doc_id,
       CAST(tc.turn_idx - th.turn_idx AS INT) AS offset
FROM pool p
JOIN transcripts th ON th.doc_id = p.doc_id
JOIN transcripts tc ON tc.conv_id = th.conv_id
 AND abs(tc.turn_idx - th.turn_idx) <= {CTX}"""
