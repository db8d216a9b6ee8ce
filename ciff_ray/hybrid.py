"""Hybrid sparse + dense retrieval: BM25 and exact-cosine kNN candidate
pools fused by reciprocal-rank fusion (RRF).

For each fixed query i the sparse side is the engine's BM25 top-POOL
over the derived transcripts (``pipelines.QUERY_SET[i]``) and the dense
side is the exact cosine top-POOL over the ``embeddings`` table for the
query vector ``vec_id = HYBRID_QUERY_VECS[i]`` (self excluded, knn
convention).  Fusion: ``rrf(d) = 1/(RRF_K + r_sparse) + 1/(RRF_K +
r_dense)`` over the union of the two pools (a missing side contributes
0), final rank by (rrf desc, doc_id asc).

Contract: documents and embeddings share one id space (the driver
tables are 1:1 — ``documents.doc_id == embeddings.vec_id``; the index's
internal docid equals ``documents.doc_id`` because docid rank by
(conv_id, turn_idx) is the identity under the derived-transcripts rule,
see ciff_ray.synth).

100-TB shape: both candidate generators are the engine's existing
distributed paths — the BM25 scorer actor pool over the index
(query.py ScorerActor) and the broadcast-query-matrix per-batch partial
top-k GEMM over the embedding table (extras.simsearch._BatchTopK);
each moves only ``pool`` rows per (query, block).  The fusion input is
O(n_queries x pool) rows BY CONSTRUCTION — independent of corpus size —
so the final join + rank is one vectorized driver kernel, not a
shuffle.

Reference scope note: the reference (pisa-engine/ciff) carries no
query engine at all (SURVEY.md §2.7 O5); hybrid fusion is part of this
engine's beyond-reference retrieval surface (SURVEY.md §2.11).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ciff_ray.pipelines import (
    QUERY_SET,
    TOPK_K,
    _query_set_ds,
    ensure_index,
)
from ciff_ray.query import QueryEngine

RRF_K = 60
POOL = 20  # per-side candidate pool depth (>= final k)

# query i's dense side: embedding of vec_id 5*i + 1 (fixed spread over
# the id range, disjoint from the knn_brute query prefix so the two
# entries exercise different vectors)
HYBRID_QUERY_VECS = [5 * i + 1 for i in range(len(QUERY_SET))]

_KEY_MUL = np.int64(1) << np.int64(32)


def _sparse_pool(sf_dir: str) -> pa.Table:
    """BM25 (query_id, rank, doc_id) pool rows, rank <= POOL — the
    distributed serving path (scorer actor pool)."""
    idx = ensure_index(sf_dir)
    eng = QueryEngine(idx)
    ds = eng.score_dataset(
        _query_set_ds().repartition(4), k=POOL, concurrency=(1, 4)
    ).select_columns(["query_id", "rank", "doc_id"])
    return pa.Table.from_pylist(ds.take_all())


def _dense_pool(sf_dir: str) -> pa.Table:
    """Cosine (query_id, rank, doc_id) pool rows, rank <= POOL, self
    excluded — broadcast query matrix + per-batch partial top-k, ranks
    identical to the knn_brute path (9-dp-rounded sims, (sim desc,
    vec_id asc) ties)."""
    import os

    import pyarrow.parquet as pq

    from ciff_ray.extras.simsearch import _BatchTopK, _merge_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", HYBRID_QUERY_VECS)],
    )
    from ciff_ray.extras.dedup import _embedding_matrix

    ids = qt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids)
    if not np.array_equal(
        ids[order], np.sort(np.array(HYBRID_QUERY_VECS, dtype=np.int64))
    ):
        raise KeyError("hybrid query vec_id missing from embeddings")
    # qids = the query VECTOR ids so _BatchTopK's vid == qid self-mask
    # excludes exactly the query's own vector
    qref = ray.put((ids[order], _embedding_matrix(qt["embedding"])[order]))
    parts = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(
            _BatchTopK,
            fn_constructor_args=(qref, POOL),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .take_all()
    )
    merged = _merge_topk(parts, POOL)  # (query_id=vec_id, rank, vec_id)
    # remap vector id -> hybrid query_id
    vec_to_q = {v: i for i, v in enumerate(HYBRID_QUERY_VECS)}
    qids = np.array(
        [vec_to_q[v] for v in merged["query_id"].to_pylist()], dtype=np.int64
    )
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": merged["rank"],
            "doc_id": merged["vec_id"],
        }
    )


def _fuse(sparse: pa.Table, dense: pa.Table, k: int) -> pa.Table:
    """RRF over the two pools: one composite-key union + two indexed
    adds (sparse first, then dense — the same operand order as the
    oracle's coalesce(s)+coalesce(d)), then per-query rank."""

    def cols(t: pa.Table):
        q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return q, r, d

    sq, sr, sd = cols(sparse)
    dq, dr, dd = cols(dense)
    keys = np.unique(
        np.concatenate([sq * _KEY_MUL + sd, dq * _KEY_MUL + dd])
    )
    rrf = np.zeros(keys.size, dtype=np.float64)
    rrf[np.searchsorted(keys, sq * _KEY_MUL + sd)] += 1.0 / (RRF_K + sr)
    rrf[np.searchsorted(keys, dq * _KEY_MUL + dd)] += 1.0 / (RRF_K + dr)
    q = (keys // _KEY_MUL).astype(np.int64)
    d = (keys % _KEY_MUL).astype(np.int64)
    # per-query top-k by (rrf desc, doc_id asc)
    order = np.lexsort((d, -rrf, q))
    q, d, rrf = q[order], d[order], rrf[order]
    pos = np.arange(q.size) - np.searchsorted(q, q)  # 0-based rank per query
    keep = pos < k
    return pa.table(
        {
            "query_id": pa.array(q[keep], type=pa.int64()),
            "rank": pa.array(pos[keep] + 1, type=pa.int64()),
            "doc_id": pa.array(d[keep], type=pa.int64()),
            "rrf_r": pa.array(np.round(rrf[keep], 6), type=pa.float64()),
        }
    )


def q_hybrid_rrf(sf_dir: str) -> pa.Table:
    """Hybrid top-k (query_id, rank, doc_id, rrf_r): BM25 + cosine-kNN
    pools fused by reciprocal-rank fusion."""
    return _fuse(_sparse_pool(sf_dir), _dense_pool(sf_dir), TOPK_K)


def hybrid_oracle_sql() -> str:
    """DuckDB equivalent: the bm25_topk scored CTE ranked to POOL, the
    knn cosine ranking for the hybrid query vectors ranked to POOL, a
    full outer join, coalesce-summed RRF, final per-query row_number."""
    from ciff_ray.pipelines import _bm25_scored_cte
    from ciff_ray.synth import SQL_TRANSCRIPTS_CTE

    qv = ", ".join(
        f"({i}, {v})" for i, v in enumerate(HYBRID_QUERY_VECS)
    )
    return f"""WITH {SQL_TRANSCRIPTS_CTE.strip()},
{_bm25_scored_cte().lstrip()},
sp AS (
  SELECT query_id, doc_id, rnk FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(score, 9) DESC, doc_id ASC) AS rnk
    FROM scored
  ) WHERE rnk <= {POOL}
),
qv(query_id, qvec) AS (VALUES {qv}),
dscored AS (
  SELECT qv.query_id, e.vec_id AS doc_id,
         round(list_cosine_similarity(CAST(s.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 9)
           AS sim
  FROM qv
  JOIN embeddings s ON s.vec_id = qv.qvec
  JOIN embeddings e ON e.vec_id <> qv.qvec
),
dn AS (
  SELECT query_id, doc_id, rnk FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, doc_id ASC) AS rnk
    FROM dscored
  ) WHERE rnk <= {POOL}
),
fused AS (
  SELECT coalesce(sp.query_id, dn.query_id) AS query_id,
         coalesce(sp.doc_id, dn.doc_id) AS doc_id,
         coalesce(1.0 / ({RRF_K} + sp.rnk), 0.0)
           + coalesce(1.0 / ({RRF_K} + dn.rnk), 0.0) AS rrf
  FROM sp FULL OUTER JOIN dn
    ON sp.query_id = dn.query_id AND sp.doc_id = dn.doc_id
)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       round(rrf, 6) AS rrf_r
FROM (
  SELECT query_id, doc_id, rrf,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf DESC, doc_id ASC) AS rnk
  FROM fused
) WHERE rnk <= {TOPK_K}"""
