"""Similarity search over the `embeddings` table (list<float> column).

* q_knn_brute — exact top-k cosine: the query matrix is ray.put once
  and every map_batches task computes a (batch x queries) GEMM against
  it; each task emits only its per-batch top-k, the driver merges
  num_blocks x k candidate rows (never the full score matrix).
* q_ann_ivf — IVF-bucketed variant (the 100 TB scale path): assign
  vectors to the nearest of C deterministic centroids (one map_batches
  pass), search only the n_probe closest buckets per query.  Approximate
  -> rows-only entry; recall vs brute force is asserted in tests.

Ranking rule (both variants): cosine rounded to 9 dp DESC, vec_id ASC —
the rounding makes float ties deterministic across engines.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _embedding_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix, zero-copy flatten
    (no per-element Python objects)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    d = int(lengths[0])
    if not (lengths == d).all():
        raise ValueError("ragged embedding column")
    flat = np.asarray(pc.list_flatten(col))
    return flat.reshape(n, d).astype(np.float64, copy=False)

N_QUERIES = 8  # query set = embeddings with vec_id < N_QUERIES
TOP_K = 10
IVF_CENTROIDS = 16  # deterministic: the first IVF_CENTROIDS vectors
IVF_PROBES = 4


def _load_embeddings(sf_dir: str):
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    E = _embedding_matrix(tbl["embedding"])
    return path, ids, E


def _query_matrix(ids: np.ndarray, E: np.ndarray):
    order = np.argsort(ids)
    qmask = ids[order] < N_QUERIES
    qids = ids[order][qmask]
    Q = E[order][qmask]
    return qids, Q


class _BatchTopK:
    """Per-batch exact scorer: GEMM vs the broadcast query matrix, then
    per-query partial top-k so only k rows per (query, batch) move."""

    def __init__(self, qref, k: int):
        self.qids, self.Q = ray.get(qref)
        self.qn = np.sqrt((self.Q * self.Q).sum(axis=1))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        V = _embedding_matrix(batch["embedding"])
        vn = np.sqrt((V * V).sum(axis=1))
        sims = (self.Q @ V.T) / (self.qn[:, None] * vn[None, :])
        sims = np.round(sims, 9)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            s = sims[qi].copy()
            s[vid == qid] = -np.inf  # exclude self
            k = min(self.k, s.size)
            # partial select, then exact order (score desc, vec_id asc)
            cand = np.argpartition(-s, k - 1)[:k] if s.size > k else np.arange(s.size)
            order = np.lexsort((vid[cand], -s[cand]))
            sel = cand[order][:k]
            sel = sel[np.isfinite(s[sel])]
            out_q.extend([qid] * sel.size)
            out_v.extend(vid[sel].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )


def _merge_topk(rows: list[dict], k: int) -> pa.Table:
    by_q: dict[int, list[tuple[float, int]]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["sim"], r["vec_id"]))
    out_q, out_r, out_v = [], [], []
    for qid in sorted(by_q):
        cands = sorted(by_q[qid], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (_, vid) in enumerate(cands, 1):
            out_q.append(qid)
            out_r.append(rank)
            out_v.append(vid)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
        }
    )


def q_knn_brute(sf_dir: str) -> pa.Table:
    """Exact top-10 cosine neighbors for the fixed query set
    (query_id, rank, vec_id)."""
    path, ids, E = _load_embeddings(sf_dir)
    qref = ray.put(_query_matrix(ids, E))
    parts = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(
            _BatchTopK,
            fn_constructor_args=(qref, TOP_K),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .take_all()
    )
    return _merge_topk(parts, TOP_K)


def q_ann_ivf(sf_dir: str) -> pa.Table:
    """IVF approximate top-10 (rows-only): bucket by nearest of the
    first IVF_CENTROIDS vectors, probe the IVF_PROBES closest buckets.
    Same output schema as q_knn_brute; recall asserted in tests."""
    path, ids, E = _load_embeddings(sf_dir)
    order = np.argsort(ids)
    cent_mask = ids[order] < IVF_CENTROIDS
    C = E[order][cent_mask]
    C = C / np.sqrt((C * C).sum(axis=1, keepdims=True))
    qids, Q = _query_matrix(ids, E)
    cref = ray.put(C)
    qref = ray.put((qids, Q))

    qn = np.sqrt((Q * Q).sum(axis=1))
    probe = np.argsort(-(Q @ C.T) / qn[:, None], axis=1)[:, :IVF_PROBES]
    probe_ref = ray.put(probe)

    class IvfScorer(_BatchTopK):
        def __init__(self, qref, k, cref, probe_ref):
            super().__init__(qref, k)
            self.C = ray.get(cref)
            self.probe = ray.get(probe_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            V = _embedding_matrix(batch["embedding"])
            vn = np.sqrt((V * V).sum(axis=1))
            assign = np.argmax((V @ self.C.T) / vn[:, None], axis=1)
            sims = (self.Q @ V.T) / (self.qn[:, None] * vn[None, :])
            sims = np.round(sims, 9)
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                in_probe = np.isin(assign, self.probe[qi]) & (vid != qid)
                idx = np.nonzero(in_probe)[0]
                if idx.size == 0:
                    continue
                s = sims[qi][idx]
                k = min(self.k, s.size)
                cand = np.argpartition(-s, k - 1)[:k] if s.size > k else np.arange(s.size)
                o = np.lexsort((vid[idx][cand], -s[cand]))
                sel = cand[o][:k]
                out_q.extend([qid] * sel.size)
                out_v.extend(vid[idx][sel].tolist())
                out_s.extend(s[sel].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "vec_id": pa.array(out_v, type=pa.int64()),
                    "sim": pa.array(out_s, type=pa.float64()),
                }
            )

    parts = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(
            IvfScorer,
            fn_constructor_args=(qref, TOP_K, cref, probe_ref),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .take_all()
    )
    return _merge_topk(parts, TOP_K)


ORACLE_SQLS = {
    "knn_brute": f"""WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 9)
           AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id
FROM ranked WHERE rnk <= {TOP_K}""",
}

QUERIES = {
    "knn_brute": q_knn_brute,
    "ann_ivf": q_ann_ivf,  # rows-only (approximate by design)
}
