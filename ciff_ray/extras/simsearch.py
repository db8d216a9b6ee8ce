"""Similarity search over the `embeddings` table (list<float> column).

* q_knn_brute — exact top-k cosine: the query matrix is ray.put once
  and every map_batches task computes a (batch x queries) GEMM against
  it; each task emits only its per-batch top-k, the driver merges
  num_blocks x k candidate rows (never the full score matrix).
* q_ann_ivf — REAL IVF (the 100 TB scale path): a spherical-k-means-
  trained quantizer (deterministic first-k init, distributed Lloyd's
  passes) assigns every vector to its bucket and one build pass writes
  it into that bucket's parquet partition (each map task writes its own
  per-bucket files — hash-partitioned layout with NO all-to-all
  shuffle); queries then READ ONLY the probed bucket partitions, so
  per-query IO and FLOPs scale with probed-bucket size, not N.  The
  bucket store lives under the configurable shared cache root
  (CIFF_RAY_CACHE_ROOT — point it at shared storage on a cluster),
  keyed by the input fingerprint, and is resumable (done-marker +
  atomic rename; part filenames are deterministic per input batch so
  task retries overwrite, not duplicate).  Approximate -> rows-only
  entry; recall vs brute force is asserted in tests.

Ranking rule (both variants): cosine rounded to 9 dp DESC, vec_id ASC —
the rounding makes float ties deterministic across engines.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
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
IVF_CENTROIDS = 16  # quantizer size (trained: spherical k-means, see _centroids)
IVF_PROBES = 4


def _ivf_root() -> str:
    """Bucket-store root — CIFF_RAY_CACHE_ROOT-relative, so on a
    cluster the map tasks' bucket part files and the driver's listing
    see the same (shared) filesystem."""
    from ciff_ray.layout import cache_root

    return os.path.join(cache_root(), "ivf")


def _read_prefix(path: str, max_id: int) -> tuple[np.ndarray, np.ndarray]:
    """(ids, vectors) for vec_id < max_id, ascending — a row-group-
    pruned read (predicate pushdown), never the full table."""
    tbl = pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", max_id)],
    )
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    E = _embedding_matrix(tbl["embedding"])
    order = np.argsort(ids)
    return ids[order], E[order]


def _query_matrix(path: str) -> tuple[np.ndarray, np.ndarray]:
    return _read_prefix(path, N_QUERIES)


def _centroids(path: str) -> np.ndarray:
    """IVF quantizer: spherical k-means over the collection (trained,
    not just the first vectors — balances buckets on real data), unit
    norm so dot products rank by cosine."""
    C, _ = kmeans_centroids(
        path, k=IVF_CENTROIDS, iters=3, spherical=True
    )
    norms = np.linalg.norm(C, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return C / norms


class _BatchTopK:
    """Per-batch exact scorer: GEMM vs the broadcast query matrix, then
    per-query partial top-k so only k rows per (query, batch) move."""

    def __init__(self, qref, k: int):
        spec = ray.get(qref)
        # (qids, Q) — unfiltered; (qids, Q, qlabels) — metadata-filtered
        self.qids, self.Q = spec[0], spec[1]
        self.qlabels = spec[2] if len(spec) > 2 else None
        self.qn = np.sqrt((self.Q * self.Q).sum(axis=1))
        self.k = k

    def _emit(self, qid, vid, s):
        """Partial top-k of one query over candidate rows: (ids, sims)."""
        k = min(self.k, s.size)
        if k == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        cand = np.argpartition(-s, k - 1)[:k] if s.size > k else np.arange(s.size)
        order = np.lexsort((vid[cand], -s[cand]))
        sel = cand[order][:k]
        sel = sel[np.isfinite(s[sel])]
        return vid[sel], s[sel]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        V = _embedding_matrix(batch["embedding"])
        labels = (
            batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
            if self.qlabels is not None
            else None
        )
        vn = np.sqrt((V * V).sum(axis=1))
        sims = (self.Q @ V.T) / (self.qn[:, None] * vn[None, :])
        sims = np.round(sims, 9)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            s = sims[qi].copy()
            s[vid == qid] = -np.inf  # exclude self
            if labels is not None:  # metadata predicate per query
                s[labels != self.qlabels[qi]] = -np.inf
            ids, ss = self._emit(qid, vid, s)
            out_q.extend([qid] * ids.size)
            out_v.extend(ids.tolist())
            out_s.extend(ss.tolist())
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
    path = os.path.join(sf_dir, "embeddings.parquet")
    qref = ray.put(_query_matrix(path))
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


# ---------------------------------------------------------------------------
# IVF bucket store


def _ivf_store_dir(path: str) -> str:
    st = os.stat(path)
    # v2: spherical-kmeans-trained quantizer
    key = f"{os.path.abspath(path)}|{st.st_size}|{st.st_mtime_ns}|{IVF_CENTROIDS}|km2"
    import zlib

    return os.path.join(_ivf_root(), format(zlib.crc32(key.encode()), "08x"))


def build_ivf(path: str) -> str:
    """Build (or reuse) the bucket-partitioned store for `path`:
    `<store>/bucket=<id>/part-*.parquet`.  Each map task writes its own
    batch split by assigned centroid — a partitioned layout with zero
    all-to-all (files per bucket = #tasks, compacted by any later
    read).  Returns the store dir; a done-marker makes re-runs free and
    the tmp-dir + atomic-rename makes concurrent builders safe."""
    store = _ivf_store_dir(path)
    marker = os.path.join(store, "_done.json")
    if os.path.exists(marker):
        return store
    root = _ivf_root()
    os.makedirs(root, exist_ok=True)
    cref = ray.put(_centroids(path))
    tmp = tempfile.mkdtemp(prefix="ivf-build-", dir=root)
    for b in range(IVF_CENTROIDS):
        os.makedirs(os.path.join(tmp, f"bucket={b}"), exist_ok=True)

    def write_buckets(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        V = _embedding_matrix(batch["embedding"])
        vn = np.sqrt((V * V).sum(axis=1))
        assign = np.argmax((V @ C.T) / vn[:, None], axis=1).astype(np.int32)
        out = batch.append_column("bucket", pa.array(assign))
        # deterministic per-batch filename: vec_ids are unique and a
        # batch is a contiguous slice, so min(vec_id) identifies it —
        # a RETRIED task overwrites its own part instead of duplicating
        part = f"{int(vid.min()):012d}" if vid.size else uuid.uuid4().hex[:12]
        counts = []
        for b in np.unique(assign):
            sub = out.filter(pa.array(assign == b))
            pq.write_table(
                sub, os.path.join(tmp, f"bucket={int(b)}", f"part-{part}.parquet")
            )
            counts.append({"bucket": int(b), "n": sub.num_rows})
        return pa.Table.from_pylist(
            counts or [{"bucket": -1, "n": 0}],
            schema=pa.schema([("bucket", pa.int32()), ("n", pa.int64())]),
        )

    total = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(write_buckets, batch_format="pyarrow")
        .sum("n")
    )
    with open(os.path.join(tmp, "_done.json"), "w") as f:
        json.dump({"n_vectors": int(total or 0)}, f)
    try:
        os.rename(tmp, store)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another builder won
    return store


class _IvfScorer(_BatchTopK):
    """Scores batches of probed-bucket rows: each query's candidates are
    masked to ITS probed buckets (the bucket column), so per-query
    FLOPs track probed rows even when several queries share a batch."""

    def __init__(self, qref, k, probe_ref):
        super().__init__(qref, k)
        self.probe = ray.get(probe_ref)  # (n_queries, IVF_PROBES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = batch["bucket"].to_numpy(zero_copy_only=False)
        V = _embedding_matrix(batch["embedding"])
        vn = np.sqrt((V * V).sum(axis=1))
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            sel = np.isin(bucket, self.probe[qi]) & (vid != qid)
            idx = np.flatnonzero(sel)
            if idx.size == 0:
                continue
            s = np.round(
                (V[idx] @ self.Q[qi]) / (vn[idx] * self.qn[qi]), 9
            )
            ids, ss = self._emit(qid, vid[idx], s)
            out_q.extend([qid] * ids.size)
            out_v.extend(ids.tolist())
            out_s.extend(ss.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )


def q_ann_ivf(sf_dir: str) -> pa.Table:
    """IVF approximate top-10 (rows-only): vectors live in
    centroid-bucket partitions; each query probes its IVF_PROBES closest
    buckets and ONLY those partitions are read and scored.  Same output
    schema as q_knn_brute; recall asserted in tests."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    store = build_ivf(path)
    C = _centroids(path)
    qids, Q = _query_matrix(path)
    qn = np.sqrt((Q * Q).sum(axis=1))
    probe = np.argsort(-(Q @ C.T) / qn[:, None], axis=1)[:, :IVF_PROBES]

    probed = np.unique(probe)
    files = []
    for b in probed:
        d = os.path.join(store, f"bucket={int(b)}")
        if os.path.isdir(d):
            files.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not files:
        return _merge_topk([], TOP_K)
    qref = ray.put((qids, Q))
    probe_ref = ray.put(probe)
    parts = (
        ray.data.read_parquet(files, columns=["vec_id", "embedding", "bucket"])
        .map_batches(
            _IvfScorer,
            fn_constructor_args=(qref, TOP_K, probe_ref),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .take_all()
    )
    return _merge_topk(parts, TOP_K)





# ---------------------------------------------------------------------------
# distributed k-means (iterative algorithm family; rows-only entry)

KMEANS_K = 8
KMEANS_ITERS = 5


def _kmeans_assign_partial(batch: pa.Table, *, cref) -> pa.Table:
    """One k-means E+partial-M step over a batch: assign rows to the
    nearest broadcast centroid, emit per-centroid partial (count,
    vector sum) — K rows per batch regardless of batch size, so the
    per-iteration reduce is K x blocks tiny rows."""
    C = ray.get(cref)
    V = _embedding_matrix(batch["embedding"])
    if V.size == 0:
        return pa.table(
            {
                "cluster_id": pa.array([], type=pa.int32()),
                "n": pa.array([], type=pa.int64()),
                "vsum": pa.array([], type=pa.large_list(pa.float64())),
            }
        )
    # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2; argmin drops ||v||^2
    d2 = -2.0 * (V @ C.T) + (C * C).sum(axis=1)[None, :]
    assign = np.argmin(d2, axis=1)
    k = C.shape[0]
    counts = np.bincount(assign, minlength=k)
    sums = np.zeros_like(C)
    np.add.at(sums, assign, V)
    present = np.flatnonzero(counts)
    return pa.table(
        {
            "cluster_id": pa.array(present.astype(np.int32)),
            "n": pa.array(counts[present], type=pa.int64()),
            "vsum": pa.array(
                [sums[c].tolist() for c in present],
                type=pa.large_list(pa.float64()),
            ),
        }
    )


def kmeans_centroids(
    path: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    spherical: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Distributed Lloyd's k-means over the embedding column: per
    iteration, centroids broadcast once (`ray.put`), one map_batches
    pass emits per-centroid partial sums, the (K x blocks)-row reduce
    runs on the driver.  Deterministic init = the first k vectors.
    `spherical=True` renormalizes centroids each iteration (the cosine
    variant the IVF quantizer trains with).  Returns
    (centroids (k, d), counts (k,))."""
    _, C = _read_prefix(path, k)
    if spherical:
        C = C / np.linalg.norm(C, axis=1, keepdims=True)
    counts = np.zeros(k, dtype=np.int64)
    ds = ray.data.read_parquet(path, columns=["embedding"])
    for _ in range(iters):
        cref = ray.put(C)
        parts = ds.map_batches(
            _kmeans_assign_partial,
            fn_kwargs={"cref": cref},
            batch_format="pyarrow",
        ).take_all()
        sums = np.zeros_like(C)
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            cid = r["cluster_id"]
            counts[cid] += r["n"]
            sums[cid] += np.asarray(r["vsum"])
        nonzero = counts > 0
        C = C.copy()
        C[nonzero] = sums[nonzero] / counts[nonzero, None]
        if spherical:
            norms = np.linalg.norm(C, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            C = C / norms
    return C, counts


def q_kmeans(sf_dir: str) -> pa.Table:
    """K-means cluster summary over the embeddings table (cluster_id,
    n, centroid) — the iterative-algorithm operator family (rows-only:
    not SQL-expressible; pinned against a single-process numpy oracle
    in tests)."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    C, counts = kmeans_centroids(path)
    return pa.table(
        {
            "cluster_id": pa.array(
                np.arange(KMEANS_K, dtype=np.int64), type=pa.int64()
            ),
            "n": pa.array(counts, type=pa.int64()),
            "centroid": pa.array(
                [c.tolist() for c in C], type=pa.large_list(pa.float64())
            ),
        }
    )


def q_knn_filtered(sf_dir: str) -> pa.Table:
    """Metadata-filtered exact vector search: top-10 cosine neighbors
    RESTRICTED to vectors sharing the query's label (the filtered-ANN
    shape every vector store serves: predicate + similarity in one
    pass).  Same broadcast-query / per-batch-partial-top-k plan as
    q_knn_brute — the predicate is a vectorized mask inside the batch
    kernel, so filtering adds no extra scan or shuffle."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    tbl = pq.read_table(
        path,
        columns=["vec_id", "embedding", "label"],
        filters=[("vec_id", "<", N_QUERIES)],
    )
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids)
    qref = ray.put(
        (
            ids[order],
            _embedding_matrix(tbl["embedding"])[order],
            tbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)[
                order
            ],
        )
    )
    parts = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding", "label"])
        .map_batches(
            _BatchTopK,
            fn_constructor_args=(qref, TOP_K),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .take_all()
    )
    return _merge_topk(parts, TOP_K)


# ---------------------------------------------------------------------------
# grouped embedding centroids (mean vector per label)


def _centroid_partials(batch: pa.Table) -> pa.Table:
    """Embedding rows -> per-batch per-label (label, n, vsum) partial
    sums — the combiner half: the groupby that follows moves one
    dim-length row per (batch, label), never per vector."""
    if len(batch) == 0:
        return pa.table(
            {
                "label": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "vsum": pa.array([], type=pa.large_list(pa.float64())),
            }
        )
    V = _embedding_matrix(batch["embedding"])
    lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = np.unique(lab)
    idx = np.searchsorted(uniq, lab)
    S = np.zeros((uniq.size, V.shape[1] if V.size else 0), dtype=np.float64)
    np.add.at(S, idx, V)
    cnt = np.bincount(idx, minlength=uniq.size).astype(np.int64)
    return pa.table(
        {
            "label": pa.array(uniq, type=pa.int64()),
            "n": pa.array(cnt),
            "vsum": pa.array(
                [row.tolist() for row in S], type=pa.large_list(pa.float64())
            ),
        }
    )


def _centroid_final(group: pa.Table) -> pa.Table:
    """One label's partials -> exploded (label, dim, avg_r) rows."""
    if len(group) == 0:
        return pa.table(
            {
                "label": pa.array([], type=pa.int64()),
                "dim": pa.array([], type=pa.int64()),
                "avg_r": pa.array([], type=pa.float64()),
            }
        )
    S = _embedding_matrix(group["vsum"])
    n = int(group["n"].to_numpy(zero_copy_only=False).sum())
    mean = S.sum(axis=0) / n
    d = mean.size
    label = int(group["label"][0].as_py())
    return pa.table(
        {
            "label": pa.array(np.full(d, label, dtype=np.int64)),
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "avg_r": pa.array(np.round(mean, 6), type=pa.float64()),
        }
    )


def q_embedding_centroids(sf_dir: str) -> ray.data.Dataset:
    """Per-label mean embedding, exploded long-form (label, dim, avg_r)
    — the grouped vector aggregate (class-centroid / cluster-profile
    step of an embedding pipeline): per-batch partial sums, then a
    tiny per-label reduce (labels x dim values total)."""
    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["embedding", "label"],
        )
        .map_batches(_centroid_partials, batch_format="pyarrow")
        .groupby("label")
        .map_groups(_centroid_final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# MMR diversification (greedy re-rank of a kNN candidate pool)

MMR_LAMBDA = 0.7
MMR_POOL = 20


def _mmr_select(
    ids: np.ndarray, rel: np.ndarray, E: np.ndarray, k: int, lam: float
) -> np.ndarray:
    """Greedy Maximal Marginal Relevance over one candidate pool:
    repeatedly pick argmax lam*rel - (1-lam)*max_sim_to_selected, ties
    by ascending id.  Pool-sized (candidates x candidates) kernel —
    pools are k-bounded, never corpus-bounded."""
    n = ids.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    norms = np.linalg.norm(E, axis=1)
    norms[norms == 0] = 1.0
    En = E / norms[:, None]
    sims = np.round(En @ En.T, 9)
    chosen: list[int] = []
    max_sim: np.ndarray | None = None  # None = no penalty yet (1st pick);
    # afterwards the TRUE max (cosines can be negative, so no 0 floor)
    picked = np.zeros(n, dtype=bool)
    for _ in range(min(k, n)):
        pen = max_sim if max_sim is not None else np.zeros(n)
        score = np.round(lam * rel - (1.0 - lam) * pen, 9)
        score_masked = np.where(picked, -np.inf, score)
        best = np.flatnonzero(score_masked == score_masked.max())
        sel = best[np.argmin(ids[best])]
        chosen.append(sel)
        picked[sel] = True
        col = sims[:, sel]
        max_sim = col.copy() if max_sim is None else np.maximum(max_sim, col)
    return np.asarray(chosen, dtype=np.int64)


def q_mmr_diversify(sf_dir: str) -> pa.Table:
    """Diversified top-{TOP_K} (query_id, rank, vec_id): the exact
    cosine top-{MMR_POOL} pool per query (knn_brute machinery), re-
    ranked by greedy MMR (lambda={MMR_LAMBDA}) so near-duplicate
    results are demoted.  Rows-only by design (greedy-iterative —
    not SQL-expressible); pinned to a pure-Python oracle in
    tests/test_extras_sim.py.

    Shape: pool generation is the distributed GEMM path; the MMR
    kernel then touches only queries x pool rows + one pushed-down
    parquet read of pool vectors (both k-bounded, corpus-independent)."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    qref = ray.put(_query_matrix(path))
    parts = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(
            _BatchTopK,
            fn_constructor_args=(qref, MMR_POOL),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .take_all()
    )
    # global per-query pool with sims (small: queries x MMR_POOL)
    by_q: dict[int, list[tuple[float, int]]] = {}
    for r in parts:
        by_q.setdefault(r["query_id"], []).append((r["sim"], r["vec_id"]))
    pool_ids = sorted(
        {
            v
            for cands in by_q.values()
            for _, v in sorted(cands, key=lambda t: (-t[0], t[1]))[:MMR_POOL]
        }
    )
    ptbl = pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", pool_ids)],
    )
    pids = ptbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    porder = np.argsort(pids)
    pids = pids[porder]
    PE = _embedding_matrix(ptbl["embedding"])[porder]
    out_q, out_r, out_v = [], [], []
    for qid in sorted(by_q):
        cands = sorted(by_q[qid], key=lambda t: (-t[0], t[1]))[:MMR_POOL]
        ids = np.array([v for _, v in cands], dtype=np.int64)
        rel = np.array([s for s, _ in cands], dtype=np.float64)
        rows = np.searchsorted(pids, ids)
        sel = _mmr_select(ids, rel, PE[rows], TOP_K, MMR_LAMBDA)
        for rank, i in enumerate(sel, 1):
            out_q.append(qid)
            out_r.append(rank)
            out_v.append(int(ids[i]))
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
        }
    )


ORACLE_SQLS = {
    "knn_filtered": f"""WITH q AS (
  SELECT vec_id AS query_id, label, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 9)
           AS sim
  FROM q JOIN embeddings e
    ON e.label = q.label AND e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id
FROM ranked WHERE rnk <= {TOP_K}""",
    "embedding_centroids": """SELECT label,
       CAST(i - 1 AS BIGINT) AS dim,
       round(avg(v), 6) AS avg_r
FROM (
  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
)
GROUP BY label, i""",
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
    "knn_filtered": q_knn_filtered,
    "embedding_centroids": q_embedding_centroids,
    "ann_ivf": q_ann_ivf,  # rows-only (approximate by design)
    "kmeans": q_kmeans,  # rows-only (iterative; numpy oracle in tests)
    # rows-only (greedy-iterative; pure-Python oracle in tests)
    "mmr_diversify": q_mmr_diversify,
}


# ---------------------------------------------------------------------------
# product quantization (PQ) ANN — compressed-vector scan + exact re-rank

PQ_M = 8  # subspaces (d must be divisible by PQ_M)
PQ_SAMPLE = 100_000  # codebook training sample (rows), bounded at any scale
PQ_RERANK = 100  # ADC candidates exactly re-ranked per query


def _pq_k(n: int) -> int:
    """Codes per subspace: 256 (uint8 ceiling) once the corpus supports
    it, smaller on tiny corpora so codebooks don't memorize points."""
    return int(min(256, max(16, n // 16)))


def _kmeans_local(X: np.ndarray, k: int, iters: int = 4) -> np.ndarray:
    """Plain Lloyd's on an in-memory sample (codebook training runs on
    a BOUNDED sample at any corpus scale — the standard PQ practice).
    Deterministic init = first k rows."""
    C = X[:k].copy()
    for _ in range(iters):
        # ||x-c||^2 ranking via -2 x.c + ||c||^2 — (n, k) memory, never
        # the (n, k, sub) broadcast tensor (1.6 GB at the full sample)
        d2 = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        a = np.argmin(d2, axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, a, X)
        counts = np.bincount(a, minlength=k)
        nz = counts > 0
        C[nz] = sums[nz] / counts[nz, None]
    return C


def train_pq_codebooks(path: str) -> np.ndarray:
    """(M, K, d/M) codebooks trained per subspace on a normalized
    sample (cosine contract: vectors are unit-normalized before
    encoding, so inner-product ADC ranks by cosine)."""
    ids, X = _read_prefix(path, PQ_SAMPLE)
    n = X.shape[0]
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    X = X / norms
    k = _pq_k(n)
    d = X.shape[1]
    if d % PQ_M:
        raise ValueError(f"dim {d} not divisible by PQ_M={PQ_M}")
    sub = d // PQ_M
    return np.stack(
        [
            _kmeans_local(
                np.ascontiguousarray(X[:, m * sub : (m + 1) * sub]), k
            )
            for m in range(PQ_M)
        ]
    )


class _PqEncode:
    """embeddings batches -> (vec_id, code list<uint8>): per subspace,
    nearest codebook centroid of the normalized vector."""

    def __init__(self, cb_ref):
        self.CB = ray.get(cb_ref)  # (M, K, sub)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.extras.dedup import _embedding_matrix

        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        X = _embedding_matrix(batch["embedding"])
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        X = X / norms
        M, K, sub = self.CB.shape
        codes = np.empty((X.shape[0], M), dtype=np.uint8)
        for m in range(M):
            S = X[:, m * sub : (m + 1) * sub]
            # ||s - c||^2 = ||s||^2 - 2 s.c + ||c||^2; argmin over c
            d2 = -2.0 * (S @ self.CB[m].T) + (self.CB[m] ** 2).sum(axis=1)[None, :]
            codes[:, m] = np.argmin(d2, axis=1).astype(np.uint8)
        flat = pa.array(codes.reshape(-1), type=pa.uint8())
        offsets = pa.array(
            np.arange(0, (X.shape[0] + 1) * M, M, dtype=np.int32)
        )
        return pa.table(
            {
                "vec_id": pa.array(vid, type=pa.int64()),
                "code": pa.ListArray.from_arrays(offsets, flat),
            }
        )


class _PqScan:
    """codes batches -> per-(query, batch) partial ADC top candidates:
    approx score = sum over subspaces of the query-to-centroid inner
    product table (one (M, K) table per query, computed once per
    actor), i.e. a pure table-lookup scan over 8-byte codes."""

    def __init__(self, tab_ref, cand: int):
        self.qids, self.T = ray.get(tab_ref)  # (nq,), (nq, M, K)
        self.cand = cand

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["code"].combine_chunks()
        codes = np.asarray(col.values).reshape(len(col), -1)  # (n, M)
        n, M = codes.shape
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            s = self.T[qi, np.arange(M)[None, :], codes].sum(axis=1)
            s[vid == qid] = -np.inf  # knn convention: self excluded
            k = min(self.cand, n)
            sel = np.argpartition(-s, k - 1)[:k] if n > k else np.arange(n)
            sel = sel[np.isfinite(s[sel])]  # the -inf self row must
            # never reach the exact re-rank (true cosine(self) = 1.0
            # would win rank 1 whenever the pool <= cand)
            out_q.extend([qid] * sel.size)
            out_v.extend(vid[sel].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "adc": pa.array(out_s, type=pa.float64()),
            }
        )


def q_ann_pq(sf_dir: str) -> pa.Table:
    """PQ ANN (query_id, rank, vec_id): vectors compressed to PQ_M
    bytes (32x for f32x64), scanned by ADC table lookups, the top
    PQ_RERANK candidates per query exactly re-ranked by true cosine
    (the standard ADC + re-rank pipeline).  Rows-only (approximate by
    design); recall vs knn_brute asserted in tests."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    CB = train_pq_codebooks(path)
    cb_ref = ray.put(CB)
    codes = ray.data.read_parquet(
        path, columns=["vec_id", "embedding"]
    ).map_batches(
        _PqEncode,
        fn_constructor_args=(cb_ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    # query ADC tables: inner products of each normalized query with
    # every codebook centroid
    qids, Q = _query_matrix(path)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn
    M, K, sub = CB.shape
    T = np.empty((qids.size, M, K))
    for m in range(M):
        T[:, m, :] = Qn[:, m * sub : (m + 1) * sub] @ CB[m].T
    tab_ref = ray.put((qids, T))
    parts = codes.map_batches(
        _PqScan,
        fn_constructor_args=(tab_ref, PQ_RERANK),
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).take_all()
    # global per-query ADC candidate pool -> exact re-rank of PQ_RERANK
    by_q: dict[int, list[tuple[float, int]]] = {}
    for r in parts:
        by_q.setdefault(r["query_id"], []).append((r["adc"], r["vec_id"]))
    cand_ids = sorted(
        {
            v
            for cands in by_q.values()
            for _, v in sorted(cands, key=lambda t: (-t[0], t[1]))[:PQ_RERANK]
        }
    )
    ct = pq.read_table(
        path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", cand_ids)],
    )
    from ciff_ray.extras.dedup import _embedding_matrix

    cids = ct["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    corder = np.argsort(cids)
    cids = cids[corder]
    CE = _embedding_matrix(ct["embedding"])[corder]
    cn = np.linalg.norm(CE, axis=1)
    cn[cn == 0] = 1.0
    out_q, out_r, out_v = [], [], []
    for qi, qid in enumerate(qids):
        cands = sorted(by_q.get(qid, []), key=lambda t: (-t[0], t[1]))[:PQ_RERANK]
        ids = np.array([v for _, v in cands], dtype=np.int64)
        rows = np.searchsorted(cids, ids)
        sims = np.round(
            (CE[rows] @ Qn[qi]) / cn[rows], 9
        )
        order = np.lexsort((ids, -sims))[:TOP_K]
        for rank, i in enumerate(order, 1):
            out_q.append(int(qid))
            out_r.append(rank)
            out_v.append(int(ids[i]))
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
        }
    )


# rows-only (approximate by design; recall vs knn_brute in tests)
QUERIES["ann_pq"] = q_ann_pq
