"""Offline BULK retrieval: score an entire query-workload table against
the index in ONE distributed Dataset pass — no serving actors, no
per-query round trips.

The latency path (ciff_ray.query.QueryEngine / ServingPool, reference
analogue: the per-query PISA search loop) answers one query at a time
over an actor pool.  Training-data pipelines ask the transposed
question: "for these 10^6 mined queries, give me the top-k docs each" —
a THROUGHPUT problem where the right unit of work is a posting-list
slice, not a query.

Design — DOC-RANGE-PARTITIONED scoring (the classical offline layout
flip: the index is term-partitioned for serving, so bulk scoring
re-partitions decoded postings by docID range once, then every range
scores ALL queries locally):

1. driver: resolve the workload's distinct analyzed terms against
   term_stats with a pushed-down ``term IN workload`` filter (rows =
   touched terms, never the vocabulary) → per-term idf; broadcast the
   small term→(term_id, idf) and term_id→query_ids maps via ray.put.
2. ``read_parquet(segments, filter=term IN workload)`` — only touched
   posting slices leave storage.
3. actor-pool ``map_batches``: decode slices vectorized, compute each
   posting's QUERY-INDEPENDENT BM25 contribution (DoclengthStore
   shard-lazy in __init__, tombstones masked), and emit PACKED rows —
   one per (slice × overlapped doc range) with the int32 offsets and
   float64 contributions as binary payloads.  CRITICALLY there is no
   query fan-out: the exchanged byte volume is the touched postings —
   INDEPENDENT of how many queries share the terms — and the exchanged
   ROW count is only slices × ranges.  (A first cut fanned out
   (query, doc, contrib) rows before the shuffle: 21M rows and two
   ~200 s all-to-alls for 128 queries at sf0.1.  A second cut moved one
   thin row per posting: correct volume, but 85M-row sort overhead
   still dominated at 4.9M turns.  Packing removed the row overhead.)
4. ``groupby(part_id).map_groups``: one group = one docID range with
   every workload term's postings for it.  Scoring is dense vector
   arithmetic: per distinct term a contribution vector over the local
   range (one scatter), per query the sum of its ≤ |q| term vectors,
   then a per-(query, range) PARTIAL top-k under the engine's exact
   (round(score, 9) desc, docID asc) key.  Docs live in exactly one
   range, so local scores are complete and the global top-k under the
   same key is contained in the union of the partials.
5. final ``groupby(query_id).map_groups`` rank over ≤ parts × k rows
   per query — trivially small.

Scale notes (10^12 turns, 10^6+ queries): the one shuffle carries the
touched postings only (24 B/row), hash-partitioned by docID range, so
stopword-scale lists spread across the cluster instead of serializing
one reducer; per-range scoring is embarrassingly parallel and its
output is bounded by ranges × queries × k.  avg docs-per-range is a
tunable (``range_docs``) — size it so a range's per-query dense vector
(8 B × range) and the workload loop fit a worker's heap.

Float determinism: per-(term, doc) contributions are bit-identical to
LocalScorer._contrib; only the ADDITION ORDER across a query's terms
differs from the serving path, which the shared round(·, 9) rank key
absorbs (≤ dozens of O(10) float64 terms ⇒ error ≪ 1e-9).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data

from ciff_ray import codecs
from ciff_ray.layout import IndexPaths, Manifest
from ciff_ray.oracle import EPS_IDF, tokenize
from ciff_ray.query import DoclengthStore

TOPK_K = 10
# docs per score-range: 64k ⇒ a query's dense vector is 512 KiB and a
# 10^12-doc corpus yields ~15M ranges — far above any realistic task
# count, so parallelism is set by the cluster, not the layout
RANGE_DOCS_DEFAULT = 65_536


def workload_term_index(
    index_dir: str, queries: list[str]
) -> tuple[dict[str, np.ndarray], dict[str, float]]:
    """(term → query_ids containing it, term → idf) for the workload's
    distinct analyzed terms.  term_stats is read with a pushed-down
    ``term IN workload`` filter — O(touched terms), not the vocabulary."""
    paths = IndexPaths(index_dir)
    manifest = Manifest.read(paths.manifest)
    from ciff_ray.analysis import get_analyzer

    analyze = get_analyzer(getattr(manifest, "analyzer", ""))

    qmap: dict[str, list[int]] = {}
    for qid, q in enumerate(queries):
        toks = tokenize(q)
        if analyze is not None:
            toks = [analyze(t) for t in toks]
        for t in set(toks):
            qmap.setdefault(t, []).append(qid)
    terms = sorted(qmap)

    if not terms:  # empty / all-empty workload: nothing to resolve
        return {}, {}
    stats = pq.read_table(
        paths.term_stats,
        columns=["term", "df"],
        filters=pads.field("term").isin(terms),
    )
    n = manifest.num_docs
    df = stats["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    idf_vals = np.maximum(np.log((n - df + 0.5) / (df + 0.5)), EPS_IDF)
    idf = dict(zip(stats["term"].to_pylist(), idf_vals.tolist()))
    return (
        {t: np.asarray(sorted(qids), dtype=np.int64) for t, qids in qmap.items()},
        idf,
    )


class _ContribActor:
    """Posting slices → PACKED (part_id, term_id, offs, contribs) rows,
    one row per (slice × overlapped doc range): offs is the int32
    within-range doc offsets as bytes, contribs the float64 BM25
    contributions as bytes.  No query fan-out, and — critically — the
    shuffle moves ~(slices × ranges) FAT rows instead of one thin row
    per posting: at 4.9M turns that is ~50k rows instead of 85M, which
    cut the groupby(part_id) exchange from 20 s to ~2 s wall (same
    total bytes, row overhead gone)."""

    def __init__(self, index_dir: str, bcast_ref, range_docs: int) -> None:
        b = ray.get(bcast_ref)
        self._tid: dict[str, int] = b["tid"]
        self._idf: np.ndarray = b["idf_by_tid"]
        self._range = range_docs
        paths = IndexPaths(index_dir)
        m = Manifest.read(paths.manifest)
        self._k1, self._b = m.k1, m.b
        self._avgdl = m.average_doclength
        self._dl = DoclengthStore(paths.docmap_dir, m.num_docs)
        if os.path.exists(paths.tombstones):
            self._dead = np.sort(
                pq.read_table(paths.tombstones)["doc_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        else:
            self._dead = np.empty(0, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_p: list[int] = []
        out_t: list[int] = []
        out_o: list[bytes] = []
        out_c: list[bytes] = []
        terms = batch["term"].to_pylist()
        dfs = batch["df"].to_numpy(zero_copy_only=False)
        firsts = batch["first_doc"].to_numpy(zero_copy_only=False)
        dcodec = batch["doc_codec"].to_numpy(zero_copy_only=False)
        tcodec = batch["tf_codec"].to_numpy(zero_copy_only=False)
        R = self._range
        for i, term in enumerate(terms):
            tid = self._tid.get(term)
            if tid is None:
                continue
            df = int(dfs[i])
            gaps = codecs.decode(
                batch["doc_bytes"][i].as_py(), df - 1, int(dcodec[i])
            ).astype(np.int64)
            docs = np.empty(df, dtype=np.int64)
            docs[0] = int(firsts[i])
            if df > 1:
                np.cumsum(gaps, out=docs[1:])
                docs[1:] += docs[0]
            tfs = codecs.decode(
                batch["tf_bytes"][i].as_py(), df, int(tcodec[i])
            ).astype(np.float64)
            if self._dead.size:
                pos = np.searchsorted(self._dead, docs)
                hit = (pos < self._dead.size) & (
                    self._dead[np.minimum(pos, self._dead.size - 1)] == docs
                )
                if hit.any():
                    docs, tfs = docs[~hit], tfs[~hit]
                    if not docs.size:
                        continue
            dl = self._dl[docs].astype(np.float64)
            contrib = (
                self._idf[tid]
                * tfs
                * (self._k1 + 1.0)
                / (tfs + self._k1 * (1.0 - self._b + self._b * dl / self._avgdl))
            )
            # split the docID-ascending slice at range boundaries: one
            # packed row per overlapped range
            lo_part = int(docs[0]) // R
            hi_part = int(docs[-1]) // R
            cuts = [0]
            if hi_part > lo_part:
                edges = (np.arange(lo_part + 1, hi_part + 1)) * R
                cuts += np.searchsorted(docs, edges).tolist()
            cuts.append(docs.size)
            off32 = (docs % R).astype(np.int32)
            for j in range(len(cuts) - 1):
                a, bnd = cuts[j], cuts[j + 1]
                if a == bnd:
                    continue
                out_p.append(int(docs[a]) // R)
                out_t.append(tid)
                out_o.append(off32[a:bnd].tobytes())
                out_c.append(contrib[a:bnd].tobytes())
        return pa.table(
            {
                "part_id": pa.array(out_p, type=pa.int64()),
                "term_id": pa.array(out_t, type=pa.int32()),
                "offs": pa.array(out_o, type=pa.large_binary()),
                "contribs": pa.array(out_c, type=pa.large_binary()),
            }
        )


def _score_range(
    group: pa.Table,
    qterms_ref,
    k: int,
    range_docs: int,
) -> pa.Table:
    """One docID range (all workload terms' postings for it) → exact
    local scores for EVERY query, partial top-k each under the
    (round(score, 9) desc, doc asc) key."""
    qterms: list[np.ndarray] = ray.get(qterms_ref)
    tids = group["term_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo = int(group["part_id"][0].as_py()) * range_docs

    # dense contribution vector per distinct term present in this range;
    # a term may span several packed rows (salted slices) whose offset
    # sets are disjoint, so plain scatter-assignment accumulates exactly
    vecs: dict[int, np.ndarray] = {}
    width = 0
    rows_off: list[np.ndarray] = []
    rows_c: list[np.ndarray] = []
    for j in range(len(tids)):
        o = np.frombuffer(group["offs"][j].as_py(), dtype=np.int32)
        c = np.frombuffer(group["contribs"][j].as_py(), dtype=np.float64)
        rows_off.append(o)
        rows_c.append(c)
        if o.size:
            width = max(width, int(o[-1]) + 1)  # offsets ascend per row
    for j in range(len(tids)):
        t = int(tids[j])
        v = vecs.get(t)
        if v is None:
            v = vecs[t] = np.zeros(width, dtype=np.float64)
        v[rows_off[j]] = rows_c[j]

    out_q: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    for qid, tlist in enumerate(qterms):
        present = [vecs[t] for t in tlist if t in vecs]
        if not present:
            continue
        s = present[0].copy()
        for v in present[1:]:
            s += v
        cand = np.flatnonzero(s > 0.0)
        if cand.size == 0:
            continue
        key = np.round(s[cand], 9)
        if k is not None and cand.size > k:
            # top-k under (key desc, doc asc): value cut by argpartition,
            # boundary ties resolved by ascending doc
            part = np.argpartition(-key, k - 1)[:k]
            kth = key[part].min()
            sel = np.flatnonzero(key > kth)
            tied = np.flatnonzero(key == kth)[: k - sel.size]
            cand = cand[np.concatenate([sel, tied])]
            key = np.round(s[cand], 9)
        out_q.append(np.full(cand.size, qid, dtype=np.int64))
        out_d.append(cand + lo)
        out_s.append(s[cand])
    if not out_q:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
            "doc_id": pa.array(np.concatenate(out_d), type=pa.int64()),
            "score": pa.array(np.concatenate(out_s), type=pa.float64()),
        }
    )


def _rank_group(group: pa.Table, k: int) -> pa.Table:
    """One query's ≤ ranges × k partials → final top-k by the engine's
    exact rank key: round(score, 9) desc, doc_id asc (query.py _rank)."""
    docs = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    scores = group["score"].to_numpy(zero_copy_only=False)
    qid = int(group["query_id"][0].as_py())
    order = np.lexsort((docs, -np.round(scores, 9)))[:k]
    return pa.table(
        {
            "query_id": pa.array(np.full(order.size, qid), type=pa.int64()),
            "rank": pa.array(np.arange(1, order.size + 1), type=pa.int64()),
            "doc_id": pa.array(docs[order], type=pa.int64()),
        }
    )


def bulk_scores(
    index_dir: str,
    queries: list[str],
    concurrency=(1, 8),
    range_docs: int = RANGE_DOCS_DEFAULT,
) -> ray.data.Dataset:
    """EVERY matching (query_id, doc_id, score) for the workload — the
    relevance-labeling output (no top-k cut).  Same doc-range layout as
    bulk_topk with the per-range partial top-k replaced by a full dump;
    the result is candidate-sized (Σ_q Σ_{t∈q} df(t) upper bound), so
    consume it as a Dataset (write_parquet / downstream transform), not
    a driver take."""
    return _bulk_pipeline(
        index_dir, queries, k=None, concurrency=concurrency,
        range_docs=range_docs,
    )


def bulk_topk(
    index_dir: str,
    queries: list[str],
    k: int = TOPK_K,
    concurrency=(1, 8),
    range_docs: int = RANGE_DOCS_DEFAULT,
) -> ray.data.Dataset:
    """Distributed top-k for a whole query workload (see module doc)."""
    return _bulk_pipeline(
        index_dir, queries, k=k, concurrency=concurrency,
        range_docs=range_docs,
    )


def _bulk_pipeline(
    index_dir: str,
    queries: list[str],
    k: int | None,
    concurrency,
    range_docs: int,
) -> ray.data.Dataset:
    qmap, idf = workload_term_index(index_dir, queries)
    if not qmap:  # no tokens in the whole workload: empty result
        return ray.data.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
            if k is not None
            else pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        )
    terms = sorted(qmap)
    tid = {t: i for i, t in enumerate(terms)}
    idf_by_tid = np.array([idf.get(t, 0.0) for t in terms], dtype=np.float64)

    paths = IndexPaths(index_dir)
    manifest = Manifest.read(paths.manifest)
    from ciff_ray.analysis import get_analyzer

    analyze = get_analyzer(getattr(manifest, "analyzer", ""))
    # per-query term-id lists (query order preserved for the scorer loop)
    qterms: list[np.ndarray] = []
    for q in queries:
        toks = tokenize(q)
        if analyze is not None:
            toks = [analyze(t) for t in toks]
        qterms.append(
            np.asarray(
                sorted({tid[t] for t in toks if t in tid}), dtype=np.int64
            )
        )

    bcast = ray.put({"tid": tid, "idf_by_tid": idf_by_tid})
    qterms_ref = ray.put(qterms)

    segs = ray.data.read_parquet(
        paths.segments_dir,
        file_extensions=["parquet"],  # skip the .done.json resume markers
        columns=[
            "term",
            "df",
            "first_doc",
            "doc_codec",
            "tf_codec",
            "doc_bytes",
            "tf_bytes",
        ],
        filter=pads.field("term").isin(terms),
    )
    scored = (
        segs.map_batches(
            _ContribActor,
            fn_constructor_args=(index_dir, bcast, range_docs),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .groupby("part_id")
        .map_groups(
            lambda g: _score_range(g, qterms_ref, k, range_docs),
            batch_format="pyarrow",
        )
    )
    if k is None:  # bulk_scores: the full (query, doc, score) dump
        return scored
    return scored.groupby("query_id").map_groups(
        lambda g: _rank_group(g, k), batch_format="pyarrow"
    )
