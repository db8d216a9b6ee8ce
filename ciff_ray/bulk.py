"""Offline BULK retrieval: score an entire query-workload table against
the index in ONE distributed Dataset pass — no serving actors, no
per-query round trips.

The latency path (ciff_ray.query.QueryEngine / ServingPool, reference
analogue: the per-query PISA search loop) answers one query at a time
over an actor pool.  Training-data pipelines ask the transposed
question: "for these 10^6 mined queries, give me the top-k docs each" —
a THROUGHPUT problem where the right unit of work is a posting-list
slice, not a query.  This module is that path, expressed purely in
Dataset operators so the streaming executor pipelines decode → score →
shuffle → rank with backpressure:

1. driver: resolve the workload's distinct analyzed terms against
   term_stats with a pushed-down ``term IN workload`` filter (rows =
   touched terms, never the vocabulary) → per-term idf; broadcast the
   small (term → query_ids) expansion + idf map once via ``ray.put``.
2. ``read_parquet(segments, filter=term IN workload)`` — only touched
   posting slices leave storage (row-group pruning on the term-sorted
   segment files).
3. actor-pool ``map_batches``: decode slices vectorized (same codecs as
   the engine), compute the per-posting BM25 contribution with a
   shard-lazy DoclengthStore, fan out to the queries containing the
   term, and PRE-AGGREGATE (query_id, doc_id) partials inside the batch
   so the shuffle moves combined rows, not raw postings × queries.
4. ``groupby(query_id, doc_id).sum`` → exact scores;
   ``groupby(query_id).map_groups`` → top-k with the engine's exact
   (round(score, 9) desc, doc_id asc) tie-break (query.py _rank).

Scale notes (10^12 turns, 10^6+ queries): stage 3's output is bounded
by Σ_t df(t) × |queries(t)| — the same work a per-query engine would do,
but batched into one shuffle whose key space (query, doc) is uniformly
hash-partitioned, so stopword-scale posting lists spread across the
cluster instead of serializing one actor.  The broadcast side is
O(workload terms), far under the documented ray.put ceiling; the final
per-query rank groups are ≤ candidate-doc-count rows, never the corpus.

Float determinism: per-(term, doc) contributions are bit-identical to
LocalScorer._contrib; only the ADDITION ORDER across a query's terms
differs from the serving path, which the shared round(·, 9) rank key
absorbs (≤ dozens of O(10) float64 terms ⇒ error ≪ 1e-9).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data

from ciff_ray import codecs
from ciff_ray.layout import IndexPaths, Manifest
from ciff_ray.oracle import EPS_IDF, tokenize
from ciff_ray.query import DoclengthStore

TOPK_K = 10


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


class _BulkScoreActor:
    """Decode posting slices → per-posting BM25 contribution → fan out
    to the queries containing the term → in-batch (query, doc) combine.

    One actor init pays the DoclengthStore + broadcast deref once; each
    __call__ is vectorized per slice (the slice IS the batch's natural
    work unit — decode is one numpy pass, fan-out one np.repeat)."""

    def __init__(self, index_dir: str, bcast_ref) -> None:
        b = ray.get(bcast_ref)
        self._qmap: dict[str, np.ndarray] = b["qmap"]
        self._idf: dict[str, float] = b["idf"]
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
        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        terms = batch["term"].to_pylist()
        dfs = batch["df"].to_numpy(zero_copy_only=False)
        firsts = batch["first_doc"].to_numpy(zero_copy_only=False)
        dcodec = batch["doc_codec"].to_numpy(zero_copy_only=False)
        tcodec = batch["tf_codec"].to_numpy(zero_copy_only=False)
        doc_bytes = batch["doc_bytes"]
        tf_bytes = batch["tf_bytes"]
        for i, term in enumerate(terms):
            qids = self._qmap.get(term)
            if qids is None:
                continue
            df = int(dfs[i])
            gaps = codecs.decode(
                doc_bytes[i].as_py(), df - 1, int(dcodec[i])
            ).astype(np.int64)
            docs = np.empty(df, dtype=np.int64)
            docs[0] = int(firsts[i])
            if df > 1:
                np.cumsum(gaps, out=docs[1:])
                docs[1:] += docs[0]
            tfs = codecs.decode(tf_bytes[i].as_py(), df, int(tcodec[i])).astype(
                np.float64
            )
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
                self._idf[term]
                * tfs
                * (self._k1 + 1.0)
                / (tfs + self._k1 * (1.0 - self._b + self._b * dl / self._avgdl))
            )
            # fan out to every query containing the term
            out_q.append(np.repeat(qids, docs.size))
            out_d.append(np.tile(docs, qids.size))
            out_c.append(np.tile(contrib, qids.size))
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "contrib": pa.array([], type=pa.float64()),
                }
            )
        q = np.concatenate(out_q)
        d = np.concatenate(out_d)
        c = np.concatenate(out_c)
        # in-batch combine: the same (query, doc) hit by several of this
        # batch's terms collapses to one partial before the shuffle
        order = np.lexsort((d, q))
        q, d, c = q[order], d[order], c[order]
        new = np.empty(q.size, dtype=bool)
        new[0] = True
        np.not_equal(q[1:], q[:-1], out=new[1:])
        np.logical_or(new[1:], d[1:] != d[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(c, starts)
        return pa.table(
            {
                "query_id": pa.array(q[starts], type=pa.int64()),
                "doc_id": pa.array(d[starts], type=pa.int64()),
                "contrib": pa.array(sums, type=pa.float64()),
            }
        )


def _topk_group(group: pa.Table, k: int = TOPK_K) -> pa.Table:
    """One query's (doc, score) rows → top-k by the engine's exact rank
    key: round(score, 9) desc, doc_id asc (query.py _rank)."""
    docs = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    scores = group["score"].to_numpy(zero_copy_only=False)
    qid = int(group["query_id"][0].as_py())
    key = np.round(scores, 9)
    order = np.lexsort((docs, -key))[:k]
    return pa.table(
        {
            "query_id": pa.array(np.full(order.size, qid), type=pa.int64()),
            "rank": pa.array(np.arange(1, order.size + 1), type=pa.int64()),
            "doc_id": pa.array(docs[order], type=pa.int64()),
        }
    )


def bulk_topk(
    index_dir: str,
    queries: list[str],
    k: int = TOPK_K,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Distributed top-k for a whole query workload (see module doc)."""
    qmap, idf = workload_term_index(index_dir, queries)
    bcast = ray.put({"qmap": qmap, "idf": idf})
    paths = IndexPaths(index_dir)
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
        filter=pads.field("term").isin(sorted(qmap)),
    )
    from ray.data.aggregate import Sum

    return (
        segs.map_batches(
            _BulkScoreActor,
            fn_constructor_args=(index_dir, bcast),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .groupby(["query_id", "doc_id"])
        .aggregate(Sum("contrib", alias_name="score"))
        .groupby("query_id")
        .map_groups(lambda g: _topk_group(g, k), batch_format="pyarrow")
    )
