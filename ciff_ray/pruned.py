"""Static (term-centric) index pruning — Carmel et al.'s top-λ variant:
keep only each posting list's λ highest-impact postings, producing a
much smaller lossy index that still answers top-k queries well (and,
for single-term queries with k <= λ, EXACTLY — see below).

Global scoring statistics are preserved, not recomputed: the pruned
index copies the source's term_stats (df/cf/max_score) and manifest
constants (N, avgdl), so every surviving posting scores bit-identically
to the full index.  Pruning order is the scorer's own per-posting
contribution tf*(k1+1)/(tf + k1*(1-b + b*dl/avgdl)) (idf is constant
within a term, so it cannot change the order), ties broken by ascending
docID — the same tie order `_rank` applies.

Exactness guarantee (single-term, k <= λ): a posting in the global
top-λ of its term is beaten by < λ postings under (contrib desc, docID
asc); all of those live in slices too, so within its own slice it is
beaten by < λ postings and survives per-slice top-λ selection.  Salted
(heavy) terms therefore keep at most λ per slice — slightly
conservative, never lossy for the guarantee.  (Theoretical caveat: the
engine's `_rank` collapses score ties at 9 dp; two postings with
DIFFERENT contribs that round to the same score could in principle
order differently across the λ boundary — requires distinct (tf, dl)
pairs within 1e-9 of each other, absent from every driver corpus and
pinned exact in tests.)

Multi-term queries are lossy by design (a doc may survive in one
term's list but not another's); the standard use is a small fast
first-tier index in front of the full one.

Shape: per-partition parallel rewrite through the shared `_pack_segment`
kernel (no shuffle, resumable via done-markers), term_stats/docmap
copied verbatim.  cites: /root/reference has no pruning analogue; the
algorithm is public (Carmel et al., SIGIR 2001, "Static index pruning
for information retrieval systems").
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ciff_ray import codecs
from ciff_ray.build import _pack_segment
from ciff_ray.layout import IndexPaths, Manifest, append_lineage

DEFAULT_LAMBDA = 64

# the engine's final ranking key rounds scores to 9 dp
# (query.LocalScorer._rank); certificate margins are strengthened by
# this quantum so the certified SET provably equals full.topk's set
# even under the rounded-key ordering (see TieredEngine docstring)
RANK_EPS = 1e-9


def _write_meta_part(
    out_root: str, pid: int, tau_rows: list[tuple[str, float]]
) -> None:
    """Atomically write partition ``pid``'s (term, tau) rows."""
    meta_dir = os.path.join(out_root, "prune_meta")
    os.makedirs(meta_dir, exist_ok=True)
    meta_tmp = os.path.join(meta_dir, f".part-{pid:05d}.tmp")
    pq.write_table(
        pa.table(
            {
                "term": pa.array([t for t, _ in tau_rows], type=pa.string()),
                "tau": pa.array([x for _, x in tau_rows], type=pa.float64()),
            }
        ),
        meta_tmp,
    )
    os.replace(meta_tmp, os.path.join(meta_dir, f"part-{pid:05d}.parquet"))


@ray.remote
def _prune_partition(
    pid: int,
    in_root: str,
    out_root: str,
    lam: int,
    avgdl: float,
    k1: float,
    b: float,
    bs: int,
    fingerprint: str,
    num_docs: int,
) -> dict:
    from ciff_ray.query import DoclengthStore

    pa.set_cpu_count(1)
    t0 = time.monotonic()
    out = IndexPaths(out_root)
    meta_part = os.path.join(out_root, "prune_meta", f"part-{pid:05d}.parquet")
    done_path = out.segment_done(pid)
    if os.path.exists(done_path):
        with open(done_path) as f:
            done = json.load(f)
        # the done marker alone is not enough: the partition's tau rows
        # feed TieredEngine's soundness bound M, so a deleted/partial
        # prune_meta part must force a re-run (a missing tau silently
        # under-states M and the certificate would certify incorrectly)
        if (
            done.get("fingerprint") == fingerprint
            and os.path.exists(out.segment(pid))
            and os.path.exists(meta_part)
        ):
            done["status"] = "skipped"
            return done

    src = IndexPaths(in_root)
    seg = (
        pq.read_table(src.segment(pid))
        if os.path.exists(src.segment(pid))
        else None
    )
    if seg is None or seg.num_rows == 0:
        _write_meta_part(out_root, pid, [])  # resume invariant: every
        # completed pid owns a meta part, even an empty one
        marker = _pack_segment(
            out, pid,
            pa.array([], type=pa.string()),
            np.empty(0, np.int64), np.empty(0, np.int64),
            np.empty(0, np.int64), np.empty(0, np.int64),
            np.empty(0, np.int64), np.empty(0, np.int64),
            avgdl, k1, b, bs, fingerprint, t0,
        )
        marker["status"] = "pruned"
        return marker

    dl_store = DoclengthStore(src.docmap_dir, num_docs)
    dfs = seg["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    firsts = seg["first_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
    dcodec = seg["doc_codec"].to_numpy(zero_copy_only=False)
    tcodec = seg["tf_codec"].to_numpy(zero_copy_only=False)
    doc_bufs = seg["doc_bytes"].to_pylist()
    tf_bufs = seg["tf_bytes"].to_pylist()

    terms_py = seg["term"].to_pylist()
    docs_parts, tfs_parts, dls_parts, counts = [], [], [], []
    tau_rows: list[tuple[str, float]] = []
    for i in range(seg.num_rows):
        df = int(dfs[i])
        gaps = codecs.decode(doc_bufs[i], df - 1, int(dcodec[i])).astype(np.int64)
        docs = np.empty(df, dtype=np.int64)
        docs[0] = firsts[i]
        if df > 1:
            np.cumsum(gaps, out=docs[1:])
            docs[1:] += firsts[i]
        tfs = codecs.decode(tf_bufs[i], df, int(tcodec[i])).astype(np.int64)
        dl = dl_store[docs].astype(np.int64)
        if df > lam:
            contrib = tfs * (k1 + 1.0) / (
                tfs + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl)
            )
            # the scorer's exact tie order: contrib desc, docID asc
            keep = np.sort(np.lexsort((docs, -contrib))[:lam])
            # tau = the weakest KEPT contribution: every pruned posting
            # of this slice contributes <= tau (TieredEngine's bound)
            tau_rows.append((terms_py[i], float(contrib[keep].min())))
            docs, tfs, dl = docs[keep], tfs[keep], dl[keep]
        docs_parts.append(docs)
        tfs_parts.append(tfs)
        dls_parts.append(dl)
        counts.append(docs.size)

    counts = np.asarray(counts, dtype=np.int64)
    ends = np.cumsum(counts).astype(np.int64)
    starts = (ends - counts).astype(np.int64)
    _write_meta_part(out_root, pid, tau_rows)
    marker = _pack_segment(
        out, pid,
        seg["term"].combine_chunks(),
        seg["salt"].to_numpy(zero_copy_only=False).astype(np.int64),
        np.concatenate(docs_parts) if counts.size else np.empty(0, np.int64),
        np.concatenate(tfs_parts) if counts.size else np.empty(0, np.int64),
        np.concatenate(dls_parts) if counts.size else np.empty(0, np.int64),
        starts, ends,
        avgdl, k1, b, bs, fingerprint, t0,
    )
    marker["status"] = "pruned"
    return marker


def prune_index(index_dir: str, out_dir: str, lam: int = DEFAULT_LAMBDA) -> Manifest:
    """Write the top-λ statically pruned copy of ``index_dir``."""
    src = IndexPaths(index_dir)
    manifest = Manifest.read(src.manifest)
    fingerprint = f"{manifest.input_fingerprint}|prune{lam}"
    out = IndexPaths(out_dir)
    out.ensure_dirs()

    rows = ray.get(
        [
            _prune_partition.remote(
                pid, index_dir, out_dir, lam,
                manifest.average_doclength, manifest.k1, manifest.b,
                manifest.block_size, fingerprint, manifest.num_docs,
            )
            for pid in range(manifest.num_partitions)
        ]
    )
    append_lineage(out.lineage, rows)

    # global stats are PRESERVED, not recomputed: copy term_stats
    # (df/cf/max_score of the FULL index keep idf and the pruning
    # bounds bit-identical) and the docmap (doclengths unchanged)
    for sub in ("term_stats", "docmap_dir"):
        dst = getattr(out, sub)
        src_dir = getattr(src, sub)
        os.makedirs(dst, exist_ok=True)  # ensure_dirs covers docmap only
        for f in os.listdir(dst):
            os.remove(os.path.join(dst, f))
        for f in os.listdir(src_dir):
            shutil.copy2(os.path.join(src_dir, f), os.path.join(dst, f))

    # per-term pruning threshold: max over slices of the weakest kept
    # contribution (a salted term's doc lives in exactly one slice, so
    # the per-term MAX upper-bounds any hidden contribution)
    meta_dir = os.path.join(out_dir, "prune_meta")
    # stale parts from a prior run in the same out_dir (e.g. a different
    # partition count) would inject wrong taus into M — drop anything
    # this run's partitions did not write
    expected = {f"part-{pid:05d}.parquet" for pid in range(manifest.num_partitions)}
    for f in os.listdir(meta_dir):
        if f not in expected:
            os.remove(os.path.join(meta_dir, f))
    missing = sorted(expected - set(os.listdir(meta_dir)))
    if missing:
        raise RuntimeError(f"prune_meta parts missing after prune: {missing}")
    parts = [
        pq.read_table(os.path.join(meta_dir, f)) for f in sorted(expected)
    ]
    merged = (
        pa.concat_tables(parts)
        if parts
        else pa.table({"term": pa.array([], type=pa.string()),
                       "tau": pa.array([], type=pa.float64())})
    )
    if merged.num_rows:
        agg = merged.group_by("term").aggregate([("tau", "max")])
        # select by NAME: pyarrow's aggregate column order has differed
        # across versions, so a positional rename could swap term/tau
        merged = pa.table(
            {"term": agg["term"], "tau": agg["tau_max"]}
        ).sort_by("term")
    tmp = os.path.join(out_dir, ".prune_meta.parquet.tmp")
    pq.write_table(merged, tmp)
    os.replace(tmp, os.path.join(out_dir, "prune_meta.parquet"))

    new_manifest = Manifest(
        version=manifest.version,
        num_docs=manifest.num_docs,
        num_postings_lists=manifest.num_postings_lists,
        total_terms_in_collection=manifest.total_terms_in_collection,
        average_doclength=manifest.average_doclength,
        description=f"top-{lam} static pruning of {index_dir}",
        num_partitions=manifest.num_partitions,
        k1=manifest.k1,
        b=manifest.b,
        block_size=manifest.block_size,
        input_fingerprint=fingerprint,
        heavy_terms=manifest.heavy_terms,
        analyzer=manifest.analyzer,
    )
    new_manifest.write(out.manifest)
    return new_manifest


def index_postings_bytes(index_dir: str) -> int:
    """Total posting-payload bytes of an index's segments (size
    accounting for the pruning tests)."""
    paths = IndexPaths(index_dir)
    total = 0
    for f in os.listdir(paths.segments_dir):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(
            os.path.join(paths.segments_dir, f), columns=["doc_bytes", "tf_bytes"]
        )
        total += sum(len(x) for x in t["doc_bytes"].to_pylist())
        total += sum(len(x) for x in t["tf_bytes"].to_pylist())
    return total


class TieredEngine:
    """Two-tier retrieval with a SOUNDNESS CERTIFICATE: answer from the
    small pruned index when pruning provably could not change the top-k
    SET, exact-rescore just those k docs against the full index
    (block-targeted decode — k docs, not a scan), and fall back to a
    full-index query only when the certificate fails.

    The certificate (Ntoulas & Cho 2007 flavor): every hidden (pruned)
    contribution of query term t is <= tau_t (the weakest KEPT
    contribution, recorded at prune time), so any document's true score
    exceeds its pruned score by at most M = sum_t idf_t * tau_t.  If
    the pruned ranking has s_k > s_{k+1} + M + RANK_EPS and
    s_k > M + RANK_EPS (unseen docs score <= M), no document outside
    the pruned top-k can reach it — the SET is exact; the final
    scores/order come from the full-index rescore of those k docs, so
    the returned result is bit-identical to full.topk().  Results are
    therefore EXACT for every query; the certificate only decides which
    tier pays the cost.

    The RANK_EPS strengthening closes the rounded-key corner: `_rank`
    orders by round(score, 9) desc then docID asc, so a raw margin
    alone could admit an in/out pair whose FULL scores round equal and
    re-order by docID.  With the margin > M + 1e-9, every certified
    doc's full score exceeds every excluded doc's by
    s_k - s_{k+1} - M > 1e-9 (full_in >= pruned_in, full_out <=
    pruned_out + M), which survives 9-dp rounding as a strict
    inequality — the certified set IS full.topk's set under the
    engine's own ranking key, ties included.
    """

    def __init__(self, full_dir: str, pruned_dir: str):
        from ciff_ray.query import QueryEngine

        self.full = QueryEngine(full_dir)
        self.pruned = QueryEngine(pruned_dir)
        meta = pq.read_table(
            os.path.join(pruned_dir, "prune_meta.parquet")
        )  # term-sorted (term, tau); only TRUNCATED terms appear
        self._tau_terms = meta["term"].to_numpy(zero_copy_only=False)
        self._taus = meta["tau"].to_numpy(zero_copy_only=False)

    def _tau(self, term: str) -> float:
        i = np.searchsorted(self._tau_terms, term)
        if i < self._tau_terms.size and self._tau_terms[i] == term:
            return float(self._taus[i])
        return 0.0

    def topk(self, query: str, k: int = 10, return_certificate: bool = False):
        ps = self.pruned._local
        terms = [t for t in ps._query_terms(query) if ps._term_stat(t)]
        M = sum(ps.idf(t) * self._tau(t) for t in terms)
        u, scores = ps.score_all(query)
        certified = False
        if M == 0.0:
            certified = True  # nothing relevant was pruned
        elif u.size > k:
            kth = np.partition(scores, scores.size - k)[scores.size - k]
            k1th = np.partition(scores, scores.size - k - 1)[
                scores.size - k - 1
            ]
            certified = kth > k1th + M + RANK_EPS and kth > M + RANK_EPS
        if certified:
            # select the SET by raw pruned scores; with the RANK_EPS
            # margin the boundary gap exceeds the rounding quantum, so
            # this is the same set a round(·, 9) key would pick — the
            # final order comes from the rescore
            ids = u[np.lexsort((u, -scores))[:k]]
            # exact rescore of the k winners on the FULL index
            fs = self.full._local
            total = np.zeros(ids.size, dtype=np.float64)
            for t in terms:
                tfs = fs._candidate_tf(t, ids)
                hit = tfs > 0
                if hit.any():
                    dl = fs._dl[ids[hit]].astype(np.float64)
                    total[hit] += fs._contrib(
                        tfs[hit].astype(np.float64), dl, fs.idf(t)
                    )
            d, s = fs._rank(ids, total, k)
            if return_certificate:
                return d, s, True
            return d, s
        d, s = self.full.topk(query, k=k)
        if return_certificate:
            return d, s, False
        return d, s


class TieredScorerActor:
    """map_batches callable serving queries through :class:`TieredEngine`
    (the distributed two-tier path: small certified index first, full
    index only on certificate failure).  Both indexes are loaded once
    per actor; output matches ScorerActor's (query_id, rank, doc_id,
    score) schema, with a `certified` column so callers can audit the
    certificate hit-rate (the driver entry drops it before the oracle
    compare and logs the rate instead)."""

    def __init__(self, full_dir: str, pruned_dir: str, k: int = 10):
        self.engine = TieredEngine(full_dir, pruned_dir)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores, certs = [], [], [], [], []
        n_cert = 0
        queries = batch["query"].to_pylist()
        for qid, q in zip(batch["query_id"].to_pylist(), queries):
            d, s, cert = self.engine.topk(q, self.k, return_certificate=True)
            n_cert += bool(cert)
            qids.extend([qid] * len(d))
            ranks.extend(range(1, len(d) + 1))
            docs.extend(d.tolist())
            scores.extend(s.tolist())
            certs.extend([bool(cert)] * len(d))
        if queries:
            print(
                f"[tiered] certificate rate {n_cert}/{len(queries)} "
                f"({100.0 * n_cert / len(queries):.0f}%) in this batch"
            )
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "score": pa.array(scores, type=pa.float64()),
                "certified": pa.array(certs, type=pa.bool_()),
            }
        )
