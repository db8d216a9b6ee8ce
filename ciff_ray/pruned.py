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
    done_path = out.segment_done(pid)
    if os.path.exists(done_path):
        with open(done_path) as f:
            done = json.load(f)
        if done.get("fingerprint") == fingerprint and os.path.exists(
            out.segment(pid)
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

    docs_parts, tfs_parts, dls_parts, counts = [], [], [], []
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
            docs, tfs, dl = docs[keep], tfs[keep], dl[keep]
        docs_parts.append(docs)
        tfs_parts.append(tfs)
        dls_parts.append(dl)
        counts.append(docs.size)

    counts = np.asarray(counts, dtype=np.int64)
    ends = np.cumsum(counts).astype(np.int64)
    starts = (ends - counts).astype(np.int64)
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
