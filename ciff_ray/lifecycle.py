"""Index lifecycle: tombstone deletes + compaction.

Completes the mutation story around the immutable segment files (the
reference engine rebuilds from scratch for any change):

* :func:`delete_docs` appends docIDs to a tombstone file.  Deletes are
  DEFERRED: every scorer filters tombstoned docs out of decoded
  posting lists (query.LocalScorer.postings), so no mode can return
  them, while collection statistics (df/avgdl/N) keep their index-time
  values — the standard deferred-delete semantics (pruning bounds stay
  valid because removing documents only lowers true scores).
* :func:`compact_index` rewrites the index without the tombstoned
  docs: postings decoded per partition (embarrassingly parallel, no
  exchange, no re-tokenize), dead postings dropped, surviving docIDs
  remapped to dense ranks, segments re-packed through the same
  build._pack_segment kernel with EXACT recomputed statistics — the
  compacted index scores bit-identically to a from-scratch build over
  the surviving corpus (tests/test_lifecycle.py).

Doclengths for the new block-max bounds come from the source index's
own doc-range-sharded DoclengthStore (row-group-pruned reads) — no
global doclength broadcast, same as the build.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ciff_ray import codecs
from ciff_ray.build import _pack_segment, _write_term_stats
from ciff_ray.layout import (
    IndexPaths,
    Manifest,
    append_lineage,
    atomic_write_parquet,
    stable_hash,
)


# compaction re-chunks same-term slices to at most ~this many postings
# (plus one straddling source slice); keeps heavy terms sharded
SLICE_CAP = 1 << 20


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone documents by docID.  Cumulative and idempotent; takes
    effect on the next scorer construction.  Returns the total
    tombstone count."""
    import fcntl

    paths = IndexPaths(index_dir)
    manifest = Manifest.read(paths.manifest)
    new = np.unique(np.asarray(doc_ids, dtype=np.int64))
    if new.size and (new[0] < 0 or new[-1] >= manifest.num_docs):
        raise ValueError(
            f"doc_ids out of range [0, {manifest.num_docs}): "
            f"{new[0]}..{new[-1]}"
        )
    # the read-union-write below is a lost-update race under concurrent
    # callers (both read the same old set; the second replace drops the
    # first's deletes) — serialize writers with an advisory flock
    lock_path = paths.tombstones + ".lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if os.path.exists(paths.tombstones):
            old = (
                pq.read_table(paths.tombstones)["doc_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            new = np.union1d(old, new)
        atomic_write_parquet(
            pa.table({"doc_id": pa.array(new, type=pa.int64())}),
            paths.tombstones,
        )
    append_lineage(
        paths.lineage,
        [{"op": "delete", "n_total_tombstones": int(new.size), "ts": time.time()}],
    )
    return int(new.size)


def delete_convs(index_dir: str, conv_ids) -> int:
    """Tombstone every turn of the given conversations (the conv-level
    delete the upsert path needs).  A distributed docmap scan resolves
    conv membership: each map task parses the conv prefix out of
    ``collection_docid`` (``<conv_id>/<turn_idx>``, turn has no '/')
    and emits ONLY matching docIDs, so the driver materializes the
    delete set (bounded by the upsert size), never the docmap.
    Returns the total tombstone count after the delete."""
    import ray.data

    conv_set = sorted(set(conv_ids))
    if not conv_set:
        paths = IndexPaths(index_dir)
        return int(_load_tombstones(paths).size)
    conv_ref = ray.put(pa.array(conv_set, type=pa.string()))

    def _matches(batch: pa.Table, *, ref=conv_ref) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64())})
        convs = pc.list_element(
            pc.split_pattern(
                batch["collection_docid"], "/", max_splits=1, reverse=True
            ),
            0,
        )
        hit = pc.is_in(convs, value_set=ray.get(ref))
        return pa.table({"doc_id": batch["doc_id"].filter(hit)})

    rows = (
        ray.data.read_parquet(
            IndexPaths(index_dir).docmap_dir,
            columns=["doc_id", "collection_docid"],
        )
        .map_batches(_matches, batch_format="pyarrow")
        .take_all()
    )
    return delete_docs(index_dir, [r["doc_id"] for r in rows])


def _load_tombstones(paths: IndexPaths) -> np.ndarray:
    if not os.path.exists(paths.tombstones):
        return np.empty(0, dtype=np.int64)
    return np.sort(
        pq.read_table(paths.tombstones)["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def _dead_mask(docs: np.ndarray, dead: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(dead, docs)
    return (pos < dead.size) & (dead[np.minimum(pos, dead.size - 1)] == docs)


@ray.remote
def _compact_partition(
    pid: int,
    in_root: str,
    out_root: str,
    dead_ref,
    avgdl_new: float,
    k1: float,
    b: float,
    bs: int,
    fingerprint: str,
    num_docs_old: int,
    heavy_terms: list[str],
) -> dict:
    """Rewrite one partition without the tombstoned docs: decode each
    slice (vectorized within; one short Python iteration per slice),
    drop dead postings, remap survivors to dense ranks, coalesce
    non-heavy slice fragmentation, re-pack via the shared build
    kernel.  Resumable via the out done-marker."""
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
    # dead_ref is a top-level task arg, so Ray has already dereferenced
    # the ray.put handle into the shared-memory array
    dead: np.ndarray = dead_ref
    seg = (
        pq.read_table(src.segment(pid))
        if os.path.exists(src.segment(pid))
        else None
    )
    if seg is None or seg.num_rows == 0:
        marker = _pack_segment(
            out,
            pid,
            pa.array([], type=pa.string()),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            avgdl_new,
            k1,
            b,
            bs,
            fingerprint,
            t0,
        )
        marker["status"] = "compacted"
        return marker

    dl_store = DoclengthStore(src.docmap_dir, num_docs_old)
    dfs = seg["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    firsts = seg["first_doc"].to_numpy(zero_copy_only=False).astype(np.int64)
    dcodec = seg["doc_codec"].to_numpy(zero_copy_only=False)
    tcodec = seg["tf_codec"].to_numpy(zero_copy_only=False)
    doc_bufs = seg["doc_bytes"].to_pylist()
    tf_bufs = seg["tf_bytes"].to_pylist()

    docs_parts, tfs_parts, keep_counts = [], [], []
    for i in range(seg.num_rows):
        df = int(dfs[i])
        gaps = codecs.decode(doc_bufs[i], df - 1, int(dcodec[i])).astype(np.int64)
        docs = np.empty(df, dtype=np.int64)
        docs[0] = firsts[i]
        if df > 1:
            np.cumsum(gaps, out=docs[1:])
            docs[1:] += firsts[i]
        tfs = codecs.decode(tf_bufs[i], df, int(tcodec[i])).astype(np.int64)
        if dead.size:
            m = ~_dead_mask(docs, dead)
            docs, tfs = docs[m], tfs[m]
        docs_parts.append(docs)
        tfs_parts.append(tfs)
        keep_counts.append(docs.size)

    counts = np.asarray(keep_counts, dtype=np.int64)
    alive = counts > 0
    docs_flat = (
        np.concatenate([d for d, a in zip(docs_parts, alive) if a])
        if alive.any()
        else np.empty(0, np.int64)
    )
    tfs_flat = (
        np.concatenate([t for t, a in zip(tfs_parts, alive) if a])
        if alive.any()
        else np.empty(0, np.int64)
    )
    # doclengths (still under OLD docIDs) for the new block-max bounds
    dls_flat = dl_store[docs_flat] if docs_flat.size else np.empty(0, np.int64)
    # dense remap: new = old - (# dead below old)
    if dead.size and docs_flat.size:
        docs_flat = docs_flat - np.searchsorted(dead, docs_flat)

    # slice DEFRAGMENTATION: repeated ingest merges leave one slice per
    # root per term forever; coalesce adjacent same-term slices into
    # chunks of ~SLICE_CAP postings (pure boundary arithmetic — the
    # flat arrays already hold them back-to-back in docID order).
    # ONLY non-heavy terms coalesce: an unsalted term routes every
    # root's slice to the SAME partition (pid = crc(term) % P, salt 0
    # before merge renumbering), so all its slices are local and the
    # global salt invariant is preserved by keeping each chunk's first
    # salt.  A salted (heavy) term's slices interleave ACROSS
    # partitions by construction — coalescing them locally would
    # reorder docID ranges — and they should stay sharded anyway (the
    # skew bound salting exists for).
    counts_alive = counts[alive]
    terms_alive = seg["term"].combine_chunks().filter(pa.array(alive))
    salts_alive = (
        seg["salt"].to_numpy(zero_copy_only=False).astype(np.int64)[alive]
    )
    n_alive = counts_alive.size
    if n_alive:
        if heavy_terms:
            is_heavy = pc.is_in(
                terms_alive, value_set=pa.array(sorted(heavy_terms))
            ).to_numpy(zero_copy_only=False)
        else:
            is_heavy = np.zeros(n_alive, dtype=bool)
        same = np.zeros(n_alive, dtype=bool)
        if n_alive > 1:
            same[1:] = (
                pc.equal(
                    terms_alive.slice(1), terms_alive.slice(0, n_alive - 1)
                ).to_numpy(zero_copy_only=False)
                & ~is_heavy[1:]
                & ~is_heavy[:-1]
            )
        gid = np.cumsum(~same) - 1
        cs = np.cumsum(counts_alive) - counts_alive
        gbase = cs[np.flatnonzero(~same)]
        chunk = (cs - gbase[gid]) // SLICE_CAP
        is_start = np.ones(n_alive, dtype=bool)
        is_start[1:] = (gid[1:] != gid[:-1]) | (chunk[1:] != chunk[:-1])
        sl_starts = np.flatnonzero(is_start)
        new_counts = np.add.reduceat(counts_alive, sl_starts)
        terms = terms_alive.take(pa.array(sl_starts))
        # each chunk keeps its FIRST slice's salt: within a term the
        # chunk firsts ascend with the original (globally ordered)
        # salts, so the query's salt-order concat stays docID-ascending
        salts = salts_alive[sl_starts]
        ends = np.cumsum(new_counts).astype(np.int64)
        starts = (ends - new_counts).astype(np.int64)
    else:
        terms = terms_alive
        salts = np.empty(0, np.int64)
        starts = np.empty(0, np.int64)
        ends = np.empty(0, np.int64)

    marker = _pack_segment(
        out,
        pid,
        terms,
        salts,
        docs_flat,
        tfs_flat,
        dls_flat,
        starts,
        ends,
        avgdl_new,
        k1,
        b,
        bs,
        fingerprint,
        t0,
    )
    marker["status"] = "compacted"
    return marker


def compact_index(index_dir: str, out_dir: str) -> Manifest:
    """Rewrite ``index_dir`` without its tombstoned docs into
    ``out_dir`` with exact recomputed statistics.  Per-partition
    parallel, no shuffle, resumable."""
    src = IndexPaths(index_dir)
    manifest = Manifest.read(src.manifest)
    dead = _load_tombstones(src)
    num_docs_new = manifest.num_docs - int(dead.size)
    if num_docs_new <= 0:
        raise ValueError("compaction would delete every document")

    # exact surviving token count: index total minus the doclengths of
    # the dead docs (streamed, row-group-pruned read of the docmap)
    if dead.size:
        dead_ds = ray.data.read_parquet(
            src.docmap_dir, columns=["doc_id", "doclength"]
        )
        dead_arr = pa.array(dead, type=pa.int64())

        def _dead_dl_sum(t: pa.Table) -> pa.Table:
            m = pc.is_in(t["doc_id"], value_set=dead_arr)
            s = pc.sum(t.filter(m)["doclength"]).as_py() or 0
            return pa.table({"s": pa.array([int(s)], type=pa.int64())})

        dead_tokens = sum(
            r["s"]
            for r in dead_ds.map_batches(
                _dead_dl_sum, batch_format="pyarrow"
            ).take_all()
        )
    else:
        dead_tokens = 0
    total_new = manifest.total_terms_in_collection - dead_tokens
    avgdl_new = total_new / num_docs_new

    tomb_hash = format(stable_hash(dead.tobytes()), "08x")
    fingerprint = format(
        stable_hash(f"{manifest.input_fingerprint}|compact|{tomb_hash}".encode()),
        "08x",
    )
    out = IndexPaths(out_dir)
    out.ensure_dirs()
    dead_ref = ray.put(dead)
    rows = ray.get(
        [
            _compact_partition.remote(
                pid,
                index_dir,
                out_dir,
                dead_ref,
                avgdl_new,
                manifest.k1,
                manifest.b,
                manifest.block_size,
                fingerprint,
                manifest.num_docs,
                sorted(manifest.heavy_terms or {}),
            )
            for pid in range(manifest.num_partitions)
        ]
    )
    append_lineage(out.lineage, rows)

    # docmap: drop dead rows, remap surviving docIDs to dense ranks
    docmap_marker = os.path.join(out.root, "docmap_done.json")
    docmap_done = False
    if os.path.exists(docmap_marker):
        with open(docmap_marker) as f:
            docmap_done = json.load(f).get("fingerprint") == fingerprint
    if not docmap_done:
        for f in os.listdir(out.docmap_dir):
            os.remove(os.path.join(out.docmap_dir, f))

        def _remap(t: pa.Table, *, dead_ref=dead_ref) -> pa.Table:
            d = ray.get(dead_ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            if d.size:
                keep = ~_dead_mask(ids, d)
                t = t.filter(pa.array(keep))
                ids = ids[keep] - np.searchsorted(d, ids[keep])
            return t.set_column(
                t.schema.get_field_index("doc_id"),
                "doc_id",
                pa.array(ids, type=pa.int64()),
            )

        ray.data.read_parquet(src.docmap_dir).map_batches(
            _remap, batch_format="pyarrow"
        ).write_parquet(out.docmap_dir)
        tmp = docmap_marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"fingerprint": fingerprint}, f)
        os.replace(tmp, docmap_marker)

    num_lists = _write_term_stats(out)
    new_manifest = Manifest(
        version=manifest.version,
        num_docs=num_docs_new,
        num_postings_lists=num_lists,
        total_terms_in_collection=total_new,
        average_doclength=avgdl_new,
        description=f"compaction of {index_dir} ({dead.size} docs removed)",
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
