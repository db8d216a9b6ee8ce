"""Index segment merge — incremental ingest without re-tokenizing.

Merges R already-built indexes (same partition count / BM25 params /
block size) into one index whose BM25 scores are bit-identical to a
monolithic build over the concatenated corpus.  The reference engine
has no merge (a new CIFF file means a full rebuild); this is the
Ray-native incremental-ingest story the north_rule's "merge sorted
segment postings into globally docID-ordered lists" asks for at
10^12-turn scale: ingest a day's transcripts as a small index, then
fold it into the serving index by rewriting METADATA ONLY.

Why no posting bytes are touched (the whole point):

* ``doc_bytes`` stores d-gaps only — every ABSOLUTE docID in a segment
  lives in the ``first_doc`` and ``block_last_doc`` columns
  (build.py:_slice_encode, query.py:_decode_slice/_block_decode).
  Offsetting a root's documents by the docID base is therefore a
  vectorized add over two int64 columns; the compressed payloads and
  their block byte offsets are byte-identical pass-throughs.
* Salted slices only need the query-side invariant "slices of a term
  cover disjoint ascending docID ranges in ascending salt order"
  (query.py:postings).  Root r's documents all follow root r-1's, so
  renumbering salts as ``base_r + salt`` (one stride per root)
  preserves it, and the term dict — not a hash recomputation — is the
  source of truth for slice -> partition routing, so slices stay in
  the partition file they already live in.
* Block-max / max-score pruning bounds were computed with the ROOT's
  avgdl.  The BM25 contribution c(a) = tf(k1+1)/(tf + k1(1-b+b*dl/a))
  is increasing in avgdl a, and for a' > a the ratio c(a')/c(a) =
  (X + Y/a)/(X + Y/a') with X = tf + k1(1-b) > 0, Y = k1*b*dl >= 0 is
  strictly below a'/a (supremum as X -> 0).  Scaling each stored bound
  by max(1, avgdl_merged/avgdl_root), rounded one float32 ulp UP, is
  therefore a safe upper bound for the merged index — slightly looser
  pruning, exactly correct scores (bounds only gate skipping).

Per-partition merge tasks are embarrassingly parallel raw Ray tasks
(the same deliberate drop as build.py's scatter/gather: P independent
file rewrites with no exchange; Dataset machinery would add a shuffle
the data doesn't need).  Each task is resumable via a fingerprinted
done-marker and emits a lineage row naming its source roots — the
per-partition lineage the north_rule requires.  The docmap is merged
as a streaming Ray Data union (offset doc_id per root -> write), never
materialized on the driver.

Caller contract: the roots index DISJOINT corpora (a conv_id present
in two roots becomes two distinct documents, which is almost never
what you want).
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

from ciff_ray.build import _write_term_stats
from ciff_ray.layout import (
    IndexPaths,
    Manifest,
    append_lineage,
    atomic_write_parquet,
    stable_hash,
)
from ciff_ray.schemas import SEGMENT_SCHEMA, TERM_DICT_SCHEMA


def _root_max_salt(paths: IndexPaths) -> int:
    """Max salt across a root's term-dict parts from parquet row-group
    statistics (metadata only; falls back to a column scan for a file
    without stats)."""
    mx = 0
    for f in sorted(os.listdir(paths.term_dict_dir)):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(paths.term_dict_dir, f)
        md = pq.ParquetFile(path).metadata
        idx = md.schema.to_arrow_schema().names.index("salt")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                col = pq.read_table(path, columns=["salt"])["salt"]
                mmax = pc.max(col).as_py()
                mx = max(mx, int(mmax) if mmax is not None else 0)
                break
            mx = max(mx, int(st.max))
    return mx


def _offset_list_i64(col: pa.ChunkedArray, delta: int) -> pa.LargeListArray:
    """large_list<int64> column + scalar -> new list array (flat add)."""
    arr = col.combine_chunks()
    vals = pc.add(arr.values, pa.scalar(delta, type=pa.int64()))
    return pa.LargeListArray.from_arrays(arr.offsets, vals)


def _scale_bounds_f32(vals: np.ndarray, factor: float) -> np.ndarray:
    """Scale float32 pruning bounds by factor >= 1, rounded one float32
    ulp up so the merged bound can never fall below the float64 score
    the query path computes (same rounding rule as the build)."""
    if factor <= 1.0:
        return vals
    scaled = vals.astype(np.float64) * factor
    return np.nextafter(scaled.astype(np.float32), np.float32(np.inf))


def _transform_segment(
    seg: pa.Table, doc_base: int, salt_base: int, bound_factor: float
) -> pa.Table:
    """One root's partition segment -> merged coordinate space."""
    bmax = seg["block_max_score"].combine_chunks()
    new_bmax = pa.LargeListArray.from_arrays(
        bmax.offsets,
        pa.array(
            _scale_bounds_f32(
                np.asarray(bmax.values, dtype=np.float32), bound_factor
            ),
            type=pa.float32(),
        ),
    )
    cols = {name: seg[name] for name in seg.column_names}
    cols["salt"] = pc.add(seg["salt"], pa.scalar(salt_base, type=pa.int32()))
    cols["first_doc"] = pc.add(
        seg["first_doc"], pa.scalar(doc_base, type=pa.int64())
    )
    cols["block_last_doc"] = _offset_list_i64(seg["block_last_doc"], doc_base)
    cols["block_max_score"] = new_bmax
    return pa.table(cols, schema=SEGMENT_SCHEMA)


def _transform_term_dict(
    td: pa.Table, salt_base: int, bound_factor: float
) -> pa.Table:
    cols = {name: td[name] for name in td.column_names}
    cols["salt"] = pc.add(td["salt"], pa.scalar(salt_base, type=pa.int32()))
    ms = td["max_score"].to_numpy(zero_copy_only=False).astype(np.float32)
    cols["max_score"] = pa.array(
        _scale_bounds_f32(ms, bound_factor), type=pa.float32()
    )
    return pa.table(cols, schema=TERM_DICT_SCHEMA)


@ray.remote
def _merge_partition(
    pid: int,
    root_dirs: list[str],
    doc_bases: list[int],
    salt_bases: list[int],
    bound_factors: list[float],
    out_root: str,
    fingerprint: str,
) -> dict:
    """Merge one partition's segment + term-dict part across all roots.
    Pure file rewrite: no decode, no re-encode, no exchange."""
    pa.set_cpu_count(1)
    t0 = time.monotonic()
    out = IndexPaths(out_root)
    done_path = out.segment_done(pid)
    if os.path.exists(done_path):
        with open(done_path) as f:
            done = json.load(f)
        if (
            done.get("fingerprint") == fingerprint
            and os.path.exists(out.segment(pid))
            and os.path.exists(out.term_dict_part(pid))
        ):
            done["status"] = "skipped"
            done.setdefault("partition_id", pid)
            return done

    seg_parts, td_parts = [], []
    for r, root in enumerate(root_dirs):
        rp = IndexPaths(root)
        if not os.path.exists(rp.segment(pid)):
            continue  # a root may have written nothing into this partition
        seg = pq.read_table(rp.segment(pid))
        seg_parts.append(
            _transform_segment(seg, doc_bases[r], salt_bases[r], bound_factors[r])
        )
        td = pq.read_table(rp.term_dict_part(pid))
        td_parts.append(_transform_term_dict(td, salt_bases[r], bound_factors[r]))

    if seg_parts:
        merged = pa.concat_tables(seg_parts).combine_chunks()
        order = pc.sort_indices(
            merged.select(["term", "salt"]),
            sort_keys=[("term", "ascending"), ("salt", "ascending")],
        )
        merged = merged.take(order)
        tdm = pa.concat_tables(td_parts).combine_chunks()
        tdm = tdm.take(
            pc.sort_indices(
                tdm.select(["term", "salt"]),
                sort_keys=[("term", "ascending"), ("salt", "ascending")],
            )
        )
    else:
        merged = SEGMENT_SCHEMA.empty_table()
        tdm = TERM_DICT_SCHEMA.empty_table()
    atomic_write_parquet(merged, out.segment(pid))
    atomic_write_parquet(tdm, out.term_dict_part(pid))

    marker = {
        "partition_id": pid,
        "fingerprint": fingerprint,
        "n_slices": merged.num_rows,
        "n_postings": int(pc.sum(merged["df"]).as_py() or 0),
        "bytes": merged.nbytes,
        "seconds": round(time.monotonic() - t0, 3),
        "sources": [os.path.basename(r.rstrip("/")) for r in root_dirs],
        "status": "merged",
    }
    tmp = done_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, done_path)
    return marker


def _offset_docmap(batch: pa.Table, *, doc_base: int) -> pa.Table:
    return batch.set_column(
        batch.schema.get_field_index("doc_id"),
        "doc_id",
        pc.add(batch["doc_id"], pa.scalar(doc_base, type=pa.int64())),
    )


def ingest(
    base_dir: str,
    new_ds,
    out_dir: str,
    delta_dir: str | None = None,
    params=None,
) -> Manifest:
    """Incremental ingest: build a delta index over ``new_ds`` (a Ray
    Dataset of transcript rows — e.g. one day's arrivals) with the
    base's build parameters, then fold base + delta into ``out_dir``
    via :func:`merge_indexes`.  The base corpus is never re-read."""
    from ciff_ray.build import BuildParams, build_index

    base = Manifest.read(IndexPaths(base_dir).manifest)
    if params is None:
        params = BuildParams(
            num_partitions=base.num_partitions,
            block_size=base.block_size,
            k1=base.k1,
            b=base.b,
            analyzer=base.analyzer,
        )
    if (
        params.num_partitions != base.num_partitions
        or params.k1 != base.k1
        or params.b != base.b
        or params.block_size != base.block_size
        or params.analyzer != base.analyzer
    ):
        raise ValueError("delta build params must match the base index")
    if delta_dir is None:
        # unique per call: a reused default delta dir would let a
        # day-2 ingest resume-skip day-1's partitions (in-memory deltas
        # have no input fingerprint to tell them apart)
        import uuid

        delta_dir = os.path.join(out_dir + f".delta-{uuid.uuid4().hex[:8]}")
    build_index(new_ds, delta_dir, params)
    return merge_indexes([base_dir, delta_dir], out_dir)


def upsert_convs(
    base_dir: str,
    new_ds,
    out_dir: str,
    delta_dir: str | None = None,
    params=None,
) -> Manifest:
    """Replace whole conversations: tombstone every existing turn of
    the conv_ids present in ``new_ds`` in the BASE index (mutates the
    base's tombstone file — deferred-delete semantics), then fold
    ``new_ds`` in as a delta via :func:`ingest`.  Conversations not in
    the base are plain inserts.

    Until :func:`ciff_ray.lifecycle.compact_index` runs on the result,
    collection statistics keep their index-time values and the docmap
    carries the dead duplicates of the replaced conversations (queries
    can never return them — every scorer filters tombstones).  After
    compaction the index is bit-identical to a from-scratch build over
    the updated corpus (tests/test_upsert.py)."""
    from ciff_ray.lifecycle import delete_convs

    # materialize once: .unique() below and the delta build inside
    # ingest() would otherwise each re-execute the caller's full lazy
    # pipeline (the delta is the SMALL side of an upsert by contract —
    # it lives in the object store, spilling if needed)
    new_ds = new_ds.materialize()
    convs = new_ds.unique("conv_id")
    delete_convs(base_dir, convs)
    return ingest(base_dir, new_ds, out_dir, delta_dir=delta_dir, params=params)


def merge_indexes(root_dirs: list[str], out_dir: str) -> Manifest:
    """Merge built indexes into ``out_dir``.  Resumable: completed
    partitions (and the docmap) are skipped via fingerprinted markers.
    Returns the merged manifest."""
    if len(root_dirs) < 2:
        raise ValueError("merge_indexes needs at least two roots")
    manifests = [Manifest.read(IndexPaths(r).manifest) for r in root_dirs]
    m0 = manifests[0]
    for m in manifests[1:]:
        for f in (
            "num_partitions", "k1", "b", "block_size", "version",
            "analyzer",  # a stemmed and an unstemmed index must not fold
        ):
            if getattr(m, f) != getattr(m0, f):
                raise ValueError(
                    f"roots disagree on {f}: {getattr(m, f)} vs {getattr(m0, f)}"
                )

    num_docs = sum(m.num_docs for m in manifests)
    total_terms = sum(m.total_terms_in_collection for m in manifests)
    avgdl = total_terms / num_docs if num_docs else 0.0
    doc_bases, acc = [], 0
    for m in manifests:
        doc_bases.append(acc)
        acc += m.num_docs
    # one salt stride for all roots: enough headroom for every root's
    # max salt, so renumbered salts order strictly by root
    stride = 1 + max(_root_max_salt(IndexPaths(r)) for r in root_dirs)
    salt_bases = [r * stride for r in range(len(root_dirs))]
    if salt_bases[-1] + stride > 2**31 - 1:
        raise ValueError("merged salt space exceeds int32")
    bound_factors = [
        (avgdl / m.average_doclength) if avgdl > m.average_doclength else 1.0
        for m in manifests
    ]

    fingerprint = format(
        stable_hash(
            "|".join(
                f"{m.input_fingerprint}:{m.num_docs}" for m in manifests
            ).encode()
        ),
        "08x",
    )
    out = IndexPaths(out_dir)
    out.ensure_dirs()

    # partitions: P independent metadata rewrites, fully parallel
    P = m0.num_partitions
    rows = ray.get(
        [
            _merge_partition.remote(
                pid,
                list(root_dirs),
                doc_bases,
                salt_bases,
                bound_factors,
                out_dir,
                fingerprint,
            )
            for pid in range(P)
        ]
    )
    append_lineage(out.lineage, rows)

    # docmap: streaming union with per-root docID offset (never on the
    # driver); resumable via its own marker
    docmap_marker = os.path.join(out.root, "docmap_done.json")
    docmap_done = False
    if os.path.exists(docmap_marker):
        with open(docmap_marker) as f:
            docmap_done = json.load(f).get("fingerprint") == fingerprint
    if not docmap_done:
        for f in os.listdir(out.docmap_dir):
            os.remove(os.path.join(out.docmap_dir, f))
        parts = [
            ray.data.read_parquet(IndexPaths(r).docmap_dir).map_batches(
                _offset_docmap,
                fn_kwargs={"doc_base": doc_bases[i]},
                batch_format="pyarrow",
            )
            for i, r in enumerate(root_dirs)
        ]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        ds.write_parquet(out.docmap_dir)
        tmp = docmap_marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"fingerprint": fingerprint}, f)
        os.replace(tmp, docmap_marker)

    # tombstones PROPAGATE: a root's deferred deletes must not be
    # resurrected by the fold — offset each root's tombstoned docIDs by
    # its base and union them into the merged index's tombstone file
    dead_parts = []
    for i, r in enumerate(root_dirs):
        tp = IndexPaths(r).tombstones
        if os.path.exists(tp):
            ids = (
                pq.read_table(tp)["doc_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            dead_parts.append(ids + doc_bases[i])
    if dead_parts:
        dead = np.unique(np.concatenate(dead_parts))
        atomic_write_parquet(
            pa.table({"doc_id": pa.array(dead, type=pa.int64())}),
            out.tombstones,
        )
    elif os.path.exists(out.tombstones):
        # a REUSED out_dir may hold a previous occupant's tombstones;
        # with no roots carrying deletes they refer to nothing in this
        # merge and would silently suppress arbitrary merged docs
        os.remove(out.tombstones)

    # global term stats: same two-level distributed tree as the build,
    # over the merged term-dict parts
    num_lists = _write_term_stats(out)

    heavy: dict = {}
    for m in manifests:
        for t, s in (m.heavy_terms or {}).items():
            heavy[t] = max(heavy.get(t, 0), s)
    manifest = Manifest(
        version=m0.version,
        num_docs=num_docs,
        num_postings_lists=num_lists,
        total_terms_in_collection=total_terms,
        average_doclength=avgdl,
        description=f"merge of {len(root_dirs)} indexes",
        num_partitions=P,
        k1=m0.k1,
        b=m0.b,
        block_size=m0.block_size,
        input_fingerprint=fingerprint,
        heavy_terms=heavy,
        analyzer=m0.analyzer,
    )
    manifest.write(out.manifest)
    return manifest
