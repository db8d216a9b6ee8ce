"""CIFF file <-> ciff_ray Ray index bridge.

* :func:`ciff_to_index` — import a CIFF file into the ciff_ray segment
  layout so the Ray query engine (actor pools, block-max metadata)
  serves indexes exported by ANY CIFF producer (Anserini, PISA, the
  reference converters).  The only driver-side pass is a boundary SCAN
  of the length-delimited postings stream (one varint + skip per
  message — the format's inherently sequential part); the protobuf
  DECODE fans out as map_batches over message chunks, and the
  partition encode/write reuses the native build's scatter/gather
  (`_partitioned_write`) and distributed term-stats merge, so
  segments, block-max scores, term dictionary and lineage are
  identical in shape to a native build.

* :func:`index_to_ciff` — export a Ray-built index to a CIFF file
  (Header / term-sorted PostingsLists / docID-sorted DocRecords), the
  ciff_ray analogue of the reference's PISA->CIFF direction
  (/root/reference/src/lib.rs:681-840).  Writing is sequential by
  format; posting lists are streamed per term in byte-sorted order.
  At 10^12-doc scale this export exists for interop/golden testing,
  not as a data path.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ciff_ray.build import (
    BuildParams,
    _partitioned_write,
    _write_term_stats,
    make_partition_writer,
    pack_partial_runs,
)
from ciff_ray.interop.convert import CiffReader, CiffWriter
from ciff_ray.interop.proto import (
    CiffHeader,
    CiffPostingsList,
    read_delimited,
    serialize_doc_records,
)
from ciff_ray.layout import (
    IndexPaths,
    Manifest,
    append_lineage,
    atomic_write_parquet,
    stable_hash,
)


class _DecodeChunk:
    """Decodes one (byte_pos, n_messages) postings-section chunk into
    packed combiner rows (the native build's _PARTIAL_SCHEMA shape):
    per-actor mmap of the CIFF file + one ray.get of the doclength
    broadcast, protobuf parse per message, ONE vectorized pack per
    chunk."""

    def __init__(self, ciff_path: str, dl_ref, num_partitions: int):
        from ciff_ray.interop import pisaio

        self.buf = pisaio.mmap_file(ciff_path)
        self.dl = ray.get(dl_ref)
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        doc_arrs: list[np.ndarray] = []
        tf_arrs: list[np.ndarray] = []
        for pos, count in zip(
            batch["pos"].to_pylist(), batch["count"].to_pylist()
        ):
            for _ in range(count):
                msg, pos = read_delimited(self.buf, pos)
                pl = CiffPostingsList.parse(msg)
                terms.append(pl.term)
                doc_arrs.append(pl.doc_ids())
                tf_arrs.append(pl.tfs)
        counts = np.asarray([d.size for d in doc_arrs], dtype=np.int64)
        crc = np.asarray(
            [stable_hash(t.encode()) for t in terms], dtype=np.int64
        )
        ends = np.cumsum(counts).astype(np.int64)
        starts = (ends - counts).astype(np.int64)
        docs_flat = (
            np.concatenate(doc_arrs) if doc_arrs else np.empty(0, np.int64)
        )
        tfs_flat = (
            np.concatenate(tf_arrs) if tf_arrs else np.empty(0, np.int64)
        )
        dls_flat = (
            self.dl[docs_flat] if self.dl.size else np.zeros(0, dtype=np.int64)
        )
        doc_bytes, tf_bytes, dl_bytes = pack_partial_runs(
            docs_flat, tfs_flat, starts, ends, dls_flat
        )
        return pa.table(
            {
                "partition_id": pa.array(
                    (crc % self.num_partitions).astype(np.int32)
                ),
                "term": pa.array(terms, type=pa.string()),
                "salt": pa.array(np.zeros(len(terms), dtype=np.int32)),
                "df": pa.array(counts, type=pa.int64()),
                "doc_bytes": doc_bytes,
                "tf_bytes": tf_bytes,
                "dl_bytes": dl_bytes,
            }
        )


def ciff_to_index(
    ciff_path: str,
    out_dir: str,
    params: BuildParams | None = None,
) -> Manifest:
    """Import a CIFF file into a ciff_ray index directory."""
    params = params or BuildParams()
    paths = IndexPaths(out_dir)
    paths.ensure_dirs()
    reader = CiffReader(ciff_path)
    header = reader.header
    fingerprint = format(stable_hash(repr(vars(header)).encode()), "08x")

    # --- boundary scan: the ONLY inherently sequential pass over the
    # postings section (one varint + skip per message, no decode);
    # everything downstream decodes chunks of messages in parallel ---
    chunks = reader.postings_chunks()

    # --- docmap, ONE doc-record pass (dense docid order enforced,
    # /root/reference/src/lib.rs:545-546) ---
    docids, colls, lens = [], [], []
    for seen, rec in enumerate(reader.doc_records()):
        if rec.docid != seen:
            raise ValueError("Document sizes must come in order")
        docids.append(rec.docid)
        colls.append(rec.collection_docid)
        lens.append(rec.doclength)
    docmap = pa.table(
        {
            "doc_id": pa.array(docids, type=pa.int64()),
            "collection_docid": pa.array(colls, type=pa.string()),
            "doclength": pa.array(lens, type=pa.int32()),
        }
    )
    atomic_write_parquet(docmap, f"{paths.docmap_dir}/part-00000.parquet")
    dl_arr = np.asarray(lens, dtype=np.int64)
    # ray.put once, zero-copy read per decode task; at 10^12 docs this
    # broadcast becomes a doc-range-sharded lookup (query.DoclengthStore
    # shape) — the import's only whole-collection side state
    dl_ref = ray.put(dl_arr)
    # honor the exporter's explicitly-stored precision
    # (/root/reference/proto/common-index-format-v1.proto:27-29)
    avgdl = header.average_doclength

    # --- postings: parallel chunk decode -> packed combiner rows ->
    # the SAME scatter/gather partition write as the native build ---
    chunk_ds = ray.data.from_items(
        [{"pos": p, "count": c} for p, c in chunks]
    )
    exploded = chunk_ds.map_batches(
        _DecodeChunk,
        fn_constructor_args=(ciff_path, dl_ref, params.num_partitions),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=(1, 8),
    )
    writer = make_partition_writer(paths, avgdl, params, fingerprint)
    lineage_rows = _partitioned_write(
        exploded, writer, params.num_partitions, params.writer_num_cpus
    )
    append_lineage(paths.lineage, lineage_rows)

    _write_term_stats(paths)

    manifest = Manifest(
        version=1,
        num_docs=header.num_docs,
        num_postings_lists=header.num_postings_lists,
        total_terms_in_collection=header.total_terms_in_collection,
        average_doclength=avgdl,
        description=header.description,
        num_partitions=params.num_partitions,
        k1=params.k1,
        b=params.b,
        block_size=params.block_size,
        input_fingerprint=fingerprint,
    )
    manifest.write(paths.manifest)
    return manifest


_EXPORT_COLS = [
    "term",
    "salt",
    "df",
    "first_doc",
    "doc_bytes",
    "doc_codec",
    "tf_bytes",
    "tf_codec",
]


def _segment_slices(path: str):
    """Stream one segment file's (term, salt) slices in stored order
    (the writer sorts rows by (term, salt) — build.py row_order), one
    decoded (term, salt, docs, tfs) tuple at a time; memory is one
    record batch, never the segment."""
    from ciff_ray import codecs

    pf = pq.ParquetFile(path)
    for rb in pf.iter_batches(batch_size=512, columns=_EXPORT_COLS):
        terms = rb.column(0).to_pylist()
        salts = rb.column(1).to_pylist()
        dfs = rb.column(2).to_pylist()
        firsts = rb.column(3).to_pylist()
        doc_bytes = rb.column(4).to_pylist()
        doc_codecs = rb.column(5).to_pylist()
        tf_bytes = rb.column(6).to_pylist()
        tf_codecs = rb.column(7).to_pylist()
        for i in range(rb.num_rows):
            df = dfs[i]
            gaps = codecs.decode(doc_bytes[i], df - 1, doc_codecs[i]).astype(
                np.int64
            )
            docs = np.empty(df, dtype=np.int64)
            docs[0] = firsts[i]
            if df > 1:
                np.cumsum(gaps, out=docs[1:])
                docs[1:] += firsts[i]
            tfs = codecs.decode(tf_bytes[i], df, tf_codecs[i]).astype(np.int64)
            yield (terms[i], salts[i], docs, tfs)


def _merged_postings(paths: IndexPaths):
    """Globally term-sorted posting lists streamed via a k-way merge of
    the per-partition slice streams (keyed on (term, salt); Python str
    comparison equals UTF-8 byte order, the O1 semantics PISA needs).
    Salted slices of one heavy term arrive salt-ascending — covering
    disjoint ascending docID ranges by the build invariant — and are
    concatenated into one list."""
    import heapq

    seg_files = sorted(
        os.path.join(paths.segments_dir, f)
        for f in os.listdir(paths.segments_dir)
        if f.endswith(".parquet")
    )
    stream = heapq.merge(
        *(_segment_slices(p) for p in seg_files), key=lambda s: (s[0], s[1])
    )
    cur_term: str | None = None
    doc_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    for term, _salt, docs, tfs in stream:
        if term != cur_term:
            if cur_term is not None:
                yield cur_term, np.concatenate(doc_parts), np.concatenate(tf_parts)
            cur_term, doc_parts, tf_parts = term, [], []
        doc_parts.append(docs)
        tf_parts.append(tfs)
    if cur_term is not None:
        yield cur_term, np.concatenate(doc_parts), np.concatenate(tf_parts)


def _docmap_batches(docmap_dir: str):
    """Stream docmap rows in global docID order.  Files are usually
    disjoint docID ranges (checked via parquet column stats) and stream
    one file at a time; overlapping files fall back to one in-memory
    sort of the docmap (O(num_docs) — still never a Python list of the
    whole table)."""
    files = sorted(
        os.path.join(docmap_dir, f)
        for f in os.listdir(docmap_dir)
        if f.endswith(".parquet")
    )
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = min(
            md.row_group(g).column(0).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(0).statistics.max
            for g in range(md.num_row_groups)
        )
        spans.append((lo, hi, f))
    spans.sort()
    disjoint = all(
        spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1)
    )
    if disjoint:
        for _, _, f in spans:
            t = pq.read_table(
                f, columns=["doc_id", "collection_docid", "doclength"]
            )
            t = t.take(pc.sort_indices(t["doc_id"].combine_chunks()))
            yield from t.to_batches(max_chunksize=4096)
    else:
        t = pq.read_table(
            docmap_dir, columns=["doc_id", "collection_docid", "doclength"]
        )
        t = t.take(pc.sort_indices(t["doc_id"].combine_chunks()))
        yield from t.to_batches(max_chunksize=4096)


def index_to_ciff(
    index_dir: str, output_path: str, description: str | None = None
) -> CiffHeader:
    """Export a ciff_ray index to a CIFF file — STREAMING: posting
    lists come from a k-way merge over the (term, salt)-sorted segment
    files and docmap rows from per-range-file record batches, so driver
    memory is bounded by open record batches, never the vocabulary or
    the docmap (the CIFF container is one sequential file, so a single
    writer is forced either way)."""
    paths = IndexPaths(index_dir)
    if os.path.exists(paths.tombstones):
        # the export streams raw segment postings; silently resurrecting
        # tombstoned docs in the CIFF (and breaking the dense-docid
        # invariant if they were dropped instead) is worse than failing
        raise ValueError(
            "index has pending tombstones — run lifecycle.compact_index "
            "before exporting to CIFF"
        )
    m = Manifest.read(paths.manifest)
    header = CiffHeader(
        version=1,
        num_postings_lists=m.num_postings_lists,
        num_docs=m.num_docs,
        total_postings_lists=m.num_postings_lists,
        total_docs=m.num_docs,
        total_terms_in_collection=m.total_terms_in_collection,
        average_doclength=m.average_doclength,
        description=description if description is not None else m.description,
    )
    with CiffWriter(output_path, header) as w:
        n_lists = 0
        for term, docs, tfs in _merged_postings(paths):
            if docs.size > 1 and (docs[1:] <= docs[:-1]).any():
                raise AssertionError(
                    f"salted slices of {term!r} out of docID order"
                )
            w.write_postings_list(
                CiffPostingsList.from_absolute(term, docs, tfs)
            )
            n_lists += 1
        if n_lists != m.num_postings_lists:
            raise AssertionError(
                f"exported {n_lists} lists, manifest says {m.num_postings_lists}"
            )
        for rb in _docmap_batches(paths.docmap_dir):
            # batch-vectorized wire encode (byte-identical to per-record
            # write_doc_record; the row loop was the export's long pole)
            w.write_serialized(
                serialize_doc_records(
                    rb.column(0).to_numpy(zero_copy_only=False),
                    rb.column(1),
                    rb.column(2).to_numpy(zero_copy_only=False),
                )
            )
    return header
