"""CIFF file <-> ciff_ray Ray index bridge.

* :func:`ciff_to_index` — import a CIFF file into the ciff_ray segment
  layout so the Ray query engine (actor pools, block-max metadata)
  serves indexes exported by ANY CIFF producer (Anserini, PISA, the
  reference converters).  The protobuf stream parse is driver-side —
  the format is a single sequential length-delimited file — but the
  partition encode/write fans out through the same
  ``groupby(partition_id).map_groups`` writer as the native build
  (ciff_ray.build), so segments, block-max scores, term dictionary and
  lineage are identical in shape to a native build.

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
from ray.data.aggregate import Max, Sum

from ciff_ray.build import BuildParams, make_partition_writer, pack_partial_runs
from ciff_ray.interop.convert import CiffReader, CiffWriter
from ciff_ray.interop.proto import CiffDocRecord, CiffHeader, CiffPostingsList
from ciff_ray.layout import (
    IndexPaths,
    Manifest,
    append_lineage,
    atomic_write_parquet,
    stable_hash,
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

    # --- postings: parse stream -> exploded arrow -> Ray partition write ---
    terms: list[str] = []
    doc_arrs: list[np.ndarray] = []
    tf_arrs: list[np.ndarray] = []
    for pl in reader.postings_lists():
        terms.append(pl.term)
        doc_arrs.append(pl.doc_ids())
        tf_arrs.append(pl.tfs)
    counts = np.asarray([d.size for d in doc_arrs], dtype=np.int64)
    crc = np.asarray([stable_hash(t.encode()) for t in terms], dtype=np.int64)
    ends = np.cumsum(counts).astype(np.int64)
    starts = (ends - counts).astype(np.int64)
    docs_flat = np.concatenate(doc_arrs) if doc_arrs else np.empty(0, np.int64)
    tfs_flat = np.concatenate(tf_arrs) if tf_arrs else np.empty(0, np.int64)
    dl_arr = np.asarray(
        [r.doclength for r in CiffReader(ciff_path).doc_records()], dtype=np.int64
    )
    dls_flat = (
        dl_arr[docs_flat] if dl_arr.size else np.zeros(0, dtype=np.int64)
    )
    doc_bytes, tf_bytes, dl_bytes = pack_partial_runs(
        docs_flat, tfs_flat, starts, ends, dls_flat
    )
    # one packed partial-list row per term (the writer's combiner shape)
    exploded = pa.table(
        {
            "partition_id": pa.array(
                (crc % params.num_partitions).astype(np.int32)
            ),
            "term": pa.array(terms, type=pa.string()),
            "salt": pa.array(np.zeros(len(terms), dtype=np.int32)),
            "df": pa.array(counts, type=pa.int64()),
            "doc_bytes": doc_bytes,
            "tf_bytes": tf_bytes,
            "dl_bytes": dl_bytes,
        }
    )

    # --- docmap (dense docid order enforced, /root/reference/src/lib.rs:545-546)
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
    # honor the exporter's explicitly-stored precision
    # (/root/reference/proto/common-index-format-v1.proto:27-29)
    avgdl = header.average_doclength

    writer = make_partition_writer(paths, avgdl, params, fingerprint)
    lineage_ds = (
        ray.data.from_arrow(exploded)
        .groupby("partition_id")
        .map_groups(writer, batch_format="pyarrow")
    )
    rows = lineage_ds.take_all()
    append_lineage(
        paths.lineage,
        [
            {k: (v if not hasattr(v, "item") else v.item()) for k, v in r.items()}
            for r in rows
        ],
    )

    term_stats = (
        ray.data.read_parquet(paths.term_dict_dir)
        .groupby("term")
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("cf", alias_name="cf"),
            Max("max_score", alias_name="max_score"),
        )
    )
    # write_parquet appends into an existing dir; clear so a resumed
    # import can't duplicate term-stats rows
    os.makedirs(paths.term_stats, exist_ok=True)
    for f in os.listdir(paths.term_stats):
        os.remove(os.path.join(paths.term_stats, f))
    term_stats.write_parquet(paths.term_stats)

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


def index_to_ciff(
    index_dir: str, output_path: str, description: str | None = None
) -> CiffHeader:
    """Export a ciff_ray index to a CIFF file."""
    from ciff_ray.query import LocalScorer

    scorer = LocalScorer(index_dir)
    m = scorer.manifest
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
    # byte-sorted term order — required by PISA downstream (O1 semantics)
    all_terms = scorer.vocabulary()  # byte-sorted by construction
    with CiffWriter(output_path, header) as w:
        for term in all_terms:
            docs, tfs = scorer.postings(term)
            w.write_postings_list(CiffPostingsList.from_absolute(term, docs, tfs))
        dm = pq.read_table(
            IndexPaths(index_dir).docmap_dir,
            columns=["doc_id", "collection_docid", "doclength"],
        )
        dm = dm.take(pc.sort_indices(dm["doc_id"].combine_chunks()))
        for did, coll, dl in zip(
            dm["doc_id"].to_pylist(),
            dm["collection_docid"].to_pylist(),
            dm["doclength"].to_pylist(),
        ):
            w.write_doc_record(CiffDocRecord(did, coll, dl))
    return header
