"""Index observability report — the `_cat/indices` / `_segments`
analogue: one distributed pass over the segment files returning a
per-partition stats table (and a one-row rollup) an operator reads
before serving or compacting:

    partition, slices, terms, postings, doc_bytes, tf_bytes,
    codec mix (varint / elias-gamma / bit-packed slice counts),
    max_df, heavy_slices (salted)

Everything comes from segment COLUMNS (no posting decode — contrast
fsck, which decodes everything), so the pass is metadata-cheap: the
only per-row work is byte-length sums and codec bincounts, one
map_batches over the segment parquet with column pruning.

Deterministic for a given build: codec selection is measured-size-based
(ciff_ray.codecs), so byte totals are reproducible — pytest pins the
rollup against independently recomputed values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ciff_ray.layout import IndexPaths, Manifest

_CODEC_NAMES = {0: "varint", 1: "gamma", 2: "packed"}


def _partition_stats(batch: pa.Table) -> pa.Table:
    """Per-input-file partial (one segment file == one partition, but
    we aggregate again by partition afterwards to stay correct under
    block splits)."""
    df = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    salt = batch["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_b = pc.binary_length(batch["doc_bytes"].combine_chunks())
    tf_b = pc.binary_length(batch["tf_bytes"].combine_chunks())
    dcodec = batch["doc_codec"].to_numpy(zero_copy_only=False).astype(np.int64)
    codec_counts = np.bincount(dcodec, minlength=3)
    return pa.table(
        {
            "slices": pa.array([batch.num_rows], type=pa.int64()),
            "terms": pa.array(
                [int(pc.count_distinct(batch["term"]).as_py())],
                type=pa.int64(),
            ),
            "postings": pa.array([int(df.sum())], type=pa.int64()),
            "doc_bytes": pa.array(
                [int(pc.sum(doc_b).as_py() or 0)], type=pa.int64()
            ),
            "tf_bytes": pa.array(
                [int(pc.sum(tf_b).as_py() or 0)], type=pa.int64()
            ),
            "varint_slices": pa.array([int(codec_counts[0])], type=pa.int64()),
            "gamma_slices": pa.array([int(codec_counts[1])], type=pa.int64()),
            "packed_slices": pa.array([int(codec_counts[2])], type=pa.int64()),
            "max_df": pa.array(
                [int(df.max()) if df.size else 0], type=pa.int64()
            ),
            "heavy_slices": pa.array([int((salt > 0).sum())], type=pa.int64()),
        }
    )


def index_report(index_dir: str) -> dict:
    """One-row rollup dict over the whole index (manifest context +
    summed segment stats + bytes/posting)."""
    from ray.data.aggregate import Max, Sum

    m = Manifest.read(IndexPaths(index_dir).manifest)
    agg = (
        ray.data.read_parquet(
            IndexPaths(index_dir).segments_dir,
            file_extensions=["parquet"],
            columns=[
                "term", "salt", "df", "doc_codec", "doc_bytes", "tf_bytes",
            ],
        )
        .map_batches(_partition_stats, batch_format="pyarrow")
        .aggregate(
            Sum("slices", alias_name="slices"),
            Sum("postings", alias_name="postings"),
            Sum("doc_bytes", alias_name="doc_bytes"),
            Sum("tf_bytes", alias_name="tf_bytes"),
            Sum("varint_slices", alias_name="varint_slices"),
            Sum("gamma_slices", alias_name="gamma_slices"),
            Sum("packed_slices", alias_name="packed_slices"),
            Max("max_df", alias_name="max_df"),
            Sum("heavy_slices", alias_name="heavy_slices"),
        )
    )
    postings = int(agg["postings"])
    payload = int(agg["doc_bytes"]) + int(agg["tf_bytes"])
    return {
        "num_docs": m.num_docs,
        "num_postings_lists": m.num_postings_lists,
        "num_partitions": m.num_partitions,
        "avg_doclength": m.average_doclength,
        "slices": int(agg["slices"]),
        "postings": postings,
        "doc_bytes": int(agg["doc_bytes"]),
        "tf_bytes": int(agg["tf_bytes"]),
        "bytes_per_posting": (payload / postings) if postings else 0.0,
        "codec_slices": {
            "varint": int(agg["varint_slices"]),
            "gamma": int(agg["gamma_slices"]),
            "packed": int(agg["packed_slices"]),
        },
        "max_df": int(agg["max_df"]),
        "heavy_slices": int(agg["heavy_slices"]),
    }
