"""Stable dense docID assignment — the distributed replacement for the
reference's mutable ``docid_map`` counter (/root/reference/src/lib.rs:1000-1026,
SURVEY.md §2.4 T1).

Rule: doc_id = dense rank of (conv_id, turn_idx) under byte-wise-ascending
order.  Because turn_idx is dense 0-based within each conversation
(validated here), the rank factorizes as

    doc_id = conv_offset[conv_id] + turn_idx

where conv_offset is the exclusive prefix sum of per-conversation turn
counts in conv_id byte order.  This needs NO all-to-all at all — a
narrow ``map_batches`` emits per-block conversation partials (count /
min / max of turn_idx), the driver merges them with one vectorized
pyarrow group_by (|convs| << |turns| rows), sorts by conv_id bytes and
prefix-sums.  The only driver barrier is that small partial table,
exactly the "cheap barrier" SURVEY.md §7 calls for.

At cluster scale the broadcast conv_offset table (and the driver merge)
would become a hash-partitioned aggregate + join keyed on conv_id; the
routing below isolates that choice in ``compute_conv_offsets`` /
``DocIdAssigner``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _conv_partials(batch: pa.Table) -> pa.Table:
    g = batch.select(["conv_id", "turn_idx"]).group_by("conv_id").aggregate(
        [("turn_idx", "count"), ("turn_idx", "min"), ("turn_idx", "max")]
    )
    return g.rename_columns(["conv_id", "n_turns", "min_turn", "max_turn"])


def compute_conv_offsets(ds: ray.data.Dataset) -> tuple[pa.Table, int]:
    """-> (conv_offsets table sorted by conv_id bytes, num_docs).

    Also validates per-conversation turn density and (conv_id, turn_idx)
    uniqueness (duplicate keys inflate n_turns past max+1 and fail the
    density check — the analogue of the reference's dense-docid bail,
    /root/reference/src/lib.rs:545-546)."""
    parts_ds = ds.map_batches(_conv_partials, batch_format="pyarrow").materialize()
    parts = pa.concat_tables(
        [t for t in ray.get(parts_ds.to_arrow_refs()) if t.num_rows],
        promote_options="default",
    )
    merged = parts.group_by("conv_id").aggregate(
        [("n_turns", "sum"), ("min_turn", "min"), ("max_turn", "max")]
    )
    merged = merged.rename_columns(["conv_id", "n_turns", "min_turn", "max_turn"])
    order = pc.sort_indices(merged["conv_id"].combine_chunks())
    merged = merged.take(order)

    counts = merged["n_turns"].to_numpy(zero_copy_only=False).astype(np.int64)
    mins = merged["min_turn"].to_numpy(zero_copy_only=False)
    maxs = merged["max_turn"].to_numpy(zero_copy_only=False)
    if counts.size and ((mins != 0).any() or (maxs != counts - 1).any()):
        bad = merged["conv_id"][
            int(np.flatnonzero((mins != 0) | (maxs != counts - 1))[0])
        ]
        raise ValueError(
            f"turn_idx not dense 0-based for conversation {bad}: "
            "docid rule requires dense turns (FIXTURES.md §1)"
        )
    offsets = np.cumsum(counts) - counts
    out = pa.table(
        {
            "conv_id": merged["conv_id"],
            "conv_offset": pa.array(offsets, type=pa.int64()),
        }
    )
    return out, int(counts.sum())


class DocIdAssigner:
    """map_batches actor: adds dense `doc_id` + `collection_docid`.

    The conversation-offset table is fetched once per actor from the
    object store (`ray.put` broadcast) and looked up per batch with the
    vectorized hash join `pc.index_in` — no per-row Python."""

    def __init__(self, offsets_ref):
        offsets: pa.Table = ray.get(offsets_ref)
        self.conv_ids = offsets["conv_id"].combine_chunks()
        self.offsets = offsets["conv_offset"].to_numpy(zero_copy_only=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pos = pc.index_in(batch["conv_id"], value_set=self.conv_ids)
        if pos.null_count:
            raise ValueError("conv_id missing from offset table")
        pos_np = pos.to_numpy(zero_copy_only=False)
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_id = self.offsets[pos_np.astype(np.int64)] + turn
        coll = pc.binary_join_element_wise(
            batch["conv_id"],
            pc.cast(batch["turn_idx"], pa.string()),
            "/",
        )
        return batch.append_column(
            "doc_id", pa.array(doc_id, type=pa.int64())
        ).append_column("collection_docid", coll)


def assign_doc_ids(
    ds: ray.data.Dataset,
) -> tuple[ray.data.Dataset, int, "ray.ObjectRef"]:
    """-> (dataset + doc_id/collection_docid columns, num_docs, offsets ref)."""
    offsets, num_docs = compute_conv_offsets(ds)
    offsets_ref = ray.put(offsets)
    out = ds.map_batches(
        DocIdAssigner,
        fn_constructor_args=(offsets_ref,),
        batch_format="pyarrow",
        concurrency=(1, 16),
    )
    return out, num_docs, offsets_ref
