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
routing below isolates that choice in ``merge_conv_partials`` /
``add_doc_ids``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def conv_partials(batch: pa.Table) -> pa.Table:
    """Per-block conversation aggregates (count/min/max of turn_idx)."""
    g = batch.select(["conv_id", "turn_idx"]).group_by("conv_id").aggregate(
        [("turn_idx", "count"), ("turn_idx", "min"), ("turn_idx", "max")]
    )
    return g.rename_columns(["conv_id", "n_turns", "min_turn", "max_turn"])


def merge_conv_blocks(parts: pa.Table) -> pa.Table:
    """Combine conversation partials (sum counts, min/max turn) — used
    both for the driver merge and for the sharded distributed merge."""
    merged = parts.group_by("conv_id").aggregate(
        [("n_turns", "sum"), ("min_turn", "min"), ("max_turn", "max")]
    )
    return merged.rename_columns(["conv_id", "n_turns", "min_turn", "max_turn"])


def merge_conv_partials(parts: pa.Table) -> tuple[pa.Table, int]:
    """Merge per-block partials -> (conv_offsets sorted by conv_id bytes,
    num_docs).  Validates per-conversation turn density and (conv_id,
    turn_idx) uniqueness (duplicate keys inflate n_turns past max+1 and
    fail the density check — the analogue of the reference's dense-docid
    bail, /root/reference/src/lib.rs:545-546)."""
    return finalize_conv_offsets(merge_conv_blocks(parts))


def finalize_conv_offsets(merged: pa.Table) -> tuple[pa.Table, int]:
    """Already-combined per-conversation aggregates -> validated,
    byte-sorted (conv_id, conv_offset) prefix-sum table + num_docs."""
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


def compute_conv_offsets(ds: ray.data.Dataset) -> tuple[pa.Table, int]:
    """-> (conv_offsets table sorted by conv_id, num_docs)."""
    parts_ds = ds.map_batches(conv_partials, batch_format="pyarrow").materialize()
    tables = [t for t in ray.get(parts_ds.to_arrow_refs()) if t.num_rows]
    parts = pa.concat_tables(tables, promote_options="default")
    return merge_conv_partials(parts)


# Per-worker-process cache of the conv -> offset hash index.  Ray reuses
# worker processes across map tasks, so the (expensive, size-of-table)
# hashtable build happens once per worker instead of once per batch —
# per-batch lookup cost then scales with the BATCH, not the table.
# Bounded: holds the index for one offsets broadcast at a time.
_OFFSETS_INDEX_CACHE: dict[bytes, tuple] = {}


def _offsets_index(offsets_ref):
    import pandas as pd

    key = offsets_ref.binary()
    ent = _OFFSETS_INDEX_CACHE.get(key)
    if ent is None:
        offsets: pa.Table = ray.get(offsets_ref)
        idx = pd.Index(offsets["conv_id"].to_numpy(zero_copy_only=False))
        offs = offsets["conv_offset"].to_numpy(zero_copy_only=False)
        idx.get_indexer(idx[:1])  # force the lazy hashtable build now
        _OFFSETS_INDEX_CACHE.clear()
        _OFFSETS_INDEX_CACHE[key] = (idx, offs)
        ent = (idx, offs)
    return ent


def add_doc_ids(
    batch: pa.Table, offsets_ref, with_collection_id: bool = True
) -> pa.Table:
    """map_batches body: adds dense `doc_id` (+ `collection_docid`).

    The conversation-offset table is a `ray.put` broadcast; `ray.get`
    inside the task is a zero-copy shared-memory read, and the lookup is
    a cached per-worker hash index — no per-row Python."""
    idx, offs = _offsets_index(offsets_ref)
    pos = idx.get_indexer(batch["conv_id"].to_numpy(zero_copy_only=False))
    if pos.size and pos.min() < 0:
        raise ValueError("conv_id missing from offset table")
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_id = offs[pos] + turn
    out = batch.append_column("doc_id", pa.array(doc_id, type=pa.int64()))
    if with_collection_id:
        coll = pc.binary_join_element_wise(
            batch["conv_id"],
            pc.cast(batch["turn_idx"], pa.string()),
            "/",
        )
        out = out.append_column("collection_docid", coll)
    return out


# Back-compat name used by earlier revisions/tests.
class DocIdAssigner:
    def __init__(self, offsets_ref):
        self.offsets_ref = offsets_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        return add_doc_ids(batch, self.offsets_ref)


def assign_doc_ids(
    ds: ray.data.Dataset,
) -> tuple[ray.data.Dataset, int, "ray.ObjectRef"]:
    """-> (dataset + doc_id/collection_docid columns, num_docs, offsets ref)."""
    offsets, num_docs = compute_conv_offsets(ds)
    offsets_ref = ray.put(offsets)
    out = ds.map_batches(
        add_doc_ids,
        fn_kwargs={"offsets_ref": offsets_ref},
        batch_format="pyarrow",
    )
    return out, num_docs, offsets_ref
