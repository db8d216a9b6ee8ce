"""DocID reordering for compression — the classic PISA-ecosystem
companion op (Silvestri's sort-by-URL, BP / recursive graph bisection,
Dhulipala et al. 2016): assign similar documents ADJACENT docIDs so
posting-list d-gaps shrink and the varint/γ/bit-packed codecs spend
fewer bytes.  The reference carries a docID-order REPAIR (O1,
reorder-repair in /root/reference/src/lib.rs:359-372; permutation
writer /root/reference/src/binary_collection.rs:384-397); this module
adds the optimizing counterpart: choose a better order, rebuild, and
serve with results mapped back to the ORIGINAL id space —
rank-and-score-identical by construction (BM25 inputs df/cf/tf/dl/avgdl
are docid-invariant, and the final rank key uses ORIGINAL ids, so even
exact-tie order is preserved).

Orderings (``ORDERINGS``):

* ``"simhash"`` — 64-bit SimHash of the document text (the
  extras.dedup kernel), ascending: a cheap one-pass clustering proxy
  that groups near-duplicate / same-template docs.
* ``"bp"`` — recursive graph bisection over the (term, doc) bipartite
  graph (:mod:`ciff_ray.bporder`), the published 2-3×-d-gap-win
  algorithm; see that module for the distribution contract.

Distribution contract (no O(num_docs) state on the driver — round-4
verdict item 1):

1. the ordering keys are a slim Dataset (16-24 B/doc);
2. the permutation is ``Dataset.sort`` over those keys — the same
   exchange class as the index build's own docmap sort;
3. NEW ids are ranks in the sorted order: per-block row counts (ints,
   one per block) are the only thing the driver touches, exclusive
   prefix-summed into per-block offsets (the docids.py device applied
   at block granularity);
4. each sorted block writes its own mapping shard
   ``(doc_id=new, old_id)`` — contiguous new-id range per shard, so
   the ``OldIdStore`` reader's row-group-stat spans are disjoint;
5. the inverse store ``(doc_id=old, new_id)`` used to re-key the
   corpus is another slim ``Dataset.sort`` + partitioned write — the
   re-key stage looks ids up through a doc-range-sharded store actor,
   never a closure-captured array.

``_DIAG`` records what actually crossed the driver (block-count list
length and the max block size) so tests can pin the no-N-array claim.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ciff_ray.query import DoclengthStore

# driver-side footprint audit of the last write_permutation_stores call
# (sketch.py's _DIAG device): driver_rows == number of sorted blocks,
# NOT number of docs.
_DIAG: dict[str, int] = {}


class OldIdStore(DoclengthStore):
    """Doc-range-sharded (new docid -> original docid) lookup."""

    VALUE_COLUMN = "old_id"
    VALUE_DTYPE = np.int64


class NewIdStore(DoclengthStore):
    """Doc-range-sharded (original docid -> new docid) lookup — the
    re-key side.  doc_id here is the ORIGINAL id (dense 0..N-1 by the
    documents-table contract), so the DoclengthStore density audit
    applies unchanged."""

    VALUE_COLUMN = "new_id"
    VALUE_DTYPE = np.int64


def _keys_simhash(docs: ray.data.Dataset) -> tuple[ray.data.Dataset, list[str]]:
    from ciff_ray.extras.dedup import simhash_batch

    return docs.map_batches(simhash_batch, batch_format="pyarrow"), ["simhash"]


def _keys_bp(docs: ray.data.Dataset) -> tuple[ray.data.Dataset, list[str]]:
    from ciff_ray.bporder import bp_keys

    return bp_keys(docs), ["bucket", "pos"]


ORDERINGS = {"simhash": _keys_simhash, "bp": _keys_bp}


@ray.remote
def _block_nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _write_mapping_shard(t: pa.Table, offset: int, tmp_dir: str, idx: int) -> int:
    """One sorted block -> one mapping shard.  Position in the global
    sort is the NEW docid; the block's ids are offset + arange.  Empty
    blocks (a sort partition with no rows carries no schema) write
    nothing."""
    n = t.num_rows
    if n == 0:
        return 0
    old = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(
                    np.arange(offset, offset + n, dtype=np.int64)
                ),
                "old_id": pa.array(old),
            }
        ),
        os.path.join(tmp_dir, f"part-{idx:05d}.parquet"),
        row_group_size=65536,
    )
    return n


def _publish(tmp: str, out_dir: str) -> None:
    """layout.publish_dir discipline: _DONE inside tmp, one atomic
    rename, loser of a race cleans up, a marker-less partial at
    out_dir self-heals."""
    from ciff_ray.layout import publish_dir

    publish_dir(tmp, out_dir)


def _swap_to_inverse(t: pa.Table) -> pa.Table:
    return pa.table({"doc_id": t["old_id"], "new_id": t["doc_id"]})


def write_permutation_stores(
    docs: ray.data.Dataset,
    mapping_dir: str,
    inv_dir: str,
    order: str = "simhash",
) -> int:
    """Build both permutation stores from a (doc_id, text) Dataset.
    Returns num_docs.  Driver footprint: one int per sorted block."""
    keys_ds, key_cols = ORDERINGS[order](docs)
    sorted_ds = (
        keys_ds.select_columns([*key_cols, "doc_id"])
        .sort([*key_cols, "doc_id"])
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) if counts else []
    tmp = f"{mapping_dir}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    written = ray.get(
        [
            _write_mapping_shard.remote(r, int(o), tmp, i)
            for i, (r, o) in enumerate(zip(refs, offsets))
        ]
    )
    num_docs = int(sum(written))
    _DIAG.clear()
    _DIAG.update(
        driver_rows=len(counts),
        num_docs=num_docs,
        max_block_rows=int(max(counts, default=0)),
    )
    _publish(tmp, mapping_dir)

    # inverse store: slim (old -> new) pairs, range-sorted by old id so
    # the NewIdStore spans are disjoint; same publish discipline
    inv_tmp = f"{inv_dir}.tmp-{os.getpid()}"
    (
        ray.data.read_parquet(mapping_dir, file_extensions=["parquet"])
        .map_batches(_swap_to_inverse, batch_format="pyarrow")
        .sort("doc_id")
        .write_parquet(inv_tmp, row_group_size=65536)
    )
    _publish(inv_tmp, inv_dir)
    return num_docs


class _RekeyActor:
    """map_batches actor: original (doc_id, text) rows -> transcripts
    whose (conv_id, turn_idx) byte-rank IS the new docid.  The
    old->new lookup goes through the doc-range-sharded NewIdStore
    (loaded lazily per actor), never a broadcast N-array.

    conv ids are fixed-width zero-padded decimal with the width
    derived from the conversation count, so byte order == numeric
    order at ANY corpus size (closes the >=10^7-conversation pad
    overflow noted in round-4 ADVICE)."""

    def __init__(self, inv_dir: str, num_docs: int, turns_per_conv: int):
        self.store = NewIdStore(inv_dir, num_docs)
        self.k = turns_per_conv
        n_convs = -(-num_docs // self.k) if num_docs else 1
        self.pad = max(7, len(str(max(n_convs - 1, 0))))

    def __call__(self, t: pa.Table) -> pa.Table:
        old = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(old, kind="stable")
        new = np.empty_like(old)
        new[order] = self.store.gather_sorted(old[order])
        conv = pc.binary_join_element_wise(
            pa.array(np.full(len(t), "conv-"), type=pa.string()),
            pc.utf8_lpad(
                pc.cast(pa.array(new // self.k), pa.string()),
                self.pad,
                "0",
            ),
            "",
        )
        return pa.table(
            {
                "conv_id": conv,
                "turn_idx": pa.array(
                    (new % self.k).astype(np.int32), type=pa.int32()
                ),
                "role": pa.array(np.full(len(t), "user"), type=pa.string()),
                "text": t["text"],
                "tool": pa.array(np.full(len(t), ""), type=pa.string()),
            }
        )


def build_reordered(
    sf_dir: str, out_dir: str, mapping_dir: str, order: str = "simhash"
) -> tuple[str, str]:
    """Rebuild the sf_dir index under the chosen order.  The re-keyed
    transcripts encode the NEW position as (conv_id, turn_idx) — docid
    assignment is rank under byte-ascending (conv_id, turn_idx), and
    fixed-width zero-padded decimal conv ids sort numerically, so
    new docid == permutation position by construction."""
    from ciff_ray.build import BuildParams, build_index
    from ciff_ray.pipelines import _sf_fingerprint
    from ciff_ray.synth import TURNS_PER_CONV_FROM_DOCS as K

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    inv_dir = mapping_dir + "-inv"
    num_docs = write_permutation_stores(docs, mapping_dir, inv_dir, order)
    build_index(
        docs.map_batches(
            _RekeyActor,
            fn_constructor_args=(inv_dir, num_docs, K),
            batch_format="pyarrow",
            concurrency=(1, 8),
        ),
        out_dir,
        BuildParams(num_partitions=16, sample_frac=1.0),
        input_fingerprint=_sf_fingerprint(sf_dir) + f"|{order}order",
    )
    return out_dir, mapping_dir


def ensure_reordered(sf_dir: str, order: str = "simhash") -> tuple[str, str]:
    from ciff_ray.layout import cache_root
    from ciff_ray.pipelines import _sf_fingerprint

    fp = _sf_fingerprint(sf_dir)
    idx = os.path.join(cache_root(), "index", f"{fp}-{order}order")
    mapping = os.path.join(cache_root(), "reorder_map", f"{fp}-{order}")
    if not (
        os.path.exists(os.path.join(idx, "manifest.json"))
        and os.path.exists(os.path.join(mapping, "_DONE"))
        and os.path.exists(os.path.join(mapping + "-inv", "_DONE"))
    ):
        build_reordered(sf_dir, idx, mapping, order)
    return idx, mapping


class _ReorderedScorerActor:
    """map_batches actor: (query_id, query) -> top-k over the
    signature-ordered index with ORIGINAL-id rank keys (bit-identical
    to the monolithic ranking, including exact ties)."""

    def __init__(self, index_dir: str, mapping_dir: str, k: int):
        from ciff_ray.query import LocalScorer

        self.scorer = LocalScorer(index_dir)
        self.old_ids = OldIdStore(mapping_dir, self.scorer.N)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ciff_ray.query import LocalScorer

        qids, ranks, docs = [], [], []
        for qid, q in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist()
        ):
            u, s = self.scorer.score_all(q)
            old = self.old_ids.gather_sorted(u)  # u ascends (postings)
            d, _ = LocalScorer._rank(old, s, self.k)
            qids.extend([qid] * len(d))
            ranks.extend(range(1, len(d) + 1))
            docs.extend(d.tolist())
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int32()),
                "doc_id": pa.array(docs, type=pa.int64()),
            }
        )


def q_bm25_topk_reordered(
    sf_dir: str, order: str = "simhash"
) -> ray.data.Dataset:
    """Top-k BM25 over the REORDERED index (simhash or bp), results in
    the original id space — must equal bm25_topk exactly (same oracle)."""
    from ciff_ray.pipelines import TOPK_K, _query_set_ds

    idx, mapping = ensure_reordered(sf_dir, order)
    return (
        _query_set_ds()
        .repartition(4)
        .map_batches(
            _ReorderedScorerActor,
            fn_constructor_args=(idx, mapping, TOPK_K),
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )
