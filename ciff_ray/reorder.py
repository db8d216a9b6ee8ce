"""DocID reordering for compression — the classic PISA-ecosystem
companion op (Silvestri's sort-by-URL, BP / recursive graph bisection,
Dhulipala et al. 2016): assign similar documents ADJACENT docIDs so
posting-list d-gaps shrink and the varint/γ/bit-packed codecs spend
fewer bytes.  The reference carries a docID-order REPAIR (O1,
reorder-repair in src/lib.rs); this module adds the optimizing
counterpart: choose a better order, rebuild, and serve with results
mapped back to the ORIGINAL id space — rank-and-score-identical by
construction (BM25 inputs df/cf/tf/dl/avgdl are docid-invariant, and
the final rank key uses ORIGINAL ids, so even exact-tie order is
preserved).

Ordering heuristic: 64-bit SimHash of the document text (the
extras.dedup kernel), ascending — a cheap one-pass clustering proxy
that groups near-duplicate / same-template docs.  BP would slot in as
a drop-in `order_fn`; the plumbing (permutation build, mapping store,
parity contract) is the reusable part.

The new->old mapping is NOT a driver array at scale: it is written as
a doc-range-sharded parquet store and read through the DoclengthStore
gather machinery (query.py VALUE_COLUMN hooks — the same reader that
serves doclengths, titles and norms), so decorating k results touches
O(k) shards.

Shape: one pass computes (old_id, simhash); the permutation is one
sort of (simhash, old_id) pairs — 16 bytes/doc, the same exchange
class as the index build's own docmap sort; the rebuild reuses
build_index unchanged over the re-keyed transcripts.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from ciff_ray.query import DoclengthStore


class OldIdStore(DoclengthStore):
    """Doc-range-sharded (new docid -> original docid) lookup."""

    VALUE_COLUMN = "old_id"
    VALUE_DTYPE = np.int64


def signature_permutation(docs: ray.data.Dataset) -> np.ndarray:
    """old doc_ids ordered by (simhash, old_id) — position in the
    returned array is the NEW docid.  The sort input is 16 B/doc
    (driver-merged here; at 10^12 docs this becomes Dataset.sort on
    the same slim pairs)."""
    from ciff_ray.extras.dedup import simhash_batch

    sig = docs.map_batches(simhash_batch, batch_format="pyarrow").take_all()
    old = np.array([r["doc_id"] for r in sig], dtype=np.int64)
    h = np.array([r["simhash"] for r in sig], dtype=np.int64)
    return old[np.lexsort((old, h))]


def build_reordered(
    sf_dir: str, out_dir: str, mapping_dir: str
) -> tuple[str, str]:
    """Rebuild the sf_dir index under the signature order.  The
    re-keyed transcripts encode the NEW position as (conv_id, turn_idx)
    — docid assignment is rank under byte-ascending (conv_id,
    turn_idx), and zero-padded decimal conv ids sort numerically, so
    new docid == signature position by construction."""
    import pyarrow.parquet as pq

    from ciff_ray.build import BuildParams, build_index
    from ciff_ray.pipelines import _sf_fingerprint
    from ciff_ray.synth import TURNS_PER_CONV_FROM_DOCS as K

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    perm = signature_permutation(docs)  # new_id -> old_id
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)  # old_id -> new_id

    def rekey(t: pa.Table) -> pa.Table:
        old = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        new = inv[old]
        conv = pa.array(
            [f"conv-{int(p) // K:07d}" for p in new], type=pa.string()
        )
        return pa.table(
            {
                "conv_id": conv,
                "turn_idx": pa.array(
                    (new % K).astype(np.int32), type=pa.int32()
                ),
                "role": pa.array(["user"] * len(t), type=pa.string()),
                "text": t["text"],
                "tool": pa.array([""] * len(t), type=pa.string()),
            }
        )

    build_index(
        docs.map_batches(rekey, batch_format="pyarrow"),
        out_dir,
        BuildParams(num_partitions=16, sample_frac=1.0),
        input_fingerprint=_sf_fingerprint(sf_dir) + "|sigorder",
    )
    # mapping store: (doc_id=new, old_id), row-group stats prune reads
    os.makedirs(mapping_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(perm.size), type=pa.int64()),
                "old_id": pa.array(perm, type=pa.int64()),
            }
        ),
        os.path.join(mapping_dir, "part-00000.parquet"),
        row_group_size=65536,
    )
    with open(os.path.join(mapping_dir, "_DONE"), "w") as f:
        f.write("ok")
    return out_dir, mapping_dir


def ensure_reordered(sf_dir: str) -> tuple[str, str]:
    from ciff_ray.layout import cache_root
    from ciff_ray.pipelines import _sf_fingerprint

    fp = _sf_fingerprint(sf_dir)
    idx = os.path.join(cache_root(), "index", f"{fp}-sigorder")
    mapping = os.path.join(cache_root(), "reorder_map", fp)
    if not (
        os.path.exists(os.path.join(idx, "manifest.json"))
        and os.path.exists(os.path.join(mapping, "_DONE"))
    ):
        build_reordered(sf_dir, idx, mapping)
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


def q_bm25_topk_reordered(sf_dir: str) -> ray.data.Dataset:
    """Top-k BM25 over the signature-REORDERED index, results in the
    original id space — must equal bm25_topk exactly (same oracle)."""
    from ciff_ray.pipelines import TOPK_K, _query_set_ds

    idx, mapping = ensure_reordered(sf_dir)
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
