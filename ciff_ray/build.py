"""Distributed index build — the Ray-Data replacement for the reference's
in-memory JsonlToCiff pipeline (/root/reference/src/lib.rs:992-1134,
SURVEY.md §3.3/§7):

    read_parquet(transcripts)
      -> assign_doc_ids            conv-level groupby + prefix sum (docids.py)
      -> docmap                    map_batches tokenize-count -> sort(doc_id) -> parquet
      -> explode (term,doc,tf)     map_batches: in-batch partial aggregation
      -> route to partitions       crc32(term) % P, heavy terms salted by docID range
      -> groupby(partition_id)     THE one all-to-all shuffle
      -> PartitionWriter           per-partition term-sort, d-gap + varint
                                   (Elias-gamma fallback) packing, block-max
                                   metadata, atomic parquet + done-marker
      -> term_stats                small groupby over per-slice stats
      -> manifest + lineage

Skew: term df is Zipf; stopword-scale lists would hot-spot one reducer.
Heavy-hitter terms (estimated from a seeded sample) are salted by
docID-range — salt = doc_id // salt_range — so each (term, salt) slice
covers a disjoint ascending docID range and the global docID-ordered
list is recovered at read time by concatenating slices in salt order,
with NO re-sort and NO cross-slice re-encoding (SURVEY.md §4).

Resume: each partition writes its segment + term-dict part atomically
and drops a done-marker keyed by the input fingerprint; a re-run skips
completed partitions (north_rule: per-partition lineage + metrics).
"""

from __future__ import annotations

import json
import os
import time
import zlib
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Max, Sum
from ray.data.context import ShuffleStrategy

from ciff_ray import codecs
from ciff_ray.docids import assign_doc_ids
from ciff_ray.layout import (
    IndexPaths,
    Manifest,
    append_lineage,
    atomic_write_parquet,
    stable_hash,
)
from ciff_ray.schemas import (
    BLOCK_SIZE,
    CODEC_GAMMA,
    CODEC_VARINT,
    SEGMENT_SCHEMA,
    TERM_DICT_SCHEMA,
)
from ciff_ray.tokenizer import doc_lengths, term_frequencies

_SALT_MIX = 0x9E3779B1


@dataclass
class BuildParams:
    num_partitions: int = 32
    block_size: int = BLOCK_SIZE
    k1: float = 0.9
    b: float = 0.4
    # terms whose sampled-estimated df exceeds this fraction of num_docs
    # get salted into `num_salts` docID-range slices; <=0 disables salting
    heavy_df_frac: float = 0.05
    num_salts: int = 8
    sample_frac: float = 0.1
    description: str = ""


# ---------------------------------------------------------------------------
# stage bodies (pure, vectorized)


def _docmap_batch(batch: pa.Table) -> pa.Table:
    dl = doc_lengths(batch, id_col="doc_id")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "collection_docid": batch["collection_docid"],
            "doclength": dl["doclength"],
        }
    )


class ExplodeRouter:
    """(doc_id, text) batch -> (partition_id, term, salt, doc_id, tf).

    Tokenize + in-batch (doc, term) aggregation, then partition routing:
    crc32 of the term (version-stable, layout.stable_hash) mixed with the
    docID-range salt for heavy terms.  Per-batch work is vectorized; the
    only Python loop is over the *unique terms of the batch* (crc +
    heavy lookup), amortized via dictionary encoding."""

    def __init__(self, heavy_ref, num_partitions: int, salt_range: int):
        self.heavy: dict[str, int] = ray.get(heavy_ref) if heavy_ref is not None else {}
        self.P = num_partitions
        self.salt_range = max(1, salt_range)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tf = term_frequencies(batch, id_col="doc_id")
        if len(tf) == 0:
            return pa.table(
                {
                    "partition_id": pa.array([], type=pa.int32()),
                    "term": pa.array([], type=pa.string()),
                    "salt": pa.array([], type=pa.int32()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "tf": pa.array([], type=pa.int32()),
                }
            )
        dict_arr = pc.dictionary_encode(tf["term"].combine_chunks())
        uniq = dict_arr.dictionary.to_pylist()
        crc = np.array([stable_hash(t.encode()) for t in uniq], dtype=np.int64)
        heavy = np.array([t in self.heavy for t in uniq], dtype=bool)
        idx = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc = tf["doc_id"].to_numpy(zero_copy_only=False)
        salt = np.where(heavy[idx], doc // self.salt_range, 0).astype(np.int64)
        pid = ((crc[idx] + salt * _SALT_MIX) % self.P).astype(np.int32)
        return pa.table(
            {
                "partition_id": pa.array(pid),
                "term": tf["term"],
                "salt": pa.array(salt.astype(np.int32)),
                "doc_id": tf["doc_id"],
                "tf": tf["tf"],
            }
        )


def _varint_nbytes_per_value(vals: np.ndarray) -> np.ndarray:
    v = vals.astype(np.uint64)
    nb = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return nb


def _slice_encode(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
) -> dict:
    """Pack all slices of a partition.

    Gap values of ALL slices are varint-encoded in ONE vectorized call
    and sliced apart by per-value byte counts; the Elias-gamma fallback
    re-encodes only the (few) slices where it wins >=20% on bytes
    (codecs.choose_codec policy).  Returns per-slice byte payloads,
    codec ids, and per-value byte-size arrays (for block byte offsets;
    a gamma slice gets no block offsets — it is decoded whole)."""
    n = doc_ids.size
    S = starts.size
    keep = np.ones(n, dtype=bool)
    keep[starts] = False
    gaps_full = np.empty(n, dtype=np.int64)
    gaps_full[0] = 0
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps_full[1:])
    gap_vals = gaps_full[keep]
    if gap_vals.size and (gap_vals < 1).any():
        raise AssertionError("doc_ids not strictly ascending within a slice")

    def _pack_all(vals: np.ndarray, counts: np.ndarray, nb: np.ndarray) -> list[bytes]:
        buf = codecs.varint_encode(vals)
        byte_ends = np.cumsum(nb) if vals.size else np.empty(0, dtype=np.int64)
        val_bounds = np.cumsum(counts)
        out = []
        prev_b = 0
        for i in range(S):
            vb = val_bounds[i]
            end_b = int(byte_ends[vb - 1]) if vb > 0 and counts[i] > 0 else prev_b
            out.append(buf[prev_b:end_b])
            prev_b = end_b
        return out

    gap_counts = ends - starts - 1
    tf_counts = ends - starts
    tf_vals = tfs.astype(np.uint64)
    gap_nb = _varint_nbytes_per_value(gap_vals)
    tf_nb = _varint_nbytes_per_value(tf_vals)
    doc_bytes = _pack_all(gap_vals, gap_counts, gap_nb)
    # tf streams are mostly 1s -> gamma often wins; single-buffer varint
    # first, then selective gamma re-encode below
    tf_bytes = _pack_all(tf_vals, tf_counts, tf_nb)

    doc_codec = np.full(S, CODEC_VARINT, dtype=np.int8)
    tf_codec = np.full(S, CODEC_VARINT, dtype=np.int8)
    gap_bounds = np.concatenate([[0], np.cumsum(gap_counts)])
    tf_bounds = np.concatenate([[0], np.cumsum(tf_counts)])
    for i in range(S):
        g = gap_vals[gap_bounds[i] : gap_bounds[i + 1]]
        if g.size and codecs.choose_codec(g) == CODEC_GAMMA:
            cand = codecs.gamma_encode(g)
            if len(cand) < len(doc_bytes[i]):
                doc_bytes[i] = cand
                doc_codec[i] = CODEC_GAMMA
        t = tf_vals[tf_bounds[i] : tf_bounds[i + 1]]
        if t.size and codecs.choose_codec(t) == CODEC_GAMMA:
            cand = codecs.gamma_encode(t)
            if len(cand) < len(tf_bytes[i]):
                tf_bytes[i] = cand
                tf_codec[i] = CODEC_GAMMA
    return {
        "doc_bytes": doc_bytes,
        "tf_bytes": tf_bytes,
        "doc_codec": doc_codec,
        "tf_codec": tf_codec,
        "gap_nb": gap_nb,
        "tf_nb": tf_nb,
        "gap_bounds": gap_bounds,
        "tf_bounds": tf_bounds,
    }


def make_partition_writer(
    paths: IndexPaths,
    dl_ref,
    avgdl: float,
    params: BuildParams,
    fingerprint: str,
):
    """Build the groupby(partition_id).map_groups body."""

    k1, b, bs = params.k1, params.b, params.block_size

    def write_partition(group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        pid = int(group["partition_id"][0].as_py())

        done_path = paths.segment_done(pid)
        if os.path.exists(done_path):
            with open(done_path) as f:
                done = json.load(f)
            if done.get("fingerprint") == fingerprint and os.path.exists(
                paths.segment(pid)
            ):
                return pa.table(
                    {
                        "partition_id": pa.array([pid], type=pa.int32()),
                        "n_slices": pa.array([done["n_slices"]], type=pa.int64()),
                        "n_postings": pa.array([done["n_postings"]], type=pa.int64()),
                        "bytes": pa.array([done["bytes"]], type=pa.int64()),
                        "seconds": pa.array([0.0], type=pa.float64()),
                        "status": pa.array(["skipped"], type=pa.string()),
                    }
                )

        order = pc.sort_indices(
            group,
            sort_keys=[
                ("term", "ascending"),
                ("salt", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        group = group.take(order)
        terms = group["term"].combine_chunks()
        salts = group["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tfs = group["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(group)

        term_change = pc.not_equal(terms.slice(1), terms.slice(0, n - 1))
        change = term_change.to_numpy(zero_copy_only=False) | (
            salts[1:] != salts[:-1]
        )
        starts = np.concatenate([[0], np.flatnonzero(change) + 1]).astype(np.int64)
        ends = np.concatenate([starts[1:], [n]]).astype(np.int64)
        S = starts.size

        df = ends - starts
        cf = np.add.reduceat(tfs, starts)
        max_tf = np.maximum.reduceat(tfs, starts)
        first_doc = doc_ids[starts]

        enc = _slice_encode(doc_ids, tfs, starts, ends)
        doc_bytes, tf_bytes = enc["doc_bytes"], enc["tf_bytes"]
        doc_codec, tf_codec = enc["doc_codec"], enc["tf_codec"]

        # block-max metadata: idf-independent partial contribution
        dl_all: np.ndarray = ray.get(dl_ref)
        dl = dl_all[doc_ids].astype(np.float64)
        contrib = (tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dl / avgdl))).astype(
            np.float32
        )
        nblocks = (df + bs - 1) // bs
        tot_blocks = int(nblocks.sum())
        slice_of_block = np.repeat(np.arange(S), nblocks)
        blk_in_slice = np.arange(tot_blocks) - np.repeat(
            np.concatenate([[0], np.cumsum(nblocks)[:-1]]), nblocks
        )
        bstart = starts[slice_of_block] + blk_in_slice * bs
        bend = np.minimum(bstart + bs, ends[slice_of_block])
        block_last = doc_ids[bend - 1]
        block_max = np.maximum.reduceat(contrib, bstart) if tot_blocks else contrib[:0]
        blk_offsets = np.concatenate([[0], np.cumsum(nblocks)]).astype(np.int64)
        slice_max = (
            np.maximum.reduceat(block_max, blk_offsets[:-1])
            if tot_blocks
            else np.empty(0, np.float32)
        )

        # per-block byte offsets into doc_bytes/tf_bytes (block-skipping
        # decode for the WAND path); -1 for gamma slices
        sob = slice_of_block
        rel = bstart - starts[sob]
        C = np.concatenate([[0], np.cumsum(enc["gap_nb"])]).astype(np.int64)
        Ct = np.concatenate([[0], np.cumsum(enc["tf_nb"])]).astype(np.int64)
        gb, tb = enc["gap_bounds"], enc["tf_bounds"]
        blk_doc_off = np.where(
            rel > 0, C[gb[sob] + np.maximum(rel - 1, 0)] - C[gb[sob]], 0
        ).astype(np.int64)
        blk_tf_off = (Ct[tb[sob] + rel] - Ct[tb[sob]]).astype(np.int64)
        blk_doc_off[doc_codec[sob] == CODEC_GAMMA] = -1
        blk_tf_off[tf_codec[sob] == CODEC_GAMMA] = -1

        seg = pa.table(
            {
                "term": terms.take(pa.array(starts)),
                "salt": pa.array(salts[starts].astype(np.int32)),
                "df": pa.array(df, type=pa.int64()),
                "cf": pa.array(cf, type=pa.int64()),
                "first_doc": pa.array(first_doc, type=pa.int64()),
                "doc_codec": pa.array(doc_codec, type=pa.int8()),
                "tf_codec": pa.array(tf_codec, type=pa.int8()),
                "doc_bytes": pa.array(doc_bytes, type=pa.large_binary()),
                "tf_bytes": pa.array(tf_bytes, type=pa.large_binary()),
                "max_tf": pa.array(max_tf.astype(np.int32)),
                "block_last_doc": pa.LargeListArray.from_arrays(
                    blk_offsets, pa.array(block_last, type=pa.int64())
                ),
                "block_max_score": pa.LargeListArray.from_arrays(
                    blk_offsets, pa.array(block_max, type=pa.float32())
                ),
                "block_doc_off": pa.LargeListArray.from_arrays(
                    blk_offsets, pa.array(blk_doc_off, type=pa.int64())
                ),
                "block_tf_off": pa.LargeListArray.from_arrays(
                    blk_offsets, pa.array(blk_tf_off, type=pa.int64())
                ),
            },
            schema=SEGMENT_SCHEMA,
        )
        atomic_write_parquet(seg, paths.segment(pid))

        tdict = pa.table(
            {
                "term": seg["term"],
                "salt": seg["salt"],
                "partition_id": pa.array(
                    np.full(S, pid, dtype=np.int32), type=pa.int32()
                ),
                "df": seg["df"],
                "cf": seg["cf"],
                "max_score": pa.array(slice_max.astype(np.float32)),
            },
            schema=TERM_DICT_SCHEMA,
        )
        atomic_write_parquet(tdict, paths.term_dict_part(pid))

        nbytes = sum(len(x) for x in doc_bytes) + sum(len(x) for x in tf_bytes)
        secs = time.monotonic() - t0
        marker = {
            "partition_id": pid,
            "fingerprint": fingerprint,
            "n_slices": S,
            "n_postings": n,
            "bytes": nbytes,
            "seconds": secs,
        }
        tmp = done_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, done_path)
        return pa.table(
            {
                "partition_id": pa.array([pid], type=pa.int32()),
                "n_slices": pa.array([S], type=pa.int64()),
                "n_postings": pa.array([n], type=pa.int64()),
                "bytes": pa.array([nbytes], type=pa.int64()),
                "seconds": pa.array([secs], type=pa.float64()),
                "status": pa.array(["written"], type=pa.string()),
            }
        )

    return write_partition


# ---------------------------------------------------------------------------
# driver orchestration

# below this many bytes of term-dict parts the global per-term stats
# merge runs as one vectorized pyarrow group_by on the driver; above it,
# a distributed Ray groupby (vocab can be arbitrarily large at scale)
_TERM_STATS_DRIVER_BYTES = 256 << 20


def _write_term_stats(paths: IndexPaths) -> int:
    """Merge per-partition term-dict parts into global (term, df, cf,
    max_score) stats (A1/A2 analogue).  Returns the number of posting
    lists (vocabulary size)."""
    os.makedirs(paths.term_stats, exist_ok=True)
    part_files = [
        os.path.join(paths.term_dict_dir, f)
        for f in os.listdir(paths.term_dict_dir)
        if f.endswith(".parquet")
    ]
    total_bytes = sum(os.path.getsize(f) for f in part_files)
    if total_bytes <= _TERM_STATS_DRIVER_BYTES:
        td = pq.read_table(part_files, columns=["term", "df", "cf", "max_score"])
        merged = td.group_by("term").aggregate(
            [("df", "sum"), ("cf", "sum"), ("max_score", "max")]
        )
        merged = merged.rename_columns(["term", "df", "cf", "max_score"])
        atomic_write_parquet(merged, os.path.join(paths.term_stats, "part-0.parquet"))
        return merged.num_rows
    term_stats = (
        ray.data.read_parquet(paths.term_dict_dir)
        .groupby("term")
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("cf", alias_name="cf"),
            Max("max_score", alias_name="max_score"),
        )
    )
    term_stats.write_parquet(paths.term_stats)
    return pq.read_table(paths.term_stats, columns=["term"]).num_rows


_HEAVY_TOPK = 128


def _heavy_partials(batch: pa.Table) -> pa.Table:
    """Per-batch term document-frequency partials, truncated to the
    top-K terms of the batch.  Heavy hitters (df ~ a few % of docs) are
    top-K in essentially every batch, so the truncation loses nothing
    that matters for the salting heuristic while keeping the driver
    merge tiny."""
    tmp = pa.table(
        {
            "doc_id": pa.array(np.arange(len(batch), dtype=np.int64)),
            "text": batch["text"],
        }
    )
    tf = term_frequencies(tmp, id_col="doc_id")
    counts = tf.group_by("term").aggregate([("doc_id", "count")])
    counts = counts.rename_columns(["term", "df_part"])
    if counts.num_rows > _HEAVY_TOPK:
        order = pc.sort_indices(
            counts, sort_keys=[("df_part", "descending"), ("term", "ascending")]
        )
        counts = counts.take(order.slice(0, _HEAVY_TOPK))
    return counts


def _estimate_heavy_terms(
    ds: ray.data.Dataset, num_docs: int, params: BuildParams
) -> dict[str, int]:
    """Skew control (SURVEY.md §4): estimate stopword-scale terms from a
    seeded sample with a narrow map + tiny driver merge — no shuffle.
    The estimate only steers salting; posting correctness never depends
    on it."""
    if params.heavy_df_frac <= 0 or num_docs == 0:
        return {}
    frac = min(1.0, params.sample_frac)
    sample = ds if frac >= 1.0 else ds.random_sample(frac, seed=42)
    parts_ds = (
        sample.select_columns(["text"])
        .map_batches(_heavy_partials, batch_format="pyarrow")
        .materialize()
    )
    tables = [t for t in ray.get(parts_ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return {}
    parts = pa.concat_tables(tables, promote_options="default")
    sampled_docs = num_docs * frac  # expected sample size; heuristic only
    merged = parts.group_by("term").aggregate([("df_part", "sum")])
    threshold = max(1.0, params.heavy_df_frac * sampled_docs)
    mask = pc.greater(merged["df_part_sum"], threshold)
    heavy_terms = merged.filter(mask)["term"].to_pylist()
    return {t: params.num_salts for t in heavy_terms}


def build_index(
    ds: ray.data.Dataset,
    out_dir: str,
    params: BuildParams | None = None,
    input_fingerprint: str | None = None,
) -> Manifest:
    """Full index build.  Safe to re-run with the same inputs: completed
    partitions are skipped via their done-markers (resumable)."""
    params = params or BuildParams()
    paths = IndexPaths(out_dir)
    paths.ensure_dirs()

    if input_fingerprint is None:
        try:
            files = sorted(ds.input_files())
        except Exception:
            files = []
        input_fingerprint = format(
            stable_hash(("|".join(files) + repr(asdict(params))).encode()), "08x"
        )

    ds = ds.select_columns(["conv_id", "turn_idx", "text"])
    ds2, num_docs, _offsets_ref = assign_doc_ids(ds)

    # --- heavy-hitter estimation (skew control, SURVEY.md §4);
    # narrow pass over raw text, no doc ids needed ---
    heavy = _estimate_heavy_terms(ds, num_docs, params)
    heavy_ref = ray.put(heavy)
    salt_range = max(1, (num_docs + params.num_salts - 1) // params.num_salts)

    # --- docmap + doclengths (DocRecord analogue, K3/A6) ---
    # written unsorted (block order); consumers order by the doc_id
    # column (LocalScorer, CIFF export), so no global sort is needed
    docmap = ds2.map_batches(_docmap_batch, batch_format="pyarrow")
    docmap.write_parquet(paths.docmap_dir)
    dm = pq.read_table(paths.docmap_dir, columns=["doc_id", "doclength"])
    order = pc.sort_indices(dm["doc_id"].combine_chunks())
    doclengths = (
        dm["doclength"].combine_chunks().take(order).to_numpy(zero_copy_only=False)
    ).astype(np.int32)
    total_terms = int(doclengths.sum())
    avgdl = total_terms / num_docs if num_docs else 0.0  # f64, src/lib.rs:616-617
    dl_ref = ray.put(doclengths)

    # --- explode + route + shuffle + write ---
    # hash exchange on the precomputed small-cardinality partition_id:
    # beats the default range-sort shuffle (no global sample/sort of the
    # exploded posting stream)
    ctx = ray.data.DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        exploded = ds2.map_batches(
            ExplodeRouter,
            fn_constructor_args=(heavy_ref, params.num_partitions, salt_range),
            batch_format="pyarrow",
            concurrency=(1, 16),
        )
        writer = make_partition_writer(
            paths, dl_ref, avgdl, params, input_fingerprint
        )
        lineage_ds = exploded.groupby(
            "partition_id", num_partitions=params.num_partitions
        ).map_groups(writer, batch_format="pyarrow")
        lineage_rows = lineage_ds.take_all()  # tiny: one row per partition
    finally:
        ctx.shuffle_strategy = prev_strategy
    append_lineage(
        paths.lineage,
        [{k: (v if not hasattr(v, "item") else v.item()) for k, v in r.items()}
         for r in lineage_rows],
    )

    # --- term stats (global df/cf per term) ---
    num_lists = _write_term_stats(paths)

    manifest = Manifest(
        version=1,
        num_docs=num_docs,
        num_postings_lists=num_lists,
        total_terms_in_collection=total_terms,
        average_doclength=avgdl,
        description=params.description
        or "ciff_ray inverted index (lowercase [a-z0-9]+ tokenizer)",
        num_partitions=params.num_partitions,
        k1=params.k1,
        b=params.b,
        block_size=params.block_size,
        input_fingerprint=input_fingerprint,
        heavy_terms=heavy,
    )
    manifest.write(paths.manifest)
    return manifest


class IndexBuilder:
    """Fluent builder mirroring the reference's builder APIs
    (CiffToPisa/JsonlToCiff, /root/reference/src/lib.rs:376-465, :884-1146)."""

    def __init__(self):
        self._input = None
        self._output = None
        self._params = BuildParams()

    def input_parquet(self, path: str | list[str]) -> "IndexBuilder":
        self._input = path
        return self

    def input_dataset(self, ds: ray.data.Dataset) -> "IndexBuilder":
        self._input = ds
        return self

    def output_dir(self, path: str) -> "IndexBuilder":
        self._output = path
        return self

    def description(self, d: str) -> "IndexBuilder":
        self._params.description = d
        return self

    def partitions(self, n: int) -> "IndexBuilder":
        self._params.num_partitions = n
        return self

    def bm25(self, k1: float, b: float) -> "IndexBuilder":
        self._params.k1, self._params.b = k1, b
        return self

    def salting(self, heavy_df_frac: float, num_salts: int) -> "IndexBuilder":
        self._params.heavy_df_frac = heavy_df_frac
        self._params.num_salts = num_salts
        return self

    def convert(self) -> Manifest:
        if self._input is None or self._output is None:
            raise ValueError("input and output are required")
        ds = (
            self._input
            if isinstance(self._input, ray.data.Dataset)
            else ray.data.read_parquet(
                self._input, columns=["conv_id", "turn_idx", "text"]
            )
        )
        return build_index(ds, self._output, self._params)
