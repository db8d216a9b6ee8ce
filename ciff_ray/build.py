"""Distributed index build — the Ray-Data replacement for the reference's
in-memory JsonlToCiff pipeline (/root/reference/src/lib.rs:992-1134,
SURVEY.md §3.3/§7).  TWO streaming passes over the input text, exactly
one all-to-all:

    pass A (narrow)   stats_partials: ONE tokenize yields per-block
                      conversation aggregates (docID prefix-sum inputs),
                      heavy-term df partials (salting), per-turn docmap
                      partials, and the exact collection token count;
                      small rows merge on the driver, fat rows stay in
                      the object store
    docmap finalize   doc IDs attached to the kind=3 partials and
                      written to parquet — overlapped with pass C in a
                      background thread, never re-reads the input
    pass C (shuffle)  add_doc_ids -> invert_partial: per-batch local
                      inversion into PACKED partial posting lists
                      (varint d-gaps + tfs + inline doclengths, crc32
                      partition routing, docID-range salting of heavy
                      terms) -> scatter/gather by partition_id [THE
                      all-to-all] -> PartitionWriter: k-way merge,
                      d-gap + varint (Elias-gamma fallback) packing,
                      block-max metadata, atomic parquet + done-marker
    driver            term_stats merge + manifest + lineage

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
import threading
import time
import zlib
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ciff_ray import codecs
from ciff_ray.docids import (
    add_doc_ids,
    conv_partials,
    finalize_conv_offsets,
    merge_conv_blocks,
)
from ciff_ray.layout import (
    IndexPaths,
    Manifest,
    append_lineage,
    atomic_write_parquet,
    stable_hash,
)
from ciff_ray.schemas import (
    BLOCK_SIZE,
    CODEC_BP,
    CODEC_BPG,
    CODEC_GAMMA,
    CODEC_VARINT,
    SEGMENT_SCHEMA,
    TERM_DICT_SCHEMA,
)
from ciff_ray.tokenizer import token_ids

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
    # term analyzer applied after tokenization ("" = none; "porter" =
    # ciff_ray.analysis Porter stemmer).  Recorded in the manifest so
    # the query side analyzes identically.
    analyzer: str = ""
    # CPU slots each partition-writer task reserves.  The writers are
    # memory-bandwidth-bound (stream decode + k-way merge + re-encode);
    # >1 slot caps how many run concurrently per node so they don't
    # thrash the memory bus — the per-stage `num_cpus` sizing knob.
    writer_num_cpus: int = 2


# ---------------------------------------------------------------------------
# stage bodies (pure, vectorized)


_PARTIAL_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("df", pa.int64()),
        # packed postings: varint d-gaps (first value absolute docID),
        # varint tfs, varint per-posting doclengths — the shuffle moves
        # ~2-3 bytes per posting instead of 16+ (int64 doc + int32 tf +
        # a broadcast doclength table)
        ("doc_bytes", pa.large_binary()),
        ("tf_bytes", pa.large_binary()),
        ("dl_bytes", pa.large_binary()),
    ]
)


def _pack_stream(
    vals: np.ndarray, starts: np.ndarray, n: int
) -> pa.LargeBinaryArray:
    """Varint-pack values and slice per run [starts[i], next) zero-copy
    through Arrow binary offsets."""
    nb = codecs.varint_nbytes_per_value(vals)
    buf = codecs.varint_encode(vals, nbytes=nb)
    bounds = np.concatenate([starts, [n]])
    cum = np.concatenate([[0], np.cumsum(nb)]).astype(np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        starts.size,
        [None, pa.py_buffer(cum[bounds].tobytes()), pa.py_buffer(buf)],
    )


def pack_partial_runs(
    doc_s: np.ndarray,
    tf_s: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    dl_s: np.ndarray | None = None,
):
    """Pack runs [starts[i], ends[i]) of ascending docIDs + tfs (+ the
    per-posting doclength stream) into per-run varint payloads (docIDs
    d-gapped, first value absolute): ONE vectorized encode per stream,
    sliced apart zero-copy through Arrow binary offsets.

    Shipping doclengths inline with the postings is what lets the
    writers compute block-max BM25 bounds with NO global doclength
    broadcast — at 10^12 docs a doclength array cannot live on any one
    node (SURVEY.md §4)."""
    n = doc_s.size
    gaps = np.empty(n, dtype=np.int64)
    if n:
        gaps[0] = doc_s[0]
        np.subtract(doc_s[1:], doc_s[:-1], out=gaps[1:])
        gaps[starts] = doc_s[starts]
    doc_bytes = _pack_stream(gaps, starts, n)
    tf_bytes = _pack_stream(tf_s, starts, n)
    if dl_s is None:
        return doc_bytes, tf_bytes
    return doc_bytes, tf_bytes, _pack_stream(dl_s, starts, n)


def unpack_partial_rows(
    group: pa.Table,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`pack_partial_runs` over a (row-ordered) table:
    -> (lengths per row, flat absolute docIDs, flat tfs, flat dls).
    The Arrow binary values buffer already holds the row payloads
    back-to-back in row order, so the stream decode is one vectorized
    call per column."""
    lengths = group["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(lengths.sum())
    gaps = codecs.varint_decode(_binary_values(group["doc_bytes"]), n).view(
        np.int64
    )
    tfs_flat = codecs.varint_decode(_binary_values(group["tf_bytes"]), n).view(
        np.int64
    )
    dls_flat = codecs.varint_decode(_binary_values(group["dl_bytes"]), n).view(
        np.int64
    )
    # per-row absolute docids: global cumsum minus prefix before each row
    c = np.cumsum(gaps)
    row_starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    prev = np.zeros(lengths.size, dtype=np.int64)
    if lengths.size > 1:
        prev[1:] = c[row_starts[1:] - 1]
    docs_flat = c - np.repeat(prev, lengths)
    return lengths, docs_flat, tfs_flat, dls_flat


def _binary_values(arr) -> np.ndarray:
    """Zero-copy concatenated payload bytes of a LargeBinaryArray."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buffers = arr.buffers()
    off = np.frombuffer(buffers[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(buffers[2], dtype=np.uint8)
    return data[off[0] : off[-1]]


def invert_partial(
    batch: pa.Table, *, heavy_ref, num_partitions: int, salt_range: int,
    analyzer: str = ""
) -> pa.Table:
    """(doc_id, text) batch -> per-batch PARTIAL POSTING LISTS
    (partition_id, term, salt, doc_ids:list, tfs:list) — the combiner.

    Tokenize + in-batch (doc, term) tf aggregation, then local inversion:
    one output row per (term, salt) of the batch, doc_ids ascending
    within the row.  Compared to shuffling exploded (term, doc, tf)
    rows, this sends each term string once per (block x term) instead of
    once per posting and cuts shuffled row count by ~the average in-batch
    df — the all-to-all then moves a small number of fat list rows
    (payload ~= packed integers), which is what makes the exchange cheap
    at 10^12-turn scale (SURVEY.md §7 "per-partition pre-aggregation").

    Routing: crc32 of the term (version-stable, layout.stable_hash)
    mixed with the docID-range salt for heavy terms; the heavy-term set
    is a `ray.put` broadcast fetched per call (tiny dict).  Per-batch
    work is vectorized; the only Python loop is over the *unique terms
    of the batch* (crc + heavy lookup), amortized via dictionary
    encoding."""
    heavy_set: dict[str, int] = ray.get(heavy_ref) if heavy_ref is not None else {}
    salt_range = max(1, salt_range)
    nrows = len(batch)
    term_dict, idx, flat_rows = token_ids(batch["text"], analyzer)
    if len(term_dict) == 0:
        return _PARTIAL_SCHEMA.empty_table()
    uniq = term_dict.to_pylist()
    crc = np.array([stable_hash(t.encode()) for t in uniq], dtype=np.int64)
    heavy = np.array([t in heavy_set for t in uniq], dtype=bool)

    doc_col = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    # rank of each row's doc within the batch: sorting by rank == sorting
    # by docID but keeps the composite key small
    order_rows = np.argsort(doc_col, kind="stable")
    rank_of_row = np.empty(nrows, dtype=np.int64)
    rank_of_row[order_rows] = np.arange(nrows)

    doc_tok = doc_col[flat_rows]
    salt_tok = np.where(heavy[idx], doc_tok // salt_range, 0).astype(np.int64)
    S = int(salt_tok.max()) + 1 if salt_tok.size else 1

    # ONE sort of the token stream by (term, salt, doc) via a composite
    # int key fuses tf-counting AND local inversion: each equal-key run
    # is one posting (tf = run length), each slice-key run one
    # (term, salt) partial list
    slice_key = idx * S + salt_tok
    full_key = slice_key * nrows + rank_of_row[flat_rows]
    order = np.argsort(full_key, kind="stable")
    fk = full_key[order]
    change = fk[1:] != fk[:-1]
    run_starts = np.concatenate([[0], np.flatnonzero(change) + 1]).astype(np.int64)
    run_ends = np.concatenate([run_starts[1:], [fk.size]]).astype(np.int64)
    tf_run = run_ends - run_starts
    first_tok = order[run_starts]
    doc_run = doc_tok[first_tok]
    sk_run = fk[run_starts] // nrows
    # doclength = token count of the turn (Σ tf over its terms)
    dl_row = np.bincount(flat_rows, minlength=nrows)
    dl_run = dl_row[flat_rows[first_tok]]

    s_change = sk_run[1:] != sk_run[:-1]
    sl_starts = np.concatenate([[0], np.flatnonzero(s_change) + 1]).astype(np.int64)
    sl_ends = np.concatenate([sl_starts[1:], [sk_run.size]]).astype(np.int64)
    term_idx_sl = sk_run[sl_starts] // S
    salt_sl = sk_run[sl_starts] % S
    pid = ((crc[term_idx_sl] + salt_sl * _SALT_MIX) % num_partitions).astype(
        np.int32
    )

    doc_bytes, tf_bytes, dl_bytes = pack_partial_runs(
        doc_run, tf_run, sl_starts, sl_ends, dl_run
    )
    return pa.table(
        {
            "partition_id": pa.array(pid),
            "term": term_dict.take(pa.array(term_idx_sl)),
            "salt": pa.array(salt_sl.astype(np.int32)),
            "df": pa.array(sl_ends - sl_starts, type=pa.int64()),
            "doc_bytes": doc_bytes,
            "tf_bytes": tf_bytes,
            "dl_bytes": dl_bytes,
        },
        schema=_PARTIAL_SCHEMA,
    )


def _slice_encode(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    block_size: int = BLOCK_SIZE,
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
    if n == 0:
        # an empty partition (fully-tombstoned compaction, sparse
        # rebuild) must pack to an empty segment, not IndexError on
        # gaps_full[0]
        return {
            "doc_bytes": [b""] * S,
            "tf_bytes": [b""] * S,
            "doc_codec": np.full(S, CODEC_VARINT, dtype=np.int8),
            "tf_codec": np.full(S, CODEC_VARINT, dtype=np.int8),
            "gap_nb": np.empty(0, dtype=np.int64),
            "tf_nb": np.empty(0, dtype=np.int64),
            "gap_bounds": np.zeros(S + 1, dtype=np.int64),
            "tf_bounds": np.zeros(S + 1, dtype=np.int64),
            "bp_doc_off": {},
            "bp_tf_off": {},
        }
    keep = np.ones(n, dtype=bool)
    keep[starts] = False
    gaps_full = np.empty(n, dtype=np.int64)
    gaps_full[0] = 0
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps_full[1:])
    gap_vals = gaps_full[keep]
    if gap_vals.size and (gap_vals < 1).any():
        raise AssertionError("doc_ids not strictly ascending within a slice")

    def _pack_all(vals: np.ndarray, counts: np.ndarray, nb: np.ndarray) -> list[bytes]:
        buf = codecs.varint_encode(vals, nbytes=nb)
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
    tf_vals = tfs.view(np.uint64)
    gap_nb = codecs.varint_nbytes_per_value(gap_vals)
    tf_nb = codecs.varint_nbytes_per_value(tf_vals)
    doc_bytes = _pack_all(gap_vals, gap_counts, gap_nb)
    # tf streams are mostly 1s -> gamma often wins; single-buffer varint
    # first, then selective gamma re-encode below
    tf_bytes = _pack_all(tf_vals, tf_counts, tf_nb)

    doc_codec = np.full(S, CODEC_VARINT, dtype=np.int8)
    tf_codec = np.full(S, CODEC_VARINT, dtype=np.int8)
    gap_bounds = np.concatenate([[0], np.cumsum(gap_counts)])
    tf_bounds = np.concatenate([[0], np.cumsum(tf_counts)])
    # selective re-encode: gamma where it wins (short/mostly-1 streams),
    # bit-packed 128-blocks where THEY win >= 25% (long streams with
    # small gaps — heavy terms compress ~3x; codec blocks align with the
    # WAND blocks, so block-targeted decode keeps working; only when
    # this index's block_size IS the codec block size).
    bp_ok = block_size == codecs.BP_BLOCK
    bp_doc_off: dict[int, np.ndarray] = {}
    bp_tf_off: dict[int, np.ndarray] = {}

    def _bp_offsets(sizes: np.ndarray) -> np.ndarray:
        return sizes.size + np.concatenate([[0], np.cumsum(sizes[:-1])]).astype(
            np.int64
        )

    def _pick(vals: np.ndarray, vbytes: bytes, bp_codec: int):
        """Choose varint / gamma / bit-packed for one stream.

        Gamma is densest on mostly-1 streams but decodes value-at-a-time
        in Python AND disables block-targeted decode (no intra-slice
        byte offsets), so for streams long enough to have multiple WAND
        blocks we take bit-packing whenever it is within 30% of gamma's
        size (and >= 25% under varint): block skipping + vectorized
        word decode are worth a modest size premium.  Short streams
        keep the round-1 varint/gamma policy unchanged."""
        gamma_b = None
        if vals.size and codecs.choose_codec(vals) == CODEC_GAMMA:
            cand = codecs.gamma_encode(vals)
            if len(cand) < len(vbytes):
                gamma_b = cand
        if bp_ok and vals.size >= 2 * codecs.BP_BLOCK:
            plan = codecs.bp_plan(vals, bp_codec)  # one sizing pass,
            nb = codecs.bp_nbytes(vals, bp_codec, plan=plan)  # reused below
            if nb * 4 <= len(vbytes) * 3 and (
                gamma_b is None or nb * 10 <= len(gamma_b) * 13
            ):
                return (
                    codecs.bp_encode(vals, bp_codec, plan=plan),
                    bp_codec,
                    _bp_offsets(plan[3]),
                )
        if gamma_b is not None:
            return gamma_b, CODEC_GAMMA, None
        return vbytes, CODEC_VARINT, None

    for i in range(S):
        g = gap_vals[gap_bounds[i] : gap_bounds[i + 1]]
        doc_bytes[i], doc_codec[i], offs = _pick(g, doc_bytes[i], CODEC_BPG)
        if offs is not None:
            bp_doc_off[i] = offs
        t = tf_vals[tf_bounds[i] : tf_bounds[i + 1]]
        tf_bytes[i], tf_codec[i], offs = _pick(t, tf_bytes[i], CODEC_BP)
        if offs is not None:
            bp_tf_off[i] = offs
    return {
        "doc_bytes": doc_bytes,
        "tf_bytes": tf_bytes,
        "doc_codec": doc_codec,
        "tf_codec": tf_codec,
        "gap_nb": gap_nb,
        "tf_nb": tf_nb,
        "gap_bounds": gap_bounds,
        "tf_bounds": tf_bounds,
        "bp_doc_off": bp_doc_off,
        "bp_tf_off": bp_tf_off,
    }


def make_partition_writer(
    paths: IndexPaths,
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
            if (
                done.get("fingerprint") == fingerprint
                and os.path.exists(paths.segment(pid))
                # a missing term-dict part would make every term of
                # this partition silently unsearchable (merge.py's
                # resume guard checks both; so must the build's)
                and os.path.exists(paths.term_dict_part(pid))
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

        # rows are partial lists (invert_partial); order rows by term
        # bytes then salt, flatten, then sort postings within each
        # (term, salt) slice by docID.  combine_chunks: deterministic
        # single-chunk layout -> byte-identical parquet regardless of
        # shuffle arrival order (resume test relies on replayed
        # partitions being byte-equal to the original build)
        # combine first: the shuffle hands the group over as thousands of
        # tiny chunks, and chunked sort/take/flatten pay per-chunk costs
        group = group.combine_chunks()
        row_order = pc.sort_indices(
            group.select(["term", "salt"]),
            sort_keys=[("term", "ascending"), ("salt", "ascending")],
        )
        group = group.take(row_order).combine_chunks()
        nrows = len(group)
        terms_rows = group["term"].combine_chunks()
        salts_rows = group["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        lengths, docs_flat, tfs_flat, dls_flat = unpack_partial_rows(group)
        n = int(lengths.sum())

        # (term, salt) runs over rows
        row_change = pc.not_equal(
            terms_rows.slice(1), terms_rows.slice(0, nrows - 1)
        ).to_numpy(zero_copy_only=False) | (salts_rows[1:] != salts_rows[:-1])
        run_starts_row = np.concatenate([[0], np.flatnonzero(row_change) + 1]).astype(
            np.int64
        )
        run_of_row = np.zeros(nrows, dtype=np.int64)
        run_of_row[run_starts_row[1:]] = 1
        run_of_row = np.cumsum(run_of_row)
        S = run_starts_row.size

        # global (slice_id, doc_id) sort of the flattened postings:
        # partials are ascending runs, the lexsort merges them
        slice_of_value = np.repeat(run_of_row, lengths)
        perm = np.lexsort((docs_flat, slice_of_value))
        doc_ids = docs_flat[perm]
        tfs = tfs_flat[perm]
        dls = dls_flat[perm]

        run_lengths = np.add.reduceat(lengths, run_starts_row)
        ends = np.cumsum(run_lengths).astype(np.int64)
        starts = (ends - run_lengths).astype(np.int64)
        terms = terms_rows.take(pa.array(run_starts_row))
        salts_slice = salts_rows[run_starts_row]

        marker = _pack_segment(
            paths, pid, terms, salts_slice, doc_ids, tfs,
            dls, starts, ends, avgdl, k1, b, bs, fingerprint, t0,
        )
        return pa.table(
            {
                "partition_id": pa.array([pid], type=pa.int32()),
                "n_slices": pa.array([marker["n_slices"]], type=pa.int64()),
                "n_postings": pa.array([marker["n_postings"]], type=pa.int64()),
                "bytes": pa.array([marker["bytes"]], type=pa.int64()),
                "seconds": pa.array([marker["seconds"]], type=pa.float64()),
                "status": pa.array(["written"], type=pa.string()),
            }
        )

    return write_partition


def _pack_segment(
    paths: IndexPaths,
    pid: int,
    terms,
    salts_slice: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    bs: int,
    fingerprint: str,
    t0: float | None = None,
) -> dict:
    """Encode + write one partition's segment and term-dict part from
    per-slice sorted posting arrays, plus its done-marker.  Shared by
    the build's partition writer and lifecycle.compact_index (which
    re-packs surviving postings after tombstone removal).

    Inputs: ``terms`` is an Arrow string array of S slice terms,
    ``salts_slice`` the parallel salts, ``starts/ends`` the [start,
    end) bounds of each slice inside the flat ``doc_ids/tfs/dls``
    (docIDs strictly ascending within a slice)."""
    if t0 is None:
        t0 = time.monotonic()
    S = starts.size
    n = int(doc_ids.size)
    done_path = paths.segment_done(pid)

    df = ends - starts
    cf = np.add.reduceat(tfs, starts, dtype=np.int64) if S else np.empty(0, np.int64)
    max_tf = np.maximum.reduceat(tfs, starts) if S else np.empty(0, np.int64)
    first_doc = doc_ids[starts] if S else np.empty(0, np.int64)

    enc = _slice_encode(doc_ids, tfs, starts, ends, block_size=bs)
    doc_bytes, tf_bytes = enc["doc_bytes"], enc["tf_bytes"]
    doc_codec, tf_codec = enc["doc_codec"], enc["tf_codec"]

    # block-max metadata: idf-independent partial contribution; the
    # doclengths ride inline with the postings (no global broadcast).
    # Bumped one float32 ulp UP so the stored bound can never round
    # below the float64 score the query path computes.
    dl = dls.astype(np.float64)
    contrib64 = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dl / avgdl))
    contrib = np.nextafter(
        contrib64.astype(np.float32), np.float32(np.inf)
    )
    nblocks = (df + bs - 1) // bs
    tot_blocks = int(nblocks.sum())
    slice_of_block = np.repeat(np.arange(S), nblocks)
    if tot_blocks:
        blk_in_slice = np.arange(tot_blocks) - np.repeat(
            np.concatenate([[0], np.cumsum(nblocks)[:-1]]), nblocks
        )
    else:  # zero slices: np.repeat([0], []) does not broadcast
        blk_in_slice = np.empty(0, dtype=np.int64)
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
    # bit-packed slices: offsets point at each codec block's PAYLOAD
    # (width bytes live in the buffer's header); codec blocks align
    # 1:1 with WAND blocks by construction
    for i, offs_arr in enc["bp_doc_off"].items():
        rows = np.nonzero(sob == i)[0]
        blk_doc_off[rows] = offs_arr[: rows.size]
    for i, offs_arr in enc["bp_tf_off"].items():
        rows = np.nonzero(sob == i)[0]
        blk_tf_off[rows] = offs_arr[: rows.size]

    seg = pa.table(
        {
            "term": terms,
            "salt": pa.array(salts_slice.astype(np.int32)),
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
    return marker



# ---------------------------------------------------------------------------
# the partition exchange
#
# The combiner output is ALREADY partitioned (partition_id is a
# precomputed dense key), so the exchange is a pure scatter/gather:
# split every block by partition_id, then each writer gathers its
# slices.  Ray Data's groupby would re-sort the whole stream (and its
# hash strategy spins up aggregator actors) — both add an all-to-all
# cost the data doesn't need; measured on the 4.9M-turn bench table the
# sort exchange is ~10s flat regardless of CPUs while this scatter is
# 3-4s and scales.  This is the one deliberate drop to raw Ray tasks
# (SURVEY.md §4).  At multi-thousand-block scale the flat gather
# fan-in (blocks x partitions object refs) would become a two-level
# tree merge keyed on the same partition_id.


@ray.remote
def _split_by_pid(tbl: pa.Table, P: int):
    # raw Ray tasks don't inherit Ray Data's thread capping: without
    # this, each of the ~cpu-count concurrent tasks spins up a
    # full-width Arrow thread pool and they thrash each other
    pa.set_cpu_count(1)
    if "partition_id" not in tbl.column_names:
        # zero-column block from a skipped upstream UDF (see
        # _block_small_aggs) — scatter nothing everywhere
        empty = _PARTIAL_SCHEMA.empty_table()
        return tuple(empty for _ in range(P))
    tbl = tbl.combine_chunks()
    pid = tbl["partition_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(pid, kind="stable")
    tbl = tbl.take(pa.array(order)).combine_chunks()
    pid = pid[order]
    bounds = np.searchsorted(pid, np.arange(P + 1))
    return tuple(
        tbl.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(P)
    )


@ray.remote
def _write_group(writer, *parts):
    pa.set_cpu_count(1)  # see _split_by_pid
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return None
    return writer(pa.concat_tables(parts))


@ray.remote
def _concat_parts(*parts):
    """Level-1 node of the two-level gather tree: concatenate one
    block-group's slices for one partition."""
    pa.set_cpu_count(1)
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return parts[0]  # empty, schema preserved
    return pa.concat_tables(nonempty)


# above this many (blocks x partitions) scatter slices the gather runs
# as a two-level tree: level-1 tasks concatenate _TREE_GROUP blocks per
# partition, so each writer's fan-in is blocks/_TREE_GROUP refs instead
# of blocks (flat fan-in is O(blocks x partitions) refs at the driver
# AND per-writer gather — the multi-thousand-block scale hazard).
# Measured on this box (sf0.1, 64 blocks x 128 partitions, fresh
# processes): flat 7.3-7.6s vs tree 8.9-9.4s — the level-1 task layer
# costs ~1.7s of worker startup at small block counts, so the tree only
# engages past ~512 blocks where ref fan-in, not startup, dominates.
_TREE_FANIN_THRESHOLD = 65536
_TREE_GROUP = 16


def _partitioned_write(
    exploded: ray.data.Dataset,
    writer,
    num_partitions: int,
    writer_num_cpus: int = 1,
) -> list[dict]:
    """Scatter blocks by partition_id, gather + write per partition;
    returns the lineage rows."""
    block_refs = exploded.materialize().to_arrow_refs()
    if num_partitions == 1:
        tasks = [
            _write_group.options(num_cpus=writer_num_cpus).remote(
                writer, *block_refs
            )
        ]
    else:
        split_refs = [
            _split_by_pid.options(num_returns=num_partitions).remote(
                b, num_partitions
            )
            for b in block_refs
        ]
        if len(block_refs) * num_partitions > _TREE_FANIN_THRESHOLD:
            groups = [
                split_refs[g : g + _TREE_GROUP]
                for g in range(0, len(split_refs), _TREE_GROUP)
            ]
            per_part = [
                [
                    _concat_parts.remote(*[s[i] for s in grp])
                    for grp in groups
                ]
                for i in range(num_partitions)
            ]
        else:
            per_part = [
                [s[i] for s in split_refs] for i in range(num_partitions)
            ]
        tasks = [
            _write_group.options(num_cpus=writer_num_cpus).remote(
                writer, *per_part[i]
            )
            for i in range(num_partitions)
        ]
    rows: list[dict] = []
    for tbl in ray.get(tasks):
        if tbl is None:
            continue
        rows.extend(
            {k: (v if not hasattr(v, "item") else v.item()) for k, v in r.items()}
            for r in tbl.to_pylist()
        )
    return rows


# ---------------------------------------------------------------------------
# driver orchestration

_TERM_STATS_SHARDS = 16


def _term_stats_agg(t: pa.Table) -> pa.Table:
    merged = t.group_by("term").aggregate(
        [("df", "sum"), ("cf", "sum"), ("max_score", "max")]
    )
    return merged.rename_columns(["term", "df", "cf", "max_score"])


@ray.remote
def _term_stats_file_shards(path: str, nshard: int):
    """Level 1: one partition's term-dict part -> locally combined stats
    split into disjoint term-hash shards."""
    pa.set_cpu_count(1)
    td = pq.read_table(path, columns=["term", "df", "cf", "max_score"])
    merged = _term_stats_agg(td)
    import polars as pl

    h = (
        pl.from_arrow(merged["term"].combine_chunks()).hash(seed=17).to_numpy()
        % nshard
    )
    return tuple(merged.filter(pa.array(h == s)) for s in range(nshard))


@ray.remote
def _term_stats_merge_shard(out_path: str, *parts) -> int:
    """Level 2: merge one disjoint term shard across all partitions and
    write its stats file."""
    pa.set_cpu_count(1)
    # with num_returns=1 Ray hands the level-1 task's whole 1-tuple
    # through a single ref, so a part may arrive as (Table,) — unwrap
    parts = [p[0] if isinstance(p, tuple) else p for p in parts]
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        return 0
    merged = _term_stats_agg(pa.concat_tables(nonempty))
    atomic_write_parquet(merged, out_path)
    return merged.num_rows


def _write_term_stats(paths: IndexPaths) -> int:
    """Merge per-partition term-dict parts into global (term, df, cf,
    max_score) stats (A1/A2 analogue) — DISTRIBUTED two-level tree
    (per-file local combine -> term-hash-sharded merge), zero driver
    vocab work at any scale; only salted heavy terms span partition
    files, so the level-2 shards are near-concatenations.  Returns the
    number of posting lists (vocabulary size)."""
    os.makedirs(paths.term_stats, exist_ok=True)
    # write_parquet/shard writers APPEND uniquely-named files into an
    # existing dir, so a resumed build would duplicate every term-stats
    # row without this clear (same rationale as the docmap-dir clearing
    # in build_index)
    for f in os.listdir(paths.term_stats):
        os.remove(os.path.join(paths.term_stats, f))
    part_files = [
        os.path.join(paths.term_dict_dir, f)
        for f in os.listdir(paths.term_dict_dir)
        if f.endswith(".parquet")
    ]
    if not part_files:
        return 0
    shard_refs = [
        _term_stats_file_shards.options(num_returns=_TERM_STATS_SHARDS).remote(
            p, _TERM_STATS_SHARDS
        )
        for p in part_files
    ]
    if _TERM_STATS_SHARDS == 1:
        shard_refs = [(r,) for r in shard_refs]
    tasks = [
        _term_stats_merge_shard.remote(
            os.path.join(paths.term_stats, f"part-{s:03d}.parquet"),
            *[fr[s] for fr in shard_refs],
        )
        for s in range(_TERM_STATS_SHARDS)
    ]
    return int(sum(ray.get(tasks)))


_HEAVY_TOPK = 128

_STATS_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0=conv partial, 1=heavy-term partial, 3=docmap row
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("min_turn", pa.int64()),
        ("max_turn", pa.int64()),
        ("term", pa.string()),
        ("df_part", pa.int64()),
        ("turn_idx", pa.int32()),
        ("doclength", pa.int32()),
    ]
)


def stats_partials(batch: pa.Table, *, analyzer: str = "") -> pa.Table:
    """ONE narrow pass — one tokenize of the input — computing every
    small-aggregate input of the build (SURVEY.md §7 "cheap barrier"):

    * kind=0: per-block conversation partials for the docID prefix sum
    * kind=1: per-block term document-frequency partials, truncated to
      the batch's top-K — the heavy-hitter salting heuristic.  Heavy
      terms (df ~ a few % of docs) are top-K in essentially every
      batch, so truncation loses nothing that matters while keeping the
      driver merge tiny.
    * kind=3: per-turn docmap partials (conv_id, turn_idx, doclength) —
      doc IDs are attached later by a cheap pass over these partials,
      so the full text is never read or tokenized a third time; their
      doclength sum is also the exact `total_terms_in_collection`.
    """
    conv = conv_partials(batch)
    nc = conv.num_rows
    nulls = pa.nulls
    parts = [
        pa.table(
            {
                "kind": pa.array(np.zeros(nc, dtype=np.int8)),
                "conv_id": conv["conv_id"],
                "n_turns": pc.cast(conv["n_turns"], pa.int64()),
                "min_turn": pc.cast(conv["min_turn"], pa.int64()),
                "max_turn": pc.cast(conv["max_turn"], pa.int64()),
                "term": nulls(nc, pa.string()),
                "df_part": nulls(nc, pa.int64()),
                "turn_idx": nulls(nc, pa.int32()),
                "doclength": nulls(nc, pa.int32()),
            },
            schema=_STATS_SCHEMA,
        )
    ]
    nrows = len(batch)
    term_dict, t_idx_all, flat_rows = token_ids(batch["text"], analyzer)
    # doclength per turn = token count (Σ tf; empty turns stay 0)
    dl = np.bincount(flat_rows, minlength=nrows).astype(np.int32)
    parts.append(
        pa.table(
            {
                "kind": pa.array(np.full(nrows, 3, dtype=np.int8)),
                "conv_id": batch["conv_id"],
                "n_turns": nulls(nrows, pa.int64()),
                "min_turn": nulls(nrows, pa.int64()),
                "max_turn": nulls(nrows, pa.int64()),
                "term": nulls(nrows, pa.string()),
                "df_part": nulls(nrows, pa.int64()),
                "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
                "doclength": pa.array(dl),
            },
            schema=_STATS_SCHEMA,
        )
    )
    # per-term df partial = distinct (row, term) pair count: one sort of
    # the token stream by a composite key, runs = pairs
    if len(term_dict):
        key = t_idx_all * nrows + flat_rows
        ks = np.sort(key)
        run_starts = np.concatenate(
            [[0], np.flatnonzero(ks[1:] != ks[:-1]) + 1]
        ).astype(np.int64)
        df_per_term = np.bincount(
            ks[run_starts] // nrows, minlength=len(term_dict)
        )
        order_df = np.argsort(-df_per_term, kind="stable")[:_HEAVY_TOPK]
        counts = pa.table(
            {
                "term": term_dict.take(pa.array(order_df)),
                "df_part": pa.array(df_per_term[order_df], type=pa.int64()),
            }
        )
    else:
        counts = pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "df_part": pa.array([], type=pa.int64()),
            }
        )
    nh = counts.num_rows
    parts.append(
        pa.table(
            {
                "kind": pa.array(np.ones(nh, dtype=np.int8)),
                "conv_id": nulls(nh, pa.string()),
                "n_turns": nulls(nh, pa.int64()),
                "min_turn": nulls(nh, pa.int64()),
                "max_turn": nulls(nh, pa.int64()),
                "term": counts["term"],
                "df_part": pc.cast(counts["df_part"], pa.int64()),
                "turn_idx": nulls(nh, pa.int32()),
                "doclength": nulls(nh, pa.int32()),
            },
            schema=_STATS_SCHEMA,
        )
    )
    return pa.concat_tables(parts)


_DOCMAP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("collection_docid", pa.string()),
        ("doclength", pa.int32()),
    ]
)


def _docmap_from_partials(batch: pa.Table, *, offsets_ref) -> pa.Table:
    """kind=3 stats partials -> docmap rows with dense doc IDs."""
    b = batch.filter(pc.equal(batch["kind"], 3)).select(
        ["conv_id", "turn_idx", "doclength"]
    )
    if len(b) == 0:
        return _DOCMAP_SCHEMA.empty_table()
    withids = add_doc_ids(b, offsets_ref)
    out = pa.table(
        {
            "doc_id": withids["doc_id"],
            "collection_docid": withids["collection_docid"],
            "doclength": pc.cast(b["doclength"], pa.int32()),
        },
        schema=_DOCMAP_SCHEMA,
    )
    # sort by doc_id WITHIN the batch (cheap, no shuffle): files land
    # as sorted runs, so with small row groups the parquet min/max
    # stats actually prune DoclengthStore/TitleStore range reads —
    # unsorted files made every row group span the whole docID range
    return out.take(pc.sort_indices(out["doc_id"]))


_CONV_SHARDS = 16


@ray.remote
def _block_small_aggs(block: pa.Table, nshard: int):
    """ONE task per stats block extracts every small-aggregate input:
    conversation partials split into disjoint hash shards (returns
    nshard + 1 values via num_returns; the combine runs distributed),
    plus (heavy-term partial rows, block doclength sum) as the final
    return — fused so pass A costs one task launch per block, not two
    (the conv/heavy gather was task-launch-latency bound)."""
    import pandas as pd

    pa.set_cpu_count(1)
    if "kind" not in block.column_names:
        # Ray 2.49 propagates zero-column blocks from fully-filtered /
        # fragment-pruned upstream stages through operator boundaries
        # WITHOUT running the UDF (same hazard as dedup._ref_tables):
        # a filtered input Dataset can land one here.  Treat as empty.
        empty = _STATS_SCHEMA.empty_table()
        block = empty
    conv = block.filter(pc.equal(block["kind"], 0)).select(
        ["conv_id", "n_turns", "min_turn", "max_turn"]
    )
    if conv.num_rows == 0:
        shards = tuple(conv for _ in range(nshard))
    else:
        h = (
            pd.util.hash_array(conv["conv_id"].to_numpy(zero_copy_only=False))
            % nshard
        )
        shards = tuple(conv.filter(pa.array(h == s)) for s in range(nshard))
    heavy = block.filter(pc.equal(block["kind"], 1)).select(["term", "df_part"])
    dlsum = pc.sum(
        block.filter(pc.equal(block["kind"], 3))["doclength"]
    ).as_py()
    return shards + ((heavy, int(dlsum or 0)),)


@ray.remote
def _merge_conv_shard(*parts: pa.Table) -> pa.Table:
    """Combine one disjoint conversation shard (sum/min/max)."""
    pa.set_cpu_count(1)
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return None
    return merge_conv_blocks(pa.concat_tables(parts))


def _merge_heavy_partials(
    heavy_parts: pa.Table, num_docs: int, params: BuildParams
) -> dict[str, int]:
    """Skew control (SURVEY.md §4): stopword-scale terms get salted.
    The estimate (exact up to per-batch top-K truncation) only steers
    salting; posting correctness never depends on it."""
    if params.heavy_df_frac <= 0 or heavy_parts.num_rows == 0 or num_docs == 0:
        return {}
    merged = heavy_parts.group_by("term").aggregate([("df_part", "sum")])
    threshold = max(1.0, params.heavy_df_frac * num_docs)
    mask = pc.greater(merged["df_part_sum"], threshold)
    heavy_terms = merged.filter(mask)["term"].to_pylist()
    return {t: params.num_salts for t in heavy_terms}


def _clean_stale_parts(paths: IndexPaths, fingerprint: str) -> None:
    """Reusing an out_dir across DIFFERENT builds must not leave the
    previous occupant's state behind:

    * a segment/term-dict part whose done-marker carries another
      fingerprint (or has no marker at all) would survive untouched if
      the new build routes no rows to that partition — its terms would
      resolve to the OLD corpus's docIDs;
    * tombstones.parquet refers to the old corpus's docIDs and would
      silently suppress arbitrary new docs.

    Markers matching ``fingerprint`` are left alone (that is resume)."""
    import re as _re

    seg_dir = paths.segments_dir
    if os.path.isdir(seg_dir):
        keep: set[int] = set()
        for fn in os.listdir(seg_dir):
            m = _re.fullmatch(r"part-(\d+)\.done\.json", fn)
            if not m:
                continue
            pid = int(m.group(1))
            try:
                with open(os.path.join(seg_dir, fn)) as f:
                    if json.load(f).get("fingerprint") == fingerprint:
                        keep.add(pid)
                        continue
            except (OSError, json.JSONDecodeError):
                pass
            os.remove(os.path.join(seg_dir, fn))
        for d, pat in ((seg_dir, r"part-(\d+)\.parquet"), (
            paths.term_dict_dir, r"part-(\d+)\.parquet",
        )):
            if not os.path.isdir(d):
                continue
            for fn in os.listdir(d):
                m = _re.fullmatch(pat, fn)
                if m and int(m.group(1)) not in keep:
                    os.remove(os.path.join(d, fn))
    docmap_marker = os.path.join(paths.root, "docmap_done.json")
    same_docmap = False
    if os.path.exists(docmap_marker):
        try:
            with open(docmap_marker) as f:
                same_docmap = json.load(f).get("fingerprint") == fingerprint
        except (OSError, json.JSONDecodeError):
            pass
    if not same_docmap and os.path.exists(paths.tombstones):
        os.remove(paths.tombstones)


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

    # phase timing (CIFF_BUILD_TIMING=1): one stderr JSON line with the
    # wall time of each build phase — the profiling hook behind the
    # scaling work (driver-serial fraction must shrink, not be argued
    # away)
    _times: dict[str, float] = {}
    _tprev = time.monotonic()

    def _mark(phase: str) -> None:
        nonlocal _tprev
        now = time.monotonic()
        _times[phase] = round(now - _tprev, 3)
        _tprev = now

    fingerprint_deferred = False
    if input_fingerprint is None:
        try:
            files = sorted(ds.input_files())
        except Exception:
            files = []
        if files:
            input_fingerprint = format(
                stable_hash(
                    ("|".join(files) + repr(asdict(params))).encode()
                ),
                "08x",
            )
        else:
            # in-memory / untracked sources have NO file identity: a
            # params-only hash would match markers from a DIFFERENT
            # dataset and silently skip its partitions.  Defer to a
            # CONTENT fingerprint from the pass-A aggregates instead
            # (doc/token/conv counts + the heavy-term profile) — same-
            # content rebuilds still resume, different content never
            # matches.
            fingerprint_deferred = True

    if not fingerprint_deferred:
        _clean_stale_parts(paths, input_fingerprint)

    ds = ds.select_columns(["conv_id", "turn_idx", "text"])

    # --- pass A: fused small-aggregate pass — ONE tokenize of the input
    # yields conv offsets (docids), heavy-hitter df partials (salting),
    # per-turn docmap partials, and the exact total token count.  The
    # driver fetches only the small conv/heavy rows (per-block remote
    # pre-filter); the fat docmap partials stay in the object store. ---
    stats_ds = ds.map_batches(
        stats_partials,
        fn_kwargs={"analyzer": params.analyzer},
        batch_format="pyarrow",
    ).materialize()
    stat_blocks = stats_ds.to_arrow_refs()
    _mark("pass_a_stats")
    # conv-partial combine runs distributed over disjoint hash shards;
    # the driver only concatenates the (exactly n_convs rows of) merged
    # shards, sorts by conv_id bytes and prefix-sums
    agg_refs = [
        _block_small_aggs.options(num_returns=_CONV_SHARDS + 1).remote(
            b, _CONV_SHARDS
        )
        for b in stat_blocks
    ]
    shard_tasks = [
        _merge_conv_shard.remote(*[ar[s] for ar in agg_refs])
        for s in range(_CONV_SHARDS)
    ]
    extracted = ray.get([ar[_CONV_SHARDS] for ar in agg_refs])
    heavy_tables = [t for t, _ in extracted if t.num_rows]
    heavy_parts = (
        pa.concat_tables(heavy_tables)
        if heavy_tables
        else pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "df_part": pa.array([], type=pa.int64()),
            }
        )
    )
    total_terms = int(sum(s for _, s in extracted))
    merged_shards = [t for t in ray.get(shard_tasks) if t is not None]
    if not merged_shards:
        raise ValueError("empty input: no conversations found")
    _mark("conv_heavy_merge")
    offsets, num_docs = finalize_conv_offsets(pa.concat_tables(merged_shards))
    offsets_ref = ray.put(offsets)
    _mark("finalize_offsets")
    heavy = _merge_heavy_partials(heavy_parts, num_docs, params)
    heavy_ref = ray.put(heavy)
    salt_range = max(1, (num_docs + params.num_salts - 1) // params.num_salts)
    avgdl = total_terms / num_docs if num_docs else 0.0  # f64, src/lib.rs:616-617
    if fingerprint_deferred:
        content = (
            f"content|{num_docs}|{total_terms}|"
            f"{sorted(heavy.items())}|{repr(asdict(params))}"
        )
        input_fingerprint = format(stable_hash(content.encode()), "08x")
        _clean_stale_parts(paths, input_fingerprint)

    # --- docmap finalize (DocRecord analogue, K3/A6): attach doc IDs to
    # the kind=3 partials and write parquet.  Runs OVERLAPPED with pass
    # C in a background thread — it re-reads only the materialized
    # partials, never the input text.  Written unsorted (block order);
    # consumers order by the doc_id column.  Resumable via a
    # fingerprinted marker; a stale docmap dir is CLEARED first
    # (write_parquet appends uniquely-named files, so rewriting without
    # clearing would duplicate rows). ---
    docmap_marker = os.path.join(paths.root, "docmap_done.json")
    docmap_done = False
    if os.path.exists(docmap_marker):
        with open(docmap_marker) as f:
            docmap_done = json.load(f).get("fingerprint") == input_fingerprint

    def _finalize_docmap() -> None:
        for f in os.listdir(paths.docmap_dir):
            os.remove(os.path.join(paths.docmap_dir, f))
        stats_ds.map_batches(
            _docmap_from_partials,
            fn_kwargs={"offsets_ref": offsets_ref},
            batch_format="pyarrow",
        ).write_parquet(paths.docmap_dir, row_group_size=65_536)
        tmp = docmap_marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"fingerprint": input_fingerprint}, f)
        os.replace(tmp, docmap_marker)

    docmap_thread = None
    docmap_errs: list[BaseException] = []

    def _finalize_docmap_guarded() -> None:
        # the thread deletes the existing docmap before rewriting, so a
        # swallowed failure would leave a missing/partial docmap behind a
        # "successful" build — capture and re-raise after join()
        try:
            _finalize_docmap()
        except BaseException as e:  # noqa: BLE001
            docmap_errs.append(e)

    if not docmap_done:
        docmap_thread = threading.Thread(
            target=_finalize_docmap_guarded, daemon=True
        )
        docmap_thread.start()

    # --- pass C: local inversion (combiner) + scatter/gather + write
    # (THE all-to-all; moves packed partial posting lists) ---
    ds2 = ds.map_batches(
        add_doc_ids,
        # collection_docid isn't needed on the postings path; skip the
        # per-row string build
        fn_kwargs={"offsets_ref": offsets_ref, "with_collection_id": False},
        batch_format="pyarrow",
    )
    exploded = ds2.map_batches(
        invert_partial,
        fn_kwargs={
            "heavy_ref": heavy_ref,
            "num_partitions": params.num_partitions,
            "salt_range": salt_range,
            "analyzer": params.analyzer,
        },
        batch_format="pyarrow",
    )
    writer = make_partition_writer(paths, avgdl, params, input_fingerprint)
    lineage_rows = _partitioned_write(
        exploded, writer, params.num_partitions, params.writer_num_cpus
    )
    append_lineage(paths.lineage, lineage_rows)
    _mark("pass_c_shuffle_write")

    if docmap_thread is not None:
        docmap_thread.join()
        if docmap_errs:
            raise docmap_errs[0]
    _mark("docmap_join")

    # --- term stats (global df/cf per term) ---
    num_lists = _write_term_stats(paths)
    _mark("term_stats")
    if os.environ.get("CIFF_BUILD_TIMING"):
        import sys

        print(json.dumps({"build_phases": _times}), file=sys.stderr)

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
        analyzer=params.analyzer,
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

    def input_jsonl(self, path: str | list[str]) -> "IndexBuilder":
        """Raw transcript rows as JSONL (one object per line with at
        least conv_id/turn_idx/text — the shape logs arrive in).  The
        read is distributed (`ray.data.read_json`); a normalization
        stage casts the three build columns to the canonical schema and
        fails fast on missing fields (the reference's fail-fast JSONL
        parse semantics, /root/reference/src/lib.rs:1005-1056)."""

        def _norm(batch: pa.Table) -> pa.Table:
            for col in ("conv_id", "turn_idx", "text"):
                if col not in batch.schema.names:
                    raise ValueError(f"JSONL transcripts missing {col!r}")
            return pa.table(
                {
                    "conv_id": batch["conv_id"].cast(pa.string()),
                    "turn_idx": batch["turn_idx"].cast(pa.int32()),
                    "text": pc.fill_null(
                        batch["text"].cast(pa.string()), ""
                    ),
                }
            )

        self._input = ray.data.read_json(path).map_batches(
            _norm, batch_format="pyarrow"
        )
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

    def analyzer(self, name: str) -> "IndexBuilder":
        from ciff_ray.analysis import get_analyzer

        get_analyzer(name)  # fail fast on unknown names
        self._params.analyzer = name
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
