"""Integer codecs for packed posting slices: d-gap + LEB128 varint, an
Elias-gamma fallback for gap-dense lists, and bit-packed 128-value
blocks (the PISA block-codec family — pisa uses block_simdbp as its
default postings codec) for long streams whose values fit a few bits.

Semantics follow the reference's delta model (SURVEY.md §2.3 M1/M2):
encode stores ``docid - last_doc`` per posting
(/root/reference/src/lib.rs:663-671, :1118-1125), decode is a running
prefix sum (/root/reference/src/lib.rs:255-259).  Unlike the reference
(protobuf varints), the byte layout here is ours; only the delta
semantics are shared.

Everything is numpy-vectorized — no Python loop touches a per-posting
element on the varint path.  The Elias-gamma decode does one cheap
Python iteration per *value* for boundary discovery (codes are
self-delimiting, so boundaries are inherently sequential), then extracts
value bits vectorized; gamma is therefore only auto-selected for slices
where it wins on size (mostly-1 tf streams, gap≈1 stopword runs) —
see :func:`choose_codec`.
"""

from __future__ import annotations

import numpy as np

from ciff_ray.schemas import CODEC_BP, CODEC_BPG, CODEC_GAMMA, CODEC_VARINT

# ---------------------------------------------------------------------------
# d-gaps


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Strictly-ascending absolute docIDs -> d-gaps.

    First element is stored absolute (gap vs. an implicit -1 is NOT used:
    we keep the reference's convention of an absolute first docid,
    /root/reference/src/lib.rs:1118-1125, i.e. gap[0] = doc_ids[0]).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    if doc_ids.size == 0:
        return doc_ids
    gaps = np.empty_like(doc_ids)
    gaps[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """d-gaps -> absolute docIDs (prefix sum, /root/reference/src/lib.rs:255-259)."""
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


# ---------------------------------------------------------------------------
# LEB128 varint


def bit_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value bit length (0 for value 0), vectorized via frexp —
    exact below 2^53, with a loop-free fallback correction above."""
    v = np.asarray(values, dtype=np.uint64)
    _, e = np.frexp(v.astype(np.float64))
    e = e.astype(np.int64)
    if v.size and int(v.max()) >= (1 << 53):
        # float rounding can overshoot by one near powers of two:
        # bit_length is correct iff v >= 2^(e-1)
        e = np.minimum(e, 64)
        shift = np.clip(e - 1, 0, 63).astype(np.uint64)
        over = (e > 0) & (v < (np.uint64(1) << shift))
        e[over] -= 1
    return e


def varint_nbytes_per_value(values: np.ndarray) -> np.ndarray:
    """ceil(bit_length / 7), min 1 — bytes per value under LEB128."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0 or int(v.max()) < 0x80:
        # dominant case for gap/tf/doclength streams: all single-byte
        return np.ones(v.shape, dtype=np.int64)
    return np.maximum(1, (bit_lengths(v) + 6) // 7)


def varint_encode(values: np.ndarray, nbytes: np.ndarray | None = None) -> bytes:
    """Vectorized LEB128: 7 value bits per byte, high bit = continuation.
    ``nbytes`` (per-value byte counts) can be passed in when the caller
    already computed them — it is the most expensive part of encoding."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if int(v.max()) < 0x80:
        # all single-byte: one cast, no scatter passes
        return v.astype(np.uint8).tobytes()
    if nbytes is None:
        nbytes = varint_nbytes_per_value(v)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    maxb = int(nbytes.max())
    for k in range(maxb):
        mask = nbytes > k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if count is not None and b.size == count:
        # every byte is its own value only if no continuation bits
        if not (b & 0x80).any():
            return b.astype(np.uint64)
        raise ValueError("varint stream byte count equals value count "
                         "but continuation bits present")
    terminators = (b & 0x80) == 0
    term_idx = np.flatnonzero(terminators)
    n = term_idx.size
    if count is not None and n != count:
        raise ValueError(f"varint stream holds {n} values, expected {count}")
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = term_idx[:-1] + 1
    # group id per byte = index of the value it belongs to
    group = np.zeros(b.size, dtype=np.int64)
    group[starts[1:]] = 1
    group = np.cumsum(group)
    pos = np.arange(b.size, dtype=np.int64) - starts[group]
    contrib = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


# ---------------------------------------------------------------------------
# Elias gamma (values must be >= 1)


def gamma_encode(values: np.ndarray) -> bytes:
    """Elias-gamma: N zeros then the (N+1)-bit binary of v, MSB first."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if (v < 1).any():
        raise ValueError("Elias gamma requires values >= 1")
    nb = bit_lengths(v) - 1  # N = floor(log2 v)
    code_len = 2 * nb + 1
    ends = np.cumsum(code_len)
    starts = ends - code_len
    bits = np.zeros(int(ends[-1]), dtype=np.uint8)
    maxnb = int(nb.max())
    # bit j of the value part (MSB first) lands at start + nb + j
    for j in range(maxnb + 1):
        mask = nb >= j
        shift = (nb[mask] - j).astype(np.uint64)
        bits[starts[mask] + nb[mask] + j] = ((v[mask] >> shift) & np.uint64(1)).astype(
            np.uint8
        )
    return np.packbits(bits).tobytes()


def gamma_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode `count` gamma codes.

    Codes are self-delimiting so boundary discovery is inherently
    sequential.  Boundaries are found by one pointer chase per code over
    a precomputed vectorized jump table (O(count) steps, ~0.1us each on
    a plain Python list); the value extraction below is fully
    vectorized, O(max code length) numpy passes."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
    B = bits.size
    # next one-bit at-or-after each position (B if none): right-to-left
    # min-accumulate, fully vectorized
    m = np.where(bits, np.arange(B, dtype=np.int64), B)
    nxt = np.minimum.accumulate(m[::-1])[::-1]
    # jump table: a code starting at p (nb = nxt[p]-p leading zeros) ends
    # just before 2*nxt[p] - p + 1; the boundary walk is a plain-list
    # pointer chase (~0.1us/step), the only sequential part
    jump = (2 * nxt - np.arange(B, dtype=np.int64) + 1).tolist()
    starts_list = [0] * count
    p = 0
    for i in range(count):
        if p >= B:
            raise ValueError("gamma stream truncated")
        starts_list[i] = p
        p = jump[p]
    starts = np.asarray(starts_list, dtype=np.int64)
    nbs = nxt[starts] - starts
    if nbs.size and int(starts[-1] + 2 * nbs[-1] + 1) > B:
        raise ValueError("gamma stream truncated")
    out = np.zeros(count, dtype=np.uint64)
    maxnb = int(nbs.max())
    for j in range(maxnb + 1):
        mask = nbs >= j
        idx = starts[mask] + nbs[mask] + j
        out[mask] = (out[mask] << np.uint64(1)) | bits[idx].astype(np.uint64)
    # note: the loop above shifts in MSB-first bits only for positions
    # j <= nb; values with nb < j are masked out, so each value gets
    # exactly nb+1 shifts.
    return out




# ---------------------------------------------------------------------------
# bit-packed 128-value blocks (the PISA block-codec family: same layout
# idea as simdbp/FastPFor's block-FOR — per block a single bit width b,
# then the 128 values packed b bits each, LSB-first).  Both encode and
# decode are GROUP-vectorized: blocks are bucketed by (count, width) and
# each bucket runs as one packbits/unpackbits matrix op, so a 500k-
# posting slice decodes in ~a dozen numpy calls, not a per-block loop.
#
# CODEC_BP blocks uniformly at BP_BLOCK values; CODEC_BPG's FIRST block
# holds BP_BLOCK-1 values (doc-gap streams: the first docID is stored
# absolute in first_doc, so df docs = df-1 gaps against 128-doc blocks).
# ---------------------------------------------------------------------------

BP_BLOCK = 128

# widths are rounded UP to a divisor of 64 so every u64 word holds a
# whole number of values — decode is then three vectorized word ops
# (gather, shift, mask) instead of per-byte gathers.  Costs ~10% size
# on b=3/5/6 streams, buys a ~6x faster decode; same trade simdbp makes
# with its SIMD-lane-aligned widths.
_BP_WIDTHS = np.array([0, 1, 2, 4, 8, 16, 32, 64], dtype=np.int64)


def _bp_counts(n: int, first_block: int) -> np.ndarray:
    """Per-block value counts for an n-value stream."""
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    fb = min(first_block, n)
    rest = n - fb
    counts = [fb] + [BP_BLOCK] * (rest // BP_BLOCK)
    if rest % BP_BLOCK:
        counts.append(rest % BP_BLOCK)
    return np.array(counts, dtype=np.int64)


def _bp_widths(v: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Per-block width: max bit length rounded up to a divisor of 64."""
    bl = np.maximum.reduceat(bit_lengths(v), bounds[:-1]).astype(np.int64)
    return _BP_WIDTHS[np.searchsorted(_BP_WIDTHS, bl)]


def _bp_first_block(codec: int) -> int:
    return BP_BLOCK - 1 if codec == CODEC_BPG else BP_BLOCK


def bp_plan(values: np.ndarray, codec: int):
    """(counts, bounds, widths, payload sizes) for one stream — computed
    once and threaded through sizing, encoding, and the writer's block
    offsets (each would otherwise redo the bit_lengths/reduceat pass
    over the full stream, and bp streams are precisely the heavy
    slices)."""
    v = np.asarray(values, dtype=np.uint64)
    counts = _bp_counts(v.size, _bp_first_block(codec))
    if counts.size == 0:
        z = np.empty(0, dtype=np.int64)
        return counts, np.zeros(1, dtype=np.int64), z, z
    bounds = np.concatenate([[0], np.cumsum(counts)])
    widths = _bp_widths(v, bounds)
    return counts, bounds, widths, (counts * widths + 7) // 8


def bp_block_nbytes(values: np.ndarray, codec: int, plan=None) -> np.ndarray:
    """Per-block PAYLOAD byte sizes.  Layout: buf = [nblk width bytes]
    [payload 0][payload 1]... — the width header makes decode's offset
    recovery one cumsum, and the block-targeted path reads buf[bi]."""
    if plan is None:
        plan = bp_plan(values, codec)
    return plan[3]


def bp_nbytes(values: np.ndarray, codec: int, plan=None) -> int:
    sizes = bp_block_nbytes(values, codec, plan=plan)
    return int(sizes.sum() + sizes.size)  # + header


def _bp_pack_group(rows: np.ndarray, b: int) -> np.ndarray:
    """(k, cnt) uint64 values -> (k, ceil(cnt*b/8)) payload bytes."""
    k, cnt = rows.shape
    per = 64 // b
    nw = (cnt + per - 1) // per
    padded = np.zeros((k, nw * per), dtype=np.uint64)
    padded[:, :cnt] = rows
    lanes = padded.reshape(k, nw, per)
    shifts = (np.arange(per, dtype=np.uint64) * np.uint64(b))[None, None, :]
    words = (lanes << shifts).sum(axis=2, dtype=np.uint64)
    nbytes = (cnt * b + 7) // 8
    return words.astype("<u8").view(np.uint8).reshape(k, nw * 8)[:, :nbytes]


def _bp_unpack_group(payload: np.ndarray, cnt: int, b: int) -> np.ndarray:
    """(k, payload_bytes) -> (k, cnt) uint64 values."""
    k, nbytes = payload.shape
    per = 64 // b
    nw = (cnt + per - 1) // per
    padded = np.zeros((k, nw * 8), dtype=np.uint8)
    padded[:, :nbytes] = payload
    words = padded.view("<u8").reshape(k, nw)
    shifts = (np.arange(per, dtype=np.uint64) * np.uint64(b))[None, None, :]
    vals = words[:, :, None] >> shifts
    if b < 64:
        vals &= (np.uint64(1) << np.uint64(b)) - np.uint64(1)
    return vals.reshape(k, nw * per)[:, :cnt]


def bp_encode(values: np.ndarray, codec: int, plan=None) -> bytes:
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    counts, bounds, widths, sizes = plan if plan is not None else bp_plan(v, codec)
    nblk = counts.size
    offs = nblk + np.concatenate([[0], np.cumsum(sizes)])
    out = np.zeros(int(offs[-1]), dtype=np.uint8)
    out[:nblk] = widths
    key = counts * 128 + widths  # group blocks by (count, width)
    for kk in np.unique(key):
        sel = np.nonzero(key == kk)[0]
        cnt, b = int(counts[sel[0]]), int(widths[sel[0]])
        if b == 0:
            continue
        rows = v[
            (bounds[sel][:, None] + np.arange(cnt)[None, :]).ravel()
        ].reshape(len(sel), cnt)
        packed = _bp_pack_group(rows, b)
        dst = (
            offs[sel][:, None] + np.arange(packed.shape[1])[None, :]
        ).ravel()
        out[dst] = packed.ravel()
    return out.tobytes()


def bp_decode(buf: bytes, count: int, codec: int) -> np.ndarray:
    if count <= 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    counts = _bp_counts(count, _bp_first_block(codec))
    nblk = counts.size
    widths = raw[:nblk].astype(np.int64)
    sizes = (counts * widths + 7) // 8
    offs = nblk + np.concatenate([[0], np.cumsum(sizes)])
    out = np.zeros(count, dtype=np.uint64)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    key = counts * 128 + widths
    for kk in np.unique(key):
        sel = np.nonzero(key == kk)[0]
        cnt, b = int(counts[sel[0]]), int(widths[sel[0]])
        if b == 0:
            continue
        nbytes = (cnt * b + 7) // 8
        src = (offs[sel][:, None] + np.arange(nbytes)[None, :]).ravel()
        vals = _bp_unpack_group(raw[src].reshape(len(sel), nbytes), cnt, b)
        dst = (bounds[sel][:, None] + np.arange(cnt)[None, :]).ravel()
        out[dst] = vals.ravel()
    return out


def bp_decode_block(
    buf: bytes, bi: int, payload_off: int, payload_end: int, count: int
) -> np.ndarray:
    """Decode ONE block: width from header byte bi, payload at
    [payload_off, payload_end) (writer-recorded offsets)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    b = int(raw[bi])
    if b == 0:
        return np.zeros(count, dtype=np.uint64)
    return _bp_unpack_group(
        raw[payload_off:payload_end][None, :], count, b
    )[0]


# ---------------------------------------------------------------------------
# codec selection + uniform entry points


def gamma_nbits(values: np.ndarray) -> int:
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return 0
    nb = bit_lengths(v) - 1
    return int((2 * nb + 1).sum())


def varint_nbytes(values: np.ndarray) -> int:
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return 0
    return int(varint_nbytes_per_value(v).sum())


# Above this many postings, always use varint: gamma's decode does a
# Python-level boundary scan per value, so its density win is only worth
# it for short-to-mid slices (and for tf streams, which are mostly 1s).
GAMMA_MAX_VALUES = 1 << 16


def choose_codec(values: np.ndarray) -> int:
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0 or v.size > GAMMA_MAX_VALUES or (v < 1).any():
        return CODEC_VARINT
    gamma_bytes = (gamma_nbits(v) + 7) // 8
    if gamma_bytes * 5 <= varint_nbytes(v) * 4:  # >= 20% smaller
        return CODEC_GAMMA
    return CODEC_VARINT


def encode(values: np.ndarray, codec: int) -> bytes:
    if codec == CODEC_VARINT:
        return varint_encode(values)
    if codec == CODEC_GAMMA:
        return gamma_encode(values)
    if codec in (CODEC_BP, CODEC_BPG):
        return bp_encode(values, codec)
    raise ValueError(f"unknown codec {codec}")


def decode(buf: bytes, count: int, codec: int) -> np.ndarray:
    if codec == CODEC_VARINT:
        return varint_decode(buf, count)
    if codec == CODEC_GAMMA:
        return gamma_decode(buf, count)
    if codec in (CODEC_BP, CODEC_BPG):
        return bp_decode(buf, count, codec)
    raise ValueError(f"unknown codec {codec}")
