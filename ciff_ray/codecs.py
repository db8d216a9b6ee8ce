"""Integer codecs for packed posting slices: d-gap + LEB128 varint, with
an Elias-gamma fallback for gap-dense lists.

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

from ciff_ray.schemas import CODEC_GAMMA, CODEC_VARINT

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
    raise ValueError(f"unknown codec {codec}")


def decode(buf: bytes, count: int, codec: int) -> np.ndarray:
    if codec == CODEC_VARINT:
        return varint_decode(buf, count)
    if codec == CODEC_GAMMA:
        return gamma_decode(buf, count)
    raise ValueError(f"unknown codec {codec}")
