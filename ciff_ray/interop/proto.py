"""Minimal protobuf wire codec for the CIFF message set.

Hand-rolled (public protobuf wire format: varint keys `(field << 3) |
wire_type`, length-delimited strings/messages, 64-bit doubles) so no
codegen step is needed — the reference compiles the schema at build time
instead (/root/reference/build.rs:10-15).  Message layout mirrors
/root/reference/proto/common-index-format-v1.proto exactly:

    Header       {1:version 2:num_postings_lists 3:num_docs
                  4:total_postings_lists 5:total_docs
                  6:total_terms_in_collection 7:average_doclength(double)
                  8:description}
    Posting      {1:docid 2:tf}              # docid is the d-gap on wire
    PostingsList {1:term 2:df 3:cf 4:repeated Posting}
    DocRecord    {1:docid 2:collection_docid 3:doclength}

A CIFF file is: Header, then `num_postings_lists` PostingsList messages,
then `num_docs` DocRecords, each length-delimited with no tag
(write_message_no_tag semantics, /root/reference/src/lib.rs:832-835).

proto3 serialization omits default-valued (zero/empty) fields, matching
the reference's prost/protobuf output.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_WT_VARINT = 0
_WT_64BIT = 1
_WT_LEN = 2
_WT_32BIT = 5


# -- varints ----------------------------------------------------------------


def read_varint(buf, pos: int) -> tuple[int, int]:
    """Decode one varint at ``pos``; returns (value, next_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        # protobuf int32/int64 negatives: 64-bit two's complement varint
        value &= 0xFFFFFFFFFFFFFFFF
    while value > 0x7F:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)


def _signed(value: int) -> int:
    """Interpret a decoded varint as a signed 64-bit integer."""
    return value - (1 << 64) if value >= (1 << 63) else value


def _skip_field(buf, pos: int, wire_type: int) -> int:
    if wire_type == _WT_VARINT:
        _, pos = read_varint(buf, pos)
    elif wire_type == _WT_64BIT:
        pos += 8
    elif wire_type == _WT_LEN:
        n, pos = read_varint(buf, pos)
        pos += n
    elif wire_type == _WT_32BIT:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire_type}")
    return pos


# -- messages ---------------------------------------------------------------


@dataclass
class CiffHeader:
    """proto Header (/root/reference/proto/common-index-format-v1.proto:10-34)."""

    version: int = 0
    num_postings_lists: int = 0
    num_docs: int = 0
    total_postings_lists: int = 0
    total_docs: int = 0
    total_terms_in_collection: int = 0
    average_doclength: float = 0.0
    description: str = ""

    _INT_FIELDS = {
        1: "version",
        2: "num_postings_lists",
        3: "num_docs",
        4: "total_postings_lists",
        5: "total_docs",
        6: "total_terms_in_collection",
    }

    def __str__(self) -> str:
        """Display-format parity with the reference's `impl fmt::Display
        for Header` (/root/reference/src/proto/mod.rs:6-31), including
        the missing colon after "Total Terms in Collection"."""
        # Rust's `{}` on f64 prints the shortest round-trip repr and
        # omits a trailing ".0" on integral values; Python's repr() is
        # also shortest-round-trip, so only the ".0" differs.
        avg = repr(float(self.average_doclength))
        if avg.endswith(".0"):
            avg = avg[:-2]
        return (
            "----- CIFF HEADER -----\n"
            f"Version: {self.version}\n"
            f"No. Postings Lists: {self.num_postings_lists}\n"
            f"Total Postings Lists: {self.total_postings_lists}\n"
            f"No. Documents: {self.num_docs}\n"
            f"Total Documents: {self.total_docs}\n"
            f"Total Terms in Collection {self.total_terms_in_collection}\n"
            f"Average Document Length: {avg}\n"
            f"Description: {self.description}\n"
            "-----------------------"
        )

    @classmethod
    def parse(cls, buf) -> "CiffHeader":
        h = cls()
        pos, end = 0, len(buf)
        while pos < end:
            key, pos = read_varint(buf, pos)
            fnum, wt = key >> 3, key & 7
            if fnum in cls._INT_FIELDS and wt == _WT_VARINT:
                v, pos = read_varint(buf, pos)
                setattr(h, cls._INT_FIELDS[fnum], _signed(v))
            elif fnum == 7 and wt == _WT_64BIT:
                raw = bytes(buf[pos : pos + 8])
                if len(raw) < 8:
                    # struct.error is not part of the parse-error
                    # contract (controlled errors only; see
                    # tests/test_fuzz_pisaio.py)
                    raise ValueError("truncated f64 field")
                h.average_doclength = struct.unpack("<d", raw)[0]
                pos += 8
            elif fnum == 8 and wt == _WT_LEN:
                n, pos = read_varint(buf, pos)
                h.description = bytes(buf[pos : pos + n]).decode("utf-8")
                pos += n
            else:
                pos = _skip_field(buf, pos, wt)
        h.validate()
        return h

    def validate(self) -> None:
        """Fail-fast on negative counts — the reference's u32 casts at
        header read (/root/reference/src/lib.rs:168-179)."""
        for name in ("num_postings_lists", "num_docs"):
            if getattr(self, name) < 0:
                raise ValueError(f"header field {name} is negative")

    def serialize(self) -> bytes:
        out = bytearray()
        for fnum, name in self._INT_FIELDS.items():
            v = getattr(self, name)
            if v != 0:
                write_varint(out, (fnum << 3) | _WT_VARINT)
                write_varint(out, v)
        if self.average_doclength != 0.0:
            write_varint(out, (7 << 3) | _WT_64BIT)
            out += struct.pack("<d", self.average_doclength)
        if self.description:
            b = self.description.encode("utf-8")
            write_varint(out, (8 << 3) | _WT_LEN)
            write_varint(out, len(b))
            out += b
        return bytes(out)


@dataclass
class CiffPostingsList:
    """Decoded PostingsList.  ``gaps`` holds the on-wire d-gap docids
    (first element absolute, rest gaps — /root/reference/src/lib.rs:255-259);
    use :meth:`doc_ids` for the absolute ascending list."""

    term: str = ""
    df: int = 0
    cf: int = 0
    gaps: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    tfs: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))

    def doc_ids(self) -> np.ndarray:
        return np.cumsum(self.gaps)

    @classmethod
    def parse(cls, buf) -> "CiffPostingsList":
        term, df, cf = "", 0, 0
        gaps: list[int] = []
        tfs: list[int] = []
        pos, end = 0, len(buf)
        while pos < end:
            key, pos = read_varint(buf, pos)
            fnum, wt = key >> 3, key & 7
            if fnum == 1 and wt == _WT_LEN:
                n, pos = read_varint(buf, pos)
                term = bytes(buf[pos : pos + n]).decode("utf-8")
                pos += n
            elif fnum == 2 and wt == _WT_VARINT:
                v, pos = read_varint(buf, pos)
                df = _signed(v)
            elif fnum == 3 and wt == _WT_VARINT:
                v, pos = read_varint(buf, pos)
                cf = _signed(v)
            elif fnum == 4 and wt == _WT_LEN:
                n, pos = read_varint(buf, pos)
                p_end = pos + n
                docid = tf = 0
                while pos < p_end:
                    pkey, pos = read_varint(buf, pos)
                    pf, pwt = pkey >> 3, pkey & 7
                    if pf == 1 and pwt == _WT_VARINT:
                        docid, pos = read_varint(buf, pos)
                        docid = _signed(docid)
                    elif pf == 2 and pwt == _WT_VARINT:
                        tf, pos = read_varint(buf, pos)
                        tf = _signed(tf)
                    else:
                        pos = _skip_field(buf, pos, pwt)
                gaps.append(docid)
                tfs.append(tf)
            else:
                pos = _skip_field(buf, pos, wt)
        pl = cls(
            term,
            df,
            cf,
            np.asarray(gaps, dtype=np.int64),
            np.asarray(tfs, dtype=np.int64),
        )
        if (pl.gaps < 0).any() or (pl.tfs < 0).any() or pl.df < 0:
            # negative docid/tf/df rejected (/root/reference/src/lib.rs:246-266)
            raise ValueError(f"negative posting value in list {term!r}")
        return pl

    def serialize(self) -> bytes:
        out = bytearray()
        if self.term:
            b = self.term.encode("utf-8")
            write_varint(out, (1 << 3) | _WT_LEN)
            write_varint(out, len(b))
            out += b
        if self.df:
            write_varint(out, (2 << 3) | _WT_VARINT)
            write_varint(out, self.df)
        if self.cf:
            write_varint(out, (3 << 3) | _WT_VARINT)
            write_varint(out, self.cf)
        for gap, tf in zip(self.gaps.tolist(), self.tfs.tolist()):
            p = bytearray()
            if gap:
                write_varint(p, (1 << 3) | _WT_VARINT)
                write_varint(p, gap)
            if tf:
                write_varint(p, (2 << 3) | _WT_VARINT)
                write_varint(p, tf)
            write_varint(out, (4 << 3) | _WT_LEN)
            write_varint(out, len(p))
            out += p
        return bytes(out)

    @classmethod
    def from_absolute(
        cls, term: str, doc_ids: np.ndarray, tfs: np.ndarray
    ) -> "CiffPostingsList":
        """Build from absolute ascending docids (re-delta-encodes, the
        writer side of /root/reference/src/lib.rs:663-671)."""
        doc_ids = np.asarray(doc_ids, dtype=np.int64)
        gaps = np.diff(doc_ids, prepend=0)
        return cls(
            term,
            int(doc_ids.size),
            int(np.asarray(tfs).sum()),
            gaps,
            np.asarray(tfs, dtype=np.int64),
        )


@dataclass
class CiffDocRecord:
    """proto DocRecord (/root/reference/proto/common-index-format-v1.proto:51-55)."""

    docid: int = 0
    collection_docid: str = ""
    doclength: int = 0

    @classmethod
    def parse(cls, buf) -> "CiffDocRecord":
        r = cls()
        pos, end = 0, len(buf)
        while pos < end:
            key, pos = read_varint(buf, pos)
            fnum, wt = key >> 3, key & 7
            if fnum == 1 and wt == _WT_VARINT:
                v, pos = read_varint(buf, pos)
                r.docid = _signed(v)
            elif fnum == 2 and wt == _WT_LEN:
                n, pos = read_varint(buf, pos)
                r.collection_docid = bytes(buf[pos : pos + n]).decode("utf-8")
                pos += n
            elif fnum == 3 and wt == _WT_VARINT:
                v, pos = read_varint(buf, pos)
                r.doclength = _signed(v)
            else:
                pos = _skip_field(buf, pos, wt)
        if r.docid < 0 or r.doclength < 0:
            raise ValueError("negative docid/doclength in DocRecord")
        return r

    def serialize(self) -> bytes:
        out = bytearray()
        if self.docid:
            write_varint(out, (1 << 3) | _WT_VARINT)
            write_varint(out, self.docid)
        if self.collection_docid:
            b = self.collection_docid.encode("utf-8")
            write_varint(out, (2 << 3) | _WT_LEN)
            write_varint(out, len(b))
            out += b
        if self.doclength:
            write_varint(out, (3 << 3) | _WT_VARINT)
            write_varint(out, self.doclength)
        return bytes(out)


# -- length-delimited framing ----------------------------------------------


def read_delimited(buf, pos: int):
    """Read one length-delimited message; returns (message_bytes, next_pos)."""
    n, pos = read_varint(buf, pos)
    return buf[pos : pos + n], pos + n


def write_delimited(fh, msg_bytes: bytes) -> None:
    out = bytearray()
    write_varint(out, len(msg_bytes))
    fh.write(out)
    fh.write(msg_bytes)


# -- batch-vectorized DocRecord serialization --------------------------------


def _varint_matrix(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized varint encode: (n,) uint64 -> ((n, 10) uint8 byte
    matrix, (n,) byte lengths).  Row i's first lengths[i] bytes are the
    wire encoding of vals[i] (continuation bits set)."""
    v = np.asarray(vals, dtype=np.uint64)
    shifts = np.uint64(7) * np.arange(10, dtype=np.uint64)
    chunks = (v[:, None] >> shifts[None, :]) & np.uint64(0x7F)
    nz = chunks != 0
    lengths = np.where(
        v == 0, 1, 10 - np.argmax(nz[:, ::-1], axis=1)
    ).astype(np.int64)
    cont = np.arange(10)[None, :] < (lengths[:, None] - 1)
    mat = (chunks | (cont.astype(np.uint64) << np.uint64(7))).astype(np.uint8)
    return mat, lengths


def _scatter_varints(
    out: np.ndarray,
    offs: np.ndarray,
    mat: np.ndarray,
    lens: np.ndarray,
    mask: np.ndarray | None = None,
) -> None:
    """Write varint rows (mat/lens) into ``out`` at per-row offsets."""
    if mask is not None:
        offs, mat, lens = offs[mask], mat[mask], lens[mask]
    if offs.size == 0:
        return
    col = np.arange(mat.shape[1])
    sel = col[None, :] < lens[:, None]
    pos = offs[:, None] + col[None, :]
    out[pos[sel]] = mat[sel]


def _ragged_arange(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lens)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens)


def serialize_doc_records(
    docids: np.ndarray, collection_docids, doclengths: np.ndarray
) -> bytes:
    """Length-delimited wire bytes of a BATCH of DocRecords —
    byte-identical to ``write_delimited(fh, CiffDocRecord(...).serialize())``
    per row, but fully vectorized (varint byte matrices + one scatter
    per field; the per-record Python loop was the CIFF export's long
    pole at ~500k docs).  ``collection_docids`` is an Arrow string
    array; proto3 default-omission (docid 0 / empty string /
    doclength 0) is preserved."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    did = np.asarray(docids, dtype=np.int64)
    dl = np.asarray(doclengths, dtype=np.int64)
    if (did < 0).any() or (dl < 0).any():
        raise ValueError("negative docid/doclength in DocRecord batch")
    col = collection_docids
    if isinstance(col, _pa.ChunkedArray):
        col = col.combine_chunks()
    enc = _pc.cast(col, _pa.large_binary())
    if enc.null_count:
        raise ValueError("null collection_docid in DocRecord batch")
    n = len(did)
    soff = np.frombuffer(
        enc.buffers()[1], dtype=np.int64, count=n + 1, offset=enc.offset * 8
    )
    data_buf = enc.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    slen = np.diff(soff)

    m1, l1 = _varint_matrix(did.astype(np.uint64))
    m2, l2 = _varint_matrix(slen.astype(np.uint64))
    m3, l3 = _varint_matrix(dl.astype(np.uint64))
    has1, has2, has3 = did != 0, slen != 0, dl != 0
    f1 = np.where(has1, 1 + l1, 0)
    f2 = np.where(has2, 1 + l2 + slen, 0)
    f3 = np.where(has3, 1 + l3, 0)
    inner = f1 + f2 + f3
    m0, l0 = _varint_matrix(inner.astype(np.uint64))

    total = int((l0 + inner).sum())
    out = np.zeros(total, dtype=np.uint8)
    rec = np.concatenate(([0], np.cumsum(l0 + inner)[:-1])).astype(np.int64)
    _scatter_varints(out, rec, m0, l0)  # outer length frame
    p = rec + l0
    out[p[has1]] = (1 << 3) | _WT_VARINT  # 0x08
    _scatter_varints(out, p + 1, m1, l1, has1)
    p = p + f1
    out[p[has2]] = (2 << 3) | _WT_LEN  # 0x12
    _scatter_varints(out, p + 1, m2, l2, has2)
    sp = (p + 1 + l2)[has2]
    sl = slen[has2]
    if sl.size:
        ra = _ragged_arange(sl)
        dst = np.repeat(sp, sl) + ra
        src = np.repeat(soff[:-1][has2], sl) + ra
        out[dst] = data[src]
    p = p + f2
    out[p[has3]] = (3 << 3) | _WT_VARINT  # 0x18
    _scatter_varints(out, p + 1, m3, l3, has3)
    return out.tobytes()
