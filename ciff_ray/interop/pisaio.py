"""PISA uncompressed ("binary collection") index file IO + lexicons.

Byte-compatible with the reference formats:

* binary collection — flat file of u32 LE sequences, each
  ``[len:u32][len x u32]`` (/root/reference/src/binary_collection.rs:32-36);
  sequential reader (S4), random-access reader (S5), element access (S6),
  permutation writer (reorder, /root/reference/src/binary_collection.rs:384-397).
* ``.sizes`` — a single sequence ``[num_docs][doclength per docid]``
  (/root/reference/src/lib.rs:519-554).
* payload-vector lexicon (``.termlex``/``.doclex``) —
  ``[count:u64][count+1 offsets:u64][concatenated payloads]``
  (/root/reference/src/payload_vector.rs:36-61 build,
  :196-206 random access), verified byte-identical against the golden
  ``tests/test_data/terms.lex``.

All readers are zero-copy numpy views over a memory-mapped buffer — the
Python analogue of the reference's mmap + transmute readers.
"""

from __future__ import annotations

import mmap
import os
from dataclasses import dataclass

import numpy as np


class InvalidFormat(ValueError):
    pass


# -- binary collections -----------------------------------------------------


def encode_u32_sequence(values) -> bytes:
    """``[len:u32 LE][values:u32 LE]`` (/root/reference/src/lib.rs:220-232)."""
    arr = np.ascontiguousarray(values, dtype="<u4")
    return np.uint32(arr.size).tobytes() + arr.tobytes()


class BinaryCollection:
    """Sequential iterator over u32 sequences in a byte buffer (S4)."""

    def __init__(self, buf):
        if len(buf) % 4 != 0:
            raise InvalidFormat(
                "binary collection byte length not divisible by 4"
            )  # /root/reference/src/binary_collection.rs:79-88
        self._words = np.frombuffer(buf, dtype="<u4")
        self._pos = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._pos >= self._words.size:
            raise StopIteration
        n = int(self._words[self._pos])
        start = self._pos + 1
        end = start + n
        if end > self._words.size:
            raise InvalidFormat("truncated sequence")
        self._pos = end
        return self._words[start:end]


class RandomAccessBinaryCollection:
    """One offset-collecting pass, then O(1) ``get(i)`` (S5,
    /root/reference/src/binary_collection.rs:174-251)."""

    def __init__(self, buf):
        if len(buf) % 4 != 0:
            raise InvalidFormat("binary collection byte length not divisible by 4")
        self._words = np.frombuffer(buf, dtype="<u4")
        offsets = []
        pos = 0
        n_words = self._words.size
        while pos < n_words:
            offsets.append(pos)
            pos += 1 + int(self._words[pos])
        if pos != n_words:
            raise InvalidFormat("truncated sequence")
        self._offsets = np.asarray(offsets, dtype=np.int64)

    def __len__(self) -> int:
        return self._offsets.size

    def get(self, i: int) -> np.ndarray:
        if not 0 <= i < self._offsets.size:
            raise IndexError(i)
        off = int(self._offsets[i])
        n = int(self._words[off])
        return self._words[off + 1 : off + 1 + n]

    def __iter__(self):
        for i in range(len(self)):
            yield self.get(i)


def reorder(coll: RandomAccessBinaryCollection, order, fh) -> None:
    """Write sequences permuted by ``order``
    (/root/reference/src/binary_collection.rs:384-397)."""
    for i in order:
        fh.write(encode_u32_sequence(coll.get(int(i))))


def sizes(buf) -> np.ndarray:
    """First sequence of ``.sizes`` = doclength array (S7)."""
    it = BinaryCollection(buf)
    try:
        return next(it)
    except StopIteration:
        raise InvalidFormat("sizes collection is empty") from None


def read_document_count(coll: BinaryCollection) -> int:
    """Singleton ``[num_documents]`` prelude of ``.docs`` (S8,
    /root/reference/src/lib.rs:572-581)."""
    try:
        seq = next(coll)
    except StopIteration:
        raise InvalidFormat("Unable to read document count") from None
    if seq.size < 1:
        raise InvalidFormat("Unable to read document count")
    return int(seq[0])


def mmap_file(path: str):
    """Read-only memory map (the reference's Mmap::map analogue, S11)."""
    with open(path, "rb") as f:
        if os.fstat(f.fileno()).st_size == 0:
            return b""
        return mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)


# -- payload-vector lexicons ------------------------------------------------


def build_payload_vector(items) -> bytes:
    """Encode byte payloads as ``[count:u64][count+1 offsets:u64][payloads]``
    (/root/reference/src/payload_vector.rs:36-61)."""
    payloads = [bytes(x) for x in items]
    count = len(payloads)
    lens = np.asarray([len(p) for p in payloads], dtype="<u8")
    offsets = np.zeros(count + 1, dtype="<u8")
    np.cumsum(lens, out=offsets[1:])
    return (
        np.uint64(count).tobytes() + offsets.tobytes() + b"".join(payloads)
    )


class PayloadSlice:
    """O(1) random access over a payload-vector buffer
    (/root/reference/src/payload_vector.rs:196-206)."""

    def __init__(self, buf):
        self._buf = buf
        if len(buf) < 8:
            raise InvalidFormat("payload vector too short for count")
        count = int(np.frombuffer(buf[:8], dtype="<u8")[0])
        base = 8 + 8 * (count + 1)
        if len(buf) < base:
            raise InvalidFormat("payload vector offsets truncated")
        self._offsets = np.frombuffer(buf[8:base], dtype="<u8")
        self._base = base
        self._count = count

    def __len__(self) -> int:
        return self._count

    def __getitem__(self, i: int) -> bytes:
        if not 0 <= i < self._count:
            raise IndexError(i)
        start = self._base + int(self._offsets[i])
        end = self._base + int(self._offsets[i + 1])
        return bytes(self._buf[start:end])

    def __iter__(self):
        for i in range(self._count):
            yield self[i]


def build_lexicon(input_path: str, output_path: str) -> None:
    """Newline-delimited text -> payload-vector file (K7,
    /root/reference/src/payload_vector.rs:260-268)."""
    with open(input_path, "rb") as f:
        lines = f.read().split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    with open(output_path, "wb") as out:
        out.write(build_payload_vector(lines))


# -- misc helpers -----------------------------------------------------------


def check_lines_sorted(lines) -> bool:
    """Byte-wise non-decreasing check (M8, /root/reference/src/lib.rs:273-283)."""
    prev = b""
    for line in lines:
        b = line.encode("utf-8") if isinstance(line, str) else line
        if b < prev:
            return False
        prev = b
    return True


@dataclass
class PisaPaths:
    """Path derivation for the 7 PISA files (M9,
    /root/reference/src/lib.rs:307-338)."""

    docs: str
    freqs: str
    sizes: str
    terms: str
    documents: str
    termlex: str | None
    doclex: str | None

    @classmethod
    def from_base_path(cls, base: str, lexicons: bool = True) -> "PisaPaths":
        return cls(
            docs=base + ".docs",
            freqs=base + ".freqs",
            sizes=base + ".sizes",
            terms=base + ".terms",
            documents=base + ".documents",
            termlex=base + ".termlex" if lexicons else None,
            doclex=base + ".doclex" if lexicons else None,
        )
