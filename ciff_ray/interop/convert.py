"""CIFF <-> PISA converters + score quantizer.

Functional re-implementations of the reference's three converters with
identical validation and ordering semantics:

* :class:`CiffToPisa`  — /root/reference/src/lib.rs:376-465 (builder),
  :487-569 (convert_to_pisa): streaming postings decode (d-gap prefix
  sum), dense-docid doc-record pass, sorted-terms check with full
  reorder repair, lexicon build.
* :class:`PisaToCiff`  — /root/reference/src/lib.rs:681-840: stats pass
  (header), postings pass (3-way zip + re-delta-encode + df/cf), doc
  pass.
* :class:`ScoreQuantizer` / :func:`find_score_range` —
  /root/reference/src/lib.rs:94-148, :922-957.  NOTE the doc comment in
  the reference says min==max maps to the max value, but the code
  returns MIN_QUANTIZED_VALUE — we follow the code (SURVEY.md §2.3 M6).

These run on the driver: a CIFF file is a single sequential
length-delimited stream, so its (de)serialization is inherently serial;
the *distributed* paths in/out of this format are
``ciff_ray.interop.bridge`` (CIFF -> ciff_ray index -> Ray query
engine, and Ray-built index -> CIFF export).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ciff_ray.interop import pisaio
from ciff_ray.interop.proto import (
    CiffDocRecord,
    CiffHeader,
    CiffPostingsList,
    read_delimited,
    write_delimited,
)

MIN_QUANTIZED_VALUE = 1
MAX_QUANTIZED_VALUE = 255


@dataclass
class ScoreQuantizer:
    """Linear [min,max] -> [1,255] quantizer (M6,
    /root/reference/src/lib.rs:94-148)."""

    min: float
    max: float

    def __post_init__(self):
        if self.min <= 0.0:
            raise ValueError(f"min must be greater than 0, got {self.min}")
        if self.max <= 0.0:
            raise ValueError(f"max must be greater than 0, got {self.max}")
        if self.max < self.min:
            raise ValueError(f"max ({self.max}) must be >= min ({self.min})")

    def quantize(self, score: float) -> int:
        if score <= 0.0:
            return 0  # will be filtered out
        if self.min == self.max:
            return MIN_QUANTIZED_VALUE  # follow the code, not the doc comment
        normalized = (score - self.min) / (self.max - self.min)
        qrange = MAX_QUANTIZED_VALUE - MIN_QUANTIZED_VALUE
        quantized = int(_round_half_away(normalized * qrange + MIN_QUANTIZED_VALUE))
        return min(max(quantized, MIN_QUANTIZED_VALUE), MAX_QUANTIZED_VALUE)

    def quantize_array(self, scores: np.ndarray) -> np.ndarray:
        """Vectorized quantize for the Ray ingestion path."""
        scores = np.asarray(scores, dtype=np.float64)
        if self.min == self.max:
            out = np.where(scores <= 0.0, 0, MIN_QUANTIZED_VALUE)
            return out.astype(np.int32)
        normalized = (scores - self.min) / (self.max - self.min)
        qrange = MAX_QUANTIZED_VALUE - MIN_QUANTIZED_VALUE
        vals = normalized * qrange + MIN_QUANTIZED_VALUE
        # Rust f64::round = round half away from zero (not banker's)
        q = np.sign(vals) * np.floor(np.abs(vals) + 0.5)
        q = np.clip(q, MIN_QUANTIZED_VALUE, MAX_QUANTIZED_VALUE).astype(np.int32)
        return np.where(scores <= 0.0, 0, q)


def _round_half_away(x: float) -> float:
    """Rust ``f64::round`` rounds half away from zero; Python ``round``
    is banker's rounding, so do it explicitly."""
    return np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5)


def find_score_range(scores_iter) -> tuple[float, float]:
    """Min/max over positive scores only (A7,
    /root/reference/src/lib.rs:922-957)."""
    lo, hi = np.inf, -np.inf
    for s in scores_iter:
        if s > 0.0:
            lo = min(lo, s)
            hi = max(hi, s)
    if not np.isfinite(lo) or not np.isfinite(hi):
        raise ValueError("No valid scores found for quantization")
    return lo, hi


# -- CIFF file stream -------------------------------------------------------


class CiffReader:
    """Streaming reader over a CIFF file: header, then generators for
    posting lists and doc records (S1/S2/S3)."""

    def __init__(self, path: str):
        self.buf = pisaio.mmap_file(path)
        msg, pos = read_delimited(self.buf, 0)
        self.header = CiffHeader.parse(msg)
        self._postings_start = pos

    def postings_lists(self):
        pos = self._postings_start
        for _ in range(self.header.num_postings_lists):
            msg, pos = read_delimited(self.buf, pos)
            yield CiffPostingsList.parse(msg)
        self._docs_start = pos

    def doc_records(self):
        pos = getattr(self, "_docs_start", None)
        if pos is None:
            for _ in self.postings_lists():
                pass
            pos = self._docs_start
        for _ in range(self.header.num_docs):
            msg, pos = read_delimited(self.buf, pos)
            yield CiffDocRecord.parse(msg)

    def postings_chunks(self, target_msgs: int = 4096) -> list[tuple[int, int]]:
        """Boundary scan WITHOUT parsing: walk the length-delimited
        postings section (one varint + skip per message) and return
        (byte_pos, n_messages) chunks of ~target_msgs messages each —
        the split points that let Ray tasks decode the protobuf stream
        in parallel (the scan is the only inherently sequential part of
        the format).  Also fixes _docs_start so doc_records() needs no
        second postings pass."""
        from ciff_ray.interop.proto import read_varint

        pos = self._postings_start
        chunks: list[tuple[int, int]] = []
        n = self.header.num_postings_lists
        i = 0
        while i < n:
            cnt = min(target_msgs, n - i)
            start = pos
            for _ in range(cnt):
                ln, p2 = read_varint(self.buf, pos)
                pos = p2 + ln
            chunks.append((start, cnt))
            i += cnt
        self._docs_start = pos
        return chunks


class CiffWriter:
    """Sequential CIFF writer: header first, then lists, then records
    (K4/K5/K6 composition)."""

    def __init__(self, path: str, header: CiffHeader):
        self._fh = open(path, "wb")
        write_delimited(self._fh, header.serialize())

    def write_postings_list(self, pl: CiffPostingsList) -> None:
        write_delimited(self._fh, pl.serialize())

    def write_doc_record(self, rec: CiffDocRecord) -> None:
        write_delimited(self._fh, rec.serialize())

    def write_serialized(self, payload: bytes) -> None:
        """Append pre-framed message bytes (e.g. a
        proto.serialize_doc_records batch) verbatim."""
        self._fh.write(payload)

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# -- CIFF -> PISA -----------------------------------------------------------


class CiffToPisa:
    """Fluent builder mirroring /root/reference/src/lib.rs:376-465."""

    def __init__(self):
        self._input: str | None = None
        self._paths: pisaio.PisaPaths | None = None
        self._lexicons = True

    def input_path(self, path: str) -> "CiffToPisa":
        self._input = path
        return self

    def output_paths(self, base: str) -> "CiffToPisa":
        self._base = base
        return self

    def skip_lexicons(self) -> "CiffToPisa":
        self._lexicons = False
        return self

    def convert(self) -> None:
        if self._input is None or getattr(self, "_base", None) is None:
            raise ValueError("input and output paths are required")
        paths = pisaio.PisaPaths.from_base_path(self._base, lexicons=self._lexicons)
        reader = CiffReader(self._input)
        header = reader.header

        with open(paths.docs, "wb") as docs, open(paths.freqs, "wb") as freqs, open(
            paths.terms, "w", encoding="utf-8"
        ) as terms:
            # prelude: singleton [num_docs] (/root/reference/src/lib.rs:500)
            docs.write(pisaio.encode_u32_sequence([header.num_docs]))
            for pl in reader.postings_lists():
                # d-gap prefix-sum decode -> absolute ascending docids (M1)
                docs.write(pisaio.encode_u32_sequence(pl.doc_ids()))
                freqs.write(pisaio.encode_u32_sequence(pl.tfs))
                terms.write(pl.term + "\n")

        with open(paths.sizes, "wb") as sizes_f, open(
            paths.documents, "w", encoding="utf-8"
        ) as titles:
            sizes_f.write(np.uint32(header.num_docs).tobytes())
            for docs_seen, rec in enumerate(reader.doc_records()):
                if rec.docid != docs_seen:
                    # /root/reference/src/lib.rs:545-546
                    raise ValueError("Document sizes must come in order")
                sizes_f.write(np.uint32(rec.doclength).tobytes())
                titles.write(rec.collection_docid + "\n")

        with open(paths.terms, encoding="utf-8") as f:
            if not pisaio.check_lines_sorted(line.rstrip("\n") for line in f):
                reorder_pisa_index(paths)

        if self._lexicons:
            pisaio.build_lexicon(paths.terms, paths.termlex)
            pisaio.build_lexicon(paths.documents, paths.doclex)


def _reorder_postings(path: str, order, skip_first: bool) -> None:
    tmp = path + ".reorder.tmp"
    os.replace(path, tmp)
    buf = pisaio.mmap_file(tmp)
    coll = pisaio.RandomAccessBinaryCollection(buf)
    if skip_first:
        order = [0] + [i + 1 for i in order]
    with open(path, "wb") as fh:
        pisaio.reorder(coll, order, fh)
    del buf
    os.remove(tmp)


def reorder_pisa_index(paths: pisaio.PisaPaths) -> None:
    """Permute the whole index to byte-wise term order (O1,
    /root/reference/src/lib.rs:359-372)."""
    with open(paths.terms, encoding="utf-8") as f:
        terms = [line.rstrip("\n") for line in f]
    order = sorted(range(len(terms)), key=lambda i: terms[i].encode("utf-8"))
    _reorder_postings(paths.docs, order, skip_first=True)
    _reorder_postings(paths.freqs, order, skip_first=False)
    with open(paths.terms, "w", encoding="utf-8") as f:
        for i in order:
            f.write(terms[i] + "\n")


# -- PISA -> CIFF -----------------------------------------------------------


class PisaToCiff:
    """Fluent builder mirroring /root/reference/src/lib.rs:681-807."""

    def __init__(self):
        self._description = "CIFF exported from ciff_ray"
        self._docs = self._freqs = self._sizes = None
        self._terms = self._titles = self._output = None

    def index_paths(self, base: str) -> "PisaToCiff":
        self._docs = base + ".docs"
        self._freqs = base + ".freqs"
        self._sizes = base + ".sizes"
        if self._terms is None:
            self._terms = base + ".terms"
        if self._titles is None:
            self._titles = base + ".documents"
        return self

    def terms_path(self, path: str) -> "PisaToCiff":
        self._terms = path
        return self

    def titles_path(self, path: str) -> "PisaToCiff":
        self._titles = path
        return self

    def output_path(self, path: str) -> "PisaToCiff":
        self._output = path
        return self

    def description(self, d: str) -> "PisaToCiff":
        self._description = d
        return self

    def convert(self) -> None:
        if None in (self._docs, self._freqs, self._sizes, self._output):
            raise ValueError("index, terms, titles and output paths are required")
        docs_buf = pisaio.mmap_file(self._docs)
        freqs_buf = pisaio.mmap_file(self._freqs)
        sizes_buf = pisaio.mmap_file(self._sizes)

        header = _pisa_header(docs_buf, sizes_buf, self._description)
        with open(self._output, "wb") as out_fh:
            write_delimited(out_fh, header.serialize())

            # postings pass: docs x freqs x terms zip (J1), re-delta (M2)
            docs_coll = pisaio.BinaryCollection(docs_buf)
            pisaio.read_document_count(docs_coll)
            freqs_coll = pisaio.BinaryCollection(freqs_buf)
            with open(self._terms, encoding="utf-8") as terms_f:
                for term_docs, term_freqs, term in zip(
                    docs_coll, freqs_coll, (l.rstrip("\n") for l in terms_f)
                ):
                    pl = CiffPostingsList.from_absolute(
                        term,
                        term_docs.astype(np.int64),
                        term_freqs.astype(np.int64),
                    )
                    write_delimited(out_fh, pl.serialize())

            # doc pass: sizes x titles zip + enumerate (J2)
            doclens = pisaio.sizes(sizes_buf)
            with open(self._titles, encoding="utf-8") as titles_f:
                for docid, (size, title) in enumerate(
                    zip(doclens, (l.rstrip("\n") for l in titles_f))
                ):
                    write_delimited(
                        out_fh,
                        CiffDocRecord(docid, title, int(size)).serialize(),
                    )


def _pisa_header(docs_buf, sizes_buf, description: str) -> CiffHeader:
    """Stats pass (K4, /root/reference/src/lib.rs:583-619)."""
    coll = pisaio.BinaryCollection(docs_buf)
    num_documents = pisaio.read_document_count(coll)
    num_postings_lists = sum(1 for _ in coll)
    doclen_sum = int(pisaio.sizes(sizes_buf).astype(np.int64).sum())
    return CiffHeader(
        version=1,
        num_postings_lists=num_postings_lists,
        num_docs=num_documents,
        total_postings_lists=num_postings_lists,
        total_docs=num_documents,
        total_terms_in_collection=doclen_sum,
        average_doclength=doclen_sum / num_documents if num_documents else 0.0,
        description=description,
    )


# deprecated-style function API kept for parity with the reference
# (/root/reference/src/lib.rs:477-485, :792-807)
def ciff_to_pisa(input_path: str, output_base: str) -> None:
    CiffToPisa().input_path(input_path).output_paths(output_base).convert()


def pisa_to_ciff(base: str, output_path: str, description: str = "") -> None:
    b = PisaToCiff().index_paths(base).output_path(output_path)
    if description:
        b.description(description)
    b.convert()
