"""JSONL (impact-vector documents) -> CIFF ingestion.

Mirrors the reference's ``jsonl2ciff`` semantics exactly
(/root/reference/src/lib.rs:884-1146, SURVEY.md §3.3):

* input lines ``{id: string|int, content?: string, vector: {term: f64}}``;
  float ids rejected (M7, /root/reference/src/lib.rs:859-881)
* docids assigned in first-appearance order via get-or-insert (T1)
* optional 8-bit scalar quantization: pass 0 scans the positive score
  range, then maps [min,max] -> [1,255]; without quantization scores are
  cast to int (Rust ``as i32`` truncation)
* terms with resulting tf <= 0 are dropped (M4); doclength = number of
  surviving unique terms, NOT sum of tf (§1.3 JSONL rule)
* output: Header + byte-sorted PostingsLists (postings docid-sorted,
  stable) + DocRecords in docid order

Like the reference, this path is single-pass-in-memory — it exists for
format parity and golden tests.  The scalable ingestion is the
transcripts build (ciff_ray.build); to SERVE a JSONL collection
distributed, compose ``jsonl_to_ciff`` + ``interop.bridge.ciff_to_index``.
"""

from __future__ import annotations

import json

import numpy as np

from ciff_ray.interop.convert import CiffWriter, ScoreQuantizer, find_score_range
from ciff_ray.interop.proto import CiffDocRecord, CiffHeader, CiffPostingsList


def parse_doc_id(raw) -> str:
    """id int-or-string -> string; floats and other types rejected
    (/root/reference/src/lib.rs:859-881)."""
    if isinstance(raw, str):
        return raw
    if isinstance(raw, bool):
        raise ValueError("id must be a string or a number")
    if isinstance(raw, int):
        return str(raw)
    if isinstance(raw, float):
        raise ValueError("id must be an integer")
    raise ValueError(
        "id must be a string or a number, but found an unsupported type"
    )


def _iter_docs(input_path: str):
    with open(input_path, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError as e:
                raise ValueError(f"Invalid JSON line:\n  `{line.rstrip()}`") from e
            yield parse_doc_id(obj.get("id", "")), obj.get("vector", {})


def jsonl_to_ciff(
    input_path: str,
    output_path: str,
    quantize: bool = False,
    description: str = "Converted from JSON lines",
) -> CiffHeader:
    quantizer = None
    if quantize:
        lo, hi = find_score_range(
            s for _, vec in _iter_docs(input_path) for s in vec.values()
        )
        quantizer = ScoreQuantizer(lo, hi)

    doc_records: list[CiffDocRecord] = []
    postings_map: dict[str, list[tuple[int, int]]] = {}
    docid_map: dict[str, int] = {}
    total_terms = 0

    for coll_id, vector in _iter_docs(input_path):
        docid = docid_map.get(coll_id)
        if docid is None:
            docid = len(docid_map)
            docid_map[coll_id] = docid
        doc_length = 0
        for term, score in vector.items():
            tf = quantizer.quantize(score) if quantizer else int(score)
            if tf <= 0:
                continue
            doc_length += 1
            postings_map.setdefault(term, []).append((docid, tf))
        total_terms += doc_length
        # one DocRecord per LINE, like the reference (repeat ids included)
        doc_records.append(CiffDocRecord(docid, coll_id, doc_length))

    doc_records.sort(key=lambda r: r.docid)
    num_docs = len(doc_records)
    terms = sorted(postings_map.keys(), key=lambda s: s.encode("utf-8"))

    header = CiffHeader(
        version=1,
        num_postings_lists=len(terms),
        num_docs=num_docs,
        total_postings_lists=len(terms),
        total_docs=num_docs,
        total_terms_in_collection=total_terms,
        average_doclength=total_terms / num_docs if num_docs else 0.0,
        description=description,
    )
    with CiffWriter(output_path, header) as w:
        for term in terms:
            pairs = sorted(postings_map[term], key=lambda p: p[0])  # stable
            docs = np.asarray([d for d, _ in pairs], dtype=np.int64)
            tfs = np.asarray([t for _, t in pairs], dtype=np.int64)
            w.write_postings_list(CiffPostingsList.from_absolute(term, docs, tfs))
        for rec in doc_records:
            w.write_doc_record(rec)
    return header
