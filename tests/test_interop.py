"""CIFF/PISA interop golden tests.

The golden fixture is the reference's own toy collection
(/root/reference/tests/test_data/toy-complete-20200309.ciff) and the
expected output bytes are the ones asserted in the reference's
end-to-end test (/root/reference/tests/toy.rs:10-86, :145-226) — our
converters must produce byte-identical PISA files.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ciff_ray.interop import (
    CiffReader,
    CiffToPisa,
    PisaToCiff,
    ScoreQuantizer,
    jsonl_to_ciff,
)
from ciff_ray.interop import pisaio
from ciff_ray.interop.convert import reorder_pisa_index

TOY = "/root/reference/tests/test_data/toy-complete-20200309.ciff"
TERMS_TXT = "/root/reference/tests/test_data/terms.txt"
TERMS_LEX = "/root/reference/tests/test_data/terms.lex"

TOY_TERMS = ["01", "03", "30", "content", "enough", "head", "simpl", "text", "veri"]


def u32s(*vals) -> bytes:
    return struct.pack(f"<{len(vals)}I", *vals)


# expected golden bytes (tests/toy.rs:57-86)
TOY_DOCS = (
    u32s(1, 3)
    + u32s(1, 0)
    + u32s(1, 0)
    + u32s(1, 0)
    + u32s(1, 0)
    + u32s(1, 2)
    + u32s(3, 0, 1, 2)
    + u32s(2, 1, 2)
    + u32s(3, 0, 1, 2)
    + u32s(1, 1)
)
TOY_FREQS = (
    u32s(1, 1)
    + u32s(1, 1)
    + u32s(1, 1)
    + u32s(1, 1)
    + u32s(1, 1)
    + u32s(3, 1, 1, 1)
    + u32s(2, 1, 1)
    + u32s(3, 1, 1, 3)
    + u32s(1, 1)
)
TOY_SIZES = u32s(3, 6, 4, 6)


def test_toy_header():
    r = CiffReader(TOY)
    h = r.header
    assert h.num_docs == 3
    assert h.num_postings_lists == 9
    assert h.total_terms_in_collection == 16
    assert h.average_doclength == pytest.approx(16 / 3)


def test_ciff_to_pisa_golden(tmp_path):
    base = str(tmp_path / "coll")
    CiffToPisa().input_path(TOY).output_paths(base).convert()
    p = pisaio.PisaPaths.from_base_path(base)
    assert open(p.documents).read() == "WSJ_1\nTREC_DOC_1\nDOC222\n"
    assert open(p.sizes, "rb").read() == TOY_SIZES
    assert open(p.terms).read().splitlines() == TOY_TERMS
    assert open(p.docs, "rb").read() == TOY_DOCS
    assert open(p.freqs, "rb").read() == TOY_FREQS
    # lexicons decode to the term/title lists (tests/toy.rs:24-55)
    termlex = pisaio.PayloadSlice(open(p.termlex, "rb").read())
    assert [b.decode() for b in termlex] == TOY_TERMS
    doclex = pisaio.PayloadSlice(open(p.doclex, "rb").read())
    assert [b.decode() for b in doclex] == ["WSJ_1", "TREC_DOC_1", "DOC222"]


def test_skip_lexicons(tmp_path):
    base = str(tmp_path / "coll")
    CiffToPisa().input_path(TOY).output_paths(base).skip_lexicons().convert()
    import os

    assert not os.path.exists(base + ".termlex")
    assert not os.path.exists(base + ".doclex")


def test_lexicon_golden_bytes(tmp_path):
    """build_lexicon(terms.txt) must be byte-identical to the golden
    terms.lex (/root/reference/src/payload_vector.rs:277-353)."""
    out = str(tmp_path / "terms.lex")
    pisaio.build_lexicon(TERMS_TXT, out)
    assert open(out, "rb").read() == open(TERMS_LEX, "rb").read()


def test_round_trip_ciff_pisa_ciff(tmp_path):
    """CIFF->PISA->CIFF->PISA with PISA file equality (tests/toy.rs:88-143)."""
    base = str(tmp_path / "coll")
    CiffToPisa().input_path(TOY).output_paths(base).convert()
    ciff2 = str(tmp_path / "ciff")
    PisaToCiff().index_paths(base).output_path(ciff2).convert()
    copy = str(tmp_path / "copy")
    CiffToPisa().input_path(ciff2).output_paths(copy).convert()
    for suffix in (".sizes", ".terms", ".documents", ".docs", ".freqs"):
        assert (
            open(base + suffix, "rb").read() == open(copy + suffix, "rb").read()
        ), suffix


def test_reorder_terms(tmp_path):
    """Scrambled terms file -> conversion restores byte-sorted order with
    permuted postings (tests/toy.rs:145-226)."""
    base = str(tmp_path / "coll")
    CiffToPisa().input_path(TOY).output_paths(base).convert()
    with open(base + ".terms", "w") as f:
        f.write("\n".join(reversed(TOY_TERMS)))
    ciff2 = str(tmp_path / "ciff")
    (
        PisaToCiff()
        .index_paths(base)
        .terms_path(base + ".terms")
        .titles_path(base + ".documents")
        .output_path(ciff2)
        .convert()
    )
    copy = str(tmp_path / "copy")
    CiffToPisa().input_path(ciff2).output_paths(copy).convert()
    assert open(copy + ".documents").read() == "WSJ_1\nTREC_DOC_1\nDOC222\n"
    assert open(copy + ".terms").read().splitlines() == TOY_TERMS
    expected_docs = (
        u32s(1, 3)
        + u32s(1, 1)
        + u32s(3, 0, 1, 2)
        + u32s(2, 1, 2)
        + u32s(3, 0, 1, 2)
        + u32s(1, 2)
        + u32s(1, 0)
        + u32s(1, 0)
        + u32s(1, 0)
        + u32s(1, 0)
    )
    expected_freqs = (
        u32s(1, 1)
        + u32s(3, 1, 1, 3)
        + u32s(2, 1, 1)
        + u32s(3, 1, 1, 1)
        + u32s(1, 1)
        + u32s(1, 1)
        + u32s(1, 1)
        + u32s(1, 1)
        + u32s(1, 1)
    )
    assert open(copy + ".docs", "rb").read() == expected_docs
    assert open(copy + ".freqs", "rb").read() == expected_freqs


def test_binary_collection_random_access():
    buf = u32s(2, 5, 7) + u32s(0) + u32s(3, 1, 2, 3)
    coll = pisaio.RandomAccessBinaryCollection(buf)
    assert len(coll) == 3
    assert coll.get(0).tolist() == [5, 7]
    assert coll.get(1).tolist() == []
    assert coll.get(2).tolist() == [1, 2, 3]
    with pytest.raises(pisaio.InvalidFormat):
        pisaio.RandomAccessBinaryCollection(buf[:-2])  # not /4
    with pytest.raises(pisaio.InvalidFormat):
        pisaio.RandomAccessBinaryCollection(u32s(5, 1))  # truncated


# -- quantizer (mirrors /root/reference/src/lib.rs:1316-1467) ---------------


def test_quantizer_basic():
    q = ScoreQuantizer(1.0, 100.0)
    assert q.quantize(0.0) == 0
    assert q.quantize(-5.0) == 0
    assert q.quantize(1.0) == 1
    assert q.quantize(100.0) == 255
    assert 1 <= q.quantize(50.0) <= 255


def test_quantizer_identical_min_max():
    # doc comment says max, code returns MIN_QUANTIZED_VALUE = 1:
    # follow the code (/root/reference/src/lib.rs:138-140)
    q = ScoreQuantizer(5.0, 5.0)
    assert q.quantize(5.0) == 1
    assert q.quantize(0.0) == 0


def test_quantizer_clamp_out_of_range():
    q = ScoreQuantizer(10.0, 20.0)
    assert q.quantize(5.0) == 1  # below min clamps to 1 (positive score)
    assert q.quantize(25.0) == 255


def test_quantizer_invalid_ranges():
    for lo, hi in [(0.0, 1.0), (-1.0, 1.0), (1.0, 0.0), (1.0, -2.0), (2.0, 1.0)]:
        with pytest.raises(ValueError):
            ScoreQuantizer(lo, hi)


def test_quantizer_array_matches_scalar():
    q = ScoreQuantizer(0.5, 9.5)
    xs = np.array([-1.0, 0.0, 0.25, 0.5, 3.3, 9.5, 12.0])
    assert q.quantize_array(xs).tolist() == [q.quantize(x) for x in xs]


# -- JSONL ingestion --------------------------------------------------------


def _write_jsonl(path, lines):
    import json

    with open(path, "w") as f:
        for obj in lines:
            f.write(json.dumps(obj) + "\n")


def test_jsonl_to_ciff(tmp_path):
    src = str(tmp_path / "docs.jsonl")
    _write_jsonl(
        src,
        [
            {"id": "d1", "vector": {"b": 2.0, "a": 3.0, "zero": 0.0}},
            {"id": 7, "vector": {"a": 1.0}},
            {"id": "d3", "vector": {"c": 5.0, "neg": -1.0}},
        ],
    )
    out = str(tmp_path / "out.ciff")
    h = jsonl_to_ciff(src, out)
    assert h.num_docs == 3
    assert h.num_postings_lists == 3  # a, b, c (zero/neg dropped)
    assert h.total_terms_in_collection == 4  # unique surviving terms per doc
    r = CiffReader(out)
    lists = {pl.term: pl for pl in r.postings_lists()}
    assert sorted(lists.keys()) == ["a", "b", "c"]
    assert lists["a"].doc_ids().tolist() == [0, 1]
    assert lists["a"].tfs.tolist() == [3, 1]
    assert lists["c"].doc_ids().tolist() == [2]
    recs = list(r.doc_records())
    assert [x.collection_docid for x in recs] == ["d1", "7", "d3"]
    assert [x.doclength for x in recs] == [2, 1, 1]


def test_jsonl_quantized(tmp_path):
    src = str(tmp_path / "docs.jsonl")
    _write_jsonl(
        src,
        [
            {"id": "x", "vector": {"t1": 1.0, "t2": 100.0}},
            {"id": "y", "vector": {"t1": 50.5}},
        ],
    )
    out = str(tmp_path / "q.ciff")
    jsonl_to_ciff(src, out, quantize=True)
    lists = {pl.term: pl for pl in CiffReader(out).postings_lists()}
    assert lists["t1"].tfs.tolist()[0] == 1  # min -> 1
    assert lists["t2"].tfs.tolist() == [255]  # max -> 255
    q = ScoreQuantizer(1.0, 100.0)
    assert lists["t1"].tfs.tolist()[1] == q.quantize(50.5)


def test_jsonl_float_id_rejected(tmp_path):
    src = str(tmp_path / "bad.jsonl")
    _write_jsonl(src, [{"id": 1.5, "vector": {"a": 1.0}}])
    with pytest.raises(ValueError, match="integer"):
        jsonl_to_ciff(src, str(tmp_path / "o.ciff"))


def test_jsonl_no_positive_scores_quantize(tmp_path):
    src = str(tmp_path / "bad.jsonl")
    _write_jsonl(src, [{"id": "a", "vector": {"t": 0.0}}])
    with pytest.raises(ValueError, match="No valid scores"):
        jsonl_to_ciff(src, str(tmp_path / "o.ciff"), quantize=True)


def test_header_display_parity():
    # mirrors the reference's test_display_header
    # (/root/reference/src/proto/mod.rs:36-64)
    from ciff_ray.interop.proto import CiffHeader

    h = CiffHeader(
        version=1,
        num_postings_lists=13,
        num_docs=39,
        total_postings_lists=399,
        total_docs=200,
        total_terms_in_collection=888,
        average_doclength=12.7,
        description="Test description",
    )
    assert str(h) == (
        "----- CIFF HEADER -----\n"
        "Version: 1\n"
        "No. Postings Lists: 13\n"
        "Total Postings Lists: 399\n"
        "No. Documents: 39\n"
        "Total Documents: 200\n"
        "Total Terms in Collection 888\n"
        "Average Document Length: 12.7\n"
        "Description: Test description\n"
        "-----------------------"
    )
    # Rust's {} omits the trailing .0 on integral f64
    assert "Average Document Length: 5\n" in str(
        CiffHeader(average_doclength=5.0)
    )
