"""Arbitrary-bytes robustness fuzzing of the PISA binary-collection and
payload-vector (lexicon) parsers.

Analogue of the reference's quickcheck property that sequence access
never crashes on arbitrary input
(/root/reference/src/binary_collection.rs:427-437).  Contract: on ANY
byte buffer the parsers either succeed or raise a *controlled* error
(InvalidFormat for malformed buffers, IndexError for out-of-range
access) — never an uncontrolled numpy/struct exception, hang, or
huge allocation.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ciff_ray.interop import pisaio
from ciff_ray.interop.pisaio import InvalidFormat

CONTROLLED = (InvalidFormat, IndexError)


@given(st.binary(max_size=512))
@settings(max_examples=300, deadline=None)
def test_binary_collection_iter_never_crashes(buf):
    try:
        seqs = list(pisaio.BinaryCollection(buf))
    except CONTROLLED:
        return
    # success path: every sequence is a u32 view into the buffer
    total = sum(1 + s.size for s in seqs)
    assert total * 4 == len(buf)


@given(st.binary(max_size=512), st.lists(st.integers(-10, 1000), max_size=20))
@settings(max_examples=300, deadline=None)
def test_random_access_get_never_crashes(buf, indices):
    try:
        coll = pisaio.RandomAccessBinaryCollection(buf)
    except CONTROLLED:
        return
    for i in indices:
        try:
            seq = coll.get(i)
        except CONTROLLED:
            continue
        assert seq.dtype == np.dtype("<u4")


@given(st.binary(max_size=512), st.lists(st.integers(-10, 1000), max_size=20))
@settings(max_examples=300, deadline=None)
def test_payload_slice_never_crashes(buf, indices):
    try:
        lex = pisaio.PayloadSlice(buf)
    except CONTROLLED:
        return
    assert len(lex) >= 0
    for i in indices:
        try:
            payload = lex[i]
        except CONTROLLED:
            continue
        assert isinstance(payload, bytes)


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_sizes_and_doc_count_never_crash(buf):
    try:
        pisaio.sizes(buf)
    except CONTROLLED:
        pass
    try:
        pisaio.read_document_count(pisaio.BinaryCollection(buf))
    except CONTROLLED:
        pass


@given(st.lists(st.binary(max_size=32), max_size=50))
@settings(max_examples=200, deadline=None)
def test_payload_vector_round_trip(items):
    buf = pisaio.build_payload_vector(items)
    lex = pisaio.PayloadSlice(buf)
    assert len(lex) == len(items)
    assert [lex[i] for i in range(len(lex))] == [bytes(x) for x in items]


# -- CIFF protobuf parsers: same controlled-error contract ------------------

from ciff_ray.interop.proto import (
    CiffDocRecord,
    CiffHeader,
    CiffPostingsList,
)

PROTO_CONTROLLED = (ValueError, IndexError, UnicodeDecodeError)


@given(st.binary(max_size=256))
@settings(max_examples=400, deadline=None)
def test_ciff_message_parse_never_crashes(buf):
    """Arbitrary bytes -> parse succeeds or raises a controlled error
    (never struct.error / numpy internals / huge allocations)."""
    for cls in (CiffHeader, CiffPostingsList, CiffDocRecord):
        try:
            cls.parse(buf)
        except PROTO_CONTROLLED:
            pass


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_ciff_header_parse_round_trips_or_rejects(buf):
    """If garbage parses as a header AND validates, re-serializing and
    re-parsing must be a fixed point for the known fields."""
    try:
        h = CiffHeader.parse(buf)
        h.validate()
    except PROTO_CONTROLLED:
        return
    h2 = CiffHeader.parse(h.serialize())
    assert vars(h2) == vars(h)


# -- batch DocRecord serialization ------------------------------------------


@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**50),
        st.text(max_size=40),
        st.integers(min_value=0, max_value=2**40),
    ),
    max_size=60,
))
def test_serialize_doc_records_byte_identical(recs):
    """Vectorized batch encode == per-record serialize + frame, byte for
    byte (incl. proto3 default omission and unicode payloads)."""
    import numpy as np
    import pyarrow as pa

    from ciff_ray.interop.proto import (
        CiffDocRecord,
        serialize_doc_records,
        write_varint,
    )

    want = bytearray()
    for d, c, l in recs:
        b = CiffDocRecord(d, c, l).serialize()
        write_varint(want, len(b))
        want += b
    got = serialize_doc_records(
        np.array([r[0] for r in recs], dtype=np.int64),
        pa.array([r[1] for r in recs], type=pa.string()),
        np.array([r[2] for r in recs], dtype=np.int64),
    )
    assert got == bytes(want)
