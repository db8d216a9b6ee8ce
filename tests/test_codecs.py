"""Codec unit + property tests (mirrors the reference's quickcheck layer,
/root/reference/src/binary_collection.rs:427-437)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ciff_ray import codecs
from ciff_ray.schemas import CODEC_GAMMA, CODEC_VARINT


def test_delta_roundtrip():
    ids = np.array([3, 7, 8, 100, 101, 1_000_000], dtype=np.int64)
    gaps = codecs.delta_encode(ids)
    assert gaps.tolist() == [3, 4, 1, 92, 1, 999899]
    assert codecs.delta_decode(gaps).tolist() == ids.tolist()


def test_delta_empty():
    assert codecs.delta_encode(np.array([], dtype=np.int64)).size == 0
    assert codecs.delta_decode(np.array([], dtype=np.int64)).size == 0


def test_varint_known_bytes():
    assert codecs.varint_encode(np.array([0])) == b"\x00"
    assert codecs.varint_encode(np.array([1])) == b"\x01"
    assert codecs.varint_encode(np.array([127])) == b"\x7f"
    assert codecs.varint_encode(np.array([128])) == b"\x80\x01"
    assert codecs.varint_encode(np.array([300])) == b"\xac\x02"


def test_varint_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 300, 2**31, 2**63 - 1], dtype=np.uint64)
    buf = codecs.varint_encode(vals)
    out = codecs.varint_decode(buf, len(vals))
    assert out.tolist() == vals.tolist()


def test_varint_count_mismatch():
    buf = codecs.varint_encode(np.array([1, 2, 3]))
    with pytest.raises(ValueError):
        codecs.varint_decode(buf, 5)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = codecs.varint_decode(codecs.varint_encode(arr), len(arr))
    assert out.tolist() == arr.tolist()


def test_gamma_known():
    # 1 -> '1'; 2 -> '010'; 3 -> '011'; 4 -> '00100'
    assert codecs.gamma_encode(np.array([1])) == bytes([0b10000000])
    assert codecs.gamma_encode(np.array([2])) == bytes([0b01000000])
    assert codecs.gamma_encode(np.array([1, 1, 1, 1, 1, 1, 1, 1])) == bytes([0xFF])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**32 - 1), max_size=200))
def test_gamma_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = codecs.gamma_decode(codecs.gamma_encode(arr), len(arr))
    assert out.tolist() == arr.tolist()


def test_gamma_rejects_zero():
    with pytest.raises(ValueError):
        codecs.gamma_encode(np.array([0]))


def test_choose_codec_prefers_gamma_for_ones():
    ones = np.ones(1000, dtype=np.uint64)
    assert codecs.choose_codec(ones) == CODEC_GAMMA
    big = np.full(1000, 10_000_000, dtype=np.uint64)
    assert codecs.choose_codec(big) == CODEC_VARINT
    with_zero = np.array([0, 1, 2], dtype=np.uint64)
    assert codecs.choose_codec(with_zero) == CODEC_VARINT


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**20), min_size=1, max_size=100))
def test_dispatch_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    codec = codecs.choose_codec(arr)
    out = codecs.decode(codecs.encode(arr, codec), len(arr), codec)
    assert out.tolist() == arr.tolist()


# ---------------------------------------------------------------------------
# bit-packed 128-value blocks (CODEC_BP / CODEC_BPG)
# ---------------------------------------------------------------------------


def test_bp_round_trip_exhaustive_shapes():
    from ciff_ray import codecs
    from ciff_ray.schemas import CODEC_BP, CODEC_BPG

    rng = np.random.default_rng(9)
    for codec in (CODEC_BP, CODEC_BPG):
        for n in (0, 1, 2, 126, 127, 128, 129, 255, 256, 257, 1000):
            v = rng.integers(0, 2**30, size=n, dtype=np.int64).astype(np.uint64)
            buf = codecs.bp_encode(v, codec)
            assert len(buf) == codecs.bp_nbytes(v, codec), (codec, n)
            assert np.array_equal(codecs.bp_decode(buf, n, codec), v), (codec, n)
        for hi in (1, 2, 15, 255, 2**16 - 1, 2**40, 2**63, 2**64 - 1):
            v = rng.integers(0, hi, size=400, dtype=np.uint64, endpoint=True)
            rt = codecs.bp_decode(codecs.bp_encode(v, codec), 400, codec)
            assert np.array_equal(rt, v), (codec, hi)
        z = np.zeros(300, dtype=np.uint64)  # width-0 blocks
        assert np.array_equal(
            codecs.bp_decode(codecs.bp_encode(z, codec), 300, codec), z
        )


def test_bp_block_decode_matches_full_decode():
    from ciff_ray import codecs
    from ciff_ray.schemas import CODEC_BP, CODEC_BPG

    rng = np.random.default_rng(4)
    for codec, fb in ((CODEC_BP, 128), (CODEC_BPG, 127)):
        v = rng.integers(1, 300, size=1000, dtype=np.uint64)
        buf = codecs.bp_encode(v, codec)
        counts = codecs._bp_counts(v.size, fb)
        sizes = codecs.bp_block_nbytes(v, codec)
        offs = counts.size + np.concatenate([[0], np.cumsum(sizes)])
        bounds = np.concatenate([[0], np.cumsum(counts)])
        for bi in range(counts.size):
            got = codecs.bp_decode_block(
                buf, bi, int(offs[bi]), int(offs[bi + 1]), int(counts[bi])
            )
            assert np.array_equal(got, v[bounds[bi] : bounds[bi + 1]]), bi


def test_bp_width_rounding_and_size_wins():
    """Widths round UP to divisors of 64; size beats varint ~2x on the
    [128, 255] gap band (the Zipf mid-tail band varint spends 2 bytes
    on) and ~3x on dense heavy-list gaps."""
    from ciff_ray import codecs
    from ciff_ray.schemas import CODEC_BPG

    rng = np.random.default_rng(2)
    mid = rng.integers(128, 256, size=10_000, dtype=np.uint64)
    assert codecs.bp_nbytes(mid, CODEC_BPG) * 2 < codecs.varint_nbytes(mid) * 1.1
    dense = rng.integers(1, 4, size=100_000, dtype=np.uint64)
    assert codecs.bp_nbytes(dense, CODEC_BPG) * 3 < codecs.varint_nbytes(dense) * 1.2
    v = np.array([7, 1, 1], dtype=np.uint64)  # max 3 bits -> width 4
    buf = codecs.bp_encode(v, CODEC_BPG)
    assert np.frombuffer(buf, dtype=np.uint8)[0] == 4


@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=600),
    st.sampled_from([2, 3]),  # CODEC_BP, CODEC_BPG
)
@settings(max_examples=120, deadline=None)
def test_bp_round_trip_property(vals, codec):
    from ciff_ray import codecs

    v = np.array(vals, dtype=np.uint64)
    buf = codecs.bp_encode(v, codec)
    assert len(buf) == codecs.bp_nbytes(v, codec)
    assert np.array_equal(codecs.bp_decode(buf, v.size, codec), v)
