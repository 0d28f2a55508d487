"""Golden-vector + property tests for the RLEv1 family.

The golden byte vectors are the reference's own encoder unit tests,
re-expressed as pytest assertions (SURVEY.md section 5.1):
- ByteRLE:    /root/reference/src/writer/encoder/byte_rle.rs:106-118
- BooleanRLE: /root/reference/src/writer/encoder/boolean_rle.rs:74-79
- IntRLEv1:   /root/reference/src/writer/encoder/int_rle_v1.rs:166-200
- Varint:     /root/reference/src/writer/encoder/varint.rs:117-144
"""

import numpy as np
import pytest

from orc_format_spark.codecs.blocks import compress_stream, decompress_stream
from orc_format_spark.codecs.rle_v1 import (
    decode_boolean_rle,
    decode_byte_rle,
    decode_int_rle_v1,
    encode_boolean_rle,
    encode_byte_rle,
    encode_int_rle_v1,
)
from orc_format_spark.codecs.varint import (
    decode_varints,
    encode_varints,
    zigzag_decode,
    zigzag_encode,
)

RNG = np.random.default_rng(42)


# ------------------------------------------------------------- golden vectors

BYTE_RLE_GOLDEN = [
    ([], []),
    ([10], [255, 10]),
    ([10, 20, 30], [253, 10, 20, 30]),
    ([10, 10, 10], [0, 10]),
    ([10, 20, 20, 20, 20], [255, 10, 1, 20]),
    ([10, 10, 10, 10, 10, 20, 30], [2, 10, 254, 20, 30]),
    ([10, 20, 20, 30], [252, 10, 20, 20, 30]),
    ([10] * 131, [127, 10, 255, 10]),
    (list(range(140)), [128] + list(range(128)) + [244] + list(range(128, 140))),
]

BOOLEAN_RLE_GOLDEN = [
    ([], []),
    (
        [True, False, True, False, True, False, False, False, True],
        [254, 0b10101000, 0b10000000],
    ),
    ([False] * 80, [7, 0]),
]

SIGNED_INT_RLE_GOLDEN = [
    ([], []),
    ([10], [255, 20]),
    ([0, -1, 1, -2, 2], [251, 0, 1, 2, 3, 4]),
    ([10, 10, 10, 10], [1, 0, 20]),
    ([10, 15, 20, 25], [1, 5, 20]),
    ([10, 15, 20, 25, 0], [1, 5, 20, 255, 0]),
]

UNSIGNED_INT_RLE_GOLDEN = [
    ([7] * 100, [97, 0, 7]),
]

VARINT_U64_GOLDEN = [
    (0, [0x00]),
    (1, [0x01]),
    (127, [0x7F]),
    (128, [0x80, 0x01]),
    (129, [0x81, 0x01]),
    (16383, [0xFF, 0x7F]),
    (16384, [0x80, 0x80, 0x01]),
    (16385, [0x81, 0x80, 0x01]),
]

VARINT_I64_ZIGZAG_GOLDEN = [(0, [0]), (-1, [1]), (1, [2]), (-2, [3]), (2, [4])]


@pytest.mark.parametrize("inp,expected", BYTE_RLE_GOLDEN)
def test_byte_rle_golden(inp, expected):
    got = encode_byte_rle(np.array(inp, np.uint8))
    assert list(got) == expected
    assert decode_byte_rle(got).tolist() == inp


@pytest.mark.parametrize("inp,expected", BOOLEAN_RLE_GOLDEN)
def test_boolean_rle_golden(inp, expected):
    got = encode_boolean_rle(np.array(inp, bool))
    assert list(got) == expected
    assert decode_boolean_rle(got, len(inp)).tolist() == inp


@pytest.mark.parametrize("inp,expected", SIGNED_INT_RLE_GOLDEN)
def test_signed_int_rle_v1_golden(inp, expected):
    got = encode_int_rle_v1(np.array(inp, np.int64), signed=True)
    assert list(got) == expected
    assert decode_int_rle_v1(got, signed=True).tolist() == inp


@pytest.mark.parametrize("inp,expected", UNSIGNED_INT_RLE_GOLDEN)
def test_unsigned_int_rle_v1_golden(inp, expected):
    got = encode_int_rle_v1(np.array(inp, np.uint64), signed=False)
    assert list(got) == expected
    assert decode_int_rle_v1(got, signed=False).tolist() == inp


def test_varint_u64_golden():
    for val, expected in VARINT_U64_GOLDEN:
        b, off = encode_varints(np.array([val], np.uint64))
        assert b.tolist() == expected
        back, consumed = decode_varints(b)
        assert back.tolist() == [val] and consumed == len(expected)


def test_varint_i64_zigzag_golden():
    for val, expected in VARINT_I64_ZIGZAG_GOLDEN:
        zz = zigzag_encode(np.array([val], np.int64))
        b, _ = encode_varints(zz)
        assert b.tolist() == expected
        assert zigzag_decode(decode_varints(b)[0]).tolist() == [val]


# --------------------------------------------------- reference state machine


class _RefIntRLEv1:
    """Direct value-at-a-time transcription of the int_rle_v1.rs:49-97
    state machine, used as a differential-test oracle for the vectorized
    encoder (never in production paths)."""

    def __init__(self, signed):
        self.signed = signed
        self.out = bytearray()
        self.buf = []
        self.run_len = 0
        self.last_val = 0
        self.delta = 0

    def _varint(self, x):
        if self.signed:
            x = ((x << 1) ^ (x >> 63)) & 0xFFFFFFFFFFFFFFFF
        while True:
            if x < 0x80:
                self.out.append(x)
                return
            self.out.append(0x80 | (x & 0x7F))
            x >>= 7

    def _wrap(self, x):
        x &= 0xFFFFFFFFFFFFFFFF
        if self.signed and x >= 1 << 63:
            x -= 1 << 64
        return x

    def _finish_group(self):
        if self.run_len > 0:
            self.out.append(self.run_len - 3)
            self.out.append(self.delta & 0xFF)
            self._varint(self.buf[0])
            self.buf.clear()
            self.run_len = 0
        elif self.buf:
            self.out.append((-len(self.buf)) & 0xFF)
            for x in self.buf:
                self._varint(x)
            self.buf.clear()

    def write(self, x):
        if len(self.buf) == 128 or self.run_len == 130:
            self._finish_group()
        if self.run_len > 0:
            if self._wrap(x - self.last_val) == self.delta:
                self.run_len += 1
            else:
                self._finish_group()
                self.buf.append(x)
        else:
            if not self.buf:
                self.buf.append(x)
                return
            delta = self._wrap(x - self.buf[-1])
            if len(self.buf) >= 2 and delta == self.delta and -128 <= self._as_i64(delta) < 128:
                y = self.buf[-2]
                del self.buf[-2:]
                self._finish_group()
                self.run_len = 3
                self.buf.append(y)
            else:
                self.buf.append(x)
                self.delta = delta
        self.last_val = x

    @staticmethod
    def _as_i64(x):
        x &= 0xFFFFFFFFFFFFFFFF
        return x - (1 << 64) if x >= 1 << 63 else x

    def finish(self):
        self._finish_group()
        return bytes(self.out)


def _ref_encode(values, signed):
    m = _RefIntRLEv1(signed)
    for x in values:
        m.write(int(x))
    return m.finish()


def _cases_int(signed):
    lo, hi = (-(2**31), 2**31) if signed else (0, 2**32)
    dt = np.int64 if signed else np.uint64
    yield np.array([], dt)
    yield np.array([5], dt)
    yield RNG.integers(lo, hi, 1000).astype(dt)
    yield RNG.integers(0, 5, 1000).astype(dt)  # short runs
    yield np.repeat(RNG.integers(0, 100, 50), RNG.integers(1, 60, 50)).astype(dt)
    yield np.arange(0, 5000, 3, dtype=dt)  # long delta run
    yield np.concatenate(
        [np.full(137, 9, dt), np.arange(200, dtype=dt), RNG.integers(0, 2, 500).astype(dt)]
    )
    # run pattern straddling the 128-literal cap (the "stranding" quirk)
    base = RNG.integers(lo // 2, hi // 2, 127).astype(dt)
    yield np.concatenate([base, np.arange(1000, 1010, dtype=dt)])
    if signed:
        yield np.array([2**62, -(2**62), 2**63 - 1, -(2**63), 0], np.int64)
    else:
        yield np.array([2**64 - 1, 0, 2**63, 1], np.uint64)


@pytest.mark.parametrize("signed", [True, False])
def test_int_rle_v1_differential_vs_reference_machine(signed):
    for case in _cases_int(signed):
        exp = _ref_encode(case, signed)
        got = encode_int_rle_v1(case, signed=signed)
        assert got == exp, f"mismatch for case len={len(case)}"
        back = decode_int_rle_v1(got, signed=signed)
        assert np.array_equal(back, case.astype(back.dtype))


def test_byte_rle_differential_roundtrip():
    for case in [
        RNG.integers(0, 256, 5000).astype(np.uint8),
        np.repeat(RNG.integers(0, 256, 100), RNG.integers(1, 300, 100)).astype(np.uint8),
        np.zeros(100000, np.uint8),
    ]:
        out = encode_byte_rle(case)
        assert np.array_equal(decode_byte_rle(out), case)


def test_boolean_rle_roundtrip():
    for case in [
        RNG.integers(0, 2, 10007).astype(bool),
        np.ones(999, bool),
        np.zeros(13, bool),
    ]:
        out = encode_boolean_rle(case)
        assert np.array_equal(decode_boolean_rle(out, len(case)), case)


# ------------------------------------------------------------- block framing


@pytest.mark.parametrize("kind", ["none", "zstd", "snappy"])
def test_block_framing_roundtrip(kind):
    for data in [
        b"",
        b"x",
        b"hello world " * 50_000,  # multi-block, compressible
        RNG.integers(0, 256, 600_000).astype(np.uint8).tobytes(),  # incompressible
    ]:
        comp = compress_stream(data, kind)
        assert decompress_stream(comp, kind) == data


def test_block_framing_incompressible_stores_original():
    data = RNG.integers(0, 256, 100_000).astype(np.uint8).tobytes()
    comp = compress_stream(data, "zstd")
    # varint prefix + 3-byte header per block + original payloads: never
    # more than ~13 bytes of overhead over the raw data
    assert len(comp) <= len(data) + 13
