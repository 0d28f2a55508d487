"""Big-endian bit packing + frame-of-reference codec.

Bit packing follows the ORC RLEv2 convention (public ORC v1 spec): values
are written MSB-first at a fixed bit width, concatenated, zero-padded to a
byte boundary. Not present in the reference repo (its proto knows RLEv2 but
the writer only emits DIRECT/RLEv1 — see SURVEY.md section 2.7); mandated
by BASELINE.json.

The frame-of-reference (FoR) codec subtracts the minimum and bit-packs the
residuals:  header = zigzag-varint(min) | width u8 | varint(count) | packed.
Width 0 encodes a constant column in a handful of bytes.

All kernels are numpy-vectorized; memory is bounded by chunking the bit
matrix at 1M values.
"""

from __future__ import annotations

import numpy as np

from .varint import (
    decode_varint_one,
    encode_varint_one,
    zigzag_decode,
    zigzag_encode,
)

_CHUNK = 1 << 20

# ORC RLEv2 closed set of bit widths (public spec, "Direct" encoding)
WIDTH_TABLE = tuple(range(1, 25)) + (26, 28, 30, 32, 40, 48, 56, 64)
_WIDTH_TO_CODE = {w: i for i, w in enumerate(WIDTH_TABLE)}


def round_width(width: int) -> int:
    """Smallest spec width >= ``width`` (min 1)."""
    if width <= 24:
        return max(1, width)
    for w in WIDTH_TABLE[24:]:
        if width <= w:
            return w
    raise ValueError(f"width {width} > 64")


def width_code(width: int) -> int:
    return _WIDTH_TO_CODE[width]


def code_width(code: int) -> int:
    return WIDTH_TABLE[code]


def bits_required(u: np.ndarray) -> int:
    """Bits needed for the max of a uint64 array (0 for all-zero)."""
    if u.size == 0:
        return 0
    m = int(u.max())
    return m.bit_length()


def _lane_dtype(width: int):
    if width <= 8:
        return np.uint8
    if width <= 16:
        return np.uint16
    if width <= 32:
        return np.uint32
    return np.uint64


def bitpack(u: np.ndarray, width: int) -> bytes:
    """Pack unsigned values at ``width`` bits each, MSB-first big-endian.

    Accepts any unsigned dtype — narrow inputs (uint8/16/32) are packed
    without an uint64 upcast, halving/quartering memory traffic on the
    hot token path.
    """
    u = np.ascontiguousarray(u)
    if u.dtype.kind != "u":
        u = u.astype(np.uint64)
    n = u.size
    if n == 0 or width == 0:
        return b""
    if width % 8 == 0:
        # byte-aligned: each value is the low width/8 bytes of its
        # big-endian representation
        nb = width // 8
        lane = 1
        while lane < nb or lane < u.dtype.itemsize:
            lane *= 2
        be = (
            u.astype(f">u{lane}").view(np.uint8).reshape(n, lane)[:, lane - nb :]
        )
        return np.ascontiguousarray(be).tobytes()
    dt = _lane_dtype(width)
    shifts = np.arange(width - 1, -1, -1, dtype=dt)
    out_parts = []
    # process in chunks whose bit counts are byte-aligned (chunk*width % 8
    # == 0 because _CHUNK is a multiple of 8)
    for s in range(0, n, _CHUNK):
        chunk = u[s : s + _CHUNK].astype(dt, copy=False)
        bits = ((chunk[:, None] >> shifts) & dt(1)).astype(np.uint8, copy=False)
        out_parts.append(np.packbits(bits.reshape(-1)))
    return b"".join(p.tobytes() for p in out_parts)


def bitunpack(buf, width: int, count: int) -> np.ndarray:
    """Inverse of bitpack -> uint64 array of ``count`` values."""
    if count == 0 or width == 0:
        return np.zeros(count, np.uint64)
    raw = np.frombuffer(buf, np.uint8)
    if width % 8 == 0:
        nb = width // 8
        be = np.zeros((count, 8), np.uint8)
        be[:, 8 - nb :] = raw[: count * nb].reshape(count, nb)
        return be.reshape(-1).view(">u8").astype(np.uint64)
    dt = _lane_dtype(width)
    out = np.empty(count, np.uint64)
    done = 0
    byte_pos = 0
    while done < count:
        c = min(_CHUNK, count - done)
        nbytes = (c * width + 7) // 8
        bits = np.unpackbits(raw[byte_pos : byte_pos + nbytes])[: c * width]
        m = bits.reshape(c, width).astype(dt)
        acc = np.zeros(c, dt)
        for k in range(width):
            acc |= m[:, k] << dt(width - 1 - k)
        out[done : done + c] = acc
        done += c
        byte_pos += nbytes
    return out


# ------------------------------------------------------- frame-of-reference


_UNSIGNED_OF = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def encode_for_bitpack(values: np.ndarray, signed: bool = True) -> bytes:
    v = np.ascontiguousarray(values)
    n = v.size
    if n == 0:
        return b""
    if v.dtype.itemsize < 8 and (v.dtype.kind == "u" or (signed and v.dtype.kind == "i")):
        # narrow fast path: residual = wrapping subtract in the native
        # unsigned width (exact because the value range fits the width);
        # avoids the int64 upcast -> half/quarter the memory traffic
        udt = _UNSIGNED_OF[v.dtype.itemsize]
        mn = int(v.min())
        mask = (1 << (8 * v.dtype.itemsize)) - 1
        residual = v.view(udt) - udt(mn & mask)
        width = int(residual.max()).bit_length() if n else 0
        header = (
            encode_varint_one(int(zigzag_encode(np.array([mn], np.int64))[0]))
            + bytes((width,))
            + encode_varint_one(n)
        )
        return header + bitpack(residual, width)
    if signed:
        v64 = np.ascontiguousarray(v, dtype=np.int64)
        u = v64.view(np.uint64)
        mn = int(v64.min())
        residual = (u - np.uint64(mn & 0xFFFFFFFFFFFFFFFF))  # wraps correctly
    else:
        u = np.ascontiguousarray(v, dtype=np.uint64)
        mn = int(u.min())
        residual = u - np.uint64(mn)
    width = bits_required(residual)
    header = (
        encode_varint_one(int(zigzag_encode(np.array([mn], np.int64))[0]))
        + bytes((width,))
        + encode_varint_one(n)
    )
    return header + bitpack(residual, width)


def decode_for_bitpack(buf, signed: bool = True) -> np.ndarray:
    if len(buf) == 0:
        return np.empty(0, np.int64 if signed else np.uint64)
    zz, pos = decode_varint_one(buf, 0)
    mn = int(zigzag_decode(np.array([zz], np.uint64))[0])
    width = buf[pos]
    pos += 1
    n, pos = decode_varint_one(buf, pos)
    residual = bitunpack(buf[pos:], width, n)
    vals = residual + np.uint64(mn & 0xFFFFFFFFFFFFFFFF)
    return vals.view(np.int64) if signed else vals
