"""ORC RLEv1 family: ByteRLE, BooleanRLE, signed/unsigned IntRLEv1.

Reimplements, bit-identically, the greedy run-length machines of the
reference writer (studied for behavior, not copied):

- ByteRLE  — `src/writer/encoder/byte_rle.rs:46-98`: runs of >=3 equal
  bytes -> header ``run_len-3`` (0..127 => run 3..130) + value byte;
  literal groups -> header ``256-len`` (255..128 => len 1..128) + raw bytes.
- BooleanRLE — `src/writer/encoder/boolean_rle.rs:28-66`: MSB-first 8-per-
  byte bit packing, final partial byte left-aligned, then ByteRLE.
- IntRLEv1 — `src/writer/encoder/int_rle_v1.rs:5-158`: greedy RLE with a
  per-run constant delta in [-128,128); run group = header ``run_len-3`` +
  delta byte (two's complement) + varint base; literal group = header
  ``256-len`` + varints. Signed values are zigzag'd inside the varint.

The greedy segmentation (including the 128-literal / 130-run buffer caps
and the value "stranding" that happens when a run pattern straddles a
128-literal flush) is reproduced exactly; the reference's own golden byte
vectors are asserted in tests/test_rle_v1.py.

Implementation strategy: instead of a per-value state machine, group
boundaries are derived from vectorized numpy delta/stretch analysis plus an
O(#groups) assembly loop, so cost scales with the number of emitted groups
(<= n/3 for runs, n/128 for incompressible data), not with values.
"""

from __future__ import annotations

import numpy as np

from .varint import (
    decode_varints,
    encode_varints,
    zigzag_decode,
    zigzag_encode,
)

_LIT_CAP = 128  # max literal group (byte_rle.rs buf len / int_rle_v1 buf cap)
_RUN_CAP = 130  # max run length (run_len cap at 130, header 127)


def _greedy_groups(d_u64: np.ndarray, fits: np.ndarray) -> list[tuple[bool, int, int]]:
    """Compute the exact group segmentation of the reference machine.

    ``d_u64[i] = v[i] - v[i-1]`` (wrapping, d_u64[0] unused); ``fits[i]``
    is whether d_u64[i] is an admissible run delta (|delta| i8 for ints,
    delta==0 for bytes). Returns [(is_run, start, count), ...].

    A run starts at value index c (>= 2) when d[c] == d[c-1], fits[c], and
    the literal buffer at that moment holds >= 2 values (buffer restarts at
    every 128-literal cap flush). It extends while d stays constant,
    emitting groups of <=130; 1-2 leftover same-delta values fall back into
    the literal buffer.
    """
    n = d_u64.size
    groups: list[tuple[bool, int, int]] = []
    if n == 0:
        return groups
    same = np.zeros(n, bool)
    if n >= 3:
        same[2:] = d_u64[2:] == d_u64[1:-1]
    cand = np.flatnonzero(same & fits)
    not_same = np.flatnonzero(~same)  # positions where a stretch breaks
    nc = len(cand)
    i = 0  # next value index to account for
    ls = 0  # literal buffer start
    ci = 0  # candidate cursor
    while True:
        while ci < nc and cand[ci] < i:
            ci += 1
        c = -1
        cj = ci
        while cj < nc:
            cc = int(cand[cj])
            # effective buffer start after 128-cap flushes
            ls_eff = ls + _LIT_CAP * ((cc - ls) // _LIT_CAP)
            if cc - ls_eff >= 2:
                c = cc
                break
            cj += 1  # candidate lands too close to a cap flush; stays literal
        if c < 0:
            # no more runs: flush literals ls..n-1 in cap-sized chunks
            p = ls
            while n - p > _LIT_CAP:
                groups.append((False, p, _LIT_CAP))
                p += _LIT_CAP
            if n - p > 0:
                groups.append((False, p, n - p))
            return groups
        # literals before the run: full 128-groups up to ls_eff, then the
        # popped-to remainder ls_eff..c-3 as one group
        ls_eff = ls + _LIT_CAP * ((c - ls) // _LIT_CAP)
        p = ls
        while p < ls_eff:
            groups.append((False, p, _LIT_CAP))
            p += _LIT_CAP
        if c - 2 - ls_eff > 0:
            groups.append((False, ls_eff, c - 2 - ls_eff))
        # run from c-2 through the end of the constant-delta stretch
        j = int(np.searchsorted(not_same, c, side="right"))
        e = int(not_same[j]) - 1 if j < len(not_same) else n - 1
        pos = c - 2
        rem = e - pos + 1
        while rem >= 3:
            r = min(rem, _RUN_CAP)
            groups.append((True, pos, r))
            pos += r
            rem -= r
        ls = pos  # 0..2 leftover same-delta values re-enter the buffer
        i = e + 1
        ci = cj + 1
        if i >= n:
            if n - ls > 0:  # flush leftovers (always < 3 here)
                groups.append((False, ls, n - ls))
            return groups


# ---------------------------------------------------------------- ByteRLE


def encode_byte_rle(values: np.ndarray) -> bytes:
    """Greedy byte RLE, bit-identical to byte_rle.rs:46-98."""
    v = np.ascontiguousarray(values, dtype=np.uint8)
    n = v.size
    if n == 0:
        return b""
    d = np.zeros(n, np.uint64)
    u = v.astype(np.uint64)
    d[1:] = u[1:] - u[:-1]
    fits = d == 0  # byte runs require equal values
    groups = _greedy_groups(d, fits)
    parts: list[bytes] = []
    vb = v.tobytes()
    for is_run, s, cnt in groups:
        if is_run:
            parts.append(bytes((cnt - 3, v[s])))
        else:
            parts.append(bytes(((256 - cnt) & 0xFF,)))
            parts.append(vb[s : s + cnt])
    return b"".join(parts)


def decode_byte_rle(buf) -> np.ndarray:
    b = np.frombuffer(buf, np.uint8)
    out: list[np.ndarray] = []
    i = 0
    L = b.size
    while i < L:
        h = int(b[i])
        if h < 128:
            cnt = h + 3
            out.append(np.full(cnt, b[i + 1], np.uint8))
            i += 2
        else:
            cnt = 256 - h
            out.append(b[i + 1 : i + 1 + cnt])
            i += 1 + cnt
    if not out:
        return np.empty(0, np.uint8)
    return np.concatenate(out)


# -------------------------------------------------------------- BooleanRLE


def encode_boolean_rle(mask: np.ndarray) -> bytes:
    """MSB-first bit packing (boolean_rle.rs:45-61) + ByteRLE."""
    m = np.ascontiguousarray(mask, dtype=bool)
    if m.size == 0:
        return b""
    packed = np.packbits(m)  # MSB-first, zero-padded right: exact match
    return encode_byte_rle(packed)


def decode_boolean_rle(buf, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, bool)
    packed = decode_byte_rle(buf)
    bits = np.unpackbits(packed)[:count]
    return bits.astype(bool)


# -------------------------------------------------------------- IntRLEv1


def _prep_u64(values: np.ndarray, signed: bool) -> np.ndarray:
    v = np.asarray(values)
    if signed:
        return np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)
    return np.ascontiguousarray(v, dtype=np.uint64)


def encode_int_rle_v1(values: np.ndarray, signed: bool = True) -> bytes:
    """IntRLEv1, bit-identical to int_rle_v1.rs:49-97 (greedy delta runs)."""
    u = _prep_u64(values, signed)
    n = u.size
    if n == 0:
        return b""
    d = np.zeros(n, np.uint64)
    d[1:] = u[1:] - u[:-1]  # wrapping subtraction
    di = d.view(np.int64)
    fits = (di >= -128) & (di < 128)  # VarInt::fits_i8 (varint.rs:29-31)
    groups = _greedy_groups(d, fits)
    zz = zigzag_encode(u.view(np.int64)) if signed else u
    vbytes, voff = encode_varints(zz)
    vb = vbytes.tobytes()
    parts: list[bytes] = []
    for is_run, s, cnt in groups:
        if is_run:
            delta_byte = int(d[s + 1]) & 0xFF  # two's-complement low byte
            parts.append(bytes((cnt - 3, delta_byte)))
            parts.append(vb[voff[s] : voff[s + 1]])
        else:
            parts.append(bytes(((256 - cnt) & 0xFF,)))
            parts.append(vb[voff[s] : voff[s + cnt]])
    return b"".join(parts)


def decode_int_rle_v1(buf, signed: bool = True) -> np.ndarray:
    """Decode IntRLEv1 -> int64 (signed) or uint64 (unsigned) array."""
    b = np.frombuffer(buf, np.uint8)
    out: list[np.ndarray] = []
    i = 0
    L = b.size
    while i < L:
        h = int(b[i])
        if h < 128:  # run group
            cnt = h + 3
            delta = int(b[i + 1])
            if delta >= 128:
                delta -= 256
            j = i + 2
            k = j
            while b[k] & 0x80:
                k += 1
            base_u = 0
            for t in range(j, k + 1):
                base_u |= (int(b[t]) & 0x7F) << (7 * (t - j))
            base_u &= 0xFFFFFFFFFFFFFFFF
            steps = np.arange(cnt, dtype=np.uint64) * np.uint64(delta & 0xFFFFFFFFFFFFFFFF)
            if signed:
                base = int(zigzag_decode(np.array([base_u], np.uint64))[0])
                vals = (np.uint64(base & 0xFFFFFFFFFFFFFFFF) + steps).view(np.int64)
            else:
                vals = np.uint64(base_u) + steps
            out.append(vals)
            i = k + 1
        else:  # literal group
            cnt = 256 - h
            vals_u, consumed = decode_varints(b[i + 1 :], count=cnt)
            out.append(zigzag_decode(vals_u) if signed else vals_u)
            i += 1 + consumed
    if not out:
        return np.empty(0, np.int64 if signed else np.uint64)
    return np.concatenate(out)
