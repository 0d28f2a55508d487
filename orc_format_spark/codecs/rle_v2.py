"""ORC RLEv2-style integer codec: short-repeat / direct / patched-base /
delta sub-encodings.

Not present in the reference repo (its writer only emits RLEv1 + DIRECT
encodings; RLEv2 exists only in its proto enum — see SURVEY.md section
2.7). Mandated by BASELINE.json; the wire layout follows the public ORC
v1 specification's four sub-encodings exactly — the spec's own worked
byte examples for short-repeat, direct, patched-base, and delta are
pinned as golden vectors in tests/test_rle_v2_spec.py.

Header layouts (byte0 top 2 bits select the sub-encoding; ORC v1 spec
"Run Length Encoding, version 2"):

  short-repeat  00WWWRRR                         W=value bytes-1, R=count-3
                value: W+1 bytes big-endian (zigzag if signed); runs 3..10
  direct        01CCCCCL LLLLLLLL                C=width code, L=count-1
                values bit-packed MSB-first at WIDTH_TABLE[C] (zigzag if
                signed); count 1..512
  patched-base  10CCCCCL LLLLLLLL  (BBB PPPPP) (GGG NNNNN)
                B=base bytes-1, P=patch width code, G=patch gap bits-1,
                N=patch count (0..31); base sign-magnitude big-endian;
                residuals (v-min) packed at WIDTH_TABLE[C]; patch list
                entries ((gap<<PW)|patch_high_bits) packed at the closest
                fixed width >= (G+1)+PW bits (Apache readers demand the
                rounded width); gaps >255 bridged with (255, 0) fillers
  delta         11DDDDDL LLLLLLLL                D=0: fixed delta, else
                D is the spec width code of |deltas[1:]| (so the packed
                width is WIDTH_TABLE[D], never less than 2 — code 0 is
                taken by the fixed-delta case, the spec's known quirk);
                widths are rounded up to the spec's *aligned* set
                (2,4,8,16,24,...), matching the Java writer and the
                spec's worked example; base varint (zigzag if signed),
                first delta signed zigzag varint; monotonic runs only;
                count 2..512

The encoder segments the input into equal-value runs (>=3) and 512-value
literal chunks, then picks the cheapest applicable sub-encoding per chunk.
Encoder *strategy* (which valid sub-encoding/width a writer picks — e.g.
our exact-count 95th-percentile patched-base split) is a writer freedom
the spec grants; the emitted bytes are always spec-decodable.
"""

from __future__ import annotations

import numpy as np

from .bitpack import (
    bitpack,
    bitunpack,
    code_width,
    round_width,
    width_code,
)
from .varint import (
    decode_varint_one,
    encode_varint_one,
    zigzag_decode,
    zigzag_encode,
)

_MAX_CHUNK = 512
_U64_MASK = 0xFFFFFFFFFFFFFFFF

_POW2 = np.array([1 << k for k in range(64)], dtype=np.uint64)


def _bit_lengths(u: np.ndarray) -> np.ndarray:
    """Per-value bit length of a uint64 array (0 for zero)."""
    return np.searchsorted(_POW2, u, side="right").astype(np.int64)


def _zigzag_one(x: int) -> int:
    return ((x << 1) ^ (x >> 63)) & _U64_MASK if x < 0 else (x << 1) & _U64_MASK


def _unzigzag_one(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


# ------------------------------------------------------------------ encode


def _emit_short_repeat(out: list[bytes], value_u: int, count: int, signed: bool):
    v = _zigzag_one(value_u - (1 << 64) if signed and value_u >> 63 else value_u) if signed else value_u
    nbytes = max(1, (v.bit_length() + 7) // 8)
    out.append(bytes(((0 << 6) | ((nbytes - 1) << 3) | (count - 3),)))
    out.append(v.to_bytes(nbytes, "big"))


def _emit_direct(
    out: list[bytes], seg_u: np.ndarray, signed: bool, zz: np.ndarray | None = None
):
    if zz is None:
        zz = zigzag_encode(seg_u.view(np.int64)) if signed else seg_u
    w = round_width(int(_bit_lengths(zz).max()) if zz.size else 1)
    c = width_code(w)
    n = seg_u.size
    out.append(bytes(((1 << 6) | (c << 1) | ((n - 1) >> 8), (n - 1) & 0xFF)))
    out.append(bitpack(zz, w))


# Spec "aligned" widths (Java writer getClosestAlignedFixedBits); delta
# never packs below 2 bits because delta width code 0 means fixed-delta.
_DELTA_ALIGNED = (2, 4, 8, 16, 24, 32, 40, 48, 56, 64)


def _delta_packed_width(bits: int) -> int:
    for w in _DELTA_ALIGNED:
        if bits <= w:
            return w
    raise ValueError(f"delta width {bits} > 64")


def _delta_width_field(d0: int, rest_abs: np.ndarray) -> int | None:
    """The 5-bit width field for a delta chunk: 0 for fixed delta, else
    the SPEC width code of the aligned packed width of |deltas[1:]|
    (ORC quirk: code 0 is taken by fixed-delta, so packed widths start
    at 2). None if the deltas exceed 64 bits (use direct/patched)."""
    if rest_abs.size and not bool((rest_abs == np.uint64(abs(d0))).all()):
        bits = int(_bit_lengths(rest_abs).max())
        if bits > 64:
            return None
        return width_code(_delta_packed_width(bits))
    return 0  # fixed delta: decoder replays |d0| with d0's sign


def _emit_delta(
    out: list[bytes], seg_u: np.ndarray, d0: int, rest_abs: np.ndarray, signed: bool
):
    n = seg_u.size
    dfield = _delta_width_field(d0, rest_abs)
    assert dfield is not None, "caller must pre-check _delta_width_field"
    if dfield:
        w = code_width(dfield)
    else:
        w = 0
    out.append(bytes(((3 << 6) | (dfield << 1) | ((n - 1) >> 8), (n - 1) & 0xFF)))
    base = int(seg_u[0])
    if signed:
        base_s = base - (1 << 64) if base >> 63 else base
        out.append(encode_varint_one(_zigzag_one(base_s)))
    else:
        out.append(encode_varint_one(base))
    out.append(encode_varint_one(_zigzag_one(d0)))
    if dfield:
        out.append(bitpack(rest_abs, w))


def _try_patched(seg_u: np.ndarray, signed: bool) -> bytes | None:
    """Return the patched-base encoding if applicable and beneficial."""
    n = seg_u.size
    if n < 16:
        return None
    if signed:
        s = seg_u.view(np.int64)
        base = int(s.min())
    else:
        base = int(seg_u.min())
        if base >= 1 << 63:
            return None
    residual = seg_u - np.uint64(base & _U64_MASK)
    bl = _bit_lengths(residual)
    max_w = int(bl.max())
    # 95th-percentile width via bincount (bl <= 64, far faster than
    # np.percentile on small chunks)
    counts = np.bincount(bl, minlength=65)
    w95 = int(np.searchsorted(np.cumsum(counts), 0.95 * n))
    w = round_width(max(1, w95))
    if w >= max_w:
        return None  # no outliers to patch
    outliers = np.flatnonzero(bl > w)
    if outliers.size == 0 or outliers.size > 31:
        return None
    pw = round_width(max_w - w)
    # patch entries: (gap, high bits); bridge gaps > 255
    entries: list[tuple[int, int]] = []
    prev = 0
    ok = True
    for idx in outliers.tolist():
        gap = idx - prev
        while gap > 255:
            entries.append((255, 0))
            gap -= 255
        entries.append((gap, int(residual[idx] >> np.uint64(w))))
        prev = idx
    if len(entries) > 31:
        return None
    pgw = max(1, max(e[0] for e in entries).bit_length())
    if pgw > 8 or pgw + pw > 64:
        return None
    # +1: the MSB of the first base byte is the SIGN bit (sign-magnitude
    # big-endian) — the magnitude must not reach into it, or a
    # spec-compliant reader (Apache ORC C++) reads a negative base.
    # Caught by the write_orc(rle="v2") external-reader loop; our own
    # symmetric decoder masked it.
    bw = max(1, ((abs(base)).bit_length() + 1 + 7) // 8)
    if bw > 8 or abs(base) >= 1 << 63:
        return None
    # patch-list entries are packed at the CLOSEST FIXED WIDTH >= pgw+pw
    # (ORC spec / Apache readers: getClosestFixedBits(patchBitSize+pgw)) —
    # packing at the raw sum desyncs the Apache C++ reader's stream walk
    ew = round_width(pgw + pw)
    packed_main = bitpack(residual & np.uint64((1 << w) - 1), w)
    patch_vals = np.array(
        [(g << pw) | p for g, p in entries], dtype=np.uint64
    )
    packed_patch = bitpack(patch_vals, ew)
    header = bytes(
        (
            (2 << 6) | (width_code(w) << 1) | ((n - 1) >> 8),
            (n - 1) & 0xFF,
            ((bw - 1) << 5) | width_code(pw),
            ((pgw - 1) << 5) | len(entries),
        )
    )
    base_mag = abs(base)
    base_bytes = bytearray(base_mag.to_bytes(bw, "big"))
    if base < 0:
        base_bytes[0] |= 0x80
    return header + bytes(base_bytes) + packed_main + packed_patch


def _encode_literal_chunk(
    out: list[bytes], seg_u: np.ndarray, signed: bool, zz: np.ndarray | None = None
):
    """Pick the cheapest of delta/patched/direct for a <=512 chunk."""
    n = seg_u.size
    if n == 1:
        _emit_direct(out, seg_u, signed, zz)
        return
    if 3 <= n <= 10 and bool((seg_u == seg_u[0]).all()):
        _emit_short_repeat(out, int(seg_u[0]), n, signed)
        return
    # monotonic? (compare in the value domain)
    if signed:
        s = seg_u.view(np.int64)
        nondec = bool((s[1:] >= s[:-1]).all())
        noninc = bool((s[1:] <= s[:-1]).all())
    else:
        nondec = bool((seg_u[1:] >= seg_u[:-1]).all())
        noninc = bool((seg_u[1:] <= seg_u[:-1]).all())
    if nondec or noninc:
        if nondec:
            dabs = seg_u[1:] - seg_u[:-1]
        else:
            dabs = seg_u[:-1] - seg_u[1:]
        # the decoder takes the run direction from sign(d0): a decreasing
        # sequence whose FIRST delta is 0 would decode with the wrong sign
        dir_ok = nondec or dabs.size == 0 or int(dabs[0]) != 0 or not dabs.any()
        if (
            dir_ok
            and (dabs.size == 0 or int(dabs.max()) < 1 << 63)
            and (
                dabs.size == 0
                or _delta_width_field(
                    int(dabs[0]) if nondec else -int(dabs[0]), dabs[1:]
                )
                is not None
            )
        ):
            d0 = int(dabs[0]) if nondec else (-int(dabs[0]) if dabs.size else 0)
            buf: list[bytes] = []
            _emit_delta(buf, seg_u, d0, dabs[1:], signed)
            delta_bytes = b"".join(buf)
            direct_buf: list[bytes] = []
            _emit_direct(direct_buf, seg_u, signed, zz)
            direct_bytes = b"".join(direct_buf)
            out.append(delta_bytes if len(delta_bytes) <= len(direct_bytes) else direct_bytes)
            return
    patched = _try_patched(seg_u, signed)
    direct_buf = []
    _emit_direct(direct_buf, seg_u, signed, zz)
    direct_bytes = b"".join(direct_buf)
    if patched is not None and len(patched) < len(direct_bytes):
        out.append(patched)
    else:
        out.append(direct_bytes)


def encode_int_rle_v2(values: np.ndarray, signed: bool = True) -> bytes:
    v = np.asarray(values)
    if signed:
        u = np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)
    else:
        u = np.ascontiguousarray(v, dtype=np.uint64)
    n = u.size
    if n == 0:
        return b""
    zz_full = zigzag_encode(u.view(np.int64)) if signed else u
    out: list[bytes] = []
    # segment into equal-value runs (>=4) and literal stretches
    change = np.empty(n, bool)
    change[0] = True
    change[1:] = u[1:] != u[:-1]
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, n))
    # Only split out long equal-value runs: short runs embedded in a
    # monotonic stretch are cheaper inside a 1-bit-delta 512-chunk than as
    # standalone groups.
    run_mask = lengths >= 32
    i = 0
    nseg = len(starts)
    si = 0
    while si < nseg:
        if run_mask[si]:
            s = int(starts[si])
            L = int(lengths[si])
            val = int(u[s])
            pos = 0
            while pos < L:
                r = min(L - pos, _MAX_CHUNK)
                if 3 <= r <= 10:
                    _emit_short_repeat(out, val, r, signed)
                elif r < 3:
                    _emit_direct(out, u[s + pos : s + pos + r], signed)
                else:
                    _emit_delta(out, u[s + pos : s + pos + r], 0, np.empty(0, np.uint64), signed)
                pos += r
            si += 1
        else:
            # coalesce consecutive non-run segments into literal stretch
            s = int(starts[si])
            sj = si
            while sj < nseg and not run_mask[sj]:
                sj += 1
            e = int(starts[sj]) if sj < nseg else n
            for cs in range(s, e, _MAX_CHUNK):
                ce = min(cs + _MAX_CHUNK, e)
                _encode_literal_chunk(out, u[cs:ce], signed, zz_full[cs:ce])
            si = sj
    return b"".join(out)


# ------------------------------------------------------------------ decode


def decode_int_rle_v2(buf, signed: bool = True) -> np.ndarray:
    b = bytes(buf)
    out: list[np.ndarray] = []
    pos = 0
    L = len(b)
    while pos < L:
        h0 = b[pos]
        kind = h0 >> 6
        if kind == 0:  # short repeat
            nbytes = ((h0 >> 3) & 0x7) + 1
            count = (h0 & 0x7) + 3
            raw = int.from_bytes(b[pos + 1 : pos + 1 + nbytes], "big")
            val = _unzigzag_one(raw) if signed else raw
            out.append(np.full(count, np.uint64(val & _U64_MASK), np.uint64))
            pos += 1 + nbytes
        elif kind == 1:  # direct
            c = (h0 >> 1) & 0x1F
            n = (((h0 & 1) << 8) | b[pos + 1]) + 1
            w = code_width(c)
            nbytes = (n * w + 7) // 8
            packed = bitunpack(b[pos + 2 : pos + 2 + nbytes], w, n)
            vals = zigzag_decode(packed).view(np.uint64) if signed else packed
            out.append(vals)
            pos += 2 + nbytes
        elif kind == 2:  # patched base
            c = (h0 >> 1) & 0x1F
            n = (((h0 & 1) << 8) | b[pos + 1]) + 1
            w = code_width(c)
            h2 = b[pos + 2]
            h3 = b[pos + 3]
            bw = ((h2 >> 5) & 0x7) + 1
            pw = code_width(h2 & 0x1F)
            pgw = ((h3 >> 5) & 0x7) + 1
            pll = h3 & 0x1F
            pos += 4
            base_raw = int.from_bytes(b[pos : pos + bw], "big")
            sign = base_raw >> (bw * 8 - 1)
            base = base_raw & ((1 << (bw * 8 - 1)) - 1)
            if sign:
                base = -base
            pos += bw
            nbytes = (n * w + 7) // 8
            residual = bitunpack(b[pos : pos + nbytes], w, n)
            pos += nbytes
            # entries are packed at the closest fixed width >= pgw+pw
            # (matches Apache readers; see _try_patched)
            ew = round_width(pgw + pw)
            pbytes = (pll * ew + 7) // 8
            entries = bitunpack(b[pos : pos + pbytes], ew, pll)
            pos += pbytes
            idx = 0
            for e in entries.tolist():
                gap = e >> pw
                patch = e & ((1 << pw) - 1)
                idx += gap
                if patch:
                    residual[idx] |= np.uint64(patch << w)
            out.append(residual + np.uint64(base & _U64_MASK))
        else:  # delta
            dfield = (h0 >> 1) & 0x1F
            n = (((h0 & 1) << 8) | b[pos + 1]) + 1
            pos += 2
            base_raw, pos = decode_varint_one(b, pos)
            base = _unzigzag_one(base_raw) if signed else base_raw
            d0_raw, pos = decode_varint_one(b, pos)
            d0 = _unzigzag_one(d0_raw)
            if dfield:
                w = code_width(dfield)
                nbytes = ((n - 2) * w + 7) // 8
                dabs = bitunpack(b[pos : pos + nbytes], w, n - 2)
                pos += nbytes
            else:
                dabs = np.full(max(0, n - 2), np.uint64(abs(d0)), np.uint64)
            deltas = np.empty(n, np.uint64)
            deltas[0] = 0
            if n > 1:
                deltas[1] = np.uint64(d0 & _U64_MASK)
                sgn = 1 if d0 >= 0 else -1
                if n > 2:
                    if sgn > 0:
                        deltas[2:] = dabs
                    else:
                        deltas[2:] = np.uint64(0) - dabs
            vals = np.uint64(base & _U64_MASK) + np.cumsum(deltas, dtype=np.uint64)
            out.append(vals)
    if not out:
        return np.empty(0, np.int64 if signed else np.uint64)
    res = np.concatenate(out)
    return res.view(np.int64) if signed else res
