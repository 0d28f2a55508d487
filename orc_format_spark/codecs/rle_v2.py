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
from .rle_v1 import _range_gather_indices
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


def _direct_header(w: int, n: int) -> bytes:
    c = width_code(w)
    return bytes(((1 << 6) | (c << 1) | ((n - 1) >> 8), (n - 1) & 0xFF))


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


def _bitpack_py(vals, width: int) -> bytes:
    """MSB-first bitpack via one Python big-int — beats the numpy
    kernel's per-call overhead for the <=31-entry patch lists."""
    acc = 0
    for v in vals:
        acc = (acc << width) | int(v)
    nbits = len(vals) * width
    if not nbits:
        return b""
    pad = (-nbits) % 8
    return (acc << pad).to_bytes((nbits + pad) // 8, "big")


def _try_patched(seg_u: np.ndarray, signed: bool):
    """Patched-base encoding if applicable and beneficial: returns
    (total_size, prefix_bytes, masked_residual, w, suffix_bytes) with
    the residual pack DEFERRED (batched by the caller), else None."""
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
    packed_patch = _bitpack_py([(g << pw) | p for g, p in entries], ew)
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
    prefix = header + bytes(base_bytes)
    size = len(prefix) + (n * w + 7) // 8 + len(packed_patch)
    return size, prefix, residual & np.uint64((1 << w) - 1), w, packed_patch


def _direct_size(n: int, w: int) -> int:
    return 2 + (n * w + 7) // 8


def _encode_literal_chunk(
    out: list,
    seg_u: np.ndarray,
    signed: bool,
    zz: np.ndarray | None = None,
    bl: np.ndarray | None = None,
):
    """Pick the cheapest of delta/patched/direct for a <=512 chunk.

    DIRECT payloads are not packed here: a ("direct", zz, w, n) marker
    is appended instead, and encode_int_rle_v2 batches all same-width
    markers into one bitpack at the end (full 512-value chunks are
    byte-aligned at any width, so concatenated packing emits the
    identical bytes). `bl` is the precomputed per-value bit length of
    `zz` — one global pass in the caller replaces a searchsorted per
    chunk."""
    n = seg_u.size
    if n == 1:
        _emit_direct(out, seg_u, signed, zz)
        return
    if 3 <= n <= 10 and bool((seg_u == seg_u[0]).all()):
        _emit_short_repeat(out, int(seg_u[0]), n, signed)
        return
    if zz is None:
        zz = zigzag_encode(seg_u.view(np.int64)) if signed else seg_u
    if bl is None:
        bl = _bit_lengths(zz)
    w_direct = round_width(max(1, int(bl.max())))
    dsize = _direct_size(n, w_direct)
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
            if len(delta_bytes) <= dsize:
                out.append(delta_bytes)
            else:
                out.append((_direct_header(w_direct, n), zz, w_direct, b""))
            return
    patched = _try_patched(seg_u, signed)
    if patched is not None and patched[0] < dsize:
        out.append(patched[1:])
    else:
        out.append((_direct_header(w_direct, n), zz, w_direct, b""))


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
    out: list = []
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
            # one bit-length pass per literal stretch (run regions
            # never pay for it), sliced per chunk
            bl_stretch = _bit_lengths(zz_full[s:e])
            for cs in range(s, e, _MAX_CHUNK):
                ce = min(cs + _MAX_CHUNK, e)
                _encode_literal_chunk(
                    out,
                    u[cs:ce],
                    signed,
                    zz_full[cs:ce],
                    bl_stretch[cs - s : ce - s],
                )
            si = sj
    # ---- resolve deferred packs (direct values / patched residuals):
    # one bitpack per width over every byte-aligned chunk (512*w bits
    # always is), split afterwards
    dpos = [k for k, p in enumerate(out) if type(p) is tuple]
    if dpos:
        by_w: dict[int, list[int]] = {}
        for k in dpos:
            prefix, arr, w, suffix = out[k]
            if (arr.size * w) % 8 == 0:
                by_w.setdefault(w, []).append(k)
            else:
                out[k] = prefix + bitpack(arr, w) + suffix
        for w, ks in by_w.items():
            packed = bitpack(np.concatenate([out[k][1] for k in ks]), w)
            off = 0
            for k in ks:
                prefix, arr, _, suffix = out[k]
                nb = arr.size * w // 8
                out[k] = prefix + packed[off : off + nb] + suffix
                off += nb
    return b"".join(out)


# ------------------------------------------------------------------ decode


def _gather_ranges(src: np.ndarray, starts, lens) -> np.ndarray:
    """Concatenate src[starts[i] : starts[i]+lens[i]].

    Real RLEv2 streams are dominated by uniform 512-value runs, so the
    ranges usually share one length and one stride — served by a
    strided view + copy instead of a len-total fancy-index gather."""
    starts = np.asarray(starts, np.int64)
    lens = np.asarray(lens, np.int64)
    if starts.size == 0:
        return src[:0]
    if starts.size == 1:
        s = int(starts[0])
        return src[s : s + int(lens[0])].copy()
    L = int(lens[0])
    if (lens == L).all():
        step = np.diff(starts)
        if (step == step[0]).all():
            st = int(step[0])
            s0 = int(starts[0])
            if st == L:
                return src[s0 : s0 + L * starts.size].copy()
            it = src.itemsize
            view = np.lib.stride_tricks.as_strided(
                src[s0:], shape=(starts.size, L), strides=(st * it, it)
            )
            return view.reshape(-1)  # materializes a contiguous copy
    return src[_range_gather_indices(starts, lens)]


def _scatter_ranges(dst: np.ndarray, starts, lens, vals) -> None:
    """dst[starts[i] : starts[i]+lens[i]] = next lens[i] of vals."""
    starts = np.asarray(starts, np.int64)
    lens = np.asarray(lens, np.int64)
    if starts.size == 0:
        return
    if starts.size == 1:
        s = int(starts[0])
        dst[s : s + int(lens[0])] = vals
        return
    if (starts[1:] == starts[:-1] + lens[:-1]).all():
        s0 = int(starts[0])
        dst[s0 : s0 + int(lens.sum())] = vals
        return
    L = int(lens[0])
    if (lens == L).all():
        step = np.diff(starts)
        if (step == step[0]).all():
            st = int(step[0])
            it = dst.itemsize
            view = np.lib.stride_tricks.as_strided(
                dst[int(starts[0]):], shape=(starts.size, L),
                strides=(st * it, it),
            )
            view[:] = np.asarray(vals).reshape(starts.size, L)
            return
    dst[_range_gather_indices(starts, lens)] = vals


def decode_int_rle_v2(buf, signed: bool = True,
                      count: int | None = None) -> np.ndarray:
    """Two-pass decode: a cheap Python header scan builds a segment
    table, then each sub-encoding materializes BATCHED across all its
    segments straight into one preallocated output. Short-repeat is a
    single np.repeat + scatter; same-width direct/delta payloads are
    gathered via strided views and bitunpacked in ONE call (a full
    512-value run is always byte-aligned: 512*w bits); ALL delta
    segments share one global cumsum with per-segment resets. Writers
    emit runs of <= 512 values, so per-segment numpy calls (the
    previous shape) were overhead-bound: measured 2-5x faster across
    token/sorted/repeat/arithmetic distributions while decoding the
    identical wire (same golden vectors, same Apache fuzz gate)."""
    b = bytes(buf)
    L = len(b)
    if not L:
        return np.empty(0, np.int64 if signed else np.uint64)
    # ---- pass 1: header scan -> per-segment kind/count/metadata
    seg_kind: list[int] = []
    seg_count: list[int] = []
    seg_meta: list = []
    pos = 0
    total = 0
    # ``count`` bounds the scan at the first run boundary at or past
    # that many values: positioned mid-stream reads stop early instead
    # of walking (and later materializing) the rest of the stripe
    while pos < L and (count is None or total < count):
        h0 = b[pos]
        kind = h0 >> 6
        if kind == 0:  # short repeat
            nbytes = ((h0 >> 3) & 0x7) + 1
            raw = int.from_bytes(b[pos + 1 : pos + 1 + nbytes], "big")
            val = _unzigzag_one(raw) if signed else raw
            seg_meta.append(val & _U64_MASK)
            seg_count.append((h0 & 0x7) + 3)
            pos += 1 + nbytes
        elif kind == 1:  # direct
            w = code_width((h0 >> 1) & 0x1F)
            n = (((h0 & 1) << 8) | b[pos + 1]) + 1
            seg_meta.append((pos + 2, w))
            seg_count.append(n)
            pos += 2 + (n * w + 7) // 8
        elif kind == 2:  # patched base
            w = code_width((h0 >> 1) & 0x1F)
            n = (((h0 & 1) << 8) | b[pos + 1]) + 1
            h2 = b[pos + 2]
            h3 = b[pos + 3]
            bw = ((h2 >> 5) & 0x7) + 1
            pw = code_width(h2 & 0x1F)
            pgw = ((h3 >> 5) & 0x7) + 1
            pll = h3 & 0x1F
            # entries are packed at the closest fixed width >= pgw+pw
            # (matches Apache readers; see _try_patched)
            ew = round_width(pgw + pw)
            seg_meta.append((pos + 4, w, bw, pw, ew, pll))
            seg_count.append(n)
            pos += 4 + bw + (n * w + 7) // 8 + (pll * ew + 7) // 8
        else:  # delta
            dfield = (h0 >> 1) & 0x1F
            n = (((h0 & 1) << 8) | b[pos + 1]) + 1
            pos += 2
            base_raw, pos = decode_varint_one(b, pos)
            base = _unzigzag_one(base_raw) if signed else base_raw
            d0_raw, pos = decode_varint_one(b, pos)
            d0 = _unzigzag_one(d0_raw)
            if dfield:
                if n < 2:
                    # spec: delta runs hold >= 2 values; a foreign
                    # stream claiming n=1 with a residual width would
                    # compute a NEGATIVE payload length and silently
                    # desync the header walk — fail loudly instead
                    raise ValueError(
                        "rle_v2: variable-width delta run with n < 2"
                    )
                w = code_width(dfield)
                seg_meta.append((base, d0, pos, w))
                pos += ((n - 2) * w + 7) // 8
            else:
                # fixed delta: a pure arithmetic sequence (the encoder
                # writes |d| for deltas[2:] with d0's sign, i.e. step
                # is exactly d0 throughout)
                seg_meta.append((base, d0, None, None))
            seg_count.append(n)
        seg_kind.append(kind)
        total += seg_count[-1]

    if not seg_count:  # count=0 positioned read: nothing to materialize
        return np.empty(0, np.int64 if signed else np.uint64)
    counts = np.array(seg_count, np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    out = np.empty(int(ends[-1]), np.uint64)
    kinds_a = np.array(seg_kind, np.int8)

    # ---- short repeat: ALL segments via one repeat + one scatter
    sr = kinds_a == 0
    if sr.any():
        sr_idx = np.flatnonzero(sr)
        vals = np.array([seg_meta[i] for i in sr_idx], np.uint64)
        _scatter_ranges(out, starts[sr], counts[sr],
                        np.repeat(vals, counts[sr]))

    # ---- direct: batch same-width segments into ONE bitunpack.
    # A full 512-value run at any width packs to exactly 64*w bytes
    # (512*w bits is always byte-aligned), so for each width we gather
    # the byte ranges of every padding-free segment, unpack the lot in
    # one call, and scatter; only tail runs with padding bits fall back
    # to the per-segment path.
    direct_idx = np.flatnonzero(kinds_a == 1)
    if direct_idx.size:
        bview = np.frombuffer(b, np.uint8)
        offs = np.array([seg_meta[i][0] for i in direct_idx], np.int64)
        ws = np.array([seg_meta[i][1] for i in direct_idx], np.int64)
        cs = counts[direct_idx]
        aligned = (cs * ws) % 8 == 0
        for w in np.unique(ws[aligned]).tolist():
            grp = aligned & (ws == w)
            gbytes = cs[grp] * w // 8
            raw = _gather_ranges(bview, offs[grp], gbytes)
            packed = bitunpack(raw.tobytes(), w, int(cs[grp].sum()))
            _scatter_ranges(
                out, starts[direct_idx[grp]], cs[grp],
                zigzag_decode(packed).view(np.uint64) if signed else packed,
            )
        for j in np.flatnonzero(~aligned):
            i = direct_idx[j]
            n = int(cs[j])
            w = int(ws[j])
            packed = bitunpack(b[offs[j] : offs[j] + (n * w + 7) // 8], w, n)
            out[starts[i] : ends[i]] = (
                zigzag_decode(packed).view(np.uint64) if signed else packed
            )

    # ---- patched base (rare; unchanged semantics)
    for i in np.flatnonzero(kinds_a == 2):
        off, w, bw, pw, ew, pll = seg_meta[i]
        n = int(counts[i])
        base_raw = int.from_bytes(b[off : off + bw], "big")
        base = base_raw & ((1 << (bw * 8 - 1)) - 1)
        if base_raw >> (bw * 8 - 1):
            base = -base
        off += bw
        nbytes = (n * w + 7) // 8
        residual = bitunpack(b[off : off + nbytes], w, n)
        off += nbytes
        entries = bitunpack(b[off : off + (pll * ew + 7) // 8], ew, pll)
        idx = 0
        for e in entries.tolist():
            gap = e >> pw
            patch = e & ((1 << pw) - 1)
            idx += gap
            if patch:
                residual[idx] |= np.uint64(patch << w)
        out[starts[i] : ends[i]] = residual + np.uint64(base & _U64_MASK)

    # ---- delta: ONE global cumsum over every delta segment's
    # increment stream [base_i, d0_i, ±|d|...], with per-segment
    # resets via prefix subtraction (uint64 wraparound keeps negative
    # steps exact). Variable-width |d| payloads are gathered per width
    # and bitunpacked in one call when byte-aligned, like direct.
    didx = np.flatnonzero(kinds_a == 3)
    if didx.size:
        c = counts[didx]
        base_u = np.array(
            [seg_meta[i][0] & _U64_MASK for i in didx], np.uint64
        )
        d0s = [seg_meta[i][1] for i in didx]
        d0_u = np.array([d & _U64_MASK for d in d0s], np.uint64)
        d0_neg = np.array([d < 0 for d in d0s], bool)
        ends_l = np.cumsum(c)
        first = ends_l - c
        inc = np.zeros(int(ends_l[-1]), np.uint64)
        nds = np.maximum(c - 2, 0)  # tail increments per segment
        is_var = np.array([seg_meta[i][2] is not None for i in didx], bool)
        # fixed delta: the tail step is exactly d0 throughout
        fix = ~is_var & (nds > 0)
        if fix.any():
            _scatter_ranges(inc, first[fix] + 2, nds[fix],
                            np.repeat(d0_u[fix], nds[fix]))
        if is_var.any():
            bview = np.frombuffer(b, np.uint8)
            offs = np.array(
                [seg_meta[i][2] if seg_meta[i][2] is not None else 0
                 for i in didx], np.int64
            )
            ws = np.array(
                [seg_meta[i][3] if seg_meta[i][3] is not None else 0
                 for i in didx], np.int64
            )
            aligned = is_var & (nds > 0) & ((nds * ws) % 8 == 0)
            for w in np.unique(ws[aligned]).tolist():
                grp = aligned & (ws == w)
                gb = nds[grp] * w // 8
                raw = _gather_ranges(bview, offs[grp], gb)
                dabs = bitunpack(raw.tobytes(), w, int(nds[grp].sum()))
                neg = np.repeat(d0_neg[grp], nds[grp])
                _scatter_ranges(inc, first[grp] + 2, nds[grp],
                                np.where(neg, np.uint64(0) - dabs, dabs))
            for j in np.flatnonzero(is_var & (nds > 0) & ~aligned):
                n_d = int(nds[j])
                w = int(ws[j])
                dabs = bitunpack(
                    b[offs[j] : offs[j] + (n_d * w + 7) // 8], w, n_d
                )
                if d0_neg[j]:
                    dabs = np.uint64(0) - dabs
                inc[first[j] + 2 : first[j] + 2 + n_d] = dabs
        has2 = c > 1
        inc[first[has2] + 1] = d0_u[has2]
        inc[first] = base_u
        csum = np.cumsum(inc, dtype=np.uint64)
        prefix = csum[first] - base_u  # running total before each seg
        vals = csum - np.repeat(prefix, c)
        _scatter_ranges(out, starts[didx], c, vals)

    return out.view(np.int64) if signed else out


def rle_v2_has_patched(buf) -> bool:
    """Header-only scan: True iff any run in ``buf`` uses the
    patched-base sub-encoding (kind 2) — the ONLY RLEv2 wire that
    changed in engine 4.0 (patch-entry width rounding, sign-bit-safe
    base bytes). Walks the same headers as ``decode_int_rle_v2``'s
    pass 1 but never touches a payload, so pre-4.0 blobs whose
    short-repeat/direct/delta streams are byte-identical across
    versions stay decodable (deserialize_blob's cross-major gate calls
    this instead of refusing every rle_v2 blob)."""
    b = bytes(buf)
    L = len(b)
    pos = 0
    while pos < L:
        h0 = b[pos]
        kind = h0 >> 6
        if kind == 0:  # short repeat
            pos += 1 + (((h0 >> 3) & 0x7) + 1)
        elif kind == 1:  # direct
            w = code_width((h0 >> 1) & 0x1F)
            n = (((h0 & 1) << 8) | b[pos + 1]) + 1
            pos += 2 + (n * w + 7) // 8
        elif kind == 2:  # patched base
            return True
        else:  # delta
            dfield = (h0 >> 1) & 0x1F
            n = (((h0 & 1) << 8) | b[pos + 1]) + 1
            pos += 2
            _, pos = decode_varint_one(b, pos)  # base
            _, pos = decode_varint_one(b, pos)  # d0
            if dfield:
                if n < 2:
                    raise ValueError(
                        "rle_v2: variable-width delta run with n < 2"
                    )
                pos += ((n - 2) * code_width(dfield) + 7) // 8
    return False
