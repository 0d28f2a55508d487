"""Pure-Python LZO1X codec (compressor + full-spec decompressor).

Closes the last proto-parity gap: the reference lists LZO as a block
compression kind (`protos/orc_proto.proto:217-224`) but never implements
it — neither do Apache ORC's own writers (C++/Java both refuse to WRITE
LZO) — yet Apache ORC C++ ships a vendored LZO1X *decompressor*, so
files we write with this compressor are externally validated end-to-end
by `pyarrow.orc` (tests/test_lzo.py).

The bitstream follows the public LZO1X format description (Linux kernel
``Documentation/lzo.txt``: the instruction encodings, the literal-run
"state" machine, and the ``17 0 0`` end-of-stream marker). This is a
from-scratch implementation of that spec, not a port of liblzo2.

Instruction set recap (encoder output marked *):
- first byte 18..255: copy (byte-17) literals (1..238), state=min(4,n) *
- ``0000 LLLL`` with state 0: literal run, length 3+L or 18+ext *
- ``0000 DDSS`` with state 1..3: 2-byte copy, distance (H<<2)+D+1
- ``0000 DDSS`` with state 4: 3-byte copy, distance (H<<2)+D+2049
- ``0001 HLLL`` (M4): length 2+L (L=0: 9+ext), LE16 -> distance
  16384+(H<<14)+(v>>2), state=v&3; distance 16384 == end of stream *
- ``001L LLLL`` (M3): length 2+L (L=0: 33+ext), LE16 -> distance
  (v>>2)+1, state=v&3 *
- ``01LD DDSS`` / ``1LLD DDSS`` (M2): length 3..4 / 5..8, one byte H ->
  distance (H<<3)+D+1, state=SS *
A match's low-2 "state" bits say how many literals (0..3) follow it
verbatim; runs of >=4 literals take a run instruction, and two run
instructions can never be adjacent (the encoder merges runs, so the
state machine's constraint is satisfied by construction).

Compressor: greedy hash-4 chaining into a 64k last-position table,
16-byte-chunk match extension, LZ4-style skip acceleration on
incompressible stretches. Matches need length >= 4 and distance <=
49151 (the M4 ceiling); distance == 16384 is forced to M3 because the
same value under M4 means EOS.

This codec is a completeness/parity path, not the hot path — the auto
chooser never selects it (zstd/snappy dominate on both axes), so the
pure-Python speed (~5-20 MB/s) only ever sees the bounded inputs of the
compression_variants query and the ORC interop tests.
"""

from __future__ import annotations

_EOS = b"\x11\x00\x00"  # M4 with LE16 0 -> distance 16384 -> end of stream

_MAX_DIST = 49_151  # M4 ceiling: 16384 + (1 << 14) + 16383
_M2_MAX_DIST = 2_048
_M3_MAX_DIST = 16_384  # inclusive; d == 16384 MUST use M3 (M4 16384 is EOS)
_MIN_MATCH = 4

_HASH_MUL = 0x9E3779B1  # Fibonacci hashing of the 4-byte window
_HASH_BITS = 16  # 64k-entry last-position table
_HASH_SHIFT = 32 - _HASH_BITS


def _ext_length(rem: int) -> bytes:
    """Length-extension run: rem = 255*zeros + final with final in 1..255."""
    z, final = divmod(rem - 1, 255)
    return b"\x00" * z + bytes([final + 1])


def _emit_match(out: bytearray, dist: int, mlen: int) -> int:
    """Append one match instruction with state bits 0; return the index
    of the byte holding the state bits (low 2 bits, patched later when
    1..3 literals trail this match)."""
    if dist <= _M2_MAX_DIST and mlen <= 8:
        dd = dist - 1
        if mlen <= 4:
            out.append(64 + ((mlen - 3) << 5) + ((dd & 7) << 2))
        else:
            out.append(128 + ((mlen - 5) << 5) + ((dd & 7) << 2))
        ss_at = len(out) - 1  # SS lives in the opcode byte for M2
        out.append(dd >> 3)
        return ss_at
    if dist <= _M3_MAX_DIST:
        if mlen <= 33:
            out.append(32 + (mlen - 2))
        else:
            out.append(32)
            out += _ext_length(mlen - 33)
        v = (dist - 1) << 2
    else:
        e = dist - 16384
        if mlen <= 9:
            out.append(16 + ((e >> 14) << 3) + (mlen - 2))
        else:
            out.append(16 + ((e >> 14) << 3))
            out += _ext_length(mlen - 9)
        v = (e & 16383) << 2
    out.append(v & 0xFF)  # LE16 low byte carries SS in its low 2 bits
    out.append(v >> 8)
    return len(out) - 2


def lzo1x_compress(data: bytes) -> bytes:
    """Compress ``data`` into one raw LZO1X bitstream (EOS included)."""
    d = bytes(data)
    n = len(d)
    out = bytearray()
    if n == 0:
        out += _EOS
        return bytes(out)
    import numpy as np

    # vectorized Fibonacci hash of every 4-byte window (one numpy pass;
    # the sequential loop below then only does list lookups)
    a = np.frombuffer(d, dtype=np.uint8)
    if n >= 4:
        seqs = (
            a[: n - 3].astype(np.uint32)
            | (a[1 : n - 2].astype(np.uint32) << np.uint32(8))
            | (a[2 : n - 1].astype(np.uint32) << np.uint32(16))
            | (a[3:n].astype(np.uint32) << np.uint32(24))
        )
        hs = ((seqs * np.uint32(_HASH_MUL)) >> np.uint32(_HASH_SHIFT)).tolist()
    else:
        hs = []
    table = [-1] * (1 << _HASH_BITS)
    mv = memoryview(d)
    ip = 0
    lit_start = 0
    ss_at = -1  # patch index of the last match's state bits (-1: none yet)
    at_start = True

    def flush_run(run_len: int) -> None:
        """Emit the pending literal run d[lit_start:lit_start+run_len]."""
        nonlocal at_start, ss_at
        lo = lit_start
        if at_start:
            at_start = False
            if run_len == 0:
                return
            if run_len <= 238:
                # first-byte special: 18..255 copies 1..238 literals
                out.append(17 + run_len)
                out.extend(d[lo : lo + run_len])
                return
            # longer first run: fall through to the regular instruction
            # (legal — initial state is 0)
        if run_len == 0:
            return
        if run_len <= 3:
            # rides in the previous match's state bits; by construction a
            # 1..3 run mid-stream always follows a match instruction
            out[ss_at] |= run_len
            out.extend(d[lo : lo + run_len])
            return
        if run_len <= 18:
            out.append(run_len - 3)
        else:
            out.append(0)
            out.extend(_ext_length(run_len - 18))
        out.extend(d[lo : lo + run_len])

    while ip < n - 3:
        h = hs[ip]
        cand = table[h]
        table[h] = ip
        if (
            cand >= 0
            and ip - cand <= _MAX_DIST
            and d[cand : cand + 4] == d[ip : ip + 4]
        ):
            dist = ip - cand
            mlen = 4
            limit = n - ip
            while (
                mlen + 16 <= limit
                and mv[cand + mlen : cand + mlen + 16]
                == mv[ip + mlen : ip + mlen + 16]
            ):
                mlen += 16
            while mlen < limit and d[cand + mlen] == d[ip + mlen]:
                mlen += 1
            flush_run(ip - lit_start)
            ss_at = _emit_match(out, dist, mlen)
            # seed the table inside long matches (sparsely) so repeats
            # just past a long match still find a candidate
            end = ip + mlen
            step = 1 if mlen <= 32 else 13
            pos = ip + 1
            stop = min(end, n - 3)
            while pos < stop:
                table[hs[pos]] = pos
                pos += step
            ip = end
            lit_start = ip
        else:
            ip += 1 + ((ip - lit_start) >> 5)
    flush_run(n - lit_start)
    out += _EOS
    return bytes(out)


def lzo1x_decompress(src: bytes, max_out: int | None = None) -> bytes:
    """Decode one raw LZO1X bitstream (full instruction set, version-0).

    Stops at the EOS marker; raises ValueError on truncation, on a
    back-reference beyond the produced output, on trailing garbage, and
    (when ``max_out`` is given) on output exceeding that bound — the
    corruption-fuzz contract the repo's other decoders follow.
    """
    s = bytes(src)
    try:
        return _decode(s, max_out)
    except IndexError:
        raise ValueError("lzo1x: truncated stream") from None


def _decode(s: bytes, max_out: int | None) -> bytes:
    out = bytearray()
    bound = max_out if max_out is not None else float("inf")
    ip = 0
    state = 0
    t = s[0]
    if t == 17 and len(s) >= 5:
        # spec: a leading 17 is a bitstream-version byte only when the
        # stream is >= 5 bytes; the bare 3-byte EOS (empty input) starts
        # with 17 as a regular M4 instruction
        raise ValueError("lzo1x: version-1 (RLE) bitstream unsupported")
    if t > 17:
        ip = 1
        cnt = t - 17
        if len(out) + cnt > bound:
            raise ValueError("lzo1x: output exceeds declared size")
        if ip + cnt > len(s):
            raise ValueError("lzo1x: truncated stream")
        out += s[ip : ip + cnt]
        ip += cnt
        state = 4 if cnt >= 4 else cnt
    while True:
        t = s[ip]
        ip += 1
        if t < 16:
            if state == 0:
                if t == 0:
                    cnt = 15
                    while s[ip] == 0:
                        cnt += 255
                        ip += 1
                        if cnt > bound and max_out is not None:
                            raise ValueError("lzo1x: run exceeds size")
                    cnt += s[ip]
                    ip += 1
                    length = 3 + cnt
                else:
                    length = 3 + t
                if len(out) + length > bound:
                    raise ValueError("lzo1x: output exceeds declared size")
                if ip + length > len(s):
                    raise ValueError("lzo1x: truncated stream")
                out += s[ip : ip + length]
                ip += length
                state = 4
                continue
            if state == 4:
                dist = (s[ip] << 2) + (t >> 2) + 2049
                length = 3
            else:  # state 1..3
                dist = (s[ip] << 2) + (t >> 2) + 1
                length = 2
            ip += 1
            ss = t & 3
        elif t < 32:  # M4
            length = t & 7
            if length == 0:
                cnt = 7
                while s[ip] == 0:
                    cnt += 255
                    ip += 1
                    if max_out is not None and cnt > bound:
                        raise ValueError("lzo1x: run exceeds size")
                cnt += s[ip]
                ip += 1
                length = cnt
            length += 2
            v = s[ip] | (s[ip + 1] << 8)
            ip += 2
            dist = 16384 + ((t & 8) << 11) + (v >> 2)
            ss = v & 3
            if dist == 16384:
                if ss:
                    raise ValueError("lzo1x: literals trail the EOS marker")
                if ip != len(s):
                    raise ValueError("lzo1x: trailing garbage after EOS")
                return bytes(out)
        elif t < 64:  # M3
            length = t & 31
            if length == 0:
                cnt = 31
                while s[ip] == 0:
                    cnt += 255
                    ip += 1
                    if max_out is not None and cnt > bound:
                        raise ValueError("lzo1x: run exceeds size")
                cnt += s[ip]
                ip += 1
                length = cnt
            length += 2
            v = s[ip] | (s[ip + 1] << 8)
            ip += 2
            dist = (v >> 2) + 1
            ss = v & 3
        else:  # M2
            if t < 128:
                length = 3 + ((t >> 5) & 1)
            else:
                length = 5 + ((t >> 5) & 3)
            dist = (s[ip] << 3) + ((t >> 2) & 7) + 1
            ip += 1
            ss = t & 3
        start = len(out) - dist
        if start < 0:
            raise ValueError("lzo1x: back-reference beyond output start")
        if len(out) + length > bound:
            raise ValueError("lzo1x: output exceeds declared size")
        if dist >= length:
            out += out[start : start + length]
        else:
            # overlapping copy: repeat the dist-byte tail
            seg = bytes(out[start:])
            reps = length // dist + 1
            out += (seg * reps)[:length]
        if ss:
            if ip + ss > len(s):
                raise ValueError("lzo1x: truncated stream")
            if len(out) + ss > bound:
                raise ValueError("lzo1x: output exceeds declared size")
            out += s[ip : ip + ss]
            ip += ss
        state = ss
