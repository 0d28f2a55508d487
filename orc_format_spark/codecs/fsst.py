"""FSST: Fast Static Symbol Table string compression.

From the public algorithm (Boncz, Neumann, Leis: "FSST: Fast Random Access
String Compression", VLDB 2020) — not in the reference repo; mandated by
BASELINE.json for string columns.

- Symbol table: up to 255 symbols (codes 0..254) of 1..8 bytes; code 255
  is the escape marker (next byte is a literal).
- Training: a few generations of greedy re-encoding of a bounded sample,
  counting gain = frequency x length for current symbols and for
  concatenations of adjacent matches (the paper's iterative scheme,
  simplified). Sample is capped, so training cost is O(1) per partition.
- Encoding: per-position longest-match tables are precomputed with
  vectorized numpy window hashing + searchsorted; the only sequential part
  is an O(#output symbols) jump loop over plain Python ints.
- Decoding: fully vectorized — escape/literal classification by 0xFF-run
  parity, then a repeat/ramp gather to expand symbols.

Layout: u8 n_symbols | per symbol (u8 len | bytes) | varint(payload_len) |
payload.
"""

from __future__ import annotations

import numpy as np

from .varint import decode_varint_one, encode_varint_one

_MAX_SYMBOLS = 255
_ESCAPE = 255
_MAX_LEN = 8
_SAMPLE_BYTES = 1 << 13
_GENERATIONS = 3


def _window_keys(data: np.ndarray, max_len: int) -> list[np.ndarray]:
    """keys[L-1][i] = big-endian integer of data[i:i+L], for i <= n-L."""
    keys: list[np.ndarray] = []
    k = data.astype(np.uint64)
    keys.append(k.copy())
    for L in range(2, max_len + 1):
        k = (k[:-1] << np.uint64(8)) | data[L - 1 :].astype(np.uint64)
        keys.append(k)
    return keys


def _sym_key(s: bytes) -> int:
    return int.from_bytes(s, "big")


def _longest_match(
    d: np.ndarray, keys: list[np.ndarray], table: "SymbolTable"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-position longest symbol match: (match_len, code) arrays."""
    n = d.size
    mlen = np.zeros(n, np.int8)
    mcode = np.zeros(n, np.uint16)
    for L in range(1, min(_MAX_LEN, n) + 1):
        ent = table.by_len.get(L)
        if ent is None:
            continue
        skeys, scodes = ent
        kL = keys[L - 1]
        pos_idx = np.searchsorted(skeys, kL)
        pos_idx[pos_idx == len(skeys)] = 0
        hit = skeys[pos_idx] == kL
        hp = np.flatnonzero(hit)
        mlen[hp] = L  # longer L overwrites (loop ascends)
        mcode[hp] = scodes[pos_idx[hp]]
    return mlen, mcode


def train_symbol_table(sample: bytes) -> list[bytes]:
    """Train an FSST symbol table on a (bounded) sample.

    Each generation greedy-encodes the sample with the current table
    (vectorized longest-match + an O(#matches) jump loop), then
    accumulates gain = frequency x length for every matched symbol and
    every adjacent-pair concatenation <= 8 bytes, keeping the top 255.
    Symbols are handled as (length, big-endian-key) integer pairs so the
    gain accumulation is a lexsort + reduceat, not a dict loop.
    """
    sample = sample[:_SAMPLE_BYTES]
    if not sample:
        return []
    d = np.frombuffer(sample, np.uint8)
    n = d.size
    keys = _window_keys(d, min(_MAX_LEN, n))
    table: list[bytes] = []
    for _ in range(_GENERATIONS):
        mlen, _ = _longest_match(d, keys, SymbolTable(table))
        ml = mlen.tolist()
        starts: list[int] = []
        i = 0
        while i < n:
            starts.append(i)
            l = ml[i]
            i += l if l else 1
        s_arr = np.array(starts, np.int64)
        l_arr = np.maximum(mlen[s_arr].astype(np.int64), 1)
        k_arr = np.empty(s_arr.size, np.uint64)
        for L in range(1, min(_MAX_LEN, n) + 1):
            m = l_arr == L
            if m.any():
                k_arr[m] = keys[L - 1][s_arr[m]]
        # adjacent-pair concatenations (<= 8 bytes)
        la, lb = l_arr[:-1], l_arr[1:]
        lc = la + lb
        pm = lc <= _MAX_LEN
        kc = (k_arr[:-1][pm] << (np.uint64(8) * lb[pm].astype(np.uint64))) | k_arr[1:][
            pm
        ]
        all_k = np.concatenate((k_arr, kc))
        all_l = np.concatenate((l_arr, lc[pm]))
        order = np.lexsort((all_k, all_l))
        sk, sl = all_k[order], all_l[order]
        new_grp = np.ones(sk.size, bool)
        new_grp[1:] = (sk[1:] != sk[:-1]) | (sl[1:] != sl[:-1])
        gstart = np.flatnonzero(new_grp)
        counts = np.diff(np.append(gstart, sk.size))
        g_l = sl[gstart]
        g_k = sk[gstart]
        gain = g_l * counts
        # deterministic top-255: by (-gain, len, key)
        top = np.lexsort((g_k, g_l, -gain))[:_MAX_SYMBOLS]
        table = [
            int(g_k[t]).to_bytes(int(g_l[t]), "big") for t in top
        ]
    return sorted(table)


class SymbolTable:
    def __init__(self, symbols: list[bytes]):
        self.symbols = symbols
        self.by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for L in range(1, _MAX_LEN + 1):
            idx = [i for i, s in enumerate(symbols) if len(s) == L]
            if idx:
                keys = np.array([_sym_key(symbols[i]) for i in idx], np.uint64)
                order = np.argsort(keys)
                self.by_len[L] = (keys[order], np.array(idx, np.uint16)[order])

    def serialize(self) -> bytes:
        parts = [bytes((len(self.symbols),))]
        for s in self.symbols:
            parts.append(bytes((len(s),)))
            parts.append(s)
        return b"".join(parts)

    @classmethod
    def deserialize(cls, buf, pos: int = 0) -> tuple["SymbolTable", int]:
        n = buf[pos]
        pos += 1
        syms = []
        for _ in range(n):
            L = buf[pos]
            pos += 1
            syms.append(bytes(buf[pos : pos + L]))
            pos += L
        return cls(syms), pos


def fsst_encode(data: np.ndarray, table: SymbolTable | None = None) -> bytes:
    """Encode a uint8 array. Trains a table on a sample if none given."""
    d = np.ascontiguousarray(data, np.uint8)
    n = d.size
    if table is None:
        table = SymbolTable(train_symbol_table(d[: _SAMPLE_BYTES].tobytes()))
    header = table.serialize()
    if n == 0:
        return header + encode_varint_one(0)
    # longest-match precompute
    if table.symbols:
        keys = _window_keys(d, min(_MAX_LEN, n))
        mlen, mcode = _longest_match(d, keys, table)
    else:
        mlen = np.zeros(n, np.int8)
        mcode = np.zeros(n, np.uint16)
    # jump loop over output symbols (plain ints for speed)
    ml = mlen.tolist()
    mc = mcode.tolist()
    dv = d.tolist()
    out = bytearray()
    i = 0
    while i < n:
        l = ml[i]
        if l:
            out.append(mc[i])
            i += l
        else:
            out.append(_ESCAPE)
            out.append(dv[i])
            i += 1
    return header + encode_varint_one(len(out)) + bytes(out)


def fsst_decode(buf) -> np.ndarray:
    table, pos = SymbolTable.deserialize(buf, 0)
    plen, pos = decode_varint_one(buf, pos)
    enc = np.frombuffer(buf, np.uint8, plen, pos)
    n = enc.size
    if n == 0:
        return np.empty(0, np.uint8)
    # classify escape / literal / code positions by 0xFF-run parity
    is_ff = enc == _ESCAPE
    literal = np.zeros(n, bool)
    escape = np.zeros(n, bool)
    if is_ff.any():
        prev_ff = np.concatenate(([False], is_ff[:-1]))
        starts = np.flatnonzero(is_ff & ~prev_ff)
        nxt = np.concatenate((is_ff[1:], [False]))
        ends = np.flatnonzero(is_ff & ~nxt)  # inclusive block ends
        for s, e in zip(starts.tolist(), ends.tolist()):
            k = e - s + 1
            escape[s : e + 1 : 2] = True
            literal[s + 1 : e + 1 : 2] = True
            if k % 2 == 1 and e + 1 < n:
                literal[e + 1] = True
    code_pos = ~escape & ~literal
    # per-position output lengths
    sym_lens = np.array([len(s) for s in table.symbols] + [0], np.int64)
    out_len = np.zeros(n, np.int64)
    out_len[literal] = 1
    cp = np.flatnonzero(code_pos)
    codes = enc[cp].astype(np.int64)
    if codes.size and table.symbols and int(codes.max()) >= len(table.symbols):
        raise ValueError("FSST code out of range")
    out_len[cp] = sym_lens[codes] if table.symbols else 0
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(out_len, out=out_off[1:])
    total = int(out_off[-1])
    out = np.empty(total, np.uint8)
    # literals
    lit_idx = np.flatnonzero(literal)
    out[out_off[lit_idx]] = enc[lit_idx]
    # symbols: gather from concatenated symbol payload
    if table.symbols and cp.size:
        payload = np.frombuffer(b"".join(table.symbols), np.uint8)
        soff = np.zeros(len(table.symbols) + 1, np.int64)
        np.cumsum(sym_lens[:-1], out=soff[1:])
        lens = sym_lens[codes]
        tot = int(lens.sum())
        rep_starts = np.repeat(soff[codes], lens)
        dst_starts = np.repeat(out_off[cp], lens)
        ramp = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        out[dst_starts + ramp] = payload[rep_starts + ramp]
    return out
