"""Hand-derived FSST golden vectors.

The FSST paper (Boncz, Neumann, Leis, VLDB 2020) defines the algorithm —
a 255-symbol table of 1..8-byte symbols, greedy longest-match encoding,
and an escape byte (code 255) prefixing literals — but no file layout;
our wire format is the container's own (fsst.py module docstring). These
vectors are therefore computed BY HAND from the paper's rules plus our
documented layout (u8 n_symbols | per symbol u8 len + bytes |
varint payload_len | payload), so they pin the algorithm semantics
(longest match wins, ties to the table entry, escapes cost 2 bytes,
literal 0xFF must itself be escaped) independently of the encoder's own
code paths — a self-consistent-but-wrong matcher or escape handler fails
here even though roundtrip tests keep passing.
"""

import numpy as np

from orc_format_spark.codecs.fsst import SymbolTable, fsst_decode, fsst_encode

# A fixed table in the spirit of the paper's URL running example.
SYMBOLS = [b"http://", b"www.", b".org", b".com", b"tum", b"de"]


def _table() -> SymbolTable:
    return SymbolTable(SYMBOLS)


def _header() -> bytes:
    out = bytearray([len(SYMBOLS)])
    for s in SYMBOLS:
        out.append(len(s))
        out += s
    return bytes(out)


def test_fsst_golden_longest_match_and_escape():
    # "http://tum.de" -> [http://][tum] esc'.' [de]
    data = np.frombuffer(b"http://tum.de", np.uint8)
    expected = _header() + bytes([5]) + bytes([0, 4, 255, ord("."), 5])
    assert fsst_encode(data, _table()) == expected
    assert fsst_decode(expected).tobytes() == b"http://tum.de"


def test_fsst_golden_prefers_longer_symbol():
    # "www.org" -> [www.] + [.org]? No: greedy left-to-right takes
    # [www.] at pos 0 (4 bytes), then "org" has no symbol ->
    # esc o, esc r, esc g (the paper's worst case: escape doubles).
    data = np.frombuffer(b"www.org", np.uint8)
    expected = (
        _header()
        + bytes([7])
        + bytes([1, 255, ord("o"), 255, ord("r"), 255, ord("g")])
    )
    assert fsst_encode(data, _table()) == expected
    assert fsst_decode(expected).tobytes() == b"www.org"


def test_fsst_golden_escaped_0xff_literal():
    # A literal 0xFF byte must itself be escaped: FF FF on the wire.
    data = np.frombuffer(b"de" + bytes([0xFF, 0xFF]) + b"tum", np.uint8)
    expected = _header() + bytes([6]) + bytes([5, 255, 255, 255, 255, 4])
    assert fsst_encode(data, _table()) == expected
    assert fsst_decode(expected).tobytes() == b"de\xff\xfftum"


def test_fsst_golden_empty_payload():
    expected = _header() + bytes([0])
    assert fsst_encode(np.empty(0, np.uint8), _table()) == expected
    assert fsst_decode(expected).size == 0
