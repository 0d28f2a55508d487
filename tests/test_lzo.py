"""LZO1X codec: roundtrips, full-spec decode forms, corruption, and the
Apache ORC C++ external oracle (pyarrow.orc reads our LZO ORC files).

The bitstream spec is the public LZO1X format description (Linux kernel
Documentation/lzo.txt). The reference lists LZO in its proto
(protos/orc_proto.proto:217-224) but never implements it; neither does
any Apache writer — so the only way to get an externally-validated LZO
ORC file is to write the compressor ourselves (codecs/lzo.py).
"""

import os
import random

import numpy as np
import pyarrow as pa
import pytest

from orc_format_spark.codecs.lzo import lzo1x_compress, lzo1x_decompress


# ------------------------------------------------------------ roundtrip


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"ab",
        b"abc",
        b"abcd",
        b"aaaa" * 100,
        b"hello world " * 1000,
        bytes(range(256)) * 5,
        b"\x00" * 100_000,
    ],
    ids=["empty", "1B", "2B", "3B", "4B", "rep4", "text", "cycle", "zeros"],
)
def test_roundtrip_edges(data):
    assert lzo1x_decompress(lzo1x_compress(data), max_out=len(data)) == data


def test_roundtrip_fuzz():
    rng = random.Random(20260819)
    for trial in range(300):
        n = rng.randint(0, 5000)
        mode = rng.random()
        if mode < 0.3:
            b = rng.randbytes(n)
        elif mode < 0.6:
            alpha = bytes(rng.choices(b"abcd", k=max(1, n // 10)))
            b = bytes(rng.choices(alpha, k=n)) if n else b""
        else:
            seed = rng.randbytes(rng.randint(1, 200))
            b = (seed * (n // len(seed) + 1))[:n]
        c = lzo1x_compress(b)
        assert lzo1x_decompress(c, max_out=n) == b, f"trial {trial}"


def test_roundtrip_long_runs_and_far_matches():
    rng = random.Random(7)
    # >238-byte first literal run (first-byte special can't carry it)
    b = rng.randbytes(70_000)
    assert lzo1x_decompress(lzo1x_compress(b), max_out=len(b)) == b
    # far match (M4 territory: distance 16385..49151) and long match
    # (length extension bytes)
    big = rng.randbytes(20_000)
    b = big + b"x" * 5 + big
    assert lzo1x_decompress(lzo1x_compress(b), max_out=len(b)) == b
    # distance > 49151 must NOT be used: self-similar data 60k apart
    far = rng.randbytes(60_000)
    b = far + far
    assert lzo1x_decompress(lzo1x_compress(b), max_out=len(b)) == b
    # overlapping copy (distance < length): single-byte and 3-byte periods
    for period in (1, 3):
        b = (b"XYZ"[:period] * 40_000)[: 40_000 + 7]
        assert lzo1x_decompress(lzo1x_compress(b), max_out=len(b)) == b


def test_compressed_size_beats_raw_on_repetitive_input():
    b = b"0123456789abcdef" * 4096
    assert len(lzo1x_compress(b)) < len(b) // 10


# -------------------------------------------- full-spec decoder forms
# Our encoder never emits the state-dependent 0..15 match forms; craft
# them by hand so the decoder covers the whole public instruction set.


def test_decode_two_byte_copy_state_1_to_3():
    # first byte 19 -> copy 2 literals "ab", state=2
    # then 0b0000_01_01 (t=5): state 1..3 -> 2-byte copy,
    #   D = t>>2 = 1, next byte H=0 -> distance = (0<<2)+1+1 = 2, SS=1
    # copies "ab" (2 bytes from distance 2), then 1 literal "z", then EOS
    s = bytes([19]) + b"ab" + bytes([0b00000101, 0]) + b"z" + b"\x11\x00\x00"
    assert lzo1x_decompress(s) == b"ababz"


def test_decode_three_byte_copy_state_4():
    # literal run of 2100 c's (run instruction, state=4), then t<16 with
    # state 4 -> 3-byte copy from distance (H<<2)+D+2049
    lit = b"c" * 2100
    run = bytes([0]) + _ext_len(2100 - 18) + lit
    # D=0, SS=0, H: distance = (12<<2)+0+2049 = 2097 -> copies "ccc"
    s = run + bytes([0b00000000, 12]) + b"\x11\x00\x00"
    assert lzo1x_decompress(s) == lit + b"ccc"


def _ext_len(rem):
    z, final = divmod(rem - 1, 255)
    return b"\x00" * z + bytes([final + 1])


def test_decode_rejects_corruption():
    good = lzo1x_compress(b"the quick brown fox " * 500)
    # truncations must raise, never hang or return silently
    for cut in (1, 2, len(good) // 2, len(good) - 1):
        with pytest.raises(ValueError):
            lzo1x_decompress(good[:cut], max_out=10_000)
    # trailing garbage after EOS
    with pytest.raises(ValueError):
        lzo1x_decompress(good + b"\x00", max_out=100_000)
    # back-reference before output start: M2 at stream head after 1 literal
    bad = bytes([18]) + b"a" + bytes([0b01000000 | (7 << 2), 255]) + b"\x11\x00\x00"
    with pytest.raises(ValueError):
        lzo1x_decompress(bad, max_out=100)
    # declared-size overflow
    with pytest.raises(ValueError):
        lzo1x_decompress(good, max_out=3)


def test_decode_flip_fuzz_never_hangs():
    rng = random.Random(99)
    base = lzo1x_compress(bytes(rng.randbytes(300)) * 20)
    for trial in range(300):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        try:
            out = lzo1x_decompress(bytes(buf), max_out=len(base) * 64)
            assert len(out) <= len(base) * 64
        except ValueError:
            pass  # raising is the contract; silent wrong output is fine
            # only for flips that happen to decode within bounds


# ------------------------------------------------- block-framing paths


def test_blocks_framing_lzo():
    from orc_format_spark.codecs.blocks import (
        compress_stream,
        decompress_stream,
    )

    rng = random.Random(5)
    for n in (0, 1, 1000, 262_144, 262_145, 600_000):
        data = (rng.randbytes(997) * (n // 997 + 1))[:n]
        buf = compress_stream(data, kind="lzo")
        assert decompress_stream(buf, kind="lzo") == data


# ------------------------------------ external oracle: Apache ORC C++


def _lzo_orc_supported(tmpdir) -> bool:
    import pyarrow.orc as po

    from orc_format_spark.sources.orc_file import write_orc

    path = os.path.join(tmpdir, "probe.orc")
    write_orc(pa.table({"x": pa.array([1, 2, 3], pa.int64())}), path,
              compression="lzo")
    try:
        return po.ORCFile(path).read().column("x").to_pylist() == [1, 2, 3]
    except Exception:
        return False


def test_apache_reads_our_lzo_orc(tmp_path):
    import pyarrow.orc as po

    from orc_format_spark.sources.orc_file import write_orc

    if not _lzo_orc_supported(str(tmp_path)):
        pytest.skip("this pyarrow's ORC build lacks the LZO decompressor")
    rng = np.random.default_rng(11)
    n = 60_000
    tbl = pa.table({
        "a": pa.array(rng.integers(-(2**40), 2**40, n), pa.int64()),
        "s": pa.array(
            [None if i % 97 == 0 else f"cat_{i % 37}" for i in range(n)],
            pa.string(),
        ),
        "f": pa.array(rng.normal(size=n), pa.float64()),
        "b": pa.array((rng.integers(0, 2, n) == 1).tolist(), pa.bool_()),
    })
    path = str(tmp_path / "lzo.orc")
    write_orc(tbl, path, compression="lzo", stripe_rows=16_384)
    back = po.ORCFile(path).read()
    assert back.num_rows == n
    for col in tbl.column_names:
        assert back.column(col).combine_chunks() == tbl.column(
            col
        ).combine_chunks(), col


def test_spark_native_reads_our_lzo_orc(spark, tmp_path):
    """Third independent decoder: Spark's Java ORC reader (aircompressor
    LZO port) — zero code shared with either our writer or Apache C++."""
    from orc_format_spark.sources.orc_file import write_orc

    n = 10_000
    tbl = pa.table({
        "k": pa.array(list(range(n)), pa.int64()),
        "s": pa.array([f"row_{i % 131}" for i in range(n)], pa.string()),
    })
    path = str(tmp_path / "spark_lzo.orc")
    write_orc(tbl, path, compression="lzo")
    df = spark.read.orc(path)
    assert df.count() == n
    got = {r.k: r.s for r in df.collect()}
    assert got == {i: f"row_{i % 131}" for i in range(n)}


def test_own_reader_reads_lzo_orc(tmp_path):
    from orc_format_spark.sources.orc_file import write_orc
    from orc_format_spark.sources.orc_read import read_orc

    rng = np.random.default_rng(13)
    n = 20_000
    tbl = pa.table({
        "a": pa.array(rng.integers(0, 10**6, n), pa.int64()),
        "s": pa.array([f"v{i % 211}" for i in range(n)], pa.string()),
    })
    path = str(tmp_path / "own_lzo.orc")
    write_orc(tbl, path, compression="lzo")
    back = read_orc(path)
    assert back.num_rows == n
    for col in tbl.column_names:
        assert back.column(col).combine_chunks() == tbl.column(
            col
        ).combine_chunks(), col
