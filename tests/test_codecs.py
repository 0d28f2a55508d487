"""Roundtrip + property tests for RLEv2, FoR/bitpack, dictionary, FSST,
timestamp compaction, and the blob container (SURVEY.md section 5.2)."""

import numpy as np
import pyarrow as pa
import pytest

from orc_format_spark.codecs.bitpack import (
    bitpack,
    bitunpack,
    decode_for_bitpack,
    encode_for_bitpack,
)
from orc_format_spark.codecs.container import (
    decode_table,
    encode_table,
    table_checksum,
)
from orc_format_spark.codecs.dictionary import (
    decode_dict_bytes,
    decode_dict_int,
    encode_dict_bytes,
    encode_dict_int,
)
from orc_format_spark.codecs.fsst import fsst_decode, fsst_encode
from orc_format_spark.codecs.rle_v2 import decode_int_rle_v2, encode_int_rle_v2
from orc_format_spark.codecs.selector import select_int_codec, select_str_codec
from orc_format_spark.codecs.timestamp import (
    compact_nanos,
    decode_timestamp_us,
    encode_timestamp_us,
    expand_nanos,
)

RNG = np.random.default_rng(7)


def _int_cases(signed=True):
    lo, hi = (-(2**31), 2**31) if signed else (0, 2**32)
    dt = np.int64 if signed else np.uint64
    yield np.array([], dt)
    yield np.array([42], dt)
    yield np.array([7] * 5, dt)  # short repeat
    yield np.array([7] * 600, dt)  # long fixed-delta run
    yield np.arange(0, 100000, 7, dtype=dt)  # monotonic
    yield np.arange(100000, 0, -3, dtype=dt)[:5000]  # decreasing
    yield RNG.integers(lo, hi, 10000).astype(dt)  # direct
    # patched-base shape: mostly small with a few huge outliers
    base = RNG.integers(0, 1 << 10, 2000).astype(dt)
    out_idx = RNG.choice(2000, 10, replace=False)
    base[out_idx] = RNG.integers(1 << 40, 1 << 44, 10).astype(dt)
    yield base
    yield RNG.zipf(1.5, 5000).astype(dt)
    if signed:
        yield np.array([2**62, -(2**62), 2**63 - 1, -(2**63), 0, 1, -1], np.int64)
    else:
        yield np.array([2**64 - 1, 0, 2**63, 1], np.uint64)


@pytest.mark.parametrize("signed", [True, False])
def test_rle_v2_roundtrip(signed):
    for case in _int_cases(signed):
        enc = encode_int_rle_v2(case, signed)
        dec = decode_int_rle_v2(enc, signed)
        assert np.array_equal(dec, case.astype(dec.dtype)), f"len={len(case)}"


def test_rle_v2_compresses_runs_and_ramps():
    run = np.full(10000, 123, np.int64)
    assert len(encode_int_rle_v2(run, True)) < 200
    ramp = np.arange(10000, dtype=np.int64)
    assert len(encode_int_rle_v2(ramp, True)) < 400


@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 13, 24, 33, 63, 64])
def test_bitpack_roundtrip(width):
    n = 1000
    if width == 64:
        v = RNG.integers(0, 2**63, n).astype(np.uint64) * 2 + 1
    else:
        v = RNG.integers(0, 2**width if width else 1, n).astype(np.uint64)
    packed = bitpack(v, width)
    assert len(packed) == (n * width + 7) // 8
    assert np.array_equal(bitunpack(packed, width, n), v)


@pytest.mark.parametrize("signed", [True, False])
def test_for_bitpack_roundtrip(signed):
    for case in _int_cases(signed):
        if signed and case.size and (case.max() > 2**62 or case.min() < -(2**62)):
            continue  # FoR range must fit u64; selector guards this
        enc = encode_for_bitpack(case, signed)
        dec = decode_for_bitpack(enc, signed)
        assert np.array_equal(dec, case.astype(dec.dtype))


def test_dict_int_roundtrip():
    v = RNG.integers(0, 50, 20000).astype(np.int64) * 1000 - 25000
    enc = encode_dict_int(v, True)
    assert np.array_equal(decode_dict_int(enc, True), v)
    assert len(enc) < v.nbytes / 5


def _flat(strings):
    data = np.frombuffer(b"".join(strings), np.uint8)
    off = np.zeros(len(strings) + 1, np.int64)
    np.cumsum([len(s) for s in strings], out=off[1:])
    return data, off


def test_dict_bytes_roundtrip():
    words = [b"alpha", b"beta", b"gamma", b"", b"delta-delta"]
    strings = [words[i] for i in RNG.integers(0, 5, 5000)]
    data, off = _flat(strings)
    enc = encode_dict_bytes(data, off)
    ddata, doff = decode_dict_bytes(enc)
    assert np.array_equal(doff, off)
    assert np.array_equal(ddata, data)
    assert len(enc) < data.nbytes / 3


def test_fsst_roundtrip_text():
    text = (
        b"the quick brown fox jumps over the lazy dog; "
        b"pack my box with five dozen liquor jugs. " * 500
    )
    data = np.frombuffer(text, np.uint8)
    enc = fsst_encode(data)
    assert np.array_equal(fsst_decode(enc), data)
    assert len(enc) < len(text) / 2  # real compression on repetitive text


def test_fsst_roundtrip_binary_with_ff():
    data = RNG.integers(0, 256, 5000).astype(np.uint8)
    data[100:200] = 255  # escape storms
    enc = fsst_encode(data)
    assert np.array_equal(fsst_decode(enc), data)


def test_fsst_empty():
    enc = fsst_encode(np.empty(0, np.uint8))
    assert fsst_decode(enc).size == 0


def test_compact_nanos_golden():
    nanos = np.array([0, 1, 100, 1000, 100000000, 999999999, 123456700], np.int64)
    enc = compact_nanos(nanos)
    #  z<2 -> nanos<<3 ; z>=2 -> (nanos/10^z)<<3 | (z-1)  (timestamp.rs:107-133)
    assert enc[0] == 0
    assert enc[1] == 1 << 3
    assert enc[2] == (1 << 3) | 1  # 100 = 1e2 -> val 1, tz 1
    assert enc[3] == (1 << 3) | 2  # 1000 -> val 1, tz 2
    assert enc[4] == (1 << 3) | 7  # 1e8 -> val 1, tz 7
    assert enc[5] == 999999999 << 3
    assert enc[6] == (1234567 << 3) | 1
    assert np.array_equal(expand_nanos(enc), nanos)


def test_timestamp_roundtrip():
    ts = RNG.integers(-2**40, 2**43, 10000).astype(np.int64)  # us, ~1938-2248
    ts = np.append(ts, [0, 1420070400_000000, -1])
    enc = encode_timestamp_us(ts)
    assert np.array_equal(decode_timestamp_us(enc), ts)


def test_selector_picks_sensible_codecs():
    run_heavy = np.repeat(np.arange(50, dtype=np.int64), 200)
    c, est = select_int_codec(run_heavy)
    assert c in ("rle_v1", "rle_v2", "dict_int")
    small_range = RNG.integers(1000, 1032, 10000).astype(np.int64)
    c2, est2 = select_int_codec(small_range)
    assert est2[c2] <= min(est2.values())
    strings = [b"GET", b"PUT", b"POST"] * 2000
    data, off = _flat(strings)
    c3, _ = select_str_codec(data, off)
    assert c3 == "dict_str"


# ------------------------------------------------------------- container


def _sample_table(n=3000):
    rng = np.random.default_rng(11)
    ints = rng.integers(-(2**40), 2**40, n)
    ints32 = rng.integers(0, 100, n).astype(np.int32)
    flags = rng.integers(0, 2, n).astype(bool)
    floats = rng.normal(size=n).astype(np.float32)
    doubles = rng.normal(size=n) * 1e6
    words = np.array(["alpha", "beta", "gamma", "delta"], object)
    strs = words[rng.integers(0, 4, n)]
    ts = rng.integers(0, 2**44, n).view("datetime64[us]")
    lists = pa.array(
        [rng.integers(0, 1000, rng.integers(0, 20)).astype(np.int32) for _ in range(n)],
        pa.list_(pa.int32()),
    )
    dec = pa.array([round(float(x), 2) for x in rng.normal(size=n) * 1000]).cast(
        pa.decimal128(12, 2)
    )
    cols = {
        "k": pa.array(ints),
        "small": pa.array(ints32),
        "flag": pa.array(flags),
        "f": pa.array(floats),
        "d": pa.array(doubles),
        "s": pa.array(strs),
        "ts": pa.array(ts),
        "toks": lists,
        "dec": dec,
    }
    return pa.table(cols)


@pytest.mark.parametrize("compression", ["none", "zstd", "snappy", "zlib", "lz4"])
@pytest.mark.parametrize("codec", ["auto", "rle_v1", "rle_v2"])
def test_container_roundtrip(codec, compression):
    tbl = _sample_table(1200)
    blob, lineage = encode_table(tbl, codec=codec, compression=compression)
    back = decode_table(blob)
    assert back.schema.names == tbl.schema.names
    for name in tbl.column_names:
        a, b = tbl.column(name).combine_chunks(), back.column(name).combine_chunks()
        assert a.cast(b.type).equals(b), name
    assert table_checksum(tbl) == table_checksum(back)
    assert {l["column"] for l in lineage} >= set(tbl.column_names)


def test_container_roundtrip_with_nulls():
    n = 2000
    rng = np.random.default_rng(3)
    mask = rng.integers(0, 4, n) == 0
    ints = pa.array(
        [None if m else int(x) for m, x in zip(mask, rng.integers(0, 10**6, n))]
    )
    strs = pa.array(
        [None if m else s for m, s in zip(mask[::-1], ["ab", "cdef", "ghi", ""] * 500)]
    )
    lists = pa.array(
        [None if i % 7 == 0 else list(range(i % 5)) for i in range(n)],
        pa.list_(pa.int32()),
    )
    tbl = pa.table({"i": ints, "s": strs, "l": lists})
    blob, _ = encode_table(tbl)
    back = decode_table(blob)
    for name in tbl.column_names:
        assert tbl.column(name).combine_chunks().cast(
            back.column(name).type
        ).equals(back.column(name).combine_chunks()), name


def test_container_compression_beats_raw_on_compressible():
    n = 50000
    tbl = pa.table({"v": pa.array(np.arange(n, dtype=np.int64) // 13)})
    blob, lineage = encode_table(tbl, codec="auto", compression="zstd")
    assert len(blob) < n * 8 / 50


def test_struct_map_roundtrip():
    """W9/W11 parity: struct (PRESENT only + recursive children,
    struct_.rs:26-28) and map (LENGTH + key/value children, map.rs:61-83)
    columns survive the blob container bit-identically."""
    import pyarrow as pa

    from orc_format_spark.codecs.container import (
        decode_table,
        encode_table,
        table_checksum,
    )

    struct_arr = pa.array(
        [
            {"a": 1, "b": "x", "c": [1, 2]},
            None,
            {"a": None, "b": "yy", "c": []},
            {"a": 3, "b": None, "c": [7]},
        ]
        * 50,
        pa.struct(
            [("a", pa.int64()), ("b", pa.string()), ("c", pa.list_(pa.int32()))]
        ),
    )
    map_arr = pa.array(
        [[("k1", 1), ("k2", 2)], None, [], [("k3", None)]] * 50,
        pa.map_(pa.string(), pa.int64()),
    )
    tbl = pa.table(
        {"id": pa.array(range(200), pa.int64()), "s": struct_arr, "m": map_arr}
    )
    blob, lineage = encode_table(tbl, codec="auto", compression="zstd")
    dec = decode_table(blob)
    assert dec.schema == tbl.schema
    for c in tbl.column_names:
        assert dec.column(c).to_pylist() == tbl.column(c).to_pylist()
    assert table_checksum(dec) == table_checksum(tbl)
    codecs = {l["column"]: l["codec"] for l in lineage}
    assert codecs["s"] == "struct" and codecs["m"] == "map"


def test_auto_beats_reference_mode():
    """North-rule size gate: auto codec selection must compress at least
    as well as 'reference mode' — the reference writer's fixed encodings
    (SignedIntRLEv1 ints per long.rs:24-27, raw strings per
    string.rs:24-28, zstd level 3 / 256 KiB blocks per zstd.rs:15-19) —
    on the same partitions."""
    import glob

    import pyarrow.parquet as pq

    from orc_format_spark.codecs.container import decode_table, encode_table

    for table in ("documents", "lineitem", "orders"):
        f = glob.glob(f"/root/testdata/sf0.001/{table}.parquet")[0]
        tbl = pq.read_table(f)
        auto_blob, _ = encode_table(tbl, codec="auto", compression="zstd")
        ref_blob, ref_lin = encode_table(tbl, codec="reference", compression="zstd")
        assert {l["codec"] for l in ref_lin if l["codec"] not in ("list", "struct", "map")} <= {
            "rle_v1", "raw_str", "bool_rle", "raw_float", "raw_double", "timestamp"
        }
        assert len(auto_blob) <= len(ref_blob), (table, len(auto_blob), len(ref_blob))
        # both modes stay lossless
        for blob in (auto_blob, ref_blob):
            dec = decode_table(blob)
            for c in tbl.column_names:
                assert dec.column(c).to_pylist() == tbl.column(c).to_pylist()


def test_decimal128_high_precision_roundtrip():
    """E8 parity: i128 zigzag varints (reference varint.rs:60-108) for
    decimal precision > 18, including negatives, nulls, and values beyond
    int64 range."""
    from decimal import Decimal

    import pyarrow as pa

    from orc_format_spark.codecs.container import decode_table, encode_table

    vals = [
        Decimal("12345678901234567890123456.789"),
        Decimal("-99999999999999999999999999.999"),
        None,
        Decimal("0.001"),
        Decimal("-0.001"),
        Decimal("17014118346046923173168730371588.410"),  # > int64 range
    ] * 20
    tbl = pa.table({"d": pa.array(vals, pa.decimal128(38, 3))})
    blob, lineage = encode_table(tbl, codec="auto", compression="zstd")
    assert lineage[0]["codec"] == "varint128"
    dec = decode_table(blob)
    assert dec.column("d").to_pylist() == vals


def test_decode_table_column_projection():
    """Reader-side projection: decode only requested columns, skipping
    (not decompressing) the rest — including nested children."""
    import glob
    import time

    import pyarrow.parquet as pq

    from orc_format_spark.codecs.container import decode_table, encode_table

    tbl = pq.read_table(glob.glob("/root/testdata/sf0.001/lineitem.parquet")[0])
    blob, _ = encode_table(tbl, codec="auto", compression="zstd")
    proj = decode_table(blob, columns=["l_orderkey", "l_returnflag"])
    assert proj.column_names == ["l_orderkey", "l_returnflag"]
    assert proj.column("l_orderkey").to_pylist() == tbl.column("l_orderkey").to_pylist()
    assert proj.column("l_returnflag").to_pylist() == tbl.column("l_returnflag").to_pylist()
    # projection must also skip nested (list) columns correctly
    import pyarrow as pa

    t2 = pa.table(
        {
            "a": pa.array([1, 2], pa.int64()),
            "lst": pa.array([[1, 2], [3]], pa.list_(pa.int32())),
            "b": pa.array(["x", "y"], pa.string()),
        }
    )
    b2, _ = encode_table(t2, codec="auto", compression="zstd")
    p2 = decode_table(b2, columns=["b"])
    assert p2.column_names == ["b"]
    assert p2.column("b").to_pylist() == ["x", "y"]


def test_union_roundtrip():
    """W12 parity: dense union = ByteRLE tag stream + per-variant child
    columns in arrival order (union.rs:25-28, 59-89)."""
    import numpy as np
    import pyarrow as pa

    from orc_format_spark.codecs.container import (
        decode_table,
        encode_table,
        table_checksum,
    )

    tags = pa.array(np.array([0, 1, 0, 2, 1, 0, 2, 0] * 30, np.int8), pa.int8())
    tc = np.asarray(tags)
    counts = [int((tc == v).sum()) for v in (0, 1, 2)]
    offs = np.zeros(len(tags), np.int32)
    for v in (0, 1, 2):
        pos = np.flatnonzero(tc == v)
        offs[pos] = np.arange(pos.size, dtype=np.int32)
    children = [
        pa.array(np.arange(counts[0], dtype=np.int64)),
        pa.array([f"s{i}" for i in range(counts[1])], pa.string()),
        pa.array(np.linspace(0, 1, counts[2]), pa.float64()),
    ]
    u = pa.UnionArray.from_dense(
        tags, pa.array(offs, pa.int32()), children,
        field_names=["i", "s", "f"], type_codes=[0, 1, 2],
    )
    tbl = pa.table({"id": pa.array(range(len(tags)), pa.int64()), "u": u})
    blob, lineage = encode_table(tbl, codec="auto", compression="zstd")
    dec = decode_table(blob)
    assert dec.schema == tbl.schema
    assert dec.column("u").to_pylist() == tbl.column("u").to_pylist()
    assert table_checksum(dec) == table_checksum(tbl)
    assert decode_table(blob, columns=["id"]).column_names == ["id"]


def test_per_column_codec_map():
    """codec may be a {column-path: codec} mapping (children keyed by
    their dotted path); unlisted columns auto-select."""
    import numpy as np
    import pyarrow as pa

    from orc_format_spark.codecs.container import decode_table, encode_table

    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(500)]),
            "tokens": pa.array(
                [list(range(i % 40)) for i in range(500)], pa.list_(pa.int32())
            ),
            "n_tok": pa.array(np.arange(500, dtype=np.int32)),
        }
    )
    blob, lin = encode_table(
        t, codec={"tokens.item": "rle_v1", "n_tok": "for_bitpack"}
    )
    codecs = {l["column"]: l["codec"] for l in lin}
    assert codecs["tokens.item"] == "rle_v1"
    assert codecs["n_tok"] == "for_bitpack"
    assert decode_table(blob).equals(t)
    # composes with row-group chunking
    blob2, _ = encode_table(t, codec={"n_tok": "rle_v2"}, stride=150)
    assert decode_table(blob2, rows=(100, 400)).equals(t.slice(100, 300))


def test_sliced_dense_union_roundtrip():
    """Sliced dense unions must encode the sliced entries, not the head
    of the physical buffers (pyarrow accessors ignore the slice offset)."""
    import numpy as np
    import pyarrow as pa

    from orc_format_spark.codecs.container import decode_entries, encode_column

    tags = pa.array(np.array([0, 1, 0, 1, 0, 1, 0, 0], np.int8), pa.int8())
    offs = pa.array(np.array([0, 0, 1, 1, 2, 2, 3, 4], np.int32), pa.int32())
    u = pa.UnionArray.from_dense(
        tags,
        offs,
        [pa.array([10, 20, 30, 40, 50], pa.int64()), pa.array(["a", "b", "c"])],
        field_names=["i", "s"],
        type_codes=[0, 1],
    )
    for sl in (u, u.slice(2, 4), u.slice(3), u.slice(0, 0)):
        entries = encode_column("u", sl, "auto", "zstd")
        _, arr, _ = decode_entries(entries, 0)
        assert arr.to_pylist() == sl.to_pylist()


def test_wide_struct_and_long_names_roundtrip():
    """Type strings of wide structs and long dotted column paths exceed
    255 bytes; entry-header lengths are varints so they roundtrip."""
    import numpy as np
    import pyarrow as pa

    from orc_format_spark.codecs.container import decode_table, encode_table

    n = 50
    wide = pa.StructArray.from_arrays(
        [pa.array(np.arange(20, dtype=np.int64)) for _ in range(n)],
        names=[f"field_with_a_rather_long_name_{i:03d}" for i in range(n)],
    )
    t = pa.table({"a_quite_long_top_level_column_name_indeed": wide})
    blob, lin = encode_table(t)
    assert decode_table(blob).equals(t)
    assert len(lin) == n + 1  # parent + one per field


def _serialize_v1_legacy(entries) -> bytes:
    """Re-implementation of the pre-varint (version 1) blob writer:
    single-byte field-string lengths, no engine tag."""
    from orc_format_spark.codecs.varint import encode_varint_one

    parts = [b"OFS1", bytes((1,)), len(entries).to_bytes(2, "little")]
    payloads = []
    for e in entries:
        for s in (e.name, e.type, e.codec, e.comp):
            b = s.encode()
            assert len(b) < 256
            parts.append(bytes((len(b),)))
            parts.append(b)
        parts.append(bytes((1 if e.has_null else 0,)))
        parts.append(encode_varint_one(e.n_rows))
        parts.append(encode_varint_one(e.n_present))
        parts.append(bytes((len(e.streams),)))
        for kind, payload in e.streams:
            parts.append(bytes((kind,)))
            parts.append(encode_varint_one(len(payload)))
            payloads.append(payload)
    parts.extend(payloads)
    return b"".join(parts)


def test_legacy_v1_blob_still_readable():
    """Version-gated header parse: a pre-varint (v1) blob deserializes
    through the same reader as the current v3 writer's output."""
    from orc_format_spark.codecs.container import deserialize_blob

    tbl = pa.table(
        {
            "a": pa.array([1, 2, None, 4_000_000_000], pa.int64()),
            "s": pa.array(["x", None, "yy", "zzz"]),
        }
    )
    blob, _ = encode_table(tbl)
    v1 = _serialize_v1_legacy(deserialize_blob(blob))
    assert v1[4] == 1 and blob[4] == 3 and v1 != blob
    assert decode_table(v1).equals(decode_table(blob))


def test_blob_engine_version_tag():
    from orc_format_spark.codecs.container import (
        ENCODER_VERSION,
        blob_engine_version,
        deserialize_blob,
    )

    tbl = pa.table({"a": pa.array(range(25_000), pa.int32())})
    plain, _ = encode_table(tbl)
    chunked, _ = encode_table(tbl, stride=10_000)
    assert blob_engine_version(plain) == ENCODER_VERSION
    assert blob_engine_version(chunked) == ENCODER_VERSION
    legacy = _serialize_v1_legacy(deserialize_blob(plain))
    assert blob_engine_version(legacy) == "<pre-3.0>"


def test_pre_4_rle_v2_blob_refused_only_when_patched():
    """Engine 4.0 corrected ONLY the RLEv2 patched-base sub-encoding;
    short-repeat/direct/delta streams are byte-identical across
    versions. A pre-4.0 blob must refuse decode iff a patched run is
    actually present (header-only scan) — refusing every rle_v2 blob
    would make whole old datasets permanently undecodable, while
    decoding a patched one would return silently-wrong values."""
    import numpy as np

    from orc_format_spark.codecs.container import (
        ENCODER_VERSION,
        decode_table,
        deserialize_blob,
        encode_table,
    )
    from orc_format_spark.codecs.rle_v2 import rle_v2_has_patched

    assert ENCODER_VERSION == "4.0"
    old_tag = b"3.3"
    new_tag = ENCODER_VERSION.encode()
    assert len(old_tag) == len(new_tag)  # in-place tag swap stays valid

    # Delta-only stream: wire unchanged since pre-4.0, stays decodable.
    tbl = pa.table({"a": pa.array(range(4_096), pa.int64())})
    v2_blob, _ = encode_table(tbl, codec="rle_v2")
    assert decode_table(v2_blob).equals(tbl)
    stale = v2_blob.replace(new_tag, old_tag, 1)
    assert decode_table(stale).equals(tbl)

    # Outlier mix forces a patched-base run: the one wire that changed
    # in 4.0, so the stale tag must refuse loudly.
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 100, 500).astype(np.int64)
    vals[123] = 10**15  # patch-width outlier
    ptbl = pa.table({"a": pa.array(vals)})
    p_blob, _ = encode_table(ptbl, codec="rle_v2")
    entries = deserialize_blob(p_blob)
    assert any(
        e.codec == "rle_v2"
        and any(rle_v2_has_patched(_decompressed_data(e)) for _ in [0])
        for e in entries
    ), "fixture must actually contain a patched run"
    assert decode_table(p_blob).equals(ptbl)
    p_stale = p_blob.replace(new_tag, old_tag, 1)
    with pytest.raises(ValueError, match="pre-4.0 rle_v2"):
        deserialize_blob(p_stale)
    with pytest.raises(ValueError, match="pre-4.0 rle_v2"):
        decode_table(p_stale)

    v1_blob, _ = encode_table(tbl, codec="rle_v1")
    stale_v1 = v1_blob.replace(new_tag, old_tag, 1)
    assert decode_table(stale_v1).equals(tbl)  # non-rle_v2: still fine


def _decompressed_data(entry):
    """DATA stream of a ColumnEntry, decompressed."""
    from orc_format_spark.codecs.container import DATA, decompress_stream

    for kind, s in entry.streams:
        if kind == DATA:
            return decompress_stream(s, entry.comp)
    raise AssertionError("no DATA stream")


# ------------------------------------------------------- float codecs


def test_float_split_golden_bytes():
    """Byte-stream split is a pure transpose: stream j holds byte j of
    every value, in order (the Parquet BYTE_STREAM_SPLIT layout)."""
    import numpy as np

    from orc_format_spark.codecs import raw

    v = np.array([1.0, 2.0], "<f8")
    got = raw.encode_float_split(v, double=True)
    le = v.tobytes()
    expect = bytes(le[j + 8 * k] for j in range(8) for k in range(2))
    assert got == expect
    assert raw.decode_float_split(got, double=True).tobytes() == le
    v32 = np.array([1.5, -2.5, 3.25], "<f4")
    g32 = raw.encode_float_split(v32, double=False)
    le32 = v32.tobytes()
    assert g32 == bytes(le32[j + 4 * k] for j in range(4) for k in range(3))


def test_float_codec_selection_measures_compressed():
    import numpy as np

    from orc_format_spark.codecs.selector import select_float_codec

    rng = np.random.default_rng(7)
    low_card = rng.choice([0.0, 0.05, 0.08, 0.1], 50_000)
    best, est = select_float_codec(low_card, double=True)
    assert best == "dict_float" and est["dict_float"] < est["raw"]
    high_entropy = rng.random(50_000) * 1e5
    best2, est2 = select_float_codec(high_entropy, double=True)
    assert best2 in ("raw_double", "float_split")
    smooth = np.cumsum(rng.normal(0, 0.01, 50_000)) + 100.0
    best3, est3 = select_float_codec(smooth, double=True)
    assert best3 == "float_split"  # exponent/high-mantissa runs win


def test_float_codecs_roundtrip_bit_exact_through_container():
    import numpy as np
    import pyarrow as pa

    from orc_format_spark.codecs.container import decode_table, encode_table

    specials = [0.0, -0.0, float("nan"), float("inf"), float("-inf"), 5e-324]
    rng = np.random.default_rng(1)
    for codec in ("raw_double", "float_split", "dict_float"):
        vals = list(rng.choice(specials + [1.25, -7.5], 30_005))
        t = pa.table({"x": pa.array(vals, pa.float64())})
        blob, lin = encode_table(t, codec={"x": codec}, stride=10_000)
        assert lin[0]["codec"] == codec
        back = decode_table(blob)
        assert (
            back.column("x").to_numpy().tobytes()
            == t.column("x").to_numpy().tobytes()
        )
    # float32 through dict (sign-extension path)
    t32 = pa.table({"y": pa.array([1.5, -0.0, 2.5] * 1000, pa.float32())})
    blob, lin = encode_table(t32, codec={"y": "dict_float"})
    assert lin[0]["codec"] == "dict_float"
    back = decode_table(blob)
    assert (
        back.column("y").to_numpy().astype("<f4").tobytes()
        == t32.column("y").to_numpy().tobytes()
    )


def test_alp_roundtrip_and_selection():
    """ALP (public SIGMOD'24 paper) reproduces decimal-like doubles
    bit-exactly via round(v*10^e*10^-f) digits + FoR, patches true
    reals as positional exceptions, and wins auto-selection on
    decimal columns where dict/split/raw all lose."""
    import numpy as np

    from orc_format_spark.codecs.alp import decode_alp, encode_alp
    from orc_format_spark.codecs.selector import select_float_codec

    rng = np.random.default_rng(7)
    price = np.round(rng.uniform(900, 105000, 50_000) / 100, 2)
    back = decode_alp(encode_alp(price))
    assert back.tobytes() == price.tobytes()
    best, est = select_float_codec(price, double=True)
    assert best == "alp" and est["alp"] < est["raw"]
    # ~1% irrational exceptions still roundtrip and still win
    mixed = price.copy()
    mixed[::97] *= np.pi
    assert decode_alp(encode_alp(mixed)).tobytes() == mixed.tobytes()
    assert select_float_codec(mixed, double=True)[0] == "alp"
    # pure gaussians: every value is an exception-or-wide-digit; the
    # selector must NOT pick alp (measured bytes, not vibes)
    gauss = rng.standard_normal(50_000)
    assert select_float_codec(gauss, double=True)[0] != "alp"
    assert decode_alp(encode_alp(gauss)).tobytes() == gauss.tobytes()


def test_alp_through_container_bit_exact():
    import numpy as np
    import pyarrow as pa

    from orc_format_spark.codecs.container import decode_table, encode_table

    specials = [0.0, -0.0, float("nan"), float("inf"), float("-inf"), 5e-324]
    rng = np.random.default_rng(3)
    vals = [round(float(x), 2) for x in rng.normal(0, 50, 30_000)] + specials
    t = pa.table({"x": pa.array(vals, pa.float64())})
    blob, lin = encode_table(t, codec={"x": "alp"}, stride=10_000)
    assert lin[0]["codec"] == "alp"
    back = decode_table(blob)
    assert back.column("x").to_numpy().tobytes() == t.column("x").to_numpy().tobytes()
    # float32: exactness is checked in the f4 domain the reader returns
    t32 = pa.table({"y": pa.array([1.5, -2.25, 0.1, 3.0] * 2000, pa.float32())})
    blob32, lin32 = encode_table(t32, codec={"y": "alp"})
    assert lin32[0]["codec"] == "alp"
    back32 = decode_table(blob32)
    assert (
        back32.column("y").to_numpy().astype("<f4").tobytes()
        == t32.column("y").to_numpy().tobytes()
    )


def test_sparse_union_encodes_as_dense():
    """Sparse unions (redundant child slots) encode as their dense
    equivalent: the blob stores the dense type string and per-variant
    arrival-order values; decode returns the dense union with identical
    logical content — including through slices, whose child arrays
    pyarrow slice-adjusts."""
    import numpy as np
    import pyarrow as pa

    from orc_format_spark.codecs.container import decode_table, encode_table

    rng = np.random.default_rng(5)
    n = 3000
    ints = pa.array(rng.integers(0, 1000, n), pa.int64())
    strs = pa.array([f"s{i}" for i in range(n)])
    tc = pa.array(rng.choice([5, 7], n).astype(np.int8), pa.int8())
    u = pa.UnionArray.from_sparse(tc, [ints, strs], field_names=["i", "s"], type_codes=[5, 7])
    for arr in (u, u.slice(17, 2500)):
        blob, lin = encode_table(pa.table({"u": arr}))
        back = decode_table(blob).column("u")
        assert pa.types.is_union(back.type) and back.type.mode == "dense"
        assert back.to_pylist() == arr.to_pylist()


def test_nested_parenthesized_types_roundtrip():
    """Type strings with commas inside () / [] — decimal128(10, 2) and
    timestamp[us, tz=UTC] as struct/map children — must re-parse: the
    top-level splitter tracks parens and square brackets, not just
    angle brackets, or blobs become encodable-but-undecodable."""
    import datetime as dt
    from decimal import Decimal

    tbl = pa.table({
        "x": pa.array(
            [{"a": Decimal("1.25"), "b": 2}] * 4,
            pa.struct([("a", pa.decimal128(10, 2)), ("b", pa.int32())]),
        ),
        "m": pa.array(
            [[("k", Decimal("9.5000"))]] * 4,
            pa.map_(pa.string(), pa.decimal128(20, 4)),
        ),
        "ts": pa.array(
            [{"t": dt.datetime(2020, 1, 2, 3)}] * 4,
            pa.struct([("t", pa.timestamp("us"))]),
        ),
    })
    blob, _ = encode_table(tbl)
    from orc_format_spark.codecs.container import blob_schema

    assert blob_schema(blob).equals(tbl.schema)
    assert decode_table(blob).equals(tbl)


def test_timestamp_unit_schema_fidelity():
    """timestamp[s]/[ms]/[ns] columns decode with their STORED unit
    (values travel as exact microseconds); parsing everything as us
    misreported the schema and broke downstream casts/unions."""
    for unit in ("s", "ms", "us", "ns"):
        # values travel as exact us, so ns inputs must be whole us
        # (sub-us precision fails loudly at encode via the safe cast)
        vals = [10**6, 0, 123 * (1000 if unit == "ns" else 1)]
        t = pa.table({"t": pa.array(vals, pa.timestamp(unit))})
        blob, _ = encode_table(t)
        from orc_format_spark.codecs.container import blob_schema

        assert blob_schema(blob).field(0).type == pa.timestamp(unit)
        assert decode_table(blob).equals(t)


def test_float32_prune_never_disagrees_with_filter():
    """The exact filter casts the predicate literal to float32; the
    chunk prune test compares in float64. Without ulp-widened float32
    bounds, '== 0.1' pruned every chunk whose rows all equal
    float32(0.1) — silent missing rows."""
    t = pa.table({
        "f": pa.array([0.1] * 20, pa.float32()),
        "k": pa.array(range(20), pa.int64()),
    })
    blob, _ = encode_table(t, stride=10)
    assert decode_table(blob, predicate=("f", "==", 0.1)).num_rows == 20
    assert decode_table(blob, predicate=("f", "in", (0.1, 7.0))).num_rows == 20
    assert decode_table(blob, predicate=("f", ">", 0.05)).num_rows == 20
    assert decode_table(blob, predicate=("f", "<", 0.05)).num_rows == 0


def test_tz_aware_predicate_never_prunes_naive_bounds():
    """Stored temporal bounds are tz-naive isoformats; a tz-aware
    predicate value's '+HH:MM' suffix breaks the lexicographic order.
    The prune test must treat the cross-domain compare as unknown (the
    exact filter normalizes the value and matches)."""
    import datetime as dt

    t = pa.table({
        "t": pa.array([dt.datetime(2020, 1, 1, 6)] * 20, pa.timestamp("us")),
        "k": pa.array(range(20), pa.int64()),
    })
    blob, _ = encode_table(t, stride=10)
    v = dt.datetime(2020, 1, 1, 6, tzinfo=dt.timezone.utc)
    assert decode_table(blob, predicate=("t", "==", v)).num_rows == 20


def test_sparse_union_checksum_matches_dense_decode():
    """table_checksum on a sparse union must not crash (no offsets
    buffer) and must equal the checksum of its dense-decoded twin, or
    the write-verify loop rejects every sparse-union write."""
    arr = pa.UnionArray.from_sparse(
        pa.array([0, 1, 0, 1], pa.int8()),
        [pa.array([1, 2, 3, 4], pa.int64()), pa.array(["a", "b", "c", "d"])],
    )
    t = pa.table({"u": arr})
    blob, _ = encode_table(t)
    assert table_checksum(t) == table_checksum(decode_table(blob))


def test_blob_truncation_always_valueerror():
    """EVERY truncation of a valid blob raises ValueError (not bare
    IndexError, never a silently-short metadata string), so corrupt-blob
    classification by exception type is reliable."""
    from orc_format_spark.codecs.container import deserialize_blob

    blob, _ = encode_table(pa.table({"a": pa.array(range(100), pa.int64())}))
    for cut in range(1, len(blob)):
        with pytest.raises(ValueError):
            deserialize_blob(blob[:cut])


def test_projection_typo_is_loud():
    """decode_table(columns=[missing]) raises KeyError instead of
    silently returning a narrower table."""
    blob, _ = encode_table(pa.table({"a": pa.array([1, 2], pa.int64())}))
    with pytest.raises(KeyError, match="no such columns"):
        decode_table(blob, columns=["nope"])


def test_nested_struct_projection_blob():
    """Dotted columns= paths prune struct subtrees inside blobs at any
    depth (both v1 and chunked v2 bodies); pruned children's streams
    are never decompressed and errors are loud."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from orc_format_spark.codecs.container import decode_table, encode_table

    inner = pa.struct([("x", pa.int64()), ("y", pa.string())])
    outer = pa.struct([("a", pa.int64()), ("b", pa.string()),
                       ("inner", inner)])
    n = 25_000
    t = pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "s": pa.array(
            [None if i % 11 == 0 else
             {"a": i, "b": f"b{i}",
              "inner": None if i % 7 == 0 else {"x": i * 2, "y": f"y{i}"}}
             for i in range(n)], outer),
    })
    blob, _ = encode_table(t, codec="auto", compression="zstd", stride=10_000)
    want = [None if r is None else
            {"inner": None if r["inner"] is None else {"y": r["inner"]["y"]}}
            for r in t.column("s").to_pylist()]

    got = decode_table(blob, columns=["s.inner.y", "k"])
    assert got.column_names == ["s", "k"]
    assert got.column("s").to_pylist() == want
    assert got.column("k").to_pylist() == t.column("k").to_pylist()

    # "s" alongside "s.a" widens; sibling selection keeps request order
    whole = decode_table(blob, columns=["s.a", "s"])
    assert whole.column("s").to_pylist() == t.column("s").to_pylist()
    two = decode_table(blob, columns=["s.b", "s.a"])
    assert [f.name for f in two.schema.field("s").type] == ["b", "a"]

    # row slices through the chunked path compose with nested proj
    sl = decode_table(blob, columns=["s.inner.x"], rows=(9_995, 10_005))
    assert sl.num_rows == 10

    with pytest.raises(KeyError, match="no such fields"):
        decode_table(blob, columns=["s.zz"])
    with pytest.raises(KeyError, match="non-struct"):
        decode_table(blob, columns=["k.a"])
    with pytest.raises(KeyError, match="no such columns"):
        decode_table(blob, columns=["zz.a"])

    # v1 (unchunked) body takes the same path
    blob1, _ = encode_table(t.slice(0, 500), codec="auto", compression="zstd")
    g1 = decode_table(blob1, columns=["s.inner.y"])
    assert g1.column("s").to_pylist() == want[:500]


def test_list_transparent_projection_blob():
    """Lists are transparent to dotted blob projection: "evs.id" prunes
    a list<struct> element's fields through both v1 and chunked v2."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from orc_format_spark.codecs.container import decode_table, encode_table

    elem = pa.struct([("id", pa.int64()), ("txt", pa.string())])
    n = 20_000
    t = pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "evs": pa.array(
            [None if i % 13 == 0 else
             [{"id": i * 10 + j, "txt": f"t{i}_{j}"} for j in range(i % 4)]
             for i in range(n)], pa.list_(elem)),
    })
    want = [None if r is None else [{"id": e["id"]} for e in r]
            for r in t.column("evs").to_pylist()]
    blob, _ = encode_table(t, codec="auto", compression="zstd", stride=10_000)
    got = decode_table(blob, columns=["evs.id", "k"])
    assert got.column("evs").to_pylist() == want
    blob1, _ = encode_table(t.slice(0, 300), codec="auto", compression="zstd")
    assert (decode_table(blob1, columns=["evs.id"])
            .column("evs").to_pylist() == want[:300])
    with pytest.raises(KeyError, match="non-struct"):
        decode_table(blob, columns=["k.x"])


@pytest.mark.parametrize("trial", range(40))
def test_nested_projection_fuzz_blob(trial):
    """Randomized nested projection over the blob container: random
    column trees (the ORC interop fuzz's generator), a random dotted
    struct-leaf path (lists transparent), pruned decode == full decode
    pruned python-side. Both container body versions and three block
    codecs ride the matrix."""
    import random

    import numpy as np
    import pyarrow as pa

    from test_orc_interop_fuzz import _gen_column

    from orc_format_spark.codecs.container import decode_table, encode_table

    import pyarrow.compute as pc

    rng = np.random.default_rng(5000 + trial)
    random.seed(trial * 11 + 1)
    n = int(rng.integers(0, 3000))

    def _us(typ):  # container contract: microsecond timestamps
        if pa.types.is_timestamp(typ):
            return pa.timestamp("us")
        if pa.types.is_list(typ):
            return pa.list_(_us(typ.value_type))
        if pa.types.is_large_list(typ):
            return pa.large_list(_us(typ.value_type))
        if pa.types.is_struct(typ):
            return pa.struct([(f.name, _us(f.type)) for f in typ])
        if pa.types.is_map(typ):
            return pa.map_(_us(typ.key_type), _us(typ.item_type))
        return typ

    def paths0(prefix, typ):
        if pa.types.is_struct(typ):
            out = []
            for f in typ:
                out += paths0(f"{prefix}.{f.name}", f.type)
            return out
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            return paths0(prefix, typ.value_type)
        return [prefix]

    # redraw until the random tree holds a nested struct leaf (the
    # generator draws structs ~1/6 of the time per column)
    for _redraw in range(25):
        cols = {}
        for i in range(int(rng.integers(1, 4))):
            arr, _typ = _gen_column(rng, n)
            cols[f"c{i}"] = pc.cast(arr, _us(arr.type), safe=False)
        t = pa.table(cols)
        if any("." in p for f in t.schema for p in paths0(f.name, f.type)):
            break
    else:
        pytest.skip("no nested struct drawn in 25 redraws")
    stride = random.choice([None, 500])
    comp = random.choice(["zstd", "none", "lz4"])
    blob, _ = encode_table(t, codec="auto", compression=comp, stride=stride)
    full = decode_table(blob)

    cand = []
    for f in t.schema:
        cand += [p for p in paths0(f.name, f.type) if "." in p]
    path = cand[int(rng.integers(0, len(cand)))]
    parts = path.split(".")
    got = decode_table(blob, columns=[path])

    def prune(v, ps):
        if not ps or v is None:
            return v
        if isinstance(v, list):
            return [prune(e, ps) for e in v]
        return {ps[0]: prune(v[ps[0]], ps[1:])}

    want = [prune(r, parts[1:]) for r in full.column(parts[0]).to_pylist()]
    assert got.column(parts[0]).to_pylist() == want, (trial, path, comp)
