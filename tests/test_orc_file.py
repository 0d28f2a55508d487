"""Real-ORC writer (sources/orc_file.py) vs the INDEPENDENT Apache ORC
C++ reader (pyarrow.orc) — the reference's own validation loop
(src/bin/test_writer.rs opened target/test.orc with another reader)
re-expressed as the correctness gate for the protobuf tail."""

import datetime
import io
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.orc as po
import pytest

from orc_format_spark.sources.orc_file import write_orc


def _roundtrip(t: pa.Table, **kw) -> pa.Table:
    p = tempfile.mktemp(suffix=".orc")
    try:
        write_orc(t, p, **kw)
        return po.ORCFile(p).read()
    finally:
        if os.path.exists(p):
            os.unlink(p)


def test_all_types_all_compressions():
    rng = np.random.default_rng(7)
    n = 5_000
    t = pa.table(
        {
            "i64": pa.array(rng.integers(-(2**40), 2**40, n), pa.int64()),
            "i32": pa.array(rng.integers(-(2**20), 2**20, n), pa.int32()),
            "i16": pa.array(rng.integers(-30000, 30000, n), pa.int16()),
            "i8": pa.array(rng.integers(-128, 128, n), pa.int8()),
            "f32": pa.array(rng.random(n), pa.float32()),
            "f64": pa.array(rng.random(n), pa.float64()),
            "s": pa.array([f"val{i % 97}" for i in range(n)]),
            "b": pa.array([bytes([i % 251]) for i in range(n)], pa.binary()),
            "d": pa.array(
                [
                    datetime.date(2020, 1, 1) + datetime.timedelta(days=int(x))
                    for x in rng.integers(0, 1000, n)
                ]
            ),
            "bl": pa.array(rng.random(n) > 0.5),
            "lst": pa.array(
                [[int(x) for x in rng.integers(0, 50000, i % 7)] for i in range(n)],
                pa.list_(pa.int32()),
            ),
            "st": pa.array(
                [{"x": int(i), "y": f"n{i % 100}"} for i in range(n)],
                pa.struct([("x", pa.int64()), ("y", pa.string())]),
            ),
        }
    )
    for comp in ["none", "zlib", "snappy", "lzo", "zstd"]:
        for rle in ["v1", "v2"]:
            rd = _roundtrip(t, compression=comp, rle=rle)
            assert rd.cast(t.schema).equals(t), (comp, rle)


def test_multi_stripe_and_stripe_count():
    t = pa.table({"a": pa.array(range(10_000), pa.int64())})
    p = tempfile.mktemp(suffix=".orc")
    try:
        write_orc(t, p, stripe_rows=3_000)
        f = po.ORCFile(p)
        assert f.nstripes == 4
        assert f.read().equals(t)
    finally:
        os.unlink(p)


def test_nulls_nested_and_empty():
    tn = pa.table(
        {
            "a": pa.array([None, None, None], pa.int64()),
            "l": pa.array([None, [1, None, 3], None], pa.list_(pa.int64())),
            "st": pa.array(
                [None, {"x": None}, {"x": 5}], pa.struct([("x", pa.int64())])
            ),
        }
    )
    assert _roundtrip(tn, compression="zlib").cast(tn.schema).equals(tn)
    te = tn.slice(0, 0)
    rd = _roundtrip(te)
    assert rd.num_rows == 0 and rd.schema.names == te.schema.names


def test_unsupported_types_raise_loudly():
    with pytest.raises(NotImplementedError, match="tz-aware|not supported"):
        write_orc(
            pa.table(
                {
                    "ts": pa.array(
                        [datetime.datetime(2024, 1, 1)],
                        pa.timestamp("us", tz="UTC"),
                    )
                }
            ),
            tempfile.mktemp(),
        )
    with pytest.raises(ValueError, match="compression"):
        write_orc(pa.table({"a": [1]}), tempfile.mktemp(), compression="brotli")


def test_map_roundtrip():
    """ORC MAP (kind 11): LENGTH stream + key/value children sliced to
    the offsets window — including null maps, empty maps, nested-null
    values, a sliced input, and multi-stripe — through the independent
    reader."""
    mt = pa.map_(pa.string(), pa.int64())
    rows = [
        [("a", 1), ("b", 2)],
        None,
        [],
        [("c", None), ("d", 4)],
        [("e", 5)],
        [],
    ]
    t = pa.table({"m": pa.array(rows, mt), "i": pa.array(range(6))})
    for comp in ["none", "zstd"]:
        for rle in ["v1", "v2"]:
            got = _roundtrip(t, compression=comp, rle=rle)
            assert got.cast(t.schema).equals(t), (comp, rle)
    # sliced input: physical child arrays are larger than the window
    ts = pa.table(
        {"m": pa.array(rows, mt).slice(1, 4), "i": pa.array(range(4))}
    )
    assert _roundtrip(ts).cast(ts.schema).equals(ts)
    # multi-stripe + nested value dictionaries (map<string,string>)
    big = pa.table(
        {
            "m": pa.array(
                [[(f"k{i % 5}", f"v{i % 3}")] for i in range(7_000)],
                pa.map_(pa.string(), pa.string()),
            )
        }
    )
    p = tempfile.mktemp(suffix=".orc")
    try:
        write_orc(big, p, stripe_rows=2_000)
        f = po.ORCFile(p)
        assert f.nstripes == 4
        assert f.read().cast(big.schema).equals(big)
    finally:
        os.unlink(p)


def test_rle_v2_mode_through_apache_reader():
    """rle='v2' marks DIRECT_V2/DICTIONARY_V2 and emits every integer
    stream with the repo's RLEv2 encoder — Apache ORC C++ decoding them
    is the external validation loop for that codec. Data is shaped to
    force all four sub-encodings: constant runs (short-repeat),
    monotonic ramps (delta), noise (direct), and noise+outliers
    (patched-base)."""
    rng = np.random.default_rng(11)
    n = 40_000
    noise = rng.integers(0, 2**20, n)
    outliers = noise.copy()
    outliers[rng.integers(0, n, 300)] = 2**45
    t = pa.table(
        {
            "runs": pa.array(np.repeat(rng.integers(-50, 50, n // 100), 100)),
            "ramp": pa.array(np.arange(n, dtype=np.int64) * 3 - 1000),
            "noise": pa.array(noise),
            "patched": pa.array(outliers),
            "neg": pa.array(rng.integers(-(2**33), 2**33, n)),
            "s_dict": pa.array([f"cat-{i % 41}" for i in range(n)]),
            "s_direct": pa.array([f"uniq-{i}" for i in range(n)]),
            "ts": pa.array(
                [
                    datetime.datetime(2020, 1, 1)
                    + datetime.timedelta(seconds=int(x), microseconds=int(x % 997))
                    for x in rng.integers(0, 10**8, 200)
                ].__mul__(n // 200),
                pa.timestamp("us"),
            ),
            "lst": pa.array(
                [[int(x) for x in rng.integers(0, 9, i % 5)] for i in range(n)],
                pa.list_(pa.int64()),
            ),
        }
    )
    for comp in ["none", "zstd"]:
        rd = _roundtrip(t, compression=comp, rle="v2", stripe_rows=9_000)
        assert rd.cast(t.schema).equals(t), comp
    with pytest.raises(ValueError, match="rle"):
        write_orc(pa.table({"a": [1]}), tempfile.mktemp(), rle="v3")


def test_rle_v2_patched_base_sign_bit_boundary():
    """Regression: patched-base bases whose magnitude fills a whole byte
    (199, 255, 32768, ...) must NOT collide with the sign-magnitude MSB
    — Apache read 0xC7 as base=-71 before the width fix; the symmetric
    in-repo decoder masked the wire bug. Negative bases included."""
    rng = np.random.default_rng(3)
    cols = {}
    for name, base in [
        ("b199", 199), ("b255", 255), ("b128", 128), ("b32768", 32768),
        ("bneg200", -200), ("bneg70000", -70_000),
    ]:
        v = rng.integers(0, 2**16, 2_048) + base
        v[rng.integers(0, 2_048, 20)] += 2**40  # outliers -> patched
        v[int(rng.integers(0, 2_048))] = base   # pin the exact min
        cols[name] = pa.array(v.astype(np.int64))
    t = pa.table(cols)
    assert _roundtrip(t, rle="v2").cast(t.schema).equals(t)


def test_rle_v2_fuzz_through_apache_reader():
    """Seeded fuzz of the RLEv2 wire through Apache ORC C++: extreme
    62-bit values, sparse huge outliers (patched), monotonic runs
    (delta), long equal runs (short-repeat), constants — every
    distribution family the four sub-encodings split on."""
    rng = np.random.default_rng(0)
    for trial in range(24):
        n = int(rng.integers(1, 3000))
        kind = trial % 6
        if kind == 0:
            v = rng.integers(-(2**62), 2**62, n)
        elif kind == 1:
            v = rng.integers(0, 2, n) * rng.integers(1, 2**50)
        elif kind == 2:
            v = np.sort(rng.integers(-(2**40), 2**40, n))
        elif kind == 3:
            v = np.repeat(
                rng.integers(-(2**55), 2**55, max(1, n // 7)), 7
            )[:n]
        elif kind == 4:
            v = rng.integers(0, 2**10, n)
            v[rng.integers(0, n, max(1, n // 100))] = rng.integers(
                2**50, 2**62
            )
        else:
            v = np.full(n, int(rng.integers(-(2**62), 2**62)))
        t = pa.table({"v": pa.array(v.astype(np.int64))})
        rd = _roundtrip(
            t, rle="v2", stripe_rows=int(rng.integers(100, 2000))
        )
        assert rd.cast(t.schema).equals(t), (trial, kind, n)


def test_dictionary_encoding_chosen_and_equal():
    """Low-cardinality strings take the DICTIONARY path (kind 1, sorted
    dictionary): the file must shrink vs forced-DIRECT and read back
    identical; high-cardinality strings must stay DIRECT (file size
    parity); nulls + dictionary must compose."""
    n = 20_000
    t = pa.table(
        {
            "s": pa.array([f"name-{i % 37}" for i in range(n)]),
            "u": pa.array([f"uniq-{i}" for i in range(n)]),
        }
    )
    pd_, pdir = tempfile.mktemp(suffix=".orc"), tempfile.mktemp(suffix=".orc")
    try:
        n_dict = write_orc(t, pd_, compression="none")
        n_direct = write_orc(t, pdir, compression="none", dict_strings=False)
        assert po.ORCFile(pd_).read().cast(t.schema).equals(t)
        assert po.ORCFile(pdir).read().cast(t.schema).equals(t)
        # 's' dictionary-encodes (37 uniques / 20k rows) -> much smaller;
        # 'u' is all-unique so both files carry it DIRECT
        assert n_dict < n_direct * 0.75, (n_dict, n_direct)
    finally:
        os.unlink(pd_)
        os.unlink(pdir)
    tn = pa.table(
        {"s": pa.array((["x", None, "y", "x"] * 500) + [None] * 100)}
    )
    for comp in ["none", "zlib", "zstd"]:
        assert _roundtrip(tn, compression=comp).cast(tn.schema).equals(tn)
    # all-equal column: dictionary of size 1
    t1 = pa.table({"s": pa.array(["same"] * 5_000)})
    assert _roundtrip(t1).cast(t1.schema).equals(t1)


def test_spark_orc_group_sink_roundtrip(spark):
    """Distributed sink + independent-reader scan: tokenize sf0.001,
    write per-group .orc files, read back via pyarrow.orc in workers,
    detokenize == original. ALSO read the files with Spark's own native
    ORC datasource — a SECOND independent reader."""
    import glob

    from orc_format_spark import detokenize, tokenize_documents, TOKENS_SCHEMA
    from orc_format_spark.sources.orc_file import (
        read_orc_files,
        write_orc_groups,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with tempfile.TemporaryDirectory() as work:
        files = write_orc_groups(
            tokenize_documents(docs),
            f"{work}/orc",
            num_groups=4,
            key_col="doc_id",
            size_col="n_tok",
            compression="zstd",
        )
        out = detokenize(read_orc_files(files, TOKENS_SCHEMA))
        got = {r.doc_id: r.text for r in out.collect()}
        want = {r.doc_id: r.text for r in docs.select(
            docs.doc_id.cast("string").alias("doc_id"), "text").collect()}
        assert got == want
        # second independent reader: Spark's built-in ORC source
        paths = sorted(glob.glob(f"{work}/orc/*.orc"))
        assert len(paths) == 4
        native = spark.read.orc(paths)
        assert native.count() == docs.count()
        n_tok = {r.doc_id: r.n_tok for r in native.select("doc_id", "n_tok").collect()}
        want_tok = {r.doc_id: r.n_tok for r in
                    tokenize_documents(docs).select("doc_id", "n_tok").collect()}
        assert n_tok == want_tok


def test_timestamp_decimal_roundtrip():
    """ORC TIMESTAMP (2015-epoch seconds + trailing-zero-compacted
    nanos, the probed Apache negative-seconds convention) and DECIMAL
    v1 (unbounded zigzag varint + scale SECONDARY) through the
    independent reader — including pre-epoch and pre-1950 values."""
    import decimal

    ts = [
        datetime.datetime(2024, 3, 1, 12, 0, 0, 123456),
        datetime.datetime(1969, 12, 31, 23, 59, 59),
        datetime.datetime(2014, 12, 31, 23, 59, 59),
        datetime.datetime(1950, 6, 1, 0, 0, 0, 5),
        None,
        datetime.datetime(2015, 1, 1),
        datetime.datetime(1969, 12, 31, 23, 59, 58, 999999),
        datetime.datetime(1900, 1, 1, 6, 30, 15, 250000),
    ]
    dec = [
        decimal.Decimal("123.45"),
        decimal.Decimal("-9999999999999999.99"),
        decimal.Decimal("0.01"),
        None,
        decimal.Decimal("-0.50"),
        decimal.Decimal("31415926535.89"),
        decimal.Decimal("2.00"),
        decimal.Decimal("-0.01"),
    ]
    t = pa.table(
        {
            "ts": pa.array(ts, pa.timestamp("us")),
            "dec": pa.array(dec, pa.decimal128(20, 2)),
        }
    )
    for comp in ["none", "zstd"]:
        for rle in ["v1", "v2"]:
            got = _roundtrip(t, compression=comp, rle=rle)
            assert got.cast(t.schema).equals(t), (comp, rle)


def test_timestamp_unrepresentable_window_raises():
    """The one-second pre-epoch window ORC's negative-seconds
    convention cannot express must fail loudly, never read back 1 s
    late."""
    bad = pa.table(
        {
            "ts": pa.array(
                [datetime.datetime(1969, 12, 31, 23, 59, 59, 500000)],
                pa.timestamp("us"),
            )
        }
    )
    with pytest.raises(ValueError, match="negative-seconds"):
        write_orc(bad, tempfile.mktemp())
    tz = pa.table(
        {
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1)], pa.timestamp("us", tz="UTC")
            )
        }
    )
    with pytest.raises(NotImplementedError, match="tz-aware"):
        write_orc(tz, tempfile.mktemp())


# ------------------------------------------------- column statistics


def _scan_read_rows(q) -> int:
    """Rows the file scan actually emitted (post stripe elimination),
    from the executed plan's numOutputRows metric on the Scan node."""
    q.collect()
    total = []

    def walk(nd):
        if "Scan" in nd.nodeName():
            it = nd.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    total.append(kv._2().value())
        for i in range(nd.children().size()):
            walk(nd.children().apply(i))

    walk(q._jdf.queryExecution().executedPlan())
    return sum(total)


def test_statistics_sections_parse_in_apache_reader():
    """Footer field-7 stats + Metadata StripeStatistics + per-stripe
    ROW_INDEX streams all parse in Apache ORC C++ and don't disturb the
    values; one-group-per-stripe stride is reported back verbatim."""
    t = pa.table(
        {
            "k": pa.array(range(25_000), pa.int64()),
            "s": pa.array([f"v{i:05d}" for i in range(25_000)]),
        }
    )
    p = tempfile.mktemp(suffix=".orc")
    try:
        for rle in ["v1", "v2"]:
            for comp in ["none", "zstd"]:
                write_orc(
                    t, p, stripe_rows=5_000, rle=rle, compression=comp
                )
                f = po.ORCFile(p)
                assert f.nstripes == 5
                assert f.nstripe_statistics == 5
                assert f.stripe_statistics_length > 0
                assert f.row_index_stride == 5_000
                assert f.read().cast(t.schema).equals(t)
        # row_index=False keeps the stride-0 shape readable too
        write_orc(t, p, stripe_rows=5_000, row_index=False)
        f = po.ORCFile(p)
        assert f.row_index_stride == 0
        assert f.read().cast(t.schema).equals(t)
    finally:
        if os.path.exists(p):
            os.unlink(p)


def test_stripe_elimination_by_apache_java_reader(spark):
    """Spark's built-in ORC source (Apache ORC *Java* — a second
    independent implementation) must (a) return exactly the right rows
    under predicate pushdown over our statistics and (b) demonstrably
    skip stripes: the scan emits only the surviving stripes' rows.
    This is value-level external validation of the statistics — stats
    narrower than the data would drop matching rows in (a)."""
    import datetime as dt

    n = 40_000
    t = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "s": pa.array([f"v{i:06d}" for i in range(n)]),
            "d": pa.array(
                [
                    dt.date(2020, 1, 1) + dt.timedelta(days=i // 100)
                    for i in range(n)
                ]
            ),
            "x": pa.array([float(i) for i in range(n)], pa.float64()),
            "maybe": pa.array(
                [None if i < 30_000 else i for i in range(n)], pa.int64()
            ),
        }
    )
    p = tempfile.mktemp(suffix=".orc")
    write_orc(t, p, stripe_rows=10_000)  # 4 stripes, disjoint k ranges
    try:
        assert spark.conf.get("spark.sql.orc.filterPushdown") == "true"
        df = spark.read.orc(p)
        # (a) exact results through pushdown
        q = df.filter("k >= 15000 and k < 17000").select("k")
        got = sorted(r.k for r in q.collect())
        assert got == list(range(15_000, 17_000))
        assert _scan_read_rows(q) == 10_000  # 1 of 4 stripes survived
        q = df.filter("s = 'v025123'")
        assert [r.k for r in q.collect()] == [25_123]
        assert _scan_read_rows(q) == 10_000
        q = df.filter("d = date'2020-01-05'").select("k")
        assert sorted(r.k for r in q.collect()) == list(range(400, 500))
        assert _scan_read_rows(q) == 10_000
        q = df.filter("x > 39998.5").select("k")
        assert [r.k for r in q.collect()] == [39_999]
        assert _scan_read_rows(q) == 10_000
        # hasNull drives IS NULL elimination: only 3 stripes have nulls
        q = df.filter("maybe is null")
        assert q.count() == 30_000
        assert _scan_read_rows(q) == 30_000
        q = df.filter("maybe is not null")
        assert q.count() == 10_000
        assert _scan_read_rows(q) == 10_000
    finally:
        os.unlink(p)


def test_statistics_have_teeth(spark):
    """Adversarial proof the Java reader actually CONSUMES our stats:
    deliberately-wrong stripe statistics make pushdown drop matching
    rows, while the pushdown-off read still returns them. If this test
    ever fails, the green results above no longer certify the stats."""
    import orc_format_spark.sources.orc_file as OF

    t = pa.table({"k": pa.array(range(20_000), pa.int64())})
    p = tempfile.mktemp(suffix=".orc")
    real = OF._stat_of

    def liar(arr):
        st = real(arr)
        if st["kind"] == "int" and "min" in st:
            st["min"], st["max"] = 10**9, 10**9 + 1  # excludes all rows
            st.pop("sum", None)
        return st

    OF._stat_of = liar
    try:
        write_orc(t, p, stripe_rows=5_000)
    finally:
        OF._stat_of = real
    try:
        assert spark.conf.get("spark.sql.orc.filterPushdown") == "true"
        lied = spark.read.orc(p).filter("k < 100").count()
        assert lied == 0  # every stripe wrongly eliminated
        spark.conf.set("spark.sql.orc.filterPushdown", "false")
        try:
            honest = spark.read.orc(p).filter("k < 100").count()
        finally:
            spark.conf.set("spark.sql.orc.filterPushdown", "true")
        assert honest == 100
    finally:
        os.unlink(p)


def test_union_roundtrip_through_apache_reader():
    """ORC UNION (Type kind 13, the last writer W12 off the real wire):
    byte-RLE position tags + children carrying only their tagged rows,
    probed against Apache C++'s own union output. Sparse AND dense
    Arrow unions, both RLE families, arbitrary (non-contiguous) Arrow
    type codes."""
    rng = np.random.default_rng(11)
    n = 12_000
    codes = pa.array(rng.integers(0, 3, n).astype(np.int8))
    ints = pa.array(rng.integers(-(10**6), 10**6, n), pa.int64())
    strs = pa.array([f"s{i % 97}" for i in range(n)])
    dbls = pa.array(rng.normal(size=n))
    sparse = pa.UnionArray.from_sparse(codes, [ints, strs, dbls])
    cn = np.asarray(codes)
    offs = np.zeros(n, np.int32)
    for c in range(3):
        m = cn == c
        offs[m] = np.arange(m.sum(), dtype=np.int32)
    dense = pa.UnionArray.from_dense(
        codes,
        pa.array(offs),
        [
            ints.filter(pa.array(cn == 0)),
            strs.filter(pa.array(cn == 1)),
            dbls.filter(pa.array(cn == 2)),
        ],
    )
    want = sparse.to_pylist()
    assert dense.to_pylist() == want
    for arr in (sparse, dense):
        for rle in ["v1", "v2"]:
            t = pa.table({"k": pa.array(range(n), pa.int64()), "u": arr})
            got = _roundtrip(t, stripe_rows=5_000, rle=rle,
                             compression="zstd")
            assert got.column("k").to_pylist() == list(range(n))
            assert got.column("u").to_pylist() == want
    # ORC tags are the variant's POSITION in subtypes, not Arrow's code
    weird = pa.UnionArray.from_sparse(
        pa.array([5, 7, 5, 7], pa.int8()),
        [pa.array([1, 2, 3, 4], pa.int32()), pa.array(list("abcd"))],
        ["i", "s"],
        [5, 7],
    )
    got = _roundtrip(pa.table({"u": weird}))
    assert got.column("u").to_pylist() == [1, "b", 3, "d"]


# ------------------------------------------- strided row-group indexes


def test_row_index_stride_both_apache_legs():
    """row_index_stride writes one RowIndexEntry per 2k-row group with
    REAL positions (streams restart at group boundaries). Apache C++
    must read the whole file exactly; our own reader must skip to the
    covering group and slice-match the table on every type."""
    import datetime as dt
    import decimal

    from orc_format_spark.sources.orc_read import read_orc

    D = decimal.Decimal
    n = 20_000
    t = pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "ni": pa.array([None if x % 7 == 0 else int(x) for x in range(n)],
                       pa.int32()),
        "f": pa.array(np.arange(n) * 0.5, pa.float64()),
        "s": pa.array([f"val{x:06d}" for x in range(n)]),
        "b": pa.array((np.arange(n) >= 15_000).tolist(), pa.bool_()),
        "i8": pa.array((np.arange(n) % 120).astype(np.int8), pa.int8()),
        "ts": pa.array([dt.datetime(2020, 1, 1)
                        + dt.timedelta(seconds=int(x)) for x in range(n)],
                       pa.timestamp("ns")),
        "dec": pa.array([D(int(x)).scaleb(-2) for x in range(n)],
                        pa.decimal128(18, 2)),
        "lst": pa.array([[int(x), int(x) + 1] for x in range(n)],
                        pa.list_(pa.int32())),
        "stc": pa.array([{"a": int(x), "b": f"s{x % 9}"} for x in range(n)],
                        pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "mp": pa.array([{"m": int(x)} for x in range(n)],
                       pa.map_(pa.string(), pa.int64())),
        # bit-packed hazards: nullable boolean DATA and null-bearing
        # list children have per-group bit counts that are NOT byte
        # multiples — these streams must encode continuously (group
        # restarts would pad and desync every non-seeking reader)
        "nb": pa.array([None if x % 11 == 0 else bool(x % 3)
                        for x in range(n)], pa.bool_()),
        "nlst": pa.array([[None, x] if x % 13 == 0 else [x] * (x % 3 + 1)
                          for x in range(n)], pa.list_(pa.int32())),
    })
    for rle in ("v1", "v2"):
        for comp in ("none", "zlib", "zstd"):
            buf = io.BytesIO()
            write_orc(t, buf, compression=comp, rle=rle,
                      stripe_rows=20_000, row_index_stride=2_000,
                      bloom_columns=["s"])
            data = buf.getvalue()
            f = po.ORCFile(io.BytesIO(data))
            assert f.row_index_stride == 2_000
            ref = f.read()
            for c in t.column_names:
                g = ref.column(c).combine_chunks()
                e = t.column(c).combine_chunks()
                if g.type != e.type:
                    g = g.cast(e.type)
                assert g.equals(e), (rle, comp, c)
            got = read_orc(data, predicate=[("k", ">=", 8_000),
                                            ("k", "<", 9_000)])
            assert got.num_rows == 2_000, (rle, comp, got.num_rows)
            sl = t.slice(8_000, 2_000)
            for c in t.column_names:
                g = got.column(c).combine_chunks()
                e = sl.column(c).combine_chunks()
                if g.type != e.type:
                    g = g.cast(e.type)
                assert g.equals(e), (rle, comp, c)
            got2 = read_orc(data, predicate=("s", "==", "val013777"))
            assert got2.num_rows == 2_000
            assert "val013777" in got2.column("s").to_pylist()


def test_row_group_elimination_by_apache_java_reader(spark):
    """The decisive external leg: Spark's ORC source (Apache ORC Java)
    consumes OUR RowIndexEntry positions to skip row groups inside a
    single stripe — the scan emits one 10k group of a 200k-row stripe,
    and the rows that survive are exactly right. Wrong positions would
    desync Java's positioned readers and corrupt values, so the value
    assertion alone is strong validation."""
    n = 200_000
    t = pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "s": pa.array([f"val{x:07d}" for x in range(n)]),
    })
    p = tempfile.mktemp(suffix=".orc")
    write_orc(t, p, compression="zlib", rle="v2", stripe_rows=n,
              row_index_stride=10_000, bloom_columns=["s"])
    try:
        assert po.ORCFile(p).nstripes == 1  # stripe skip can't help here
        df = spark.read.orc(p)
        q = df.filter("k >= 123456 and k < 123466")
        rows = sorted(q.collect())
        assert [r.k for r in rows] == list(range(123_456, 123_466))
        assert all(r.s == f"val{r.k:07d}" for r in rows)
        assert _scan_read_rows(q) == 10_000  # 1 of 20 row groups
        q2 = df.filter("k = 54321").select("s")
        assert [r.s for r in q2.collect()] == ["val0054321"]
        assert _scan_read_rows(q2) == 10_000
        # bloom-indexed point lookup on the string column
        q3 = df.filter("s = 'val0188888'").select("k")
        assert [r.k for r in q3.collect()] == [188_888]
        assert _scan_read_rows(q3) == 10_000
    finally:
        os.unlink(p)


def test_row_group_seek_nullable_types_java_reader(spark):
    """Java's positioned readers cross PRESENT (4-entry positions),
    SECONDARY and raw-varint streams when seeking to a mid-stripe
    group: a window inside group 8 of a 120k-row stripe must come back
    value-exact for nullable long/bool/string/timestamp/decimal."""
    import datetime as dt
    import decimal

    D = decimal.Decimal
    n = 120_000
    t = pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "ni": pa.array([None if x % 7 == 0 else int(x) for x in range(n)],
                       pa.int64()),
        "b": pa.array([None if x % 11 == 0 else bool(x % 3)
                       for x in range(n)], pa.bool_()),
        "s": pa.array([None if x % 5 == 0 else f"val{x:07d}"
                       for x in range(n)]),
        "ts": pa.array([None if x % 13 == 0 else
                        dt.datetime(2020, 1, 1)
                        + dt.timedelta(seconds=int(x)) for x in range(n)],
                       pa.timestamp("ns")),
        "dec": pa.array([None if x % 17 == 0 else D(int(x)).scaleb(-2)
                         for x in range(n)], pa.decimal128(18, 2)),
        # list with null elements: the child PRESENT stream is
        # continuous with SCANNED (header, run, bit) positions — the
        # hardest seek state Java has to consume
        "lst": pa.array([[None, int(x)] if x % 23 == 0
                         else [int(x)] * (x % 3 + 1) for x in range(n)],
                        pa.list_(pa.int64())),
    })
    p = tempfile.mktemp(suffix=".orc")
    write_orc(t, p, compression="zstd", rle="v2", stripe_rows=n,
              row_index_stride=8_192)
    try:
        df = spark.read.orc(p)
        q = df.filter("k >= 70000 and k < 70100")  # inside group 8
        rows = sorted(q.collect())
        assert len(rows) == 100
        assert _scan_read_rows(q) == 8_192  # one group of ~15
        for r in rows:
            x = r.k
            assert r.ni == (None if x % 7 == 0 else x)
            assert r.b == (None if x % 11 == 0 else bool(x % 3))
            assert r.s == (None if x % 5 == 0 else f"val{x:07d}")
            assert r.dec == (None if x % 17 == 0 else D(x).scaleb(-2))
            exp_l = [None, x] if x % 23 == 0 else [x] * (x % 3 + 1)
            assert list(r.lst) == exp_l
        got_ts = sum(1 for r in rows if r.ts is not None)
        assert got_ts == sum(1 for x in range(70_000, 70_100)
                             if x % 13 != 0)
    finally:
        os.unlink(p)


def test_row_index_stride_bit_stream_regression():
    """The exact shapes that corrupted under per-group bit restarts: a
    nullable boolean and a variable-length list with null elements at a
    non-multiple-of-8 group bit count — full reads through BOTH readers
    must be value-exact at any stride, including odd ones."""
    from orc_format_spark.sources.orc_read import read_orc

    b_vals = [None if i == 3 else bool(i % 2) for i in range(64)]
    l_vals = [[None, i] if i % 5 == 0 else [i] * (i % 3 + 1)
              for i in range(64)]
    t = pa.table({
        "b": pa.array(b_vals, pa.bool_()),
        "l": pa.array(l_vals, pa.list_(pa.int32())),
    })
    for stride in (8, 10, 16, 17):
        buf = io.BytesIO()
        write_orc(t, buf, row_index_stride=stride, compression="zlib")
        data = buf.getvalue()
        apache = po.read_table(io.BytesIO(data))
        assert apache.column("b").to_pylist() == b_vals, stride
        assert apache.column("l").to_pylist() == l_vals, stride
        ours = read_orc(data)
        assert ours.column("b").to_pylist() == b_vals, stride
        assert ours.column("l").to_pylist() == l_vals, stride
