"""Row-group sub-index (F3 parity): chunked blobs decode row slices
without touching non-covering chunks.

Reference analog: per-column positions every row_index_stride=10,000 rows
(/root/reference/src/writer/data/common.rs:24-48, writer.rs:32) that let
an ORC reader seek into a stripe. Our container v2 realizes the same
property as independently decodable row-group chunks inside one blob.
"""

import numpy as np
import pyarrow as pa
import pytest

from orc_format_spark.codecs import container as C


def _table(n=10_000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(rng.integers(0, 100, n).astype(np.int32)),
            "s": pa.array([f"row-{i % 997}" for i in range(n)]),
            "nul": pa.array(
                [None if i % 7 == 0 else float(i) for i in range(n)], pa.float64()
            ),
            "lst": pa.array(
                [list(range(i % 5)) for i in range(n)], pa.list_(pa.int32())
            ),
        }
    )


RANGES = [(0, 10), (0, 1000), (995, 1005), (1000, 2000), (9_990, 10_000),
          (0, 10_000), (5_000, 5_001), (4_242, 7_777)]


def test_chunked_roundtrip_equals_v1():
    tbl = _table()
    blob_v1, lin1 = C.encode_table(tbl)
    blob_v2, lin2 = C.encode_table(tbl, stride=1000)
    assert blob_v2[:4] == b"OFS2"
    full1 = C.decode_table(blob_v1)
    full2 = C.decode_table(blob_v2)
    assert full1.equals(tbl)
    assert full2.equals(tbl)
    # merged lineage totals agree on logical counts
    tot1 = {l["column"]: l["n_present"] for l in lin1}
    tot2 = {l["column"]: l["n_present"] for l in lin2}
    assert tot1 == tot2


@pytest.mark.parametrize("a,b", RANGES)
def test_row_slice_matches_full(a, b):
    tbl = _table()
    blob, _ = C.encode_table(tbl, stride=1000)
    sl = C.decode_table(blob, rows=(a, b))
    assert sl.equals(tbl.slice(a, b - a))


def test_row_slice_with_projection():
    tbl = _table()
    blob, _ = C.encode_table(tbl, stride=1000)
    sl = C.decode_table(blob, columns=["s", "k"], rows=(2_500, 3_500))
    assert sl.column_names == ["s", "k"]
    assert sl.column("k").to_pylist() == list(range(2_500, 3_500))


def test_row_slice_on_v1_blob_falls_back():
    tbl = _table(2_000)
    blob, _ = C.encode_table(tbl)  # v1: no chunk index
    sl = C.decode_table(blob, rows=(100, 250))
    assert sl.equals(tbl.slice(100, 150))


def test_row_slice_clamps_and_empty():
    tbl = _table(1_500)
    blob, _ = C.encode_table(tbl, stride=400)
    assert C.decode_table(blob, rows=(1_400, 99_999)).num_rows == 100
    assert C.decode_table(blob, rows=(700, 700)).num_rows == 0


def test_row_slice_touches_only_covering_chunks(monkeypatch):
    """Point reads must not decompress the whole column (the reason the
    sub-index exists at 100x scale)."""
    tbl = _table()
    blob, _ = C.encode_table(tbl, stride=1000)
    calls = {"n": 0}
    real = C.decompress_stream

    def counting(buf, kind, *a, **kw):
        calls["n"] += 1
        return real(buf, kind, *a, **kw)

    monkeypatch.setattr(C, "decompress_stream", counting)
    C.decode_table(blob, rows=(0, 10))
    point = calls["n"]
    calls["n"] = 0
    C.decode_table(blob)
    full = calls["n"]
    assert point <= full / 5  # 1 chunk of 10 decompressed


def test_chunked_nulls_and_nested():
    n = 3_000
    tbl = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "st": pa.array(
                [None if i % 11 == 0 else {"a": i, "b": f"x{i % 3}"} for i in range(n)],
                pa.struct([("a", pa.int64()), ("b", pa.string())]),
            ),
            "mp": pa.array(
                [[("k", float(i))] for i in range(n)],
                pa.map_(pa.string(), pa.float64()),
            ),
        }
    )
    blob, _ = C.encode_table(tbl, stride=700)
    assert C.decode_table(blob).equals(tbl)
    sl = C.decode_table(blob, rows=(650, 1_450))
    assert sl.equals(tbl.slice(650, 800))


def test_verify_blobs_on_chunked_blobs(spark):
    """verify_blobs' checksum comparison must hold for v2 chunked blobs
    (decode dispatches on the magic)."""
    from pyspark.sql import functions as F

    from orc_format_spark import encode_groups, verify_blobs

    df = spark.range(0, 30_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("int").alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 13).cast("string")).alias("s"),
    )
    blobs = encode_groups(df, num_groups=3, key_col="k", row_index_stride=2_000)
    assert blobs.select(F.max(F.length("blob"))).first()[0] > 0
    ver = verify_blobs(blobs)
    rows = ver.collect()
    assert len(rows) == 3 and all(r.ok for r in rows)


def test_schema_evolution_decode(spark):
    """evolution=True: mixed-era blobs resolve by name — missing columns
    decode as all-null; predicates on a missing column are decided
    without payload decode (isnull keeps all, others keep none); strict
    mode (default) still fails loudly on the mismatch."""
    import pytest as _pytest

    from orc_format_spark import decode_blobs, decode_blob_files, encode_groups

    old = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k long, a double"
    )
    new = spark.createDataFrame(
        [(i, float(i), f"s{i}") for i in range(40, 60)],
        "k long, a double, s string",
    )
    b_old = encode_groups(old, num_groups=2, key_col="k")
    b_new = encode_groups(new, num_groups=2, key_col="k")
    mixed = b_old.select("blob").unionAll(b_new.select("blob"))
    ddl = "k long, a double, s string"

    out = decode_blobs(mixed, ddl, evolution=True).collect()
    assert len(out) == 60
    by_k = {r.k: r for r in out}
    assert by_k[5].s is None and by_k[45].s == "s45"
    # strict mode still refuses the era mismatch
    with _pytest.raises(Exception, match="schema mismatch"):
        decode_blobs(mixed, ddl).collect()
    # predicate on the missing column: non-isnull ops drop old-era blobs
    # entirely (no payload decode), isnull keeps exactly their rows
    got = decode_blobs(mixed, ddl, predicate=("s", "==", "s45"), evolution=True)
    assert [r.k for r in got.collect()] == [45]
    got = decode_blobs(mixed, ddl, predicate=("s", "isnull", None), evolution=True)
    assert sorted(r.k for r in got.collect()) == list(range(40))
    # projection: declared schema = the projected columns (convention)
    got = decode_blobs(mixed, "k long, s string", columns=["k", "s"], evolution=True)
    rows = {r.k: r.s for r in got.collect()}
    assert rows[3] is None and rows[52] == "s52"
    # declared column stored in the blob but excluded from the
    # projection must fail loudly, never null-fill real data (the same
    # call raises "schema mismatch" on the strict path)
    with _pytest.raises(Exception, match="excludes"):
        decode_blobs(mixed, ddl, columns=["k"], evolution=True).collect()

    # sink-file variant
    import glob as _glob
    import tempfile

    with tempfile.TemporaryDirectory() as sink:
        # separate era directories: sink names are deterministic per
        # group_id, so two encodes into one dir would collide
        encode_groups(
            old, num_groups=2, key_col="k", blob_sink=f"{sink}/e1"
        ).collect()
        encode_groups(
            new, num_groups=2, key_col="k", blob_sink=f"{sink}/e2"
        ).collect()
        files = spark.createDataFrame(
            [(p,) for p in sorted(_glob.glob(f"{sink}/e*/*.ofs"))],
            "blob_path string",
        )
        out = decode_blob_files(files, ddl, evolution=True).collect()
        assert len(out) == 60
        assert sorted(r.k for r in out if r.s is None) == list(range(40))
