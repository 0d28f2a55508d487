"""Z-order clustering: Morton interleave golden values, loud contracts,
and the planning-time multi-column file pruning it exists for.

Reference parity: the reference is a single-file writer with no
clustering/pruning (src/writer.rs); zorder extends the repo's own
file/blob/chunk pruning ladder (SURVEY.md §2.6, sources/datasource.py).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from orc_format_spark import register_datasource
from orc_format_spark.operators.zorder import (
    _interleave,
    with_zorder_key,
    zorder_boundaries,
    zorder_write,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def zs(spark):
    register_datasource(spark)
    return spark


def test_interleave_golden():
    # two columns: x=0b11, y=0b01 -> z bits (y1 x1 y0 x0) = 0b0111
    z = _interleave([np.array([0b11], np.uint64), np.array([0b01], np.uint64)], 2)
    assert z[0] == 0b0111
    # three columns, one bit each: (c b a) -> a at bit0, b at bit1, c at bit2
    z3 = _interleave(
        [np.array([1], np.uint64), np.array([0], np.uint64), np.array([1], np.uint64)],
        1,
    )
    assert z3[0] == 0b101
    # locality: nearby (x, y) pairs get nearby z on the 4-bit curve
    xs, ys = np.meshgrid(np.arange(4, dtype=np.uint64), np.arange(4, dtype=np.uint64))
    z = _interleave([xs.ravel(), ys.ravel()], 2)
    assert len(set(z.tolist())) == 16  # bijective on the 4x4 grid


def test_contracts(zs):
    df = zs.range(10).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    )
    with pytest.raises(ValueError, match="2-4 columns"):
        with_zorder_key(df, ["a"])
    with pytest.raises(ValueError, match="63 usable bits"):
        with_zorder_key(df, ["a", "b"], bits=32)
    with pytest.raises(ValueError, match="bits must be"):
        zorder_boundaries(df, ["a", "b"], bits=0)
    nulls = df.withColumn("b", F.when(F.col("a") < 5, F.col("b")))
    with pytest.raises(Exception, match="NULL in column"):
        with_zorder_key(nulls, ["a", "b"], bits=4).collect()
    # NaN has no curve position either — loud, not a silent top bucket
    nan_df = df.withColumn(
        "b", F.when(F.col("a") < 5, F.col("b").cast("double")).otherwise(
            F.lit(float("nan"))
        )
    )
    with pytest.raises(Exception, match="NaN in column"):
        with_zorder_key(nan_df, ["a", "b"], bits=4).collect()
    # non-numeric columns rejected up front
    s_df = df.withColumn("s", F.col("a").cast("string"))
    with pytest.raises(ValueError, match="z-curve position"):
        with_zorder_key(s_df, ["a", "s"], bits=4)
    # reused boundaries must match the bits they were computed with
    b = zorder_boundaries(df, ["a", "b"], bits=6)
    with pytest.raises(ValueError, match="cut points but bits"):
        with_zorder_key(df, ["a", "b"], bits=4, boundaries=b)


def test_timestamp_units_consistent(zs):
    """Boundaries come from Spark's cast(ts as double) = epoch seconds;
    the kernel must bucket in the same units, or every row lands in the
    max bucket and the column silently stops contributing to the curve."""
    df = zs.range(1000).select(
        F.timestamp_seconds(F.lit(1_500_000_000) + F.col("id") * 3600).alias("ts"),
        (F.col("id") % 50).alias("x"),
    )
    z = with_zorder_key(df, ["ts", "x"], bits=6)
    import pandas as pd  # noqa: F401

    keys = z.select("z").toPandas()["z"]
    # ts spans ~42 days uniformly: its 6-bit rank bucket must actually
    # vary (the bug collapsed every row into bucket 63)
    ts_bits = [(int(k) >> 1) & 0b111 for k in keys]  # a few low ts bits
    assert len(set(ts_bits)) > 1
    # and the full key is bijective enough to order the time range:
    # early rows and late rows must not share z-keys
    early = z.filter(F.col("ts") < F.timestamp_seconds(F.lit(1_500_600_000)))
    late = z.filter(F.col("ts") > F.timestamp_seconds(F.lit(1_503_000_000)))
    emax = early.agg(F.max("z")).first()[0]
    lmin = late.agg(F.min("z")).first()[0]
    assert emax is not None and lmin is not None
    assert emax != lmin


def test_zorder_key_deterministic_and_local(zs):
    li = zs.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    b = zorder_boundaries(li, ["l_orderkey", "l_partkey"], bits=6)
    z1 = with_zorder_key(li, ["l_orderkey", "l_partkey"], bits=6, boundaries=b)
    z2 = with_zorder_key(li, ["l_orderkey", "l_partkey"], bits=6, boundaries=b)
    r1 = sorted(z1.select("z").toPandas()["z"].tolist())
    r2 = sorted(z2.select("z").toPandas()["z"].tolist())
    assert r1 == r2  # injected boundaries -> bit-stable keys
    assert len(set(r1)) > 1


def test_multi_column_file_pruning(zs, tmp_path):
    """The operator's reason to exist: a z-ordered layout prunes files
    on EVERY participating column; single-column range clustering
    prunes only its own. Counts are planning-time (reader.partitions),
    zero tasks for skipped files."""
    from pyspark.sql.datasource import LessThanOrEqual
    from pyspark.sql.types import StructType

    from orc_format_spark.sources.datasource import OrcFormatReader

    li = zs.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zdir, rdir = str(tmp_path / "zo"), str(tmp_path / "rg")
    zorder_write(li, zdir, ["l_orderkey", "l_partkey"], num_files=8, bits=8)
    li.repartitionByRange(8, "l_orderkey").write.format("orc_format").mode(
        "overwrite"
    ).save(rdir)

    hi_ok, hi_pk = li.agg(F.max("l_orderkey"), F.max("l_partkey")).first()
    box = [
        LessThanOrEqual(("l_orderkey",), int(hi_ok) // 4),
        LessThanOrEqual(("l_partkey",), int(hi_pk) // 4),
    ]

    def kept(path, preds):
        r = OrcFormatReader({"path": path}, StructType([]))
        r.pushFilters(list(preds))
        return len([p for p in r.partitions() if p.path])

    # off-axis column: range layout cannot prune at all, z-order must —
    # this is the property the operator exists for. (On the range
    # layout's OWN axis a single-column sort is sharper by design;
    # z-order trades that for coverage of every participating column.)
    assert kept(rdir, box[1:]) == 8
    assert kept(zdir, box[1:]) < 8
    # the box (1/4 x 1/4) must eliminate at least half the z-files
    assert kept(zdir, box) <= 4

    # and the filtered rows are exact on both layouts
    expect = li.filter(
        (F.col("l_orderkey") <= int(hi_ok) // 4)
        & (F.col("l_partkey") <= int(hi_pk) // 4)
    ).count()
    for d in (zdir, rdir):
        got = (
            zs.read.format("orc_format")
            .load(d)
            .filter(
                (F.col("l_orderkey") <= int(hi_ok) // 4)
                & (F.col("l_partkey") <= int(hi_pk) // 4)
            )
            .count()
        )
        assert got == expect
