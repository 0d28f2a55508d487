"""Z-order (Morton) multi-column clustering for blob-file pruning.

The datasource's commit manifest carries per-file [min,max] column stats
and ``DataSourceReader.partitions()`` drops whole files at planning time
(sources/datasource.py — the ORC file-stats analogue). Range clustering
on ONE column makes that pruning sharp for that column only; a filter on
any other column still opens every file. Z-ordering interleaves the bits
of several columns' rank buckets into one Morton code so that a
range-partitioned write narrows EVERY participating column's per-file
min/max at once — the Delta Lake ``OPTIMIZE ZORDER BY`` idea, built here
from public first principles (Morton 1966 interleave; quantile-rank
bucketing to make the curve skew-robust).

Scale shape (the 100 TB story):
- boundary computation is one distributed ``approxQuantile`` sketch
  (driver receives ``cols × (2^bits - 1)`` doubles — bits<=12 keeps that
  ~32 KB/col, asserted);
- bucket lookup + bit interleave run map-side in one ``mapInArrow`` pass
  (``np.searchsorted`` + vectorized bit spread, no Python per row);
- the only shuffle is the caller's final ``repartitionByRange`` on the
  z-key — exactly the shuffle any clustered write already pays.

Reference parity: the reference has no clustering or pruning at all
(single-file writer, src/writer.rs); this extends the repo's own
file/blob/chunk three-level pruning surface (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

MAX_BITS = 16  # per-column; 16 bits x 4 cols = 64-bit z fits a LongType


def zorder_boundaries(
    df: DataFrame, cols: Sequence[str], bits: int = 12, rel_err: float = 1e-4
) -> dict[str, list[float]]:
    """Per-column quantile bucket boundaries (2^bits - 1 cut points).

    One pass of Spark's distributed Greenwald-Khanna sketch; the driver
    holds only the cut points. Quantile (rank) bucketing, not min/max
    equi-width: a skewed column would otherwise collapse most rows into
    a handful of buckets and the curve would degenerate to the remaining
    columns' order.
    """
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}], got {bits}")
    n_cuts = (1 << bits) - 1
    probs = [i / (1 << bits) for i in range(1, (1 << bits))]
    casted = df.select(*[df[c].cast("double").alias(c) for c in cols])
    qs = casted.approxQuantile(list(cols), probs, rel_err)
    return {c: q for c, q in zip(cols, qs)}


def _interleave(bucketed: list[np.ndarray], bits: int) -> np.ndarray:
    """Morton-interleave k uint64 bucket arrays, bit i of column j landing
    at position i*k + j. Vectorized: bits x k shift-or passes."""
    k = len(bucketed)
    z = np.zeros(len(bucketed[0]), np.uint64)
    for i in range(bits):
        for j, col in enumerate(bucketed):
            z |= ((col >> np.uint64(i)) & np.uint64(1)) << np.uint64(i * k + j)
    return z


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 12,
    boundaries: dict[str, list[float]] | None = None,
    out_col: str = "z",
) -> DataFrame:
    """Append a Morton z-key column over ``cols``.

    Typical use::

        z = with_zorder_key(df, ["a", "b"])
        z.repartitionByRange(n, "z").sortWithinPartitions("z") \\
         .drop("z").write.format("orc_format").save(path)

    ``boundaries`` accepts precomputed cut points (e.g. reused across
    incremental writes so new files land on the same curve); otherwise
    one ``approxQuantile`` pass computes them. NULLs raise: a z-curve
    position for NULL is undefined — filter or fill first (the same loud
    contract as pack_sequences)."""
    cols = list(cols)
    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder takes 2-4 columns")
    if bits * len(cols) > 64:
        raise ValueError(f"bits*cols = {bits * len(cols)} exceeds 64-bit z-key")
    if boundaries is None:
        boundaries = zorder_boundaries(df, cols, bits)
    bcuts = {c: np.asarray(b, np.float64) for c, b in boundaries.items()}

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(df.schema.fields + [StructField(out_col, LongType())])

    def fn(it):
        for batch in it:
            arrs = []
            for c in cols:
                a = batch.column(c)
                if a.null_count:
                    raise ValueError(
                        f"zorder: NULL in column {c!r} — a z-curve position "
                        "for NULL is undefined; filter or fill first"
                    )
                v = a.to_numpy(zero_copy_only=False).astype(np.float64)
                arrs.append(np.searchsorted(bcuts[c], v, side="right").astype(np.uint64))
            z = _interleave(arrs, bits).view(np.int64)
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + [pa.array(z, pa.int64())],
                names=list(batch.schema.names) + [out_col],
            )

    return df.mapInArrow(fn, out_schema)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 16,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered write to the blob datasource: one range shuffle
    on the z-key, z dropped before encode (it is derivable metadata, not
    data). Each output file then covers a tight hyper-rectangle in every
    participating column, so the manifest's per-file [min,max] prunes
    filtered reads on ANY of them at planning time."""
    z = with_zorder_key(df, cols, bits=bits)
    (
        z.repartitionByRange(num_files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.format("orc_format")
        .mode(mode)
        .save(path)
    )
