"""Iceberg-backed tokens source (feature-gated).

BASELINE.json's input_hint names an Iceberg table of pre-tokenized
training sequences. This sandbox has no iceberg-spark runtime jar, so
the catalog path is gated on the class actually being loadable; when it
is, the swap is real, not documentation:

- ``read_tokens_table(spark, name)`` — catalog read of the tokens table.
- ``list_iceberg_splits(spark, name)`` — the split list for the
  zero-payload-movement encode path, taken from Iceberg's ``.files``
  metadata table (the manifest), then exploded to row-group granularity
  with a pyarrow footer read per data file. Snapshot-pinned manifests
  make split ids immutable => exact resume, the same determinism story
  as ``list_parquet_splits``.
- ``encode_iceberg_splits(...)`` — ``encode_parquet_splits`` over that
  manifest-derived split list.

Without the jar, callers get a clear RuntimeError naming the missing
runtime, and the parquet-path equivalents remain the supported route.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg Spark runtime not on the classpath; add "
            "org.apache.iceberg:iceberg-spark-runtime and a catalog config "
            "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog), "
            "or use the parquet-path source (sources/parquet_scan.py)."
        )


def read_tokens_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read of the Iceberg tokens table (input_hint shape)."""
    _require(spark)
    return spark.read.table(name)


def list_iceberg_splits(spark: SparkSession, name: str) -> list[tuple[int, str, int]]:
    """Deterministic (split_id, file, row_group) list from the Iceberg
    manifest (`<table>.files` metadata table), row-group-exploded.

    The manifest enumerates data files of the current snapshot; pin a
    snapshot (`VERSION AS OF`) for immutable split ids across resumes.
    """
    import pyarrow.parquet as pq

    _require(spark)
    files = sorted(
        r.file_path
        for r in spark.read.table(f"{name}.files").select("file_path").collect()
    )
    out: list[tuple[int, str, int]] = []
    sid = 0
    for f in files:
        local = f[len("file:") :] if f.startswith("file:") else f
        n_rg = pq.ParquetFile(local).metadata.num_row_groups
        for rg in range(n_rg):
            out.append((sid, local, rg))
            sid += 1
    return out


def encode_iceberg_splits(
    spark: SparkSession,
    name: str,
    columns: list[str] | None = None,
    codec: str = "auto",
    compression: str = "zstd",
    parallelism: int | None = None,
    row_index_stride: int | None = None,
) -> DataFrame:
    """Split-level encode of an Iceberg tokens table: the manifest
    supplies the splits; payload never crosses the JVM (same plan shape
    as ``encode_parquet_splits``)."""
    from .parquet_scan import encode_splits

    splits = list_iceberg_splits(spark, name)
    return encode_splits(
        spark,
        splits,
        columns=columns,
        codec=codec,
        compression=compression,
        parallelism=parallelism,
        row_index_stride=row_index_stride,
    )
