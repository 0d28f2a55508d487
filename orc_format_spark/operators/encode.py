"""Encode / decode / verify operators (the engine core).

``encode_groups`` is the Spark reshaping of the reference's stripe writer
(src/writer/stripe.rs): one deterministic group == one stripe; the group's
columns are encoded by the vectorized kernels in
``orc_format_spark.codecs`` inside an ``applyInArrow`` UDF (Arrow-batched,
zero per-row Python), emitting one blob row + codec lineage, mirroring the
reference's StripeInfo/StreamInfo bookkeeping (stripe.rs:13-28) plus the
codec-selection metadata the reference lacks (SURVEY.md section 4.2).

Scale notes: the only shuffle is the groupBy on the deterministic
``group_id`` (see operators/partitioning.py); encoding is map-side work
after the shuffle; blobs are ~tokens_per_group * 4 bytes before
compression, sized to stay well inside executor memory. Decoding streams
blobs through ``mapInArrow`` without ever collecting.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame

from ..codecs.container import (
    DEFAULT_ROW_INDEX_STRIDE,
    decode_table,
    encode_table,
    table_checksum,
)
from ..worker_env import limit_worker_threads
from .partitioning import with_group_id

BLOB_SCHEMA = (
    "group_id long, n_rows long, n_values long, input_bytes long, "
    "output_bytes long, checksum string, codecs string, lineage string, "
    "blob binary"
)

# blob persisted by the worker itself (encode_splits(blob_sink=...)):
# the row carries the sink path, the payload never crosses the JVM
BLOB_FILE_SCHEMA = BLOB_SCHEMA.replace("blob binary", "blob_path string")


def _blob_schema(blob_sink, stats: bool) -> str:
    """Output DDL for a grouped encode: payload column per sink mode,
    plus the optional blob-level ``stats`` column (stripe min/max, same
    JSON shape as the in-blob chunk stats) for JVM-side pruning."""
    s = BLOB_FILE_SCHEMA if blob_sink is not None else BLOB_SCHEMA
    if stats:
        s = s.replace(", blob", ", stats string, blob")
    return s


def _finish_group(
    gid: int,
    data: pa.Table,
    codec,
    compression: str,
    row_index_stride,
    bloom_columns,
    blob_sink,
    stats: bool = False,
) -> pa.Table:
    """Encode one group's (already sorted) rows into its blob + lineage
    row — the shared tail of every grouped-encode strategy, so row-,
    compressed-, and staged-shuffle paths emit byte-identical blobs.
    ``stats`` adds a blob-level min/max (+bloom) column for JVM-side
    stripe elimination (see ``prune_blobs``)."""
    blob, lineage = encode_table(
        data,
        codec=codec,
        compression=compression,
        stride=row_index_stride,
        bloom_columns=bloom_columns,
    )
    leaf = [l for l in lineage if l["codec"] != "list"]
    n_values = sum(l["n_present"] for l in leaf)
    input_bytes = sum(l["input_bytes"] for l in lineage)
    codecs = {l["column"]: l["codec"] for l in lineage}
    if blob_sink is not None:
        import os

        dest = os.path.join(blob_sink, f"group-{gid:08d}.ofs")
        tmp = f"{dest}.tmp.{os.getpid()}"
        with open(tmp, "wb") as out:
            out.write(blob)
        os.replace(tmp, dest)
        payload = pa.array([dest], pa.string())
        pname = "blob_path"
    else:
        payload = pa.array([blob], pa.binary())
        pname = "blob"
    cols = {
        "group_id": pa.array([gid], pa.int64()),
        "n_rows": pa.array([data.num_rows], pa.int64()),
        "n_values": pa.array([n_values], pa.int64()),
        "input_bytes": pa.array([input_bytes], pa.int64()),
        "output_bytes": pa.array([len(blob)], pa.int64()),
        "checksum": pa.array([table_checksum(data)], pa.string()),
        "codecs": pa.array([json.dumps(codecs, sort_keys=True)], pa.string()),
        "lineage": pa.array([json.dumps(lineage, sort_keys=True)], pa.string()),
    }
    if stats:
        from ..codecs.container import _chunk_stats

        cols["stats"] = pa.array(
            [json.dumps(_chunk_stats(data, bloom_columns), sort_keys=True)],
            pa.string(),
        )
    cols[pname] = payload
    return pa.table(cols)


def encode_groups(
    df: DataFrame,
    num_groups: int | None = None,
    codec: str | dict = "auto",
    compression: str = "zstd",
    key_col: str | None = None,
    size_col: str | None = None,
    row_index_stride: int | None = DEFAULT_ROW_INDEX_STRIDE,
    blob_sink: str | None = None,
    bloom_columns: list[str] | None = None,
    shuffle: str = "rows",
    cluster_by: list[str] | None = None,
    stats: bool = False,
) -> DataFrame:
    """Encode a DataFrame into per-group blobs + lineage.

    ``stats`` adds a blob-level ``stats`` column (per-column min/max —
    isoformat for temporals — plus ``bloom_columns`` bitsets; the same
    JSON shape as the in-blob chunk stats) to every lineage row. It is
    the stripe-elimination index: ``prune_blobs`` / a ``predicate=``
    decode evaluates it JVM-side and drops whole blobs before any
    payload is ferried to a Python worker or (sink mode) the blob file
    is even opened — the ORC stripe-statistics analog of split
    elimination, which matters more than chunk skipping at 100 TB.

    ``cluster_by`` sorts each group's rows by these columns (then
    ``key_col`` as tiebreak) before encoding. Clustering costs only the
    in-group sort the path performs anyway and feeds the codecs longer
    runs / smaller deltas: full lineitem encodes 13.7% smaller clustered
    by l_shipdate, the 5-column bench projection 7.6% smaller (bench
    `clustered_encode_ratio`). At 100 TB this is the
    cheapest compression lever there is — the shuffle already paid for
    co-locating the rows; ordering them is free money.

    ``row_index_stride`` chunks each blob every N rows (the reference's
    row-group index, writer.rs:32) so decode_blobs/decode_table can
    point-read a row slice without decompressing whole columns.

    ``blob_sink``: the group's task writes its blob to
    ``<sink>/group-<id>.ofs`` itself (atomic, deterministic name) and
    the returned row carries ``blob_path`` instead of ``blob`` — the
    encoded payload then never crosses the Python->JVM Arrow socket
    (measured to dominate wall time at high core counts).

    ``shuffle`` picks how the re-clustering exchange moves the payload:

    - ``"rows"``: the groupBy shuffles raw rows (UnsafeRow) — one
      exchange, encode after. Simple, but token arrays cost ~8 B/token
      on the wire.
    - ``"compressed"``: two-phase. Each input partition first encodes
      its rows per group into transient chunklet blobs map-side (no
      exchange yet), the exchange then moves only COMPRESSED bytes
      (~0.28 B/token here, a ~30x wire reduction), and each group's
      task decodes its chunklets, re-sorts, and re-encodes the final
      blob with full codec auto-selection. Output blobs, checksums,
      and lineage are byte-identical to ``"rows"`` (asserted in
      tests/test_spark_engine.py). CPU pays one extra cheap
      encode+decode; the network pays ~1/30th — at 100 TB the shuffle
      wire/spill cost dominates any re-clustering job, so this is the
      cluster-default path.
    """
    if shuffle not in ("rows", "compressed"):
        raise ValueError(f"unknown shuffle strategy: {shuffle!r}")
    if "group_id" not in df.columns:
        if num_groups is None:
            num_groups = max(1, df.rdd.getNumPartitions())
        key = key_col or df.columns[0]
        df = with_group_id(df, num_groups, key_col=key, size_col=size_col)
    sort_key = key_col or [c for c in df.columns if c != "group_id"][0]
    sort_spec = [(c, "ascending") for c in (cluster_by or []) if c != sort_key]
    sort_spec.append((sort_key, "ascending"))
    if blob_sink is not None:
        import os

        os.makedirs(blob_sink, exist_ok=True)

    if shuffle == "compressed":
        return _encode_groups_compressed(
            df,
            codec=codec,
            compression=compression,
            sort_spec=sort_spec,
            row_index_stride=row_index_stride,
            blob_sink=blob_sink,
            bloom_columns=bloom_columns,
            stats=stats,
        )

    def fn(tbl: pa.Table) -> pa.Table:
        limit_worker_threads()
        gid = tbl.column("group_id")[0].as_py() if tbl.num_rows else -1
        data = tbl.drop_columns(["group_id"]).sort_by(sort_spec)
        return _finish_group(
            gid, data, codec, compression, row_index_stride, bloom_columns,
            blob_sink, stats=stats,
        )

    return df.groupBy("group_id").applyInArrow(fn, _blob_schema(blob_sink, stats))


# flush threshold for map-side chunklet accumulation: big enough that
# per-chunklet codec/compression overhead amortizes, small enough that a
# task never holds more than ~one parquet row group of raw rows
_CHUNKLET_FLUSH_BYTES = 128 * 1024 * 1024


def _encode_groups_compressed(
    df: DataFrame,
    codec,
    compression: str,
    sort_spec: list[tuple[str, str]],
    row_index_stride,
    blob_sink,
    bloom_columns,
    stats: bool = False,
) -> DataFrame:
    """Two-phase grouped encode: map-side per-(partition, group)
    chunklet encode -> compressed-byte exchange -> per-group merge +
    final encode. See ``encode_groups(shuffle="compressed")``.

    The chunklet is a plain container blob (stride=None, no bloom) —
    transient wire format only; the final blob is re-encoded from the
    merged, re-sorted rows so every strategy emits identical bytes.
    The same move powers ``compact_blobs`` (operators/compact.py): at
    scale, bytes on the exchange wire are the budget, so ship them
    encoded.
    """

    def enc_parts(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        limit_worker_threads()
        pend: list[pa.RecordBatch] = []
        pend_bytes = 0

        def flush():
            nonlocal pend, pend_bytes
            if not pend:
                return
            tbl = pa.Table.from_batches(pend)
            pend, pend_bytes = [], 0
            gids = tbl.column("group_id")
            # ship Spark's exact Arrow schema with each chunklet: the
            # container's decode reconstructs types from type STRINGS,
            # which loses nested field-name conventions (Spark names a
            # list child "element", pyarrow defaults to "item"); the
            # merge side casts back so final blobs match the row path
            # byte-for-byte
            aschema = (
                tbl.drop_columns(["group_id"]).schema.serialize().to_pybytes()
            )
            for gid in pc.unique(gids).to_pylist():
                sub = tbl.filter(pc.equal(gids, gid)).drop_columns(
                    ["group_id"]
                )
                # cheap transient encode: auto codec, no stride/bloom
                blob, _ = encode_table(sub, codec=codec, compression=compression)
                yield pa.record_batch(
                    [
                        pa.array([gid], pa.int64()),
                        pa.array([blob], pa.binary()),
                        pa.array([aschema], pa.binary()),
                    ],
                    names=["group_id", "part", "aschema"],
                )

        for batch in batches:
            pend.append(batch)
            pend_bytes += batch.nbytes
            if pend_bytes >= _CHUNKLET_FLUSH_BYTES:
                yield from flush()
        yield from flush()

    parts = df.mapInArrow(
        enc_parts, "group_id long, part binary, aschema binary"
    )

    def merge_fn(tbl: pa.Table) -> pa.Table:
        limit_worker_threads()
        gid = tbl.column("group_id")[0].as_py() if tbl.num_rows else -1
        target = pa.ipc.read_schema(
            pa.BufferReader(tbl.column("aschema")[0].as_py())
        )
        chunks = [
            decode_table(v.as_py()).cast(target) for v in tbl.column("part")
        ]
        data = pa.concat_tables(chunks).combine_chunks().sort_by(sort_spec)
        return _finish_group(
            gid, data, codec, compression, row_index_stride, bloom_columns,
            blob_sink, stats=stats,
        )

    return parts.groupBy("group_id").applyInArrow(
        merge_fn, _blob_schema(blob_sink, stats)
    )


def encode_groups_staged(
    df: DataFrame,
    stage_dir: str,
    num_groups: int | None = None,
    codec: str = "auto",
    compression: str = "zstd",
    key_col: str | None = None,
    size_col: str | None = None,
    row_index_stride: int | None = DEFAULT_ROW_INDEX_STRIDE,
) -> DataFrame:
    """Grouped encode via a staged JVM-side shuffle materialization.

    Identical blobs/checksums to ``encode_groups`` (asserted in
    tests/test_spark_engine.py). Measured on local[32] at 96M tokens the
    two are comparable (~40 s): the dominant cost of ANY key-regrouping
    of array<int32> payloads is Spark's row shuffle itself (UnsafeRow
    ser/de of the arrays, ~35 MB/s/core), whether it surfaces as the
    applyInArrow exchange (direct) or the repartition+write here. When
    re-clustering is not semantically required, use
    ``encode_parquet_splits`` (no payload movement, ~10x faster). This
    staged variant earns its keep when the grouped stage is read more
    than once (multi-consumer pipelines) or as a shuffle-fault barrier:
    each group dir is re-readable without recomputing the shuffle.
    """
    import json

    from pyspark.sql import functions as F

    from ..codecs.container import encode_table, table_checksum
    from .partitioning import with_group_id

    spark = df.sparkSession
    if "group_id" not in df.columns:
        if num_groups is None:
            num_groups = max(1, df.rdd.getNumPartitions())
        key = key_col or df.columns[0]
        df = with_group_id(df, num_groups, key_col=key, size_col=size_col)
    sort_key = key_col or [c for c in df.columns if c != "group_id"][0]
    (
        df.repartition(F.col("group_id"))
        .write.mode("overwrite")
        .partitionBy("group_id")
        .parquet(stage_dir)
    )

    # enumerate staged group dirs via the Hadoop FileSystem API so the
    # staged path works on cluster filesystems (hdfs://, s3a://, ...), not
    # just a driver-local POSIX mount
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(stage_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    groups = sorted(
        int(st.getPath().getName().split("=")[1])
        for st in fs.listStatus(jpath)
        if st.isDirectory() and st.getPath().getName().startswith("group_id=")
    )
    gdf = spark.createDataFrame([(g,) for g in groups], "group_id long")
    gdf = gdf.repartition(max(1, min(len(groups), 4096)))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        limit_worker_threads()
        for batch in batches:
            for gid in batch.column("group_id").to_pylist():
                # pq.read_table resolves URIs through pyarrow.fs (file://,
                # s3://, gs://, hdfs:// with libhdfs); schemes pyarrow lacks
                # fail loudly here rather than silently listing nothing
                data = pq.read_table(f"{stage_dir}/group_id={gid}").sort_by(sort_key)
                blob, lineage = encode_table(
                    data, codec=codec, compression=compression,
                    stride=row_index_stride,
                )
                leaf = [l for l in lineage if l["codec"] != "list"]
                codecs = {l["column"]: l["codec"] for l in lineage}
                yield pa.record_batch(
                    [
                        pa.array([gid], pa.int64()),
                        pa.array([data.num_rows], pa.int64()),
                        pa.array([sum(l["n_present"] for l in leaf)], pa.int64()),
                        pa.array([sum(l["input_bytes"] for l in lineage)], pa.int64()),
                        pa.array([len(blob)], pa.int64()),
                        pa.array([table_checksum(data)], pa.string()),
                        pa.array([json.dumps(codecs, sort_keys=True)], pa.string()),
                        pa.array([json.dumps(lineage, sort_keys=True)], pa.string()),
                        pa.array([blob], pa.binary()),
                    ],
                    names=[
                        "group_id",
                        "n_rows",
                        "n_values",
                        "input_bytes",
                        "output_bytes",
                        "checksum",
                        "codecs",
                        "lineage",
                        "blob",
                    ],
                )

    return gdf.mapInArrow(fn, BLOB_SCHEMA)


def _normalize_schema(schema: str) -> str:
    """Map char(n)/varchar(n) DDL to string: the reference writes both
    with the String column writer (data.rs:63 — only the footer type
    kind differs, schema.rs:17-18), and Spark's runtime value
    representation of both IS string (padding applied at write time),
    which is also why mapInArrow cannot declare CharType output."""
    import re

    return re.sub(r"(?i)\b(?:var)?char\s*\(\s*\d+\s*\)", "string", schema)


def _ddl_names(schema: str) -> list[str]:
    """Top-level field names of a DDL schema string (commas inside
    array<>/struct<>/map<>/decimal() do not split fields)."""
    fields, cur, depth = [], [], 0
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        fields.append("".join(cur))
    names = []
    for f in fields:
        f = f.strip()
        if f.startswith("`"):
            # backtick-quoted names may contain spaces; a plain
            # .split()[0] would truncate "`my col` int" to "my"
            names.append(f[1 : f.index("`", 1)])
        else:
            names.append(f.split()[0])
    return names


def _check_decoded_names(tbl: pa.Table, expected: list[str]) -> None:
    """Loud mismatch instead of a JVM ArrayIndexOutOfBounds: the blob's
    stored columns must match the caller-declared output schema exactly
    (encode_groups consumes the grouping column, a common surprise)."""
    if tbl.column_names != expected:
        raise ValueError(
            f"decode schema mismatch: blob holds columns {tbl.column_names} "
            f"but the declared output schema names {expected}"
        )


def _arrow_target_schema(ddl: str) -> "pa.Schema":
    """Arrow schema Spark expects for a DDL string (driver-side)."""
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import _parse_datatype_string

    return to_arrow_schema(_parse_datatype_string(ddl))


def _type_kind(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"  # child names differ (Spark "element" vs pa "item")
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        return "map"
    return str(t)  # other: only exact or castable-same-repr


def _align_decoded_types(tbl: pa.Table, target: "pa.Schema") -> pa.Table:
    """Cast stored columns to the DECLARED arrow types, or raise a clear
    error naming the column — never let a type mismatch reach the JVM
    accessor as a cryptic UnsupportedOperationException. Casts stay
    within a type kind (int widths, timestamp units/zones, string
    reprs); cross-kind declarations (e.g. ``date`` for a stored
    timestamp) raise instead of silently truncating, and lossy in-kind
    casts (int overflow) fail via arrow's safe-cast check."""
    if tbl.schema.equals(target):
        return tbl
    cols = []
    for i, f in enumerate(target):
        c = tbl.column(i)
        if c.type.equals(f.type):
            cols.append(c)
            continue
        if _type_kind(c.type) != _type_kind(f.type):
            raise ValueError(
                f"decode schema mismatch: column {f.name!r} is stored as "
                f"{c.type} but declared as {f.type}; declare the stored "
                "type and convert in Spark if a different one is wanted"
            )
        try:
            cols.append(c.cast(f.type))
        except Exception as e:
            raise ValueError(
                f"decode schema mismatch: column {f.name!r} stored as "
                f"{c.type} cannot losslessly cast to declared {f.type}: {e}"
            ) from e
    return pa.Table.from_arrays(cols, schema=target)


def _jvm_keep_condition(preds: list[tuple]):
    """Pure-JVM keep-condition over the ``stats`` JSON for the given
    conjuncts, or None when any conjunct needs the Python evaluator
    (``==`` — so Bloom bitsets keep their pruning power — bool values,
    or value types the expression path can't compare exactly).

    The condition must NEVER wrongly prune, only wrongly keep (the
    residual filter at decode is exact). Per conjunct ``(col, op, val)``:
    missing column / unparseable stats / a form the expression doesn't
    recognize → keep; array entry ``[null, null]`` (all-null blob) →
    drop; uncastable bounds (e.g. float repr vs an int value's exact
    decimal cast) → keep. Int values compare via decimal(38,0) — exact
    for int64, where a double cast could round across a > or <
    boundary above 2^53 and wrongly prune."""
    import datetime

    from pyspark.sql import functions as F

    def cmp(op, lo, hi, v):
        if op == "!=":
            return ~((lo == hi) & (lo == v))
        return {
            "<": lo < v,
            "<=": lo <= v,
            ">": hi > v,
            ">=": hi >= v,
        }[op]

    conds = []
    for col, op, val in preds:
        if op in (
            "==", "contains", "in", "isnull", "notnull", "startswith"
        ) or isinstance(val, bool):
            # ==/in/contains need the Bloom bitset, the null tests and
            # prefix window their own stats logic -> UDF path (which
            # evaluates _chunk_may_match itself)
            return None
        if op not in ("!=", "<", "<=", ">", ">="):
            raise ValueError(f"unsupported predicate op {op!r}")
        s = F.col("stats")
        entry = F.get_json_object(s, f"$.{col}")
        if isinstance(val, (datetime.date, datetime.datetime)):
            # temporal dict form {"t":"iso","lo":...,"hi":...}; bounds
            # and value compare in the isoformat domain, exactly like
            # _chunk_may_match. A cross-domain entry (datetime bounds
            # for a date value or vice versa, detected by the 'T' in
            # the lo bound) is kept, never guessed.
            if (
                isinstance(val, datetime.datetime)
                and val.tzinfo is not None
            ):
                # stored bounds are tz-naive; an aware value's
                # isoformat ("+HH:MM" suffix) breaks the lexicographic
                # order — keep, matching _chunk_may_match's guard
                conds.append(F.lit(True))
                continue
            is_dt = isinstance(val, datetime.datetime)
            lo = F.get_json_object(s, f"$.{col}.lo")
            hi = F.get_json_object(s, f"$.{col}.hi")
            tag = F.get_json_object(s, f"$.{col}.t")
            domain_ok = (F.instr(lo, "T") > 0) if is_dt else (F.instr(lo, "T") == 0)
            keep = (
                F.when(entry.isNull(), F.lit(True))
                # an all-null temporal column stats as the ARRAY form
                # [null,null] (the all-null check precedes the iso-dict
                # branch in _chunk_stats) — provably unmatchable, same
                # as the numeric/string branches
                .when(entry == F.lit("[null,null]"), F.lit(False))
                .when(tag.isNull() | (tag != "iso"), F.lit(True))
                .when(~domain_ok, F.lit(True))
                .otherwise(cmp(op, lo, hi, F.lit(val.isoformat())))
            )
        else:
            if isinstance(val, int):
                # integral bounds text -> exact decimal(38,0) compare.
                # Fractional bounds (float-column stats against an int
                # predicate) must NOT go through decimal(38,0):
                # try_cast ROUNDS "16.6" to 17 instead of returning
                # NULL, which would wrongly prune strict boundaries
                # (stats [16.6, 17.4] vs '< 17'). Those compare in the
                # double domain — exact for |val| <= 2^53, matching
                # the Python evaluator's exact int-vs-float compare;
                # beyond 2^53 widen to the non-strict superset and
                # never prune on != (same rule as the float branch).
                lo_s = F.get_json_object(s, f"$.{col}[0]")
                hi_s = F.get_json_object(s, f"$.{col}[1]")
                is_arr = F.substring(entry, 1, 1) == F.lit("[")
                int_like = (
                    lo_s.rlike("^-?[0-9]+$") & hi_s.rlike("^-?[0-9]+$")
                )
                lo_i = lo_s.try_cast("decimal(38,0)")
                hi_i = hi_s.try_cast("decimal(38,0)")
                v_i = F.lit(val).cast("decimal(38,0)")
                lo_d = lo_s.try_cast("double")
                hi_d = hi_s.try_cast("double")
                v_d = F.lit(float(val))
                if abs(val) <= 2**53:
                    frac_keep = cmp(op, lo_d, hi_d, v_d)
                elif op == "!=":
                    frac_keep = F.lit(True)
                else:
                    op_w = {"<": "<=", ">": ">="}.get(op, op)
                    frac_keep = cmp(op_w, lo_d, hi_d, v_d)
                keep = (
                    F.when(entry.isNull() | ~is_arr, F.lit(True))
                    .when(entry == F.lit("[null,null]"), F.lit(False))
                    .when(
                        int_like,
                        F.when(
                            lo_i.isNull() | hi_i.isNull(), F.lit(True)
                        ).otherwise(cmp(op, lo_i, hi_i, v_i)),
                    )
                    .when(lo_d.isNull() | hi_d.isNull(), F.lit(True))
                    .otherwise(frac_keep)
                )
                conds.append(F.col("stats").isNull() | keep)
                continue
            if isinstance(val, float):
                # double-domain compares can round int64 bounds > 2^53
                # across a strict boundary; widen to the non-strict
                # superset (never wrong-prunes) and never prune on !=
                cast_t, v = "double", F.lit(val)
                if op == "!=":
                    conds.append(F.lit(True))
                    continue
                op = {"<": "<=", ">": ">="}.get(op, op)
            elif isinstance(val, str):
                cast_t, v = None, F.lit(val)
            else:
                return None
            lo_s = F.get_json_object(s, f"$.{col}[0]")
            hi_s = F.get_json_object(s, f"$.{col}[1]")
            # try_cast, not cast: ANSI mode hard-fails on uncastable
            # bounds (e.g. a float column's "17.0" against an int
            # value's exact decimal domain); NULL here must mean
            # "unknown, keep". JSON null bounds surface as the STRING
            # "null" (indistinguishable from a real "null" string
            # value), so the all-null-blob test uses the entry's
            # re-serialized array text instead.
            lo = lo_s.try_cast(cast_t) if cast_t else lo_s
            hi = hi_s.try_cast(cast_t) if cast_t else hi_s
            is_arr = F.substring(entry, 1, 1) == F.lit("[")
            keep = F.when(entry.isNull() | ~is_arr, F.lit(True)).when(
                entry == F.lit("[null,null]"), F.lit(False)
            )
            if cast_t is None:
                # string predicate: the bounds must BE strings (the
                # re-serialized entry's first bound starts with '"');
                # a lexicographic compare against numeric/bool bounds
                # text could wrongly prune a cross-typed predicate the
                # Python evaluator keeps (TypeError -> True) and the
                # residual filter rejects loudly
                keep = keep.when(
                    F.substring(entry, 2, 1) != F.lit('"'), F.lit(True)
                )
            keep = keep.when(
                lo.isNull() | hi.isNull(), F.lit(True)  # uncastable
            ).otherwise(cmp(op, lo, hi, v))
        conds.append(F.col("stats").isNull() | keep)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def prune_blobs(
    blobs: DataFrame,
    predicate: tuple | list[tuple],
    force_python: bool = False,
) -> DataFrame:
    """Stripe elimination: drop blobs whose blob-level ``stats`` (written
    by ``encode_groups(stats=True)``) PROVE no row matches ``predicate``
    (a ``(col, op, val)`` triple or an AND-list of them, ops as in
    ``decode_table``). The filter runs before any decode: eliminated
    blobs never reach a decode worker, and in sink mode their files are
    never opened — the ORC stripe-statistics analog of split elimination
    (the reference stores stripe stats, src/writer/stripe.rs, but its
    reader never shipped the skip).

    Range/inequality conjuncts evaluate as pure JVM expressions over the
    stats JSON (whole-stage-codegen Filter, no extra Python stage — the
    shape that stays cheap on a 25M-row lineage table). ``==`` conjuncts
    and exotic value types fall back to an Arrow-batched scalar UDF so
    per-blob Bloom bitsets keep their pruning power; only the stats
    string crosses to Python there. Rows with a null/absent stats value
    are kept (unknown never prunes), and the exact residual filter still
    runs at decode, so the result is identical to an unpruned
    ``predicate=`` decode. ``force_python`` pins the UDF evaluator
    (parity testing)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..codecs.container import _chunk_may_match

    if "stats" not in blobs.columns:
        raise ValueError(
            "prune_blobs: input has no 'stats' column — encode with "
            "encode_groups(..., stats=True)"
        )
    preds = [predicate] if isinstance(predicate, tuple) else list(predicate)
    if not preds:
        return blobs
    if not force_python:
        cond = _jvm_keep_condition(preds)
        if cond is not None:
            return blobs.filter(cond)

    def _may_match(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return True
            st = json.loads(v)
            return all(_chunk_may_match(st, pr) for pr in preds)

        return s.map(one)

    # concrete annotation objects: the module's deferred (string)
    # annotations defeat pandas_udf's hint inference
    _may_match.__annotations__ = {"s": pd.Series, "return": pd.Series}
    may_match = F.pandas_udf(_may_match, "boolean")
    return blobs.filter(may_match(F.col("stats")))


def _decode_one_evolved(
    blob_bytes: bytes,
    target: "pa.Schema",
    columns: list[str] | None,
    rows: tuple[int, int] | None,
    predicate,
) -> "pa.Table | None":
    """Schema-evolution decode of ONE blob (the Parquet/ORC/Iceberg
    reader rule — resolve by NAME): declared columns the blob lacks
    decode as all-null of the declared type; stored columns absent from
    the declared schema are skipped at the stream level; output order
    follows the declared schema. Predicates on a column the blob
    predates are decided on the virtual all-null column WITHOUT
    decoding payload: ``isnull`` keeps every row, every other op
    matches nothing (None is returned -> the blob contributes no
    batches). Returns the aligned table, or None when provably empty."""
    from ..codecs.container import blob_schema

    have = set(blob_schema(blob_bytes).names)
    preds = (
        [predicate] if isinstance(predicate, tuple) else list(predicate or [])
    )
    for p in preds:
        if p[0] not in have and p[1] != "isnull":
            return None  # null never satisfies a non-isnull predicate
    preds_eff = [p for p in preds if p[0] in have] or None
    cols_eff = None
    if columns is not None:
        # A declared field the blob DOES store must be projected, or the
        # null-fill below would silently fabricate data the blob has
        # (mirrors the strict path's _check_decoded_names loud failure).
        # Dotted paths ("s.inner.y") project their TOP-LEVEL column for
        # this resolution; the sub-struct pruning happens inside
        # decode_table.
        kept_tops = {c.split(".", 1)[0] for c in columns}
        shadowed = [
            f.name
            for f in target
            if f.name in have and f.name not in kept_tops
        ]
        if shadowed:
            raise ValueError(
                "evolution decode: declared schema names columns the blob "
                f"stores but `columns` excludes: {shadowed}; project them "
                "or narrow the declared schema to the projection"
            )
        keep = [c for c in columns if c.split(".", 1)[0] in have]
        if preds_eff:  # decode_table requires predicate cols projected
            keep += [p[0] for p in preds_eff if p[0] not in keep]
        cols_eff = keep or None  # no overlap: full decode for row count
    tbl = decode_table(
        blob_bytes, columns=cols_eff, rows=rows, predicate=preds_eff
    )
    out = {}
    for f in target:  # `schema` already names the (projected) output
        out[f.name] = (
            tbl.column(f.name)
            if f.name in tbl.column_names
            else pa.nulls(tbl.num_rows, f.type)
        )
    return _align_decoded_types(pa.table(out), target)


def decode_blobs(
    blobs: DataFrame,
    schema: str,
    columns: list[str] | None = None,
    rows: tuple[int, int] | None = None,
    predicate: tuple | list[tuple] | None = None,
    evolution: bool = False,
) -> DataFrame:
    """Decode blob rows back into the original table shape.

    ``columns`` projects at the blob level: unwanted columns' streams are
    skipped without decompression (the ORC reader-side column-pruning
    analog — at 100 TB a 2-column projection reads 2 columns' bytes).
    Dotted paths (``"s.inner.y"``) prune INSIDE struct columns at any
    depth — declare ``schema`` with the pruned struct shape (e.g.
    ``"s struct<inner:struct<y:string>>"``); pruned siblings' streams
    never decompress.
    ``rows=(a, b)`` decodes only that per-blob row slice; on chunked
    blobs only covering row-group chunks are decompressed (F3).
    ``predicate=(col, op, value)`` returns exactly the matching rows,
    skipping whole row-group chunks whose min/max stats prove no match
    (reader-side predicate pushdown over our own blobs — the stats half
    of the reference's row index, data/common.rs:24-48).
    ``schema`` may use char(n)/varchar(n); both decode as their string
    runtime representation (see ``_normalize_schema``).

    ``evolution=True`` enables schema evolution by name (the
    Parquet/ORC/Iceberg reader rule) for long-lived blob tables whose
    schema accreted columns over time: blobs predating a declared
    column yield it as all-null, stored columns not declared are
    dropped, and predicates on a missing column are decided without
    decoding payload. Default (False) keeps the strict
    exact-schema-match contract."""
    schema = _normalize_schema(schema)
    expected = _ddl_names(schema)
    target = _arrow_target_schema(schema)
    if predicate is not None and "stats" in blobs.columns:
        blobs = prune_blobs(blobs, predicate)  # stripe elimination, JVM-side

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        limit_worker_threads()
        for batch in batches:
            col = batch.column(batch.schema.get_field_index("blob"))
            for v in col:
                if evolution:
                    t = _decode_one_evolved(
                        v.as_py(), target, columns, rows, predicate
                    )
                    if t is not None:
                        yield from t.to_batches()
                    continue
                tbl = decode_table(
                    v.as_py(), columns=columns, rows=rows, predicate=predicate
                )
                _check_decoded_names(tbl, expected)
                yield from _align_decoded_types(tbl, target).to_batches()

    return blobs.select("blob").mapInArrow(fn, schema)


def decode_blob_files(
    blobs: DataFrame,
    schema: str,
    columns: list[str] | None = None,
    rows: tuple[int, int] | None = None,
    predicate: tuple | list[tuple] | None = None,
    evolution: bool = False,
) -> DataFrame:
    """Decode sink-written blob rows (``blob_path`` column, from
    ``encode_splits(blob_sink=...)``) back into the original table shape.
    The worker opens each blob file itself — like the encode side, the
    payload never crosses the JVM; only paths do. ``evolution=True``
    resolves each blob's stored schema by name against the declared one
    (see :func:`decode_blobs`) — the mixed-era read path for a blob
    table whose schema accreted columns over its life."""
    schema = _normalize_schema(schema)
    expected = _ddl_names(schema)
    target = _arrow_target_schema(schema)
    if predicate is not None and "stats" in blobs.columns:
        blobs = prune_blobs(blobs, predicate)  # stripe elimination, JVM-side

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        limit_worker_threads()
        for batch in batches:
            col = batch.column(batch.schema.get_field_index("blob_path"))
            for v in col:
                with open(v.as_py(), "rb") as f:
                    raw = f.read()
                if evolution:
                    t = _decode_one_evolved(
                        raw, target, columns, rows, predicate
                    )
                    if t is not None:
                        yield from t.to_batches()
                    continue
                tbl = decode_table(
                    raw, columns=columns, rows=rows, predicate=predicate
                )
                _check_decoded_names(tbl, expected)
                yield from _align_decoded_types(tbl, target).to_batches()

    return blobs.select("blob_path").mapInArrow(fn, schema)


def verify_blob_files(blobs: DataFrame) -> DataFrame:
    """Per-blob roundtrip verification for sink-written rows
    (``blob_path``): each worker re-opens its blob files, decodes, and
    compares checksums — same contract as ``verify_blobs``."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        limit_worker_threads()
        for batch in batches:
            t = pa.Table.from_batches([batch])
            gids = t.column("group_id").to_pylist()
            sums = t.column("checksum").to_pylist()
            paths = t.column("blob_path").to_pylist()
            out_ok = []
            out_sum = []
            for cs, path in zip(sums, paths):
                with open(path, "rb") as f:
                    ds = table_checksum(decode_table(f.read()))
                out_sum.append(ds)
                out_ok.append(ds == cs)
            yield pa.record_batch(
                [
                    pa.array(gids, pa.int64()),
                    pa.array(out_ok, pa.bool_()),
                    pa.array(sums, pa.string()),
                    pa.array(out_sum, pa.string()),
                ],
                names=["group_id", "ok", "checksum", "checksum_decoded"],
            )

    return blobs.select("group_id", "checksum", "blob_path").mapInArrow(
        fn, "group_id long, ok boolean, checksum string, checksum_decoded string"
    )


def verify_blobs(blobs: DataFrame) -> DataFrame:
    """Per-blob roundtrip verification: decode and compare checksums."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        limit_worker_threads()
        for batch in batches:
            t = pa.Table.from_batches([batch])
            gids = t.column("group_id").to_pylist()
            sums = t.column("checksum").to_pylist()
            blobs_col = t.column("blob").to_pylist()
            out_ok = []
            out_sum = []
            for cs, bl in zip(sums, blobs_col):
                decoded = decode_table(bl)
                ds = table_checksum(decoded)
                out_sum.append(ds)
                out_ok.append(ds == cs)
            yield pa.record_batch(
                [
                    pa.array(gids, pa.int64()),
                    pa.array(out_ok, pa.bool_()),
                    pa.array(sums, pa.string()),
                    pa.array(out_sum, pa.string()),
                ],
                names=["group_id", "ok", "checksum", "checksum_decoded"],
            )

    return blobs.select("group_id", "checksum", "blob").mapInArrow(
        fn, "group_id long, ok boolean, checksum string, checksum_decoded string"
    )
