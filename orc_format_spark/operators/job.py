"""Checkpointed encode job: wave-committed, exactly-resumable.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". Spark's output commit is per-job, so restartability is
achieved by splitting the deterministic group space into ``waves``: each
wave is one Spark job appending its blobs under ``out_dir/blobs`` and then
recording a state row under ``out_dir/_state``. A re-run reads the state,
skips completed waves, and (because group membership, in-group ordering,
and codec choices are all deterministic functions of the data) produces
byte-identical blobs for the remaining waves.

Byte-identity holds *within one engine version*: codec internals may
legally change their emitted bytes across upgrades (e.g. the RLEv2
patched-width percentile moved from interpolated to exact-count in
round 1) while decode stays lossless. This is ENFORCED: every _state row
carries the ``ENCODER_VERSION`` that wrote its wave (the same tag every
v3 blob header carries), and a resume under a different version raises
RuntimeError up front — finish on the version the job started with, or
delete ``out_dir`` and re-encode from wave 0.

At cluster scale each wave is bounded work (total_groups/waves stripes),
so a preempted 100 TB run loses at most one wave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..codecs.container import ENCODER_VERSION, _LEGACY_ENGINE
from .encode import encode_groups
from .partitioning import plan_num_groups, with_group_id


def _read_state(
    spark: SparkSession, state_path: str
) -> tuple[set[int], set[str], set[str]]:
    """(done waves, engine versions that wrote them, job-param
    fingerprints that wrote them). Pre-stamp state files report the
    legacy sentinel for engine and nothing for params (no check
    possible — the row predates the column)."""
    try:
        # mergeSchema: a state dir may mix column eras (wave / +engine /
        # +params) across resumes; the union schema nulls absent columns
        sdf = spark.read.option("mergeSchema", "true").parquet(state_path)
    except Exception:
        return set(), set(), set()
    rows = sdf.collect()
    waves = {r.wave for r in rows}
    if "engine" in sdf.columns:
        engines = {r.engine for r in rows if r.engine is not None}
        engines |= {_LEGACY_ENGINE} if any(r.engine is None for r in rows) else set()
    else:
        engines = {_LEGACY_ENGINE} if rows else set()
    params = (
        {r.params for r in rows if r.params is not None}
        if "params" in sdf.columns
        else set()
    )
    return waves, engines, params


def _strip_file(path: str) -> str:
    return path[len("file:") :] if path.startswith("file:") else path


def commit_lineage_metrics(
    metrics_dir: str, part_dir: str, name: str, commit_key: str
) -> None:
    """Commit one unit-of-work's lineage rows (blob column dropped) as a
    snapshot of the metrics Iceberg table at ``metrics_dir`` (created on
    first commit). Idempotent per ``commit_key`` — the shared
    exactly-once commit used by batch waves (``run_encode_job``) and
    streaming micro-batches (``streaming/encode_stream.py``)."""
    import os

    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    from ..sources.iceberg_meta import append_snapshot, create_table, is_iceberg_table

    local = part_dir[len("file:") :] if part_dir.startswith("file:") else part_dir
    mlocal = (
        metrics_dir[len("file:") :] if metrics_dir.startswith("file:") else metrics_dir
    )
    tbl = ds.dataset(local, format="parquet").to_table()
    # drop the payload (absent in sink-mode waves, which carry only
    # blob_path) AND the Spark row-metadata KV pair the wave files
    # carry: Spark trusts org.apache.spark.sql.parquet.row.metadata over
    # the physical columns, so leaving it would resurrect a null `blob`
    if "blob" in tbl.column_names:
        tbl = tbl.drop_columns(["blob"])
    tbl = tbl.replace_schema_metadata(None)
    os.makedirs(mlocal, exist_ok=True)
    path = os.path.join(mlocal, f"{name}.parquet")
    pq.write_table(tbl, path)
    if not is_iceberg_table(mlocal):
        create_table(mlocal, tbl.schema, properties={"table-kind": "codec-metrics"})
    append_snapshot(mlocal, [path], commit_key=commit_key)


def _commit_wave_metrics(metrics_dir: str, blobs_path: str, wave: int) -> None:
    commit_lineage_metrics(
        metrics_dir, f"{blobs_path}/wave={wave}", f"wave-{wave}", f"wave={wave}"
    )


def run_encode_job(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    num_groups: int | None = None,
    waves: int = 4,
    codec: str = "auto",
    compression: str = "zstd",
    key_col: str = "doc_id",
    size_col: str | None = "n_tok",
    tokens_per_group: int | None = None,
    blob_sink: bool = False,
    cluster_by: list[str] | None = None,
    stats: bool = False,
) -> DataFrame:
    """Encode ``df`` into ``out_dir/blobs`` with wave-level checkpointing.

    Returns the blobs DataFrame read back from disk.

    ``blob_sink=True`` switches the wave layout to the zero-ferry shape:
    each group's task writes its own ``out_dir/blobs/group-<id>.ofs``
    (deterministic name + deterministic bytes, so a re-run wave
    overwrites identically — the same exact-resume argument as the
    parquet layout) and the wave parquet under ``blobs/wave=<w>`` holds
    only lineage + ``blob_path``. Use it when groups are large enough
    that ferrying encoded payload into the JVM parquet writer dominates
    (it does from ~1M tokens/group up).

    ``cluster_by`` orders each group's rows by these columns before
    encoding (see ``encode_groups``); part of the job signature so the
    blob bytes stay deterministic across waves and resume. ``stats``
    adds the blob-level stripe-elimination column (see
    ``encode_groups``) — ``read_encoded(predicate=...)`` then skips
    whole blobs JVM-side. Like ``cluster_by``, keep it stable across a
    job's waves (it shapes the per-wave parquet schema).
    """
    if num_groups is None:
        if size_col and size_col in df.columns:
            total = df.agg(F.sum(size_col)).first()[0] or 0
        else:
            total = df.count()
        from .partitioning import DEFAULT_TOKENS_PER_GROUP

        num_groups = plan_num_groups(total, tokens_per_group or DEFAULT_TOKENS_PER_GROUP)
    waves = min(waves, num_groups)
    # the resume-safety fingerprint: every input that shapes group->wave
    # membership or blob bytes. A resume that changes any of these would
    # SKIP already-done waves computed under the old membership — wrong
    # data, not just wrong layout — so it must refuse, like the engine-
    # version guard below. Effective (resolved) values go in, so an
    # explicit num_groups= resume matches a data-derived first run.
    import json as _json

    fingerprint = _json.dumps(
        {
            "num_groups": num_groups,
            "waves": waves,
            "codec": codec,
            "compression": compression,
            "key_col": key_col,
            "size_col": size_col if size_col in (df.columns or []) else None,
            "blob_sink": bool(blob_sink),
            "cluster_by": list(cluster_by) if cluster_by else None,
            "stats": bool(stats),
        },
        sort_keys=True,
    )
    # read state + run both refusal guards BEFORE any grouping/persist:
    # a refused resume must not leak a cached DataFrame or do work
    blobs_path = f"{out_dir}/blobs"
    state_path = f"{out_dir}/_state"
    done, engines, prior_params = _read_state(spark, state_path)
    stale = engines - {ENCODER_VERSION}
    if stale:
        raise RuntimeError(
            f"run_encode_job: {out_dir} has waves written by engine version(s) "
            f"{sorted(stale)} but this engine is {ENCODER_VERSION}; blob "
            "byte-identity across versions is not guaranteed. Finish the job "
            "on the original version, or delete the output directory to "
            "re-encode from wave 0."
        )
    mismatched = prior_params - {fingerprint}
    if mismatched:
        raise RuntimeError(
            f"run_encode_job: {out_dir} has waves written with different job "
            f"parameters {sorted(mismatched)} than this run's {fingerprint}; "
            "resuming would skip waves whose group membership no longer "
            "matches. Re-run with the original parameters, or delete the "
            "output directory to re-encode from wave 0."
        )
    grouped = with_group_id(
        df, num_groups, key_col=key_col, size_col=size_col
    ).persist()
    try:
        for w in range(waves):
            if w in done:
                continue
            wave_df = grouped.filter(F.col("group_id") % waves == w)
            enc = encode_groups(
                wave_df,
                codec=codec,
                compression=compression,
                key_col=key_col,
                blob_sink=_strip_file(f"{out_dir}/blobstore") if blob_sink else None,
                cluster_by=cluster_by,
                stats=stats,
            )
            # idempotent wave commit: each wave owns its own directory and
            # is OVERWRITTEN on re-run, so a crash after the blob write but
            # before the state write cannot duplicate blobs on resume
            enc.write.mode("overwrite").parquet(f"{blobs_path}/wave={w}")
            # codec-lineage/metrics table (north_star: "emits ... a
            # codec-lineage row ... to a metrics Iceberg table"): derived
            # from the just-written wave parquet, NOT from `enc` —
            # re-materializing the uncached encode lineage would run the
            # whole Python-side encode a second time per wave. Written
            # driver-side to ONE deterministically named file per wave
            # (metrics are O(groups) rows, no payload), then committed as
            # an idempotent Iceberg append snapshot keyed on the wave: a
            # crashed-and-resumed wave overwrites the same file path and
            # the commit-key dedupe keeps the snapshot log exactly-once.
            _commit_wave_metrics(f"{out_dir}/metrics", blobs_path, w)
            spark.createDataFrame(
                [(w, ENCODER_VERSION, fingerprint)],
                "wave long, engine string, params string",
            ).write.mode("append").parquet(state_path)
    finally:
        grouped.unpersist()
    return spark.read.parquet(blobs_path)


def read_encoded(
    spark: SparkSession,
    out_dir: str,
    schema: str,
    columns: list[str] | None = None,
    rows: tuple[int, int] | None = None,
    predicate: tuple | list[tuple] | None = None,
) -> DataFrame:
    """Read a `run_encode_job` output back as the original table shape —
    the reader half of the writer/finish API (the reference never shipped
    one: src/reader.rs is a commented-out stub). ``columns`` prunes at
    the blob level; ``rows`` point-reads a per-blob row slice via the
    row-group sub-index. Handles both wave layouts: inline ``blob``
    parquet and sink-mode ``blob_path`` rows (workers re-open the
    blobstore files themselves)."""
    from .encode import decode_blob_files, decode_blobs

    blobs = spark.read.parquet(f"{out_dir}/blobs")
    if "blob_path" in blobs.columns:
        return decode_blob_files(
            blobs, schema, columns=columns, rows=rows, predicate=predicate
        )
    return decode_blobs(blobs, schema, columns=columns, rows=rows, predicate=predicate)


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """The job's codec-lineage/metrics table (one row per stripe),
    resolved through its Iceberg manifest (snapshot-consistent file
    list); pre-Iceberg layouts fall back to a plain parquet dir read."""
    from ..sources.iceberg_meta import is_iceberg_table, list_data_files

    mdir = out_dir[len("file:") :] if out_dir.startswith("file:") else out_dir
    mdir = f"{mdir}/metrics"
    if is_iceberg_table(mdir):
        files = sorted(p for p, _ in list_data_files(mdir))
        return spark.read.parquet(*files)
    return spark.read.parquet(mdir)


def job_metrics(blobs: DataFrame) -> DataFrame:
    """File-footer analog: aggregate metrics over all blobs
    (writer.rs:256-293 wrote merged file statistics; we aggregate the
    lineage rows)."""
    return blobs.agg(
        F.count("*").alias("n_groups"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_values").alias("n_values"),
        F.sum("input_bytes").alias("input_bytes"),
        F.sum("output_bytes").alias("output_bytes"),
        (F.sum("output_bytes") / F.sum("input_bytes")).alias("compression_ratio"),
    )
