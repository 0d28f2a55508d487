#!/usr/bin/env python
"""Benchmark harness for the PySpark columnar-encode engine.

Default mode (what the per-round driver runs):
    python bench.py
  Runs the headline queries from ``__spark_entry__.queries()`` plus the
  flagship encode-throughput job at ``$SPARK_GRAFT_SF_DIR`` (default
  /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
  prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
  Extra keys: tokens_per_sec, bytes_per_token, compression_ratio, cpus.

Scaling mode (the BASELINE.md two-cluster-size evidence; sandbox proxy for
N vs 4N executors):
    python bench.py --scaling
  Runs the encode job in two fresh JVMs at local[8] and local[32] on the
  SAME deterministic input and writes BENCH.md with throughput at both
  levels + scaling efficiency = (thr@32 / thr@8) / 4.

    python bench.py --encode-only   # one JSON line, encode job only
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Deterministic replication of the sf documents table so the encode job has
# enough tokens (~bytes of text) to measure throughput/scaling: 64x sf0.1
# ~= 96M tokens ~= 384 MB of int32 payload.
REPL = int(os.environ.get("SPARK_GRAFT_BENCH_REPL", "64"))
NUM_GROUPS = int(os.environ.get("SPARK_GRAFT_BENCH_GROUPS", "128"))

HEADLINE = [
    "tokens_roundtrip",
    "rle_v1_roundtrip",
    "rle_v2_roundtrip",
    "for_bitpack_roundtrip",
    "dict_roundtrip",
    "fsst_roundtrip",
    "double_roundtrip",
    "timestamp_roundtrip",
    "nulls_roundtrip",
    "stats_longs",
    "codec_lineage",
]


def make_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("orc-format-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 64)))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def replicated_tokens(spark, sf_dir: str, repl: int):
    """Deterministic xN replication of the documents table -> tokens table."""
    from pyspark.sql import functions as F

    from orc_format_spark import tokenize_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if repl > 1:
        reps = spark.range(repl).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(F.broadcast(reps)).withColumn(
            "doc_id", F.concat_ws("_", F.col("doc_id"), F.col("rep"))
        )
    return tokenize_documents(docs)


def run_encode(spark, sf_dir: str):
    """Flagship encode job; returns (seconds, metrics dict)."""
    from pyspark.sql import functions as F

    from orc_format_spark import encode_groups

    toks = replicated_tokens(spark, sf_dir, REPL)
    t0 = time.monotonic()
    blobs = encode_groups(
        toks, num_groups=NUM_GROUPS, codec="auto", key_col="doc_id", size_col="n_tok"
    )
    agg = blobs.agg(
        F.sum("n_values").alias("n_values"),
        F.sum("input_bytes").alias("input_bytes"),
        F.sum("output_bytes").alias("output_bytes"),
        F.count("*").alias("n_groups"),
    ).first()
    dt = time.monotonic() - t0
    n_tok = int(agg["n_values"])
    return dt, {
        "encode_sec": round(dt, 3),
        "n_tokens": n_tok,
        "n_groups": int(agg["n_groups"]),
        "tokens_per_sec": round(n_tok / dt),
        "input_bytes": int(agg["input_bytes"]),
        "output_bytes": int(agg["output_bytes"]),
        "bytes_per_token": round(int(agg["output_bytes"]) / n_tok, 4),
        "compression_ratio": round(int(agg["output_bytes"]) / int(agg["input_bytes"]), 4),
    }


def main_bench():
    import __spark_entry__ as entrymod

    spark = make_session(CPUS)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()  # warm the JVM
    qtimes: dict[str, float] = {}
    qs = entrymod.queries()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        n = fn(spark, SF_DIR).count()
        qtimes[name] = round(time.monotonic() - t0, 3)
        assert n >= 0
    _, enc = run_encode(spark, SF_DIR)
    total = round(sum(qtimes.values()) + enc["encode_sec"], 3)
    out = {
        "metric": "headline queries + flagship encode wall time",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": 0.1 if "sf0.1" in SF_DIR else SF_DIR,
        "cpus": CPUS,
        **enc,
    }
    spark.stop()
    print(json.dumps(out))


def main_encode_only():
    spark = make_session(CPUS)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()  # warm the JVM
    _, enc = run_encode(spark, SF_DIR)
    out = {
        "metric": "flagship encode throughput",
        "value": enc["encode_sec"],
        "unit": "sec",
        "sf": 0.1 if "sf0.1" in SF_DIR else SF_DIR,
        "cpus": CPUS,
        **enc,
    }
    spark.stop()
    print(json.dumps(out))


def main_scaling():
    """local[8] vs local[32] on identical input (N vs 4N cores proxy)."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--encode-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(f"local[{cpus}]: {results[cpus]['tokens_per_sec']:,} tokens/sec", file=sys.stderr)
    thr8 = results[8]["tokens_per_sec"]
    thr32 = results[32]["tokens_per_sec"]
    eff = (thr32 / thr8) / 4.0
    report = {
        "metric": "scaling efficiency local[8] -> local[32]",
        "value": round(eff, 3),
        "unit": "efficiency",
        "thr_local8": thr8,
        "thr_local32": thr32,
        "speedup": round(thr32 / thr8, 2),
        "n_tokens": results[32]["n_tokens"],
        "bytes_per_token": results[32]["bytes_per_token"],
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — measured results\n\n"
            "## Two-parallelism-level scaling (sandbox proxy for N vs 4N executors)\n\n"
            "Same deterministic input (sf0.1 documents x"
            f"{REPL} -> {results[32]['n_tokens']:,} tokens), same code, fresh JVM "
            "per level, flagship auto-codec encode job.\n\n"
            "| parallelism | encode sec | tokens/sec | bytes/token |\n"
            "|---|---|---|---|\n"
            f"| local[8] (N) | {results[8]['encode_sec']} | {thr8:,} | {results[8]['bytes_per_token']} |\n"
            f"| local[32] (4N) | {results[32]['encode_sec']} | {thr32:,} | {results[32]['bytes_per_token']} |\n\n"
            f"**Speedup 8->32 cores: {thr32 / thr8:.2f}x; scaling efficiency: "
            f"{eff:.3f}** (target >= 0.8 per BASELINE.json north_rule).\n\n"
            f"Compression: {results[32]['output_bytes']:,} B out / "
            f"{results[32]['input_bytes']:,} B in = "
            f"{results[32]['compression_ratio']:.4f} "
            f"({results[32]['bytes_per_token']} bytes/token on byte-level tokens).\n"
        )
    print(json.dumps(report))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--encode-only" in sys.argv:
        main_encode_only()
    else:
        main_bench()
