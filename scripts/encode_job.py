#!/usr/bin/env python
"""spark-submit entrypoint for the encode pipeline.

Cluster usage (the north-rule deployment shape):

    zip -r orc_format_spark.zip orc_format_spark
    spark-submit --master <cluster> --py-files orc_format_spark.zip \
        scripts/encode_job.py --input <tokens table path> --output <dir> \
        [--mode splits|grouped] [--codec auto] [--waves 8]

``splits`` mode (default) encodes one parquet row-group per stripe with
no payload shuffle; ``grouped`` mode runs the deterministic salted
doc_id grouping + wave-checkpointed resume (re-running with the same
--output resumes exactly).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# running as a plain script puts scripts/ (not the repo root) on
# sys.path; on a cluster --py-files provides the package instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input",
        required=True,
        help="tokens table: parquet path, or iceberg:<catalog.db.table> "
        "(requires the iceberg-spark runtime on the cluster classpath)",
    )
    ap.add_argument("--output", required=True, help="output dir for blobs")
    ap.add_argument("--mode", choices=("splits", "grouped"), default="splits")
    ap.add_argument("--codec", default="auto")
    ap.add_argument("--compression", default="zstd")
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--num-groups", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("orc-format-spark-encode").getOrCreate()

    if args.mode == "splits":
        if args.input.startswith("iceberg:"):
            from orc_format_spark.sources.iceberg import encode_iceberg_splits

            blobs = encode_iceberg_splits(
                spark,
                args.input[len("iceberg:") :],
                codec=args.codec,
                compression=args.compression,
            )
        else:
            from orc_format_spark import encode_parquet_splits

            blobs = encode_parquet_splits(
                spark, args.input, codec=args.codec, compression=args.compression
            )
        blobs.write.mode("overwrite").parquet(f"{args.output}/blobs")
        blobs = spark.read.parquet(f"{args.output}/blobs")
        # codec-lineage metrics table, derived from the written blobs
        blobs.drop("blob").write.mode("overwrite").parquet(f"{args.output}/metrics")
    else:
        from orc_format_spark import run_encode_job

        if args.input.startswith("iceberg:"):
            from orc_format_spark.sources.iceberg import read_tokens_table

            toks = read_tokens_table(spark, args.input[len("iceberg:") :])
        else:
            toks = spark.read.parquet(args.input)
        blobs = run_encode_job(
            spark,
            toks,
            args.output,
            num_groups=args.num_groups,
            waves=args.waves,
            codec=args.codec,
            compression=args.compression,
        )

    from orc_format_spark import job_metrics

    metrics = job_metrics(blobs).first().asDict()
    print(json.dumps({k: (float(v) if v is not None else None) for k, v in metrics.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
