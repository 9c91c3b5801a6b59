"""spark-submit entry point — the cluster-deployment form of the CLI.

Usage (the north_rule's deployment shape):

    zip -r punt_spark.zip punt_spark
    spark-submit --master <cluster> --py-files punt_spark.zip \\
        scripts/submit_job.py --input <transcripts dir> --out <output root> \\
        [--config cfg.json] [--cluster <lane>]

The script only imports from the shipped zip (``punt_spark`` must NOT be
importable from the driver's cwd for --py-files to be exercised); it builds
the session from the spark-submit-provided context instead of creating its
own master.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--cluster", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # the SAME load-bearing settings the locally-tested session uses
    # (timezone, ANSI-safe time parser, Arrow, AQE, codec) — a cluster
    # deployment must not behave differently from the tested session
    from punt_spark.session import SESSION_CONF

    builder = SparkSession.builder.appName("punt-spark-submit")
    for k, v in SESSION_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    from punt_spark.config import PipelineConfig, default_config
    from punt_spark.pipeline import Pipeline, load_lookups

    cfg = (
        PipelineConfig.from_json(args.config)
        if args.config
        else default_config()
    )
    path = args.input
    tpath = (
        os.path.join(path, "transcripts.parquet")
        if os.path.isdir(path)
        and os.path.exists(os.path.join(path, "transcripts.parquet"))
        else path
    )
    transcripts = spark.read.parquet(tpath)
    lookups = load_lookups(spark, path) if os.path.isdir(path) else {}
    pipe = Pipeline(
        spark, cfg, out_dir=args.out, lookups=lookups, cluster=args.cluster
    )
    result = pipe.run(transcripts)
    print(json.dumps(result, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
