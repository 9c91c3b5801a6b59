"""End-to-end training-data build over a documents table — the dataops
modules composed the way a pretraining-data run uses them:

    curate (quality → repetition → decontaminate → dedup → source cap →
    PII redact) → deterministic train/val/test split → GPT-style sequence
    packing → per-split parquet + mixture-stats / audit side tables.

Usage:

    python examples/curate_training_data.py \
        --input /root/testdata/sf0.01 --out /tmp/training_data \
        [--budget 512] [--max-per-source 50]

Everything is deterministic (content-hash decisions throughout), so
re-running over the same input reproduces byte-identical splits/packing —
the property that keeps eval sets uncontaminated across pipeline versions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="dir with documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=512, help="tokens/sequence")
    ap.add_argument("--max-per-source", type=int, default=50)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from punt_spark.dataops.curation import curate_corpus
    from punt_spark.dataops.packing import pack_sequences
    from punt_spark.dataops.sampling import hash_split, mixture_stats
    from punt_spark.session import get_spark

    spark = get_spark(app_name="curate-training-data", master=args.master)
    docs = spark.read.parquet(os.path.join(args.input, "documents.parquet"))

    out = curate_corpus(
        docs,
        min_quality=args.min_quality,
        max_repetition=0.9,
        max_per_source=args.max_per_source,
        redact=True,
    )
    retained = out["retained"]

    split = hash_split(
        retained, "doc_id", {"train": 0.95, "val": 0.025, "test": 0.025}
    )
    packed = pack_sequences(split, "doc_id", budget=args.budget)

    (
        packed.repartition("split")
        .sortWithinPartitions("split", "seq_id", "seq_offset")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(os.path.join(args.out, "packed"))
    )
    out["removed"].write.mode("overwrite").parquet(
        os.path.join(args.out, "removed_audit")
    )
    mixture_stats(retained, ["lang", "source"]).write.mode("overwrite").parquet(
        os.path.join(args.out, "mixture_stats")
    )

    stats = {r["reason"]: r["n"] for r in out["stats"].collect()}
    n_seqs = packed.select("split", "seq_id").distinct().groupBy("split").count()
    summary = {
        "stage_counts": stats,
        "sequences_per_split": {
            r["split"]: r["count"] for r in n_seqs.collect()
        },
        "budget": args.budget,
    }
    print(json.dumps(summary, indent=1, sort_keys=True))
    out["unpersist"]()  # release the curation stage caches
    return 0


if __name__ == "__main__":
    sys.exit(main())
