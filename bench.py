#!/usr/bin/env python
"""Benchmark harness — headline throughput + per-query timings.

Headline metric (BASELINE.json): parsed+routed turns/sec of the full punt
pipeline (parse → route → transform → enrich → fan-out snapshot commits)
over a deterministically synthesized transcript table sized to the scale
factor, measured at two parallelism levels (local[N] vs local[4N] — the
sandbox proxy for N vs 4N executors) with scaling efficiency.

Also times representative operator queries from __spark_entry__ over the
driver tables at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": thr_high, "unit": "turns/sec", "queries": {...},
   "sf": ..., "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LOW_CPUS = max(1, CPUS // 4)
TURNS_PER_SF = 6_000_000  # ~lineitem row count parity
BENCH_CACHE = os.environ.get("PUNT_BENCH_CACHE", "/tmp/punt_spark_bench")

# operator queries timed at SF_DIR (names from __spark_entry__.queries())
OP_QUERIES = [
    "route_counts",
    "routed_rows",
    "unpack_json",
    "window_rollup",
    "quality_score",
    "minhash_signature",
    "dedup_minhash_pairs",
    "ann_topk",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_transcripts(sf: float) -> tuple[str, int]:
    """Deterministic synthetic transcript parquet for this sf (cached)."""
    n = max(10_000, int(TURNS_PER_SF * sf))
    path = os.path.join(BENCH_CACHE, f"transcripts_v2_n{n}")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        from punt_spark.fixtures import write_fixtures

        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        write_fixtures(tmp, n=n, seed=42, year=2017)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
        with open(marker, "w") as f:
            f.write("ok")
    return path, n


def run_pipeline_once(master_threads: int, fixtures_path: str, n_rows: int) -> dict:
    """One full pipeline run in a fresh session at local[threads]."""
    from pyspark.sql import SparkSession

    from punt_spark.pipeline import Pipeline, load_lookups
    from punt_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        time.sleep(1)

    spark = get_spark(
        app_name=f"punt_bench_{master_threads}",
        master=f"local[{master_threads}]",
        shuffle_partitions=max(8, master_threads * 2),
    )
    transcripts = spark.read.parquet(
        os.path.join(fixtures_path, "transcripts.parquet")
    )
    out_dir = tempfile.mkdtemp(prefix=f"punt_bench_out_{master_threads}_")
    try:
        pipe = Pipeline(
            spark,
            out_dir=out_dir,
            lookups=load_lookups(spark, fixtures_path),
            collect_metrics=False,
        )
        t0 = time.monotonic()
        pipe.run(transcripts, resume=False)
        wall = time.monotonic() - t0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()
        time.sleep(1)
    return {"threads": master_threads, "wall_sec": wall, "turns_per_sec": n_rows / wall}


def time_op_queries(sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod
    from punt_spark.session import get_spark

    spark = get_spark(app_name="punt_bench_ops", master=f"local[{CPUS}]")
    qs = entrymod.queries()
    out = {}
    for name in OP_QUERIES:
        if name not in qs:
            continue
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    time.sleep(1)
    return out


def main() -> int:
    sf = _sf_from_dir(SF_DIR)
    fixtures_path, n_rows = ensure_transcripts(sf)

    queries = time_op_queries(SF_DIR)

    low = run_pipeline_once(LOW_CPUS, fixtures_path, n_rows)
    high = run_pipeline_once(CPUS, fixtures_path, n_rows)
    ratio = high["turns_per_sec"] / low["turns_per_sec"]
    efficiency = ratio / (CPUS / LOW_CPUS)

    result = {
        "metric": "parsed+routed turns/sec (full pipeline, synthetic transcripts)",
        "value": round(high["turns_per_sec"], 1),
        "unit": "turns/sec",
        "queries": queries,
        "sf": sf,
        "n_turns": n_rows,
        "scaling": {
            "low_threads": LOW_CPUS,
            "low_turns_per_sec": round(low["turns_per_sec"], 1),
            "low_wall_sec": round(low["wall_sec"], 2),
            "high_threads": CPUS,
            "high_turns_per_sec": round(high["turns_per_sec"], 1),
            "high_wall_sec": round(high["wall_sec"], 2),
            "speedup": round(ratio, 3),
            "efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
