#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py is frozen for
measurement — guide §1.4 isolation lives here).

Per declared query: noop-sink wall time (same min-of-N methodology as
bench.py's time_op_queries, same session shape), plus the Spark job /
stage / task counts behind each leg (statusTracker over a per-query job
group) — the fixed-overhead census that the 5k-row sf0.1 fixtures make
the dominant term. Optionally captures .explain("formatted") for each
query into plans/<tag>/<name>_{before,after}.txt.

Usage:
  python bench_extra.py [--queries a,b,c] [--legs 2] [--plans plans/r07 \
      --suffix before] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _fresh_session(threads: int, name: str):
    from pyspark.sql import SparkSession

    from punt_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        time.sleep(1)
    return get_spark(
        app_name=name,
        master=f"local[{threads}]",
        shuffle_partitions=max(8, threads * 2),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--legs", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir for explain captures")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = (
        [n.strip() for n in args.queries.split(",") if n.strip()]
        if args.queries
        else [n for n in qs]
    )

    spark = _fresh_session(CPUS, "punt_bench_extra")
    sc = spark.sparkContext
    # warm-up (same as bench.py): pay JIT/codegen/broadcast machinery once
    qs["route_counts"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    results = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        legs, jobinfo = [], []
        for leg in range(args.legs):
            group = f"bx_{name}_{leg}"
            sc.setJobGroup(group, name)
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            t_build = time.monotonic() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            sc.setJobGroup(None, None)
            legs.append(round(wall, 3))
            tracker = sc.statusTracker()
            jids = tracker.getJobIdsForGroup(group)
            n_stages = n_tasks = 0
            for j in jids:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numTasks > 0:
                        n_stages += 1
                        n_tasks += si.numTasks
            jobinfo.append(
                {
                    "jobs": len(jids),
                    "stages": n_stages,
                    "tasks": n_tasks,
                    "build_s": round(t_build, 3),
                }
            )
            if args.plans and leg == 0:
                try:
                    plan = df._sc is not None and df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )
                except Exception:
                    from contextlib import redirect_stdout
                    import io

                    buf = io.StringIO()
                    with redirect_stdout(buf):
                        df.explain("formatted")
                    plan = buf.getvalue()
                with open(
                    os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
                ) as f:
                    f.write(plan)
        results[name] = {"min": min(legs), "legs": legs, "jobs": jobinfo}
        print(
            f"{name:28s} min={min(legs):7.3f}  legs={legs}  "
            f"jobs={[j['jobs'] for j in jobinfo]} "
            f"stages={[j['stages'] for j in jobinfo]} "
            f"tasks={[j['tasks'] for j in jobinfo]} "
            f"build={[j['build_s'] for j in jobinfo]}",
            flush=True,
        )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    total = sum(r["min"] for r in results.values())
    print(f"TOTAL(min legs) = {total:.3f} s over {len(results)} queries")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
