"""End-to-end pipeline: read → parse → route → transform → enrich → fan-out
commit, with per-chunk resume, metrics, lineage, and alerts.

This is the Spark re-expression of the reference's daemon main path
(cmd/puntd/main.go → State.Run → ClusterWorker.run, cluster.go:233-324):
one linear DataFrame plan per input *group*, with node boundaries exactly at
the salted repartition (shuffle) and the snapshot commits (write).

Execution shape (scale rationale):

* Input is chunked by ts-day (the resume/exactly-once unit) but *processed*
  in groups: all pending chunks go through ONE parse+route pass and ONE
  write job per sink (``commit_batch`` slices the write into per-chunk
  snapshot manifests). A 30-day backfill is ~K sink jobs, not 30×K — at
  bench scale this is the difference between per-job latency dominating and
  actual throughput.
* The parse output (the one Python/Arrow stage) is cached once per group;
  the route join is a broadcast hash join recomputed cheaply per consumer.
* Sink writes are independent → submitted concurrently from driver threads
  (Spark schedules them in parallel), like the reference's per-type
  goroutine fan-out (R7).
* Groups are formed deterministically from the sorted pending-chunk list,
  so a crash-resume re-forms identical groups → identical batch ids →
  idempotent overwrite. (If NEW chunks appear between crash and resume the
  re-formed group gets a DIFFERENT id: sink and errors tables stay
  exactly-once because their manifests are per-chunk, but an
  alerts/actions snapshot committed by the crashed group lingers next to
  the new group's — duplicate alert rows in that narrow window. Accepted
  + documented: the reference loses alert windows outright on crash
  (in-memory rollup buffers, alert.go:19-21); we err on re-delivery.)
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .alerts import matched_events, render_actions, rollup_all
from .config import PipelineConfig, TypeConfig, default_config
from .enrich import apply_mutators
from .metrics import MetricsCollector
from .parse import with_parsed, with_parsed_native
from .route import route, routes_df
from .sink import (
    CHUNK_COL,
    SnapshotTable,
    enforce_mapping,
    salted_write_layout,
)
from .transform import apply_transformer


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: PipelineConfig | None = None,
        out_dir: str = "./punt_out",
        lookups: dict[str, DataFrame] | None = None,
        use_native_parse: bool = False,
        collect_metrics: bool = True,
        max_chunks_per_group: int = 64,
        parallel_sink_writes: bool = True,
        frame_mode: str = "none",
        cluster: str | None = None,
    ):
        """``cluster`` selects a ClusterConfig lane (reference: one Punt
        Config drives several clusters, each with its own ES URL + worker
        pool, config.go:14-21 / state.go:27-29): the cluster's out_root
        replaces ``out_dir`` and its num_workers overrides
        output_partitions. All clusters share the Type registry."""
        if frame_mode not in ("none", "newline", "octet"):
            raise ValueError(f"unknown frame_mode {frame_mode!r}")
        self.spark = spark
        self.cfg = cfg or default_config()
        self.cluster = cluster
        if cluster is not None:
            cc = self.cfg.clusters.get(cluster)
            if cc is None:
                raise ValueError(f"unknown cluster {cluster!r}")
            if cc.out_root:
                out_dir = cc.out_root
            if cc.num_workers:
                import dataclasses

                self.cfg = dataclasses.replace(
                    self.cfg, output_partitions=cc.num_workers
                )
        self.out_dir = out_dir
        self.lookups = lookups or {}
        self.use_native_parse = use_native_parse
        self.collect_metrics = collect_metrics
        self.max_chunks_per_group = max_chunks_per_group
        self.parallel_sink_writes = parallel_sink_writes
        self.frame_mode = frame_mode
        self.metrics = MetricsCollector(self.cfg.job_id)
        os.makedirs(os.path.join(out_dir, "_chunks"), exist_ok=True)
        self.sinks = {
            t.sink_name: SnapshotTable(os.path.join(out_dir, t.sink_name))
            for t in self.cfg.types.values()
        }
        self.errors_table = SnapshotTable(os.path.join(out_dir, "errors"))
        self.alerts_table = SnapshotTable(os.path.join(out_dir, "alerts"))
        self.actions_table = SnapshotTable(os.path.join(out_dir, "actions"))
        self._routes = routes_df(spark, self.cfg)

    # -- resume bookkeeping ----------------------------------------------------

    def _chunk_marker(self, chunk: str) -> str:
        return os.path.join(self.out_dir, "_chunks", f"{chunk}.json")

    def chunk_committed(self, chunk: str) -> bool:
        return os.path.exists(self._chunk_marker(chunk))

    def _mark_chunk(self, chunk: str, info: dict):
        tmp = self._chunk_marker(chunk) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(info, f, indent=1)
        os.replace(tmp, self._chunk_marker(chunk))

    # -- main entry --------------------------------------------------------------

    def run(
        self,
        transcripts: DataFrame,
        resume: bool = True,
        fail_after_first_sink: bool = False,
    ) -> dict:
        """Process all pending ts-day chunks of ``transcripts``. Committed
        chunks are skipped when ``resume`` (exactly-once per chunk — the
        reference's at-most-once R6 upgraded). ``fail_after_first_sink`` is a
        test hook simulating a mid-group crash."""
        t_start = time.monotonic()
        chunks = [
            r["c"]
            for r in transcripts.select(
                F.date_format("ts", "yyyy-MM-dd").alias("c")
            )
            .distinct()
            .orderBy("c")
            .collect()
        ]
        pending = [
            c for c in chunks if not (resume and self.chunk_committed(c))
        ]
        skipped = [c for c in chunks if c not in pending]
        done: list[str] = []
        for i in range(0, len(pending), self.max_chunks_per_group):
            group = pending[i : i + self.max_chunks_per_group]
            self._run_group(transcripts, group, fail_after_first_sink)
            done.extend(group)
        self._write_metrics()
        return {
            "chunks_processed": done,
            "chunks_skipped": skipped,
            "wall_sec": time.monotonic() - t_start,
            "metrics": self.metrics.totals(),
        }

    # -- group processing -----------------------------------------------------------

    def _group_id(self, group: list[str]) -> str:
        return hashlib.md5(",".join(sorted(group)).encode()).hexdigest()[:12]

    def _run_group(
        self, transcripts: DataFrame, group: list[str], fail_hook: bool = False
    ):
        cfg = self.cfg
        m = self.metrics
        gid = self._group_id(group)
        glabel = f"{group[0]}..{group[-1]}" if len(group) > 1 else group[0]
        with m.timing("processing_latency", glabel):
            gdf = transcripts.withColumn(
                CHUNK_COL, F.date_format("ts", "yyyy-MM-dd")
            ).filter(F.col(CHUNK_COL).isin(group))
            gdf = gdf.withColumnRenamed("ts", "turn_ts")
            # Spread the group across the cluster before the parse stage: a
            # group read from few/large files would otherwise parse on a
            # handful of tasks. Hash on conv_id (deterministic), skipped when
            # the scan already yields enough parallelism (the normal case at
            # scale — many files per day-partition).
            want = self.spark.sparkContext.defaultParallelism
            try:
                n_files = len(transcripts.inputFiles())
            except Exception:
                n_files = 0
            if n_files < max(2, want // 2):
                gdf = gdf.repartition(want, "conv_id", "turn_idx")

            # Framing (reference servers option `octet_counted`,
            # config.json:23; newline framing is the TCP default): each
            # framed record becomes its own row, sub-indexed by record_idx
            # so the (conv_id, turn_idx, record_idx) ordering stays stable.
            if self.frame_mode != "none":
                from .framing import frame_records

                gdf = frame_records(gdf, self.frame_mode, "text")

            parser = with_parsed_native if self.use_native_parse else with_parsed
            # Cache at the parse boundary: parse is the expensive stage (the
            # one Python/Arrow round-trip); errors sweep, route join, K sink
            # writes, alerts and metrics all re-read the cached batch. The
            # cache is SLIM: envelope fields flattened, raw text retained
            # only for failed rows (the errors side output) — good rows drop
            # the original line, roughly halving cached bytes.
            #
            # (Measured dead end, kept for the record: caching one shared
            # salted/sorted layout for all sinks — one shuffle instead of K —
            # is 2.5× SLOWER here, because the union doubles the parse pass
            # and the writer re-sorts anyway once the cache scan loses the
            # ordering guarantee. Per-sink layout + warm parse cache wins.)
            raw = parser(gdf, "text", cfg.reference_year)
            extra_meta = ["record_idx"] if "record_idx" in raw.columns else []
            cached = raw.select(
                CHUNK_COL,
                "conv_id",
                "turn_idx",
                *extra_meta,
                "role",
                "tool",
                "turn_ts",
                "parse_ok",
                F.when(~F.col("parse_ok"), F.col("text")).alias("raw_text"),
                "parsed.priority",
                "parsed.ts",
                "parsed.hostname",
                "parsed.tag",
                "parsed.pid",
                "parsed.content",
                F.col("parsed.error").alias("parse_error"),
            ).cache()
            # Materialize BEFORE the concurrent sink writes — cold cache +
            # parallel consumers would duplicate the parse work.
            with m.timing("parse_latency", glabel):
                cached.count()
            errors = cached.filter(~F.col("parse_ok")).select(
                F.col(CHUNK_COL),
                F.col("raw_text").alias("data"),
                F.col("parse_error").alias("error"),
            )
            envelope = (
                cached.filter(F.col("parse_ok"))
                .drop("parse_ok", "raw_text", "parse_error")
                .withColumn("source", F.concat(F.lit("conv:"), F.col("conv_id")))
            )
            # Broadcast route join — cheap to recompute per consumer.
            routed, unhandled = route(envelope, self._routes, job_id=cfg.job_id)
            stats_future = None
            stats_pool = None
            try:
                # ONE fused aggregation job yields every row-level counter
                # for the whole group: msgs.received / unhandled / failed /
                # processed per (chunk, tag) AND per-partition lineage —
                # what used to be 2 global + 2-3 per-sink collect() jobs.
                # Inserted counts and per-(route_key, ts_day) lineage come
                # from the commit manifests (parquet footers) below, so
                # metrics collection adds exactly one Spark job per group —
                # submitted CONCURRENTLY with the sink writes (it reads the
                # same warm cache), so its latency hides behind the writes.
                if self.collect_metrics:
                    if self.parallel_sink_writes and not fail_hook:
                        stats_pool = ThreadPoolExecutor(max_workers=1)
                        stats_future = stats_pool.submit(
                            self._record_group_stats, routed, unhandled, glabel
                        )
                    else:
                        self._record_group_stats(routed, unhandled, glabel)

                alert_events: dict[str, list] = {a.name: [] for a in cfg.alerts}

                def write_sink(t: TypeConfig):
                    sub = routed.filter(F.col("sink") == t.sink_name)
                    transformed, _failed = apply_transformer(sub, t)
                    enriched = apply_mutators(transformed, t.mutators, self.lookups)
                    final = enriched.drop(
                        "prefix", "mapping_type", "date_format", "transformer",
                        "sink",
                    )
                    # declared-mapping enforcement (the ES index-template
                    # the reference pushes at startup, type.go:63-97)
                    final = enforce_mapping(
                        final, cfg.mappings.get(t.mapping_type)
                    )
                    out = salted_write_layout(
                        final, cfg.output_partitions, cfg.salt_buckets
                    )
                    with m.timing(f"write_latency.{t.sink_name}", glabel):
                        manifests = self.sinks[t.sink_name].commit_batch(
                            out, batch_id=gid, chunks=group,
                        )
                    return t, enriched, manifests

                results = []
                types = list(cfg.types.values())
                if self.parallel_sink_writes and len(types) > 1 and not fail_hook:
                    with ThreadPoolExecutor(max_workers=min(4, len(types))) as ex:
                        results = list(ex.map(write_sink, types))
                else:
                    for t in types:
                        results.append(write_sink(t))
                        if fail_hook:
                            raise RuntimeError(
                                "simulated crash after first sink commit"
                            )

                for t, enriched, manifests in results:
                    if self.collect_metrics:
                        for c, man in manifests.items():
                            n = man.get("lineage", {}).get("n_rows", 0)
                            if n:
                                m.count("msgs.inserted", c, n, tag=t.sink_name)
                    for a in cfg.alerts:
                        ev = matched_events(enriched, a, t.name)
                        if ev is not None:
                            alert_events[a.name].append(ev)

                err_manifests = self.errors_table.commit_batch(
                    errors.coalesce(4), batch_id=gid, chunks=group,
                    partition_cols=[],
                )
                if self.collect_metrics:
                    for c, man in err_manifests.items():
                        n = man.get("lineage", {}).get("n_rows", 0)
                        if n:
                            m.count("parse_errors", c, n)

                if stats_future is not None:
                    stats_future.result()
                    stats_pool.shutdown()

                all_alerts = rollup_all(alert_events, cfg.alerts)
                if all_alerts is not None:
                    # The rollups feed two commits — cache so the second
                    # (actions render) doesn't recompute the window agg.
                    all_alerts = all_alerts.coalesce(4).cache()
                    self.alerts_table.commit(
                        all_alerts, snapshot_id=gid, partition_cols=[],
                    )
                    acts = render_actions(all_alerts, cfg.alerts, cfg.actions)
                    if acts is not None:
                        self.actions_table.commit(
                            acts, snapshot_id=gid, partition_cols=[],
                        )
                    all_alerts.unpersist()
            finally:
                if stats_pool is not None:
                    stats_pool.shutdown(wait=False)
                cached.unpersist()

        for chunk in group:
            self._mark_chunk(
                chunk, {"chunk": chunk, "group": gid, "committed_at": time.time()}
            )

    def _record_group_stats(self, routed, unhandled, glabel: str):
        """One aggregation over the cached parse output records every
        per-(chunk, tag) counter the reference keeps (cluster.go:249-319):

        * msgs.received  — rows dispatched to a sink
        * msgs.unhandled — rows with no route and no '*'
        * msgs.failed    — unpack-* rows whose content isn't a JSON object
          (the exact json.Unmarshal failure condition, transformers.go:44)
        * msgs.processed — received − failed
        * lineage.routed.partition_rows — per-Spark-partition row counts
          (spark_partition_id captured BEFORE the aggregation shuffle)
        """
        from .transform import json_ok

        m = self.metrics
        # Evaluate the JSON-object check ONLY for rows routed through an
        # unpack transformer — direct rows can't fail, and from_json over
        # the whole corpus would roughly double this job's cost.
        ok = F.when(
            F.col("transformer").isin("unpack-merge", "unpack-take"),
            json_ok(),
        ).otherwise(F.lit(True))
        r = routed.select(
            F.spark_partition_id().alias("pid"),
            F.col(CHUNK_COL),
            F.col("tag"),
            F.col("transformer"),
            ok.alias("ok"),
        )
        u = unhandled.select(
            F.spark_partition_id().alias("pid"),
            F.col(CHUNK_COL),
            F.col("tag"),
            F.lit(None).cast("string").alias("transformer"),
            F.lit(True).alias("ok"),
        )
        stats = (
            r.unionByName(u)
            .groupBy("pid", CHUNK_COL, "tag", "transformer", "ok")
            .count()
            .collect()
        )
        received: dict[tuple, int] = {}
        failed: dict[tuple, int] = {}
        lineage: dict[int, int] = {}
        for row in stats:
            key = (row[CHUNK_COL], row["tag"])
            n = int(row["count"])
            if row["transformer"] is None:  # unhandled side
                m.count("msgs.unhandled", key[0], n, tag=key[1])
                continue
            received[key] = received.get(key, 0) + n
            lineage[row["pid"]] = lineage.get(row["pid"], 0) + n
            if row["transformer"] in ("unpack-merge", "unpack-take") and not row["ok"]:
                failed[key] = failed.get(key, 0) + n
        for (c, tag), n in received.items():
            m.count("msgs.received", c, n, tag=tag)
        for (c, tag), n in failed.items():
            m.count("msgs.failed", c, n, tag=tag)
        for (c, tag), n in received.items():
            p = n - failed.get((c, tag), 0)
            if p:
                m.count("msgs.processed", c, p, tag=tag)
        for pid, n in sorted(lineage.items()):
            m.rows.append(
                {
                    "chunk": glabel,
                    "metric": "lineage.routed.partition_rows",
                    "tag": str(pid),
                    "value": n,
                }
            )

    def _write_metrics(self):
        pdf = self.metrics.to_pandas()
        path = os.path.join(self.out_dir, "metrics.parquet")
        if len(pdf):
            pdf.to_parquet(path, index=False)

    # -- maintenance -----------------------------------------------------------

    def run_retention(self) -> dict[str, list[str]]:
        """keep-N retention per configured prefix (reference gc.go:15-55)."""
        expired: dict[str, list[str]] = {}
        for g in self.cfg.gc:
            for sink in self.sinks.values():
                dropped = sink.expire_partitions(g.prefix, g.keep)
                if dropped:
                    expired.setdefault(g.prefix, []).extend(dropped)
        return expired


def load_lookups(spark: SparkSession, fixtures_dir: str) -> dict[str, DataFrame]:
    out = {}
    for key, fname in (("tool", "lookup_tool.parquet"), ("role", "lookup_role.parquet")):
        p = os.path.join(fixtures_dir, fname)
        if os.path.exists(p):
            out[key] = spark.read.parquet(p)
    return out
