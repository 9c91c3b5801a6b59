"""End-to-end pipeline: read → parse → route → transform → enrich → fan-out
commit, with per-chunk resume, metrics, lineage, and alerts.

This is the Spark re-expression of the reference's daemon main path
(cmd/puntd/main.go → State.Run → ClusterWorker.run, cluster.go:233-324):
one linear DataFrame plan per input chunk, with node boundaries exactly at
the salted repartition (shuffle) and the snapshot commits (write).

Scale notes (100 TB / 1000 executors):
* The input is chunked by ts-day — on a real cluster each chunk is an
  Iceberg partition-pruned scan; resume skips whole committed chunks.
* The routed frame is cached once per chunk and fanned out to K sink writes
  + metric aggregations (reference R7 multi-sink fan-out) — K metadata-cheap
  jobs over one materialization.
* Parse is the only Python stage (pandas UDF over Arrow batches), and can be
  swapped for the JVM-native regexp_extract path (`use_native_parse=True`)
  with identical results.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .alerts import matched_events, rollup_all
from .config import PipelineConfig, default_config
from .enrich import apply_mutators
from .metrics import MetricsCollector
from .parse import split_errors, with_parsed, with_parsed_native
from .route import route, routes_df
from .sink import SnapshotTable, partition_counts, salted_write_layout
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
    ):
        self.spark = spark
        self.cfg = cfg or default_config()
        self.out_dir = out_dir
        self.lookups = lookups or {}
        self.use_native_parse = use_native_parse
        self.collect_metrics = collect_metrics
        self.metrics = MetricsCollector(self.cfg.job_id)
        os.makedirs(os.path.join(out_dir, "_chunks"), exist_ok=True)
        self.sinks = {
            t.sink_name: SnapshotTable(os.path.join(out_dir, t.sink_name))
            for t in self.cfg.types.values()
        }
        self.errors_table = SnapshotTable(os.path.join(out_dir, "errors"))
        self.alerts_table = SnapshotTable(os.path.join(out_dir, "alerts"))
        self._routes = routes_df(spark, self.cfg)

    # -- resume bookkeeping ---------------------------------------------------

    def _chunk_marker(self, chunk: str) -> str:
        return os.path.join(self.out_dir, "_chunks", f"{chunk}.json")

    def chunk_committed(self, chunk: str) -> bool:
        return os.path.exists(self._chunk_marker(chunk))

    def _mark_chunk(self, chunk: str, info: dict):
        tmp = self._chunk_marker(chunk) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(info, f, indent=1)
        os.replace(tmp, self._chunk_marker(chunk))

    # -- main entry -----------------------------------------------------------

    def run(
        self,
        transcripts: DataFrame,
        resume: bool = True,
        fail_after_first_sink: bool = False,
    ) -> dict:
        """Process all ts-day chunks of ``transcripts``. Committed chunks are
        skipped when ``resume`` (exactly-once per chunk — the reference's
        at-most-once R6 upgraded). ``fail_after_first_sink`` is a test hook
        simulating a mid-chunk crash."""
        t_start = time.monotonic()
        chunks = [
            r["chunk"]
            for r in transcripts.select(
                F.date_format("ts", "yyyy-MM-dd").alias("chunk")
            )
            .distinct()
            .orderBy("chunk")
            .collect()
        ]
        done, skipped = [], []
        for chunk in chunks:
            if resume and self.chunk_committed(chunk):
                skipped.append(chunk)
                continue
            self._run_chunk(transcripts, chunk, fail_after_first_sink)
            done.append(chunk)
        self._write_metrics()
        wall = time.monotonic() - t_start
        return {
            "chunks_processed": done,
            "chunks_skipped": skipped,
            "wall_sec": wall,
            "metrics": self.metrics.totals(),
        }

    def _run_chunk(self, transcripts: DataFrame, chunk: str, fail_hook: bool = False):
        cfg = self.cfg
        m = self.metrics
        with m.timing("processing_latency", chunk):
            day = transcripts.filter(F.date_format("ts", "yyyy-MM-dd") == chunk)
            day = day.withColumnRenamed("ts", "turn_ts")
            # Spread the chunk across the cluster before the parse stage: a
            # chunk read from few/large files would otherwise parse on a
            # handful of tasks. Hash on conv_id (not round-robin) so the
            # shuffle is deterministic; skipped when the scan already yields
            # enough parallelism (the normal case at scale, where the input
            # table has many files per day-partition).
            scan_parts = day.rdd.getNumPartitions()
            want = self.spark.sparkContext.defaultParallelism
            if scan_parts < max(2, want // 2):
                day = day.repartition(want, "conv_id", "turn_idx")

            parser = with_parsed_native if self.use_native_parse else with_parsed
            # Cache at the parse boundary: parse is the expensive stage (the
            # one Python/Arrow round-trip); everything downstream — errors
            # sweep, route join, K sink writes, alerts, metrics — re-reads
            # the cached batch instead of re-parsing.
            parsed = parser(day, "text", cfg.reference_year).cache()
            good, errors = split_errors(parsed)

            # Envelope flatten + synthetic source (reference stamps the peer
            # address, server.go:213; fixtures derive it from conv_id).
            envelope = good.select(
                "conv_id",
                "turn_idx",
                "role",
                "tool",
                "turn_ts",
                "text",
                "parsed.priority",
                "parsed.ts",
                "parsed.hostname",
                "parsed.tag",
                "parsed.pid",
                "parsed.content",
            ).withColumn("source", F.concat(F.lit("conv:"), F.col("conv_id")))

            # The route join is a broadcast hash join over the cached parse
            # output — cheap to recompute per consumer, so only `parsed` is
            # cached.
            routed, unhandled = route(envelope, self._routes, job_id=cfg.job_id)
            try:
                if self.collect_metrics:
                    m.count_by_tag(routed, "msgs.received", chunk)
                    m.count_by_tag(unhandled, "msgs.unhandled", chunk)
                    m.partition_lineage(routed, chunk, "routed")

                alert_events: dict[str, list] = {a.name: [] for a in cfg.alerts}
                first = True
                for t in cfg.types.values():
                    sub = routed.filter(F.col("sink") == t.sink_name)
                    transformed, failed = apply_transformer(sub, t)
                    enriched = apply_mutators(transformed, t.mutators, self.lookups)
                    final = enriched.drop(
                        "prefix", "mapping_type", "date_format", "transformer", "sink",
                        "parse_ok", "parsed", "text",
                    )
                    out = salted_write_layout(
                        final, cfg.output_partitions, cfg.salt_buckets
                    )
                    lineage = {
                        "chunk": chunk,
                        "partition_rows": partition_counts(
                            final, ["route_key", "ts_day"]
                        )
                        if self.collect_metrics
                        else {},
                    }
                    with m.timing(f"write_latency.{t.sink_name}", chunk):
                        manifest = self.sinks[t.sink_name].commit(
                            out, snapshot_id=chunk, lineage=lineage
                        )
                    if self.collect_metrics:
                        inserted = sum(
                            lineage["partition_rows"].values()
                        ) if lineage["partition_rows"] else final.count()
                        m.count("msgs.inserted", chunk, inserted, tag=t.sink_name)
                        # msgs.processed is tagged (cluster.go:319) but
                        # unpack-take drops `tag` — count on the pre-transform
                        # frame minus failures.
                        sub_counts = {
                            r["tag"]: r["count"]
                            for r in sub.groupBy("tag").count().collect()
                        }
                        failed_counts = {
                            r["tag"]: r["count"]
                            for r in failed.groupBy("tag").count().collect()
                        }
                        for tag, c in failed_counts.items():
                            m.count("msgs.failed", chunk, c, tag=tag)
                        for tag, c in sub_counts.items():
                            processed = c - failed_counts.get(tag, 0)
                            if processed:
                                m.count("msgs.processed", chunk, processed, tag=tag)
                    for a in cfg.alerts:
                        ev = matched_events(enriched, a, t.name)
                        if ev is not None:
                            alert_events[a.name].append(ev)
                    if first and fail_hook:
                        raise RuntimeError(
                            "simulated crash after first sink commit"
                        )
                    first = False

                self.errors_table.commit(
                    errors.coalesce(4), snapshot_id=chunk, partition_cols=[]
                )
                if self.collect_metrics:
                    m.count("parse_errors", chunk, errors.count())
                all_alerts = rollup_all(alert_events, cfg.alerts)
                if all_alerts is not None:
                    self.alerts_table.commit(
                        all_alerts.coalesce(4), snapshot_id=chunk, partition_cols=[]
                    )
            finally:
                parsed.unpersist()

        self._mark_chunk(chunk, {"chunk": chunk, "committed_at": time.time()})

    def _write_metrics(self):
        pdf = self.metrics.to_pandas()
        path = os.path.join(self.out_dir, "metrics.parquet")
        if len(pdf):
            pdf.to_parquet(path, index=False)

    # -- maintenance ----------------------------------------------------------

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
