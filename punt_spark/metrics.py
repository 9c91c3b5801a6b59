"""Metrics — Punt's statsd counters/timings as metric tables.

Reference: per-tag counters ``msgs.received/processed/failed/unhandled``
(cluster.go:249-250,260-261,275-276,319), per-commit ``msgs.inserted`` /
``msgs.dropped`` (cluster.go:369,377), and stage latencies
(processing/write/commit — cluster.go:289,370,381).

Here counters ride jobs that run anyway — observation metrics on the sink
writes and the cache-materialization aggregate (pipeline.py) — latencies are
driver wall-clock spans, and per-partition lineage rows record how many rows
each Spark partition contributed to each commit — the `north_rule`'s lineage
requirement. This module is the accumulator the pipeline folds those
observations into.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import pandas as pd


class MetricsCollector:
    """Accumulates (chunk, stage, metric, tag, value) rows plus timings."""

    def __init__(self, job_id: str = "punt-spark"):
        self.job_id = job_id
        self.rows: list[dict] = []

    def count(self, metric: str, chunk: str, value: int, tag: str | None = None):
        self.rows.append(
            {"chunk": chunk, "metric": metric, "tag": tag, "value": int(value)}
        )

    @contextmanager
    def timing(self, metric: str, chunk: str):
        """Wall-clock span, the statsd Timing analog (cluster.go:289)."""
        t0 = time.monotonic()
        yield
        self.rows.append(
            {
                "chunk": chunk,
                "metric": metric,
                "tag": None,
                "value": time.monotonic() - t0,
            }
        )

    def to_pandas(self) -> pd.DataFrame:
        df = pd.DataFrame(
            self.rows, columns=["chunk", "metric", "tag", "value"]
        )
        df["job_id"] = self.job_id
        return df

    def totals(self) -> dict[str, float]:
        out: dict[str, float] = {}
        for r in self.rows:
            if not r["metric"].startswith("lineage."):
                out[r["metric"]] = out.get(r["metric"], 0) + r["value"]
        return out
