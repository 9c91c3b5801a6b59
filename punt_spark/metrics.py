"""Metrics — Punt's statsd counters/timings as metric tables.

Reference: per-tag counters ``msgs.received/processed/failed/unhandled``
(cluster.go:249-250,260-261,275-276,319), per-commit ``msgs.inserted`` /
``msgs.dropped`` (cluster.go:369,377), and stage latencies
(processing/write/commit — cluster.go:289,370,381).

Here counters are grouped hash aggregates over the stage DataFrames (one
map-side-combined groupBy per stage — no extra shuffle beyond the count),
latencies are driver wall-clock spans, and per-partition lineage rows record
how many rows each Spark partition contributed to each commit — the
`north_rule`'s lineage requirement.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class MetricsCollector:
    """Accumulates (chunk, stage, metric, tag, value) rows plus timings."""

    def __init__(self, job_id: str = "punt-spark"):
        self.job_id = job_id
        self.rows: list[dict] = []

    def count_by_tag(
        self, df: DataFrame, metric: str, chunk: str, tag_col: str = "tag"
    ) -> int:
        """Per-tag counter (msgs.received et al). Returns the total."""
        counted = df.groupBy(tag_col).count().collect()
        total = 0
        for r in counted:
            self.rows.append(
                {
                    "chunk": chunk,
                    "metric": metric,
                    "tag": r[tag_col],
                    "value": int(r["count"]),
                }
            )
            total += int(r["count"])
        return total

    def count_by_chunk_tag(
        self,
        df: DataFrame,
        metric: str,
        chunk_col: str = "chunk",
        tag_col: str = "tag",
    ) -> int:
        """Per-(chunk, tag) counter in ONE aggregation over a whole group."""
        total = 0
        for r in df.groupBy(chunk_col, tag_col).count().collect():
            self.rows.append(
                {
                    "chunk": r[chunk_col],
                    "metric": metric,
                    "tag": r[tag_col],
                    "value": int(r["count"]),
                }
            )
            total += int(r["count"])
        return total

    def count(self, metric: str, chunk: str, value: int, tag: str | None = None):
        self.rows.append(
            {"chunk": chunk, "metric": metric, "tag": tag, "value": int(value)}
        )

    def partition_lineage(self, df: DataFrame, chunk: str, stage: str):
        """Rows contributed per physical Spark partition — recorded alongside
        each commit so a resumed run can audit exactly which partition wrote
        what (north_rule lineage)."""
        rows = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .collect()
        )
        for r in rows:
            self.rows.append(
                {
                    "chunk": chunk,
                    "metric": f"lineage.{stage}.partition_rows",
                    "tag": str(r["partition_id"]),
                    "value": int(r["count"]),
                }
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
