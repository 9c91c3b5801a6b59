"""Sinks — atomic snapshot-committed, partition-pruned parquet tables.

Reference mapping (SURVEY.md §2.5): Punt buffers rows into ES bulk requests
and commits on size/interval triggers with bounded retries, dropping on
failure — *at-most-once* (cluster.go:307-382). Here every write is an atomic
snapshot commit: data files land first, then a manifest JSON is published via
atomic rename; readers only see manifested files. A chunk whose snapshot
exists is never reprocessed → *exactly-once per chunk*, a strict upgrade
(documented divergence; `msgs.dropped` is structurally 0).

This is the Iceberg table layout in miniature (manifest ≈ snapshot metadata,
`data/snap=<id>/route_key=…/ts_day=…` ≈ partitioned data files). On a real
cluster the same interface binds to Iceberg (`writeTo(...).append()` +
snapshot-id bookkeeping); the sandbox has no Iceberg jars, so the manifest
layer stands in. Every operation below is O(metadata), never a data rewrite.

Partition spec per BASELINE.json north_star: ``(route_key, ts_day)`` — the
ES ``prefix + date_format(ts)`` index naming (cluster.go:284) becomes the
partition key, so time-ranged reads prune.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COLS = ["route_key", "ts_day"]


class SnapshotTable:
    """A partitioned parquet table with atomic, idempotent snapshot commits."""

    def __init__(self, root: str):
        self.root = root
        self.snap_dir = os.path.join(root, "_snapshots")
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- commit protocol ----------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        snapshot_id: str,
        partition_cols: list[str] | None = None,
        lineage: dict | None = None,
    ) -> dict:
        """Write ``df`` as snapshot ``snapshot_id``. Idempotent: recommitting
        the same id replaces it atomically (crash-safe resume)."""
        part_cols = partition_cols if partition_cols is not None else [
            c for c in PARTITION_COLS if c in df.columns
        ]
        snap_data = os.path.join(self.data_dir, f"snap={snapshot_id}")
        tmp_data = snap_data + ".tmp"
        if os.path.exists(tmp_data):
            shutil.rmtree(tmp_data)
        writer = df.write.mode("overwrite")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(tmp_data)

        # Swap data dir, then publish the manifest via atomic rename. A crash
        # between the two leaves orphan data invisible to readers.
        if os.path.exists(snap_data):
            shutil.rmtree(snap_data)
        os.replace(tmp_data, snap_data)

        files = [
            os.path.relpath(f, self.root)
            for f in glob.glob(
                os.path.join(snap_data, "**", "*.parquet"), recursive=True
            )
        ]
        manifest = {
            "snapshot_id": snapshot_id,
            "partition_cols": part_cols,
            "files": files,
            "n_files": len(files),
            "lineage": lineage or {},
            "committed_at": time.time(),
        }
        tmp_manifest = os.path.join(self.snap_dir, f".{snapshot_id}.json.tmp")
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp_manifest, os.path.join(self.snap_dir, f"{snapshot_id}.json"))
        return manifest

    # -- read protocol -------------------------------------------------------

    def snapshots(self) -> dict[str, dict]:
        out = {}
        for p in sorted(glob.glob(os.path.join(self.snap_dir, "*.json"))):
            with open(p) as f:
                m = json.load(f)
            out[m["snapshot_id"]] = m
        return out

    def has_snapshot(self, snapshot_id: str) -> bool:
        return os.path.exists(os.path.join(self.snap_dir, f"{snapshot_id}.json"))

    def read(self, spark: SparkSession) -> DataFrame | None:
        """Read all committed snapshots (partition columns recovered from
        directory layout — pruning works via the path filters)."""
        snaps = self.snapshots()
        paths = [
            os.path.join(self.data_dir, f"snap={sid}") for sid in snaps
        ]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return None
        return spark.read.option("basePath", self.data_dir).parquet(*paths).drop(
            "snap"
        )

    # -- maintenance ---------------------------------------------------------

    def partitions(self, prefix: str | None = None) -> list[str]:
        """Distinct route_key partition values across committed snapshots.
        Lexicographic sort == chronological (zero-padded date formats), the
        same trick the reference's GC relies on (gc.go:29-33)."""
        keys: set[str] = set()
        for m in self.snapshots().values():
            for f in m["files"]:
                for seg in f.split(os.sep):
                    if seg.startswith("route_key="):
                        keys.add(seg[len("route_key="):])
        if prefix is not None:
            keys = {k for k in keys if k.startswith(prefix)}
        return sorted(keys)

    def expire_partitions(self, prefix: str, keep: int) -> list[str]:
        """keep-N retention per prefix (reference: gc.go:15-55). Deletes the
        expired partition directories and rewrites manifests to exclude them
        — an O(metadata) operation, like Iceberg dropPartition."""
        keys = self.partitions(prefix)
        expired = keys[:-keep] if keep > 0 else keys
        if not expired:
            return []
        expired_set = {f"route_key={k}" for k in expired}
        for sid, m in self.snapshots().items():
            kept_files = [
                f
                for f in m["files"]
                if not any(seg in expired_set for seg in f.split(os.sep))
            ]
            if len(kept_files) != len(m["files"]):
                m["files"] = kept_files
                m["n_files"] = len(kept_files)
                tmp = os.path.join(self.snap_dir, f".{sid}.json.tmp")
                with open(tmp, "w") as f:
                    json.dump(m, f, indent=1)
                os.replace(tmp, os.path.join(self.snap_dir, f"{sid}.json"))
        for d in glob.glob(os.path.join(self.data_dir, "snap=*", "route_key=*")):
            if os.path.basename(d) in expired_set:
                shutil.rmtree(d)
        return expired


def partition_counts(df: DataFrame, cols: list[str]) -> dict[str, int]:
    """Per-partition row counts for lineage manifests."""
    rows = df.groupBy(*cols).count().collect()
    return {"|".join(str(r[c]) for c in cols): r["count"] for r in rows}


def salted_write_layout(
    df: DataFrame,
    n: int,
    salt_buckets: int,
    salt_key: str = "conv_id",
    order_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Arrange a frame for an efficient dynamic-partition write.

    Two problems at once:

    * **Write-side skew** (SURVEY.md §4): hot conversations (Zipf conv_id)
      would pile a hot (route_key, ts_day) cell into one task. The salt
      splits each cell across up to ``salt_buckets`` tasks. AQE skew
      handling covers joins, not writes — this is the explicit fix.
    * **Small-file blow-up**: repartitioning on a salt alone scatters every
      (route_key, ts_day) value across ALL tasks → tasks × partitions tiny
      files, and the dynamic-partition writer juggles many open files
      (measured 10× slower). ``sortWithinPartitions`` on the partition keys
      makes each task stream one file at a time; total files ≈
      salt_buckets × partition-values instead of n × partition-values.

    The trailing ``order_cols`` sort also clusters rows by (conv_id,
    turn_idx) inside each file — the stable-ordering invariant becomes
    physical layout, so downstream per-conversation reads are sequential.
    """
    if not {"route_key", "ts_day"}.issubset(df.columns):
        return df.coalesce(max(1, n // 4))
    salt = (
        F.pmod(F.xxhash64(F.col(salt_key)), F.lit(salt_buckets))
        if salt_key in df.columns
        else F.lit(0)
    )
    out = df.repartition(n, F.col("route_key"), F.col("ts_day"), salt)
    sort_cols = ["route_key", "ts_day"] + [c for c in order_cols if c in df.columns]
    return out.sortWithinPartitions(*sort_cols)
