"""Continuous-ingestion dedup loop (D32 production wiring): each accepted
batch's fingerprints are appended to a stored index table atomically-enough
that a crash between the two commits can neither lose nor double-drop
documents.

Reference parity: the punt ingest daemon's interval-commit continuity
(/root/reference/lib/punt/cluster.go:326-338) — a batch that committed is
never reprocessed; here additionally each batch's ACCEPTED set feeds the
dedup state the next batch is checked against.

Scale shape: the index stores ONE 32-byte md5 fingerprint row per accepted
doc (~32 B/doc — 10¹² docs ≈ 32 TB of index vs re-scanning the corpus per
batch). ``incremental_dedup`` keeps the index map-side (the batch's
fingerprints broadcast into a semi-join over the index; the index never
shuffles); on a real deployment the index is an Iceberg table bucketed on
the fingerprint so the semi-join also prunes buckets.

Crash-safety protocol (ordering is the invariant):

1. ``done`` marker = the INDEX snapshot for the batch id — committed LAST.
2. Data commits FIRST. Both commits are idempotent per snapshot id
   (atomic manifest replace), and the accepted set is a deterministic
   function of (batch, index-without-this-batch).

Crash windows:
* before the data commit — nothing published; a re-run recomputes the
  same accepted set and proceeds.
* after data, before index — the re-run recomputes the SAME accepted set
  (the index cannot yet contain this batch's fingerprints, because the
  index commit is the done marker), idempotently overwrites the data
  snapshot with identical rows, then commits the index.
* after both — ``has_snapshot`` on the index short-circuits: the batch is
  never reprocessed (exactly-once per batch id).

The inverse ordering (index first) would be WRONG: a crash between the
commits would leave the batch's own fingerprints in the index, and the
re-run would dedup the batch against itself — every document dropped,
silent data loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sink import SnapshotTable
from .dedup import _norm_fingerprint, incremental_dedup

FP_COL = "fp"


class DedupIngestor:
    """Ingest batches into ``data_table`` keeping the corpus exactly-deduped
    across batches via a persistent fingerprint index in ``index_table``.

    Single-writer by design (same contract as SnapshotTable maintenance):
    one ingest daemon owns the (data, index) pair — the reference's
    one-consumer-per-cluster structure. Batch ids must be stable across
    retries (e.g. the streaming micro-batch id or a source offset range).
    """

    def __init__(
        self,
        data_table: SnapshotTable,
        index_table: SnapshotTable,
        text_col: str = "text",
        id_col: str = "doc_id",
        broadcast_hints: bool = True,
    ):
        self.data = data_table
        self.index = index_table
        self.text_col = text_col
        self.id_col = id_col
        # True presumes BOUNDED micro-batches (the ingest_stream default
        # caps files/trigger); set False for unbounded backfill batches so
        # AQE picks broadcast-vs-shuffle from observed sizes — the hard
        # hint has no fallback (see incremental_dedup's docstring)
        self.broadcast_hints = broadcast_hints

    def ingest(self, batch: DataFrame, batch_id: str) -> dict:
        """Process one batch: drop docs whose normalized-text fingerprint
        already exists in the index (or earlier in this batch — min-id
        representative kept), commit survivors to the data table, then
        append their fingerprints to the index. Returns
        {"batch_id", "accepted", "skipped"}."""
        spark = batch.sparkSession
        if self.index.has_snapshot(batch_id):
            # done marker present → both commits landed in a prior attempt
            return {"batch_id": batch_id, "accepted": None, "skipped": True}
        hist = self.index.read(spark)
        if hist is None:
            hist = spark.createDataFrame([], f"{FP_COL} string")
        accepted = incremental_dedup(
            batch,
            hist,
            self.text_col,
            self.id_col,
            history_fp_col=FP_COL,
            broadcast_hints=self.broadcast_hints,
        )
        # one computation feeds BOTH commits: the accepted set is
        # deterministic, but recomputing it per commit would scan the
        # index twice for nothing
        accepted = accepted.localCheckpoint()
        n = accepted.count()
        # ORDER MATTERS — data first, index (the done marker) last; see
        # module docstring for the crash-window analysis
        self.data.commit(accepted, snapshot_id=batch_id, partition_cols=[])
        fps = accepted.select(
            _norm_fingerprint(self.text_col).alias(FP_COL)
        )
        self.index.commit(fps, snapshot_id=batch_id, partition_cols=[])
        return {"batch_id": batch_id, "accepted": n, "skipped": False}


def ingest_stream(
    spark,
    input_path: str,
    data_table: SnapshotTable,
    index_table: SnapshotTable,
    checkpoint: str,
    schema: str = "doc_id long, text string",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = 64,
    broadcast_hints: bool = True,
):
    """The continuous-ingestion daemon shape: ``readStream`` over a
    document directory → ``foreachBatch`` → :class:`DedupIngestor` — the
    streaming twin of the punt ingest loop (cluster.go:326-338) for
    corpora instead of log lines.

    Exactly-once composes from three layers: the streaming CHECKPOINT
    pins which files belong to each micro-batch id (a restarted drain
    re-delivers the same batch with the same id, never re-reads consumed
    files into new batches), the ingestor's index done-marker skips
    batches whose two commits both landed, and both commits are
    idempotent per batch id. ``Trigger.AvailableNow`` drains the backlog
    and stops; run it on a schedule (or switch the trigger) for a
    resident daemon. Returns the finished StreamingQuery.

    ``max_files_per_trigger`` defaults to a BOUND (64 files/batch) rather
    than unset: a first trigger over a large backfill backlog would
    otherwise arrive as one unbounded batch, and ``incremental_dedup``'s
    hard broadcast hints (safe only for bounded micro-batches) could
    exceed the broadcast limit with no fallback. Pass ``None`` explicitly
    to drain a backlog in one batch — only with an upstream size
    guarantee, or together with ``broadcast_hints=False`` so AQE sizes
    the joins from observed stats instead of the hard hint."""
    ingestor = DedupIngestor(
        data_table,
        index_table,
        text_col,
        id_col,
        broadcast_hints=broadcast_hints,
    )

    def _batch(df: DataFrame, batch_id: int):
        ingestor.ingest(df, f"batch-{batch_id:08d}")

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(input_path)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
