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

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..sink import SnapshotTable
from .dedup import (
    _norm_fingerprint,
    banded_str,
    bucket_census,
    incremental_dedup,
    md5_minhash_signatures,
    minhash_signatures,
    sig_agreement,
)

FP_COL = "fp"


class _CommitProtocolIngestor:
    """The crash-window commit skeleton, in ONE place (a fix to the
    ordering or marker semantics must not be able to miss a sibling):
    done-marker skip → read-or-empty history → plan the accepted set →
    checkpoint+count → data commit FIRST → index commit LAST. Subclasses
    define ``_empty_history`` and ``_plan(batch, hist) -> (accepted,
    index_rows_fn)`` where ``index_rows_fn(accepted_checkpointed)``
    builds the rows the done-marker commit appends. The module-docstring
    crash analysis holds for any subclass whose accepted set is a
    deterministic function of (batch, index-without-this-batch)."""

    def __init__(
        self,
        data_table: SnapshotTable,
        index_table: SnapshotTable,
        admission_filter=None,
    ):
        self.data = data_table
        self.index = index_table
        # Optional filter-at-ingest (DataFrame -> DataFrame, same schema):
        # quality/language/PII gating applied to each batch BEFORE dedup
        # planning — the production shape where curation runs at the door
        # rather than as a later corpus-wide pass. Rejected docs are NOT
        # indexed: the index stays an index of the ACCEPTED corpus, and a
        # later duplicate of a rejected doc is re-evaluated on its own
        # text (the same deterministic filter rejects it again), so the
        # crash analysis is unchanged — the accepted set remains a
        # deterministic function of (admitted batch, index-without-this-
        # batch).
        self.admission_filter = admission_filter

    def _plan(self, batch: DataFrame, hist: DataFrame):
        raise NotImplementedError

    def _empty_history(self, spark, batch: DataFrame) -> DataFrame:
        """The fresh-index history frame; takes ``batch`` because a
        subclass's index schema may inherit column names/types from the
        batch (NearDupIngestor's id column)."""
        raise NotImplementedError

    def _check_index_compat(self, batch: DataFrame):
        """Hook called before planning — subclasses whose index rows are
        a function of tunable config (LSH geometry) validate here that
        this ingestor's config matches the persistent index."""

    def ingest(self, batch: DataFrame, batch_id: str) -> dict:
        """Process one batch; returns {"batch_id", "accepted", "skipped"}."""
        spark = batch.sparkSession
        if self.index.has_snapshot(batch_id):
            # done marker present → both commits landed in a prior attempt
            return {"batch_id": batch_id, "accepted": None, "skipped": True}
        self._check_index_compat(batch)
        if self.admission_filter is not None:
            cols = batch.columns
            batch = self.admission_filter(batch)
            if batch.columns != cols:
                # a filter that reshapes the frame would silently change
                # the data table's schema mid-stream; enrichment belongs
                # upstream, admission only decides membership
                raise ValueError(
                    "admission_filter must preserve the batch schema: "
                    f"{cols} -> {batch.columns}"
                )
        hist = self.index.read(spark)
        if hist is None:
            hist = self._empty_history(spark, batch)
        accepted, index_rows = self._plan(batch, hist)
        # one computation feeds BOTH commits: the accepted set is
        # deterministic, but recomputing it per commit would scan the
        # index twice for nothing
        accepted = accepted.localCheckpoint()
        n = accepted.count()
        # ORDER MATTERS — data first, index (the done marker) last; see
        # module docstring for the crash-window analysis
        self.data.commit(accepted, snapshot_id=batch_id, partition_cols=[])
        self.index.commit(
            index_rows(accepted), snapshot_id=batch_id, partition_cols=[]
        )
        return {"batch_id": batch_id, "accepted": n, "skipped": False}


class DedupIngestor(_CommitProtocolIngestor):
    """Ingest batches into ``data_table`` keeping the corpus exactly-deduped
    across batches via a persistent fingerprint index in ``index_table``.

    Single-writer by design (same contract as SnapshotTable maintenance):
    one ingest daemon owns the (data, index) pair — the reference's
    one-consumer-per-cluster structure. Batch ids must be stable across
    retries (e.g. the streaming micro-batch id or a source offset range).

    Per batch: drop docs whose normalized-text fingerprint already exists
    in the index (or earlier in this batch — min-id representative kept),
    commit survivors, append their fingerprints as the done marker."""

    def __init__(
        self,
        data_table: SnapshotTable,
        index_table: SnapshotTable,
        text_col: str = "text",
        id_col: str = "doc_id",
        broadcast_hints: bool = True,
        admission_filter=None,
    ):
        super().__init__(data_table, index_table, admission_filter)
        self.text_col = text_col
        self.id_col = id_col
        # True presumes BOUNDED micro-batches (the ingest_stream default
        # caps files/trigger); set False for unbounded backfill batches so
        # AQE picks broadcast-vs-shuffle from observed sizes — the hard
        # hint has no fallback (see incremental_dedup's docstring)
        self.broadcast_hints = broadcast_hints

    def _empty_history(self, spark, batch: DataFrame) -> DataFrame:
        return spark.createDataFrame([], f"{FP_COL} string")

    def _plan(self, batch: DataFrame, hist: DataFrame):
        accepted = incremental_dedup(
            batch,
            hist,
            self.text_col,
            self.id_col,
            history_fp_col=FP_COL,
            broadcast_hints=self.broadcast_hints,
        )

        def index_rows(acc: DataFrame) -> DataFrame:
            return acc.select(_norm_fingerprint(self.text_col).alias(FP_COL))

        return accepted, index_rows


class NearDupIngestor(_CommitProtocolIngestor):
    """Continuous-ingestion NEAR-duplicate dedup: the MinHash twin of
    :class:`DedupIngestor` — each batch is checked against a persistent
    LSH band index of previously ACCEPTED documents, survivors committed
    data-first/index-last under the same crash-window protocol (module
    docstring; the analysis transfers verbatim because the accepted set
    is again a deterministic function of (batch, index-without-batch)).

    Semantics (deterministic, no greedy recursion):

    * cross-batch — a batch doc is dropped iff some band of its MinHash
      signature collides with an accepted earlier doc AND the signature
      agreement (the Jaccard estimate) rounds ≥ ``threshold``. The index
      holds accepted docs only, so the retained corpus is what new docs
      are deduped against — a viral cluster contributes ONE accepted
      representative, which then shadows every later member.
    * within-batch — candidate pairs from the batch's own band join;
      the pair's HIGHER id drops when the estimate passes, whether or
      not the lower id itself survives (the same upper-triangular
      shadow rule as ``similarity.semantic_dedup``; pairwise predicate,
      exactly replayable by a SQL oracle).
    * docs too short to shingle (< shingle_n tokens) have no signature:
      they are always accepted and never indexed — near-dup semantics
      are undefined below one shingle (use the exact
      :class:`DedupIngestor` alongside if byte-identical shorts matter).

    Scale shape: the index stores (band_idx, band_hash, doc_id, sig) —
    ``bands`` rows ≈ 2 KB/doc at 32 hashes; per batch the FULL index
    scans exactly once (the semi join against the broadcast batch band
    keys, itself never shuffled), materializing the hit subset — bounded
    by the batch's key overlap, not the index — which the census and
    pair join then consume; on a real deployment the index table is
    bucketed on band_hash so that one scan also prunes. Hot band keys on
    EITHER side past ``max_band_fanout`` — many dissimilar accepted docs
    coincidentally sharing an index band, or a viral cluster arriving in
    one (backlog) batch — degrade to comparing against the key's min-id
    doc only: the repo's standard star degrade (simhash/semantic_dedup),
    linear in bucket size, with the same documented recall trade for
    diverse hot buckets.

    ``sig_mode``: ``"xxhash"`` (production — JVM-native 64-bit hashes)
    or ``"md5"`` (oracle-replayable hex signatures for gates/tests);
    signatures are carried as array<string> either way so the index
    schema is mode-independent. The LSH GEOMETRY is not: index rows are
    a function of (num_hashes, bands, shingle_n, sig_mode), so a daemon
    restarted with different values would never collide with the stored
    bands and silently re-accept every near-duplicate. The first ingest
    pins the geometry in ``_lsh_config.json`` beside the index (the
    ``_spec.json`` pattern) and every later ingest validates against it
    — a mismatch is a hard error naming both configs; an index with zero
    snapshots adopts the new config (nothing stored to disagree with).
    """

    def __init__(
        self,
        data_table: SnapshotTable,
        index_table: SnapshotTable,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_hashes: int = 32,
        bands: int = 8,
        shingle_n: int = 3,
        threshold: float = 0.7,
        sig_mode: str = "xxhash",
        round_dp: int = 4,
        max_band_fanout: int = 1000,
        broadcast_hints: bool = True,
        admission_filter=None,
    ):
        if num_hashes % bands:
            raise ValueError(
                f"bands ({bands}) must evenly divide num_hashes"
                f" ({num_hashes})"
            )
        if sig_mode not in ("xxhash", "md5"):
            raise ValueError(f"unknown sig_mode {sig_mode!r}")
        super().__init__(data_table, index_table, admission_filter)
        self.text_col = text_col
        self.id_col = id_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.threshold = threshold
        self.sig_mode = sig_mode
        # the estimate is k-equal-of-n → a coarse grid; rounding before
        # the >= keeps the accept/drop decision stable across engines
        self.round_dp = round_dp
        self.max_band_fanout = max_band_fanout
        self.broadcast_hints = broadcast_hints

    @property
    def _lsh_config(self) -> dict:
        return {
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "shingle_n": self.shingle_n,
            "sig_mode": self.sig_mode,
        }

    def _check_index_compat(self, batch: DataFrame):
        path = os.path.join(self.index.root, "_lsh_config.json")
        if os.path.exists(path):
            with open(path) as f:
                stored = json.load(f)
            if stored != self._lsh_config:
                # a config pinned before any snapshot published is
                # unobservable — adopt the new one (the _spec.json rule)
                if self.index.snapshots():
                    raise ValueError(
                        f"LSH config mismatch on index {self.index.root!r}:"
                        f" stored {stored}, ingestor {self._lsh_config} —"
                        " stored bands would never collide with this"
                        " geometry, silently disabling cross-batch dedup."
                        " Rebuild the index or restore the stored config."
                    )
                self._write_lsh_config(path)
            return
        self._write_lsh_config(path)

    def _write_lsh_config(self, path: str):
        os.makedirs(self.index.root, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._lsh_config, f)
        os.replace(tmp, path)

    def _empty_history(self, spark, batch: DataFrame) -> DataFrame:
        # the id column's name AND type follow the batch — a hardcoded
        # "doc_id long" would unresolve under any custom id_col
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("band_idx", IntegerType()),
                    StructField("band_hash", StringType()),
                    StructField(
                        self.id_col, batch.schema[self.id_col].dataType
                    ),
                    StructField("sig", ArrayType(StringType())),
                ]
            ),
        )

    def _signatures(self, batch: DataFrame) -> DataFrame:
        fn = (
            minhash_signatures
            if self.sig_mode == "xxhash"
            else md5_minhash_signatures
        )
        sigs = fn(
            batch, self.text_col, self.id_col, self.num_hashes, self.shingle_n
        )
        return sigs.withColumn("sig", F.col("sig").cast("array<string>"))

    def _plan(self, batch: DataFrame, hist: DataFrame):
        """Precondition: ``id_col`` non-NULL and unique (the exact_dedup /
        cap_rank contract)."""
        maybe_bc = F.broadcast if self.broadcast_hints else (lambda d: d)
        est = F.round(F.expr(sig_agreement("sig_a", "sig_b")), self.round_dp)

        # one signature computation feeds the band explode, both join
        # sides, and the index append (persist-at-fan-out rule)
        sigs = self._signatures(batch).localCheckpoint()
        bbands = banded_str(sigs, self.id_col, self.bands)

        # --- cross-batch: the FULL index streams exactly once (the semi
        # join below); the materialized hit subset — bounded by the
        # batch's key overlap, not the index size — is what the census
        # and the pair join then consume (persist-at-fan-out: without the
        # checkpoint each branch would rescan the whole index parquet)
        bkeys = bbands.select(
            "band_idx",
            "band_hash",
            F.col(self.id_col).alias("__bid"),
            F.col("sig").alias("sig_b"),
        )
        hits = hist.join(
            maybe_bc(bkeys.select("band_idx", "band_hash").distinct()),
            ["band_idx", "band_hash"],
            "left_semi",
        ).localCheckpoint()
        cool, hot = bucket_census(
            hits,
            ["band_idx", "band_hash"],
            self.max_band_fanout,
            {"aid": self.id_col, "asig": "sig"},
            [self.id_col],
        )
        cool_pairs = (
            hits.join(maybe_bc(cool), ["band_idx", "band_hash"], "left_semi")
            .select("band_idx", "band_hash", F.col("sig").alias("sig_a"))
            .join(maybe_bc(bkeys), ["band_idx", "band_hash"])
        )
        star_pairs = maybe_bc(hot).select(
            "band_idx", "band_hash", F.col("asig").alias("sig_a")
        ).join(maybe_bc(bkeys), ["band_idx", "band_hash"])
        dropped_cross = (
            cool_pairs.unionByName(star_pairs)
            .filter(est >= self.threshold)
            .select(F.col("__bid").alias(self.id_col))
        )

        # --- within-batch: shadow rule over the batch's own band
        # buckets, with the same ``max_band_fanout`` cap as the history
        # side — a viral cluster arriving in ONE batch (a backlog drain
        # with max_files_per_trigger=None) would otherwise put O(c²)
        # pairs on its band keys; over-cap buckets degrade to the
        # min-id-anchor star, which still drops every member of an
        # identical cluster down to the anchor
        bcool, bhot = bucket_census(
            bbands,
            ["band_idx", "band_hash"],
            self.max_band_fanout,
            {"aid": self.id_col, "asig": "sig"},
            [self.id_col],
        )
        cool_bands = bbands.join(
            maybe_bc(bcool), ["band_idx", "band_hash"], "left_semi"
        )
        a = cool_bands.select(
            "band_idx",
            "band_hash",
            F.col(self.id_col).alias("__ida"),
            F.col("sig").alias("sig_a"),
        )
        b = cool_bands.select(
            "band_idx",
            "band_hash",
            F.col(self.id_col).alias("__idb"),
            F.col("sig").alias("sig_b"),
        )
        within_cool = (
            a.join(b, ["band_idx", "band_hash"])
            .filter(F.col("__ida") < F.col("__idb"))
            .filter(est >= self.threshold)
            .select(F.col("__idb").alias(self.id_col))
        )
        within_star = (
            bbands.join(maybe_bc(bhot), ["band_idx", "band_hash"])
            .filter(F.col(self.id_col) != F.col("aid"))
            .select(
                F.col(self.id_col),
                F.col("sig").alias("sig_b"),
                F.col("asig").alias("sig_a"),
            )
            .filter(est >= self.threshold)
            .select(self.id_col)
        )

        dropped = (
            dropped_cross.unionByName(within_cool)
            .unionByName(within_star)
            .distinct()
        )
        accepted = batch.join(maybe_bc(dropped), self.id_col, "left_anti")

        def index_rows(acc: DataFrame) -> DataFrame:
            return bbands.join(
                maybe_bc(acc.select(self.id_col)), self.id_col, "left_semi"
            ).select("band_idx", "band_hash", self.id_col, "sig")

        return accepted, index_rows


def ingest_stream(
    spark,
    input_path: str,
    data_table: SnapshotTable,
    index_table: SnapshotTable,
    checkpoint: str,
    schema: str = "doc_id long, text string",
    text_col: str | None = None,
    id_col: str | None = None,
    max_files_per_trigger: int | None = 64,
    broadcast_hints: bool | None = None,
    admission_filter=None,
    ingestor=None,
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
    the joins from observed stats instead of the hard hint.

    ``ingestor`` swaps the per-batch dedup engine: pass a configured
    :class:`NearDupIngestor` (pointing at the SAME table pair) to run
    the daemon with MinHash near-dup semantics instead of exact
    fingerprints — the checkpoint/done-marker/exactly-once layering is
    identical because both ingestors share the commit protocol.
    ``admission_filter`` (same-schema DataFrame→DataFrame) runs
    quality/language/PII gating at the door of every micro-batch before
    dedup — see :class:`_CommitProtocolIngestor`.
    ``text_col``/``id_col``/``broadcast_hints``/``admission_filter``
    configure the DEFAULT :class:`DedupIngestor` only; combining them
    with an explicit ``ingestor`` is rejected (the ingestor already
    carries its own — silently deduping on the wrong column is the
    failure mode)."""
    if ingestor is None:
        ingestor = DedupIngestor(
            data_table,
            index_table,
            "text" if text_col is None else text_col,
            "doc_id" if id_col is None else id_col,
            broadcast_hints=True if broadcast_hints is None else broadcast_hints,
            admission_filter=admission_filter,
        )
    elif any(
        v is not None
        for v in (text_col, id_col, broadcast_hints, admission_filter)
    ):
        raise ValueError(
            "text_col/id_col/broadcast_hints/admission_filter configure"
            " the default DedupIngestor; with an explicit ingestor, set"
            " them on the ingestor itself"
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
