"""Corpus curation — the composed training-data pipeline: quality gate →
repetition filter → language filter → decontamination → exact dedup →
MinHash near-dup dedup → per-source cap → PII redaction, with full audit
trail.

This is the canonical consumer of the dataops operators at 100 TB: every
stage is a DataFrame transform over the corpus; the only shuffles are the
two dedup key exchanges (exact hash groupBy; LSH band join), both
AQE-managed. Removed rows are never dropped silently — each stage emits an
audit frame with the removal reason, so curation is reproducible and
attributable (the training-data analog of the punt pipeline's errors /
unhandled side outputs).

Execution shape (r5 redesign 10.25 s → 5.0 s at sf0.1; r6 fuses further):
exactly ONE corpus-scale cache — the scored frame, whose scalar stages
(quality / repetition / language) are fused into a single CASE-derived
removal-reason column — plus TWO small removed-(id, reason) frames, each
persisted and eagerly materialized so the retained frame is one cache scan
anti-joined against two broadcastable id sets. The two audit frames fold
the four removal stages pairwise into single jobs (r6 — fixed per-job
overhead dominates small-corpus composites and is pure profit at scale):
contamination + exact dedup share one text-key window (keeper = min
NON-contaminated id per group), and near-dup + source cap share one
source-key window (cap_rank with the near-dup flag in the window
partition). Removal frames shrink with the removal rate, not the corpus,
so at 100 TB the persisted footprint is the scored corpus once +
O(removed) ids. Eager materialization at each boundary is still required:
a lazily-persisted frame consumed by several concurrent branches of one
downstream action is raced — each branch computes the uncached partitions
itself (see pipeline._record_scan_stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Window

from .dedup import exact_key, minhash_dedup, with_shingles
from .sampling import cap_rank
from .textstats import redact_pii, with_lang_id, with_quality, with_repetition


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_langs: tuple[str, ...] | None = None,
    min_quality: float = 0.5,
    max_repetition: float | None = None,
    benchmark: DataFrame | None = None,
    decontam_shingle_n: int = 5,
    near_dup_threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    redact: bool = False,
    max_per_source: int | None = None,
    source_col: str = "source",
    near_dup_pairs: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Returns {"retained", "removed", "stats", "unpersist"}.

    removed carries (id, reason) for every dropped doc:
    low_quality | repetition | lang | contaminated | exact_dup | near_dup
    | source_cap.
    Optional stages activate with their arguments: ``max_repetition`` gates
    on the Gopher-style repetition ratio, ``benchmark`` drops test-set
    n-gram overlap (broadcast anti-join), ``max_per_source`` caps documents
    per ``source_col`` value AFTER dedup (duplicates must not consume a
    domain's budget), ``redact=True`` rewrites ``text_col`` IN PLACE with
    PII placeholders as the final pass (redaction is last so dedup hashes
    see the original bytes; in place so no consumer of the retained frame
    can export un-redacted text).

    ``near_dup_pairs`` injects a pre-computed candidate-pair frame
    (id_a, id_b) in place of the built-in MinHash stage — the near-dup
    strategy is pluggable (SimHash pairs, embedding near-dups, or an
    oracle-replayable hash family). Injected pairs are normalized to
    (least, greatest) and self-pairs dropped, so symmetric or unordered
    input cannot remove both endpoints of a group (each surviving pair
    keeps its lower id). Pairs whose endpoints did not survive the earlier
    stages are ignored (both ends are semi-joined to the exact-dedup
    survivors, exactly what the built-in stage guarantees by construction).
    Injected pairs are consumed as ONE linear join chain (semi id_a →
    semi id_b → project), so lazy frames with heavy lineage compile into
    the single near-dup audit job — no pre-materialization needed (r6;
    the r5 shape consumed them twice and wanted a checkpoint).

    Call the returned ``unpersist()`` when done with the outputs; an
    exception mid-build releases every cache persisted so far before
    re-raising.
    """
    if max_per_source is not None and max_per_source < 1:
        # same validation as sampling.cap_per_group (a 0 cap must raise,
        # not silently drop the whole corpus) — checked FIRST, before any
        # corpus-scale job burns on an argument error
        raise ValueError(f"cap must be >= 1, got {max_per_source}")
    persisted: list[DataFrame] = []

    def _stage(df: DataFrame) -> DataFrame:
        # persist AND materialize: concurrent downstream branches race a
        # cold cache and each recompute the partitions (measured ~N
        # lineage replays); the count() fills the cache exactly once.
        persisted.append(df.persist())
        df.count()
        return df

    def unpersist():
        for f in persisted:
            f.unpersist()

    try:
        scored = with_quality(docs, text_col)
        if max_repetition is not None:
            scored = with_repetition(scored, text_col)
        if keep_langs is not None:
            scored = with_lang_id(scored, text_col)

        # scalar stages fused into ONE reason column (stage precedence:
        # quality, then repetition, then language — same order the
        # sequential filters applied)
        cut = F.when(
            F.col("quality_score") < min_quality, F.lit("low_quality")
        )
        if max_repetition is not None:
            cut = cut.when(
                F.col("rep_ratio") > max_repetition, F.lit("repetition")
            )
        if keep_langs is not None:
            cut = cut.when(
                ~F.col("lang_pred").isin(*keep_langs), F.lit("lang")
            )
        # persist WITHOUT an eager count (r6): the first audit job below
        # consumes this cache through ONE linear branch, so its first
        # action fills every partition with no concurrent-branch race —
        # the separate materialization job the r5 shape needed is free.
        # Every later consumer (audit job 2, the final retained/removed
        # action) runs sequentially against the then-warm cache.
        scored = scored.withColumn("__cut", cut).persist()
        persisted.append(scored)
        survivors = scored.filter(F.col("__cut").isNull())
        removed_frames: list[DataFrame] = [
            scored.filter(F.col("__cut").isNotNull()).select(
                F.col(id_col), F.col("__cut").alias("reason")
            )
        ]

        def _drop(tagged: DataFrame, base: DataFrame) -> DataFrame:
            """Materialize a (small) removed (id, reason) frame, record
            its audit rows, and anti-join its ids off the survivor
            lineage. The frame is bounded by the removal count, and the
            persisted cache carries exact size stats — AQE broadcasts it
            when it fits and falls back to a shuffled join for a
            pathological removal rate (a hard broadcast hint here would
            OOM on a 90%-dup corpus)."""
            tagged = _stage(tagged.select(F.col(id_col), F.col("reason")))
            removed_frames.append(tagged)
            return base.join(tagged.select(id_col), id_col, "left_anti")

        # --- fused audit job 1: contamination + exact dedup -----------------
        # Sequentially these are two jobs (contaminated ids; then exact-dup
        # ids over the remainder) with identical answers to this ONE pass:
        # flag each survivor contaminated or not, then per text-key group
        # keep the min NON-contaminated id — everyone else in the group is
        # exact_dup, contaminated rows are contaminated regardless. Stage
        # precedence holds exactly (a contaminated min-id doc cedes the
        # representative slot to the next-smallest clean id, which is what
        # running dedup after decontamination produced); the fold halves
        # the fixed per-job cost that dominates small-corpus composites.
        #
        # The contamination flag is computed LINEARLY (explode_outer the
        # doc's shingles → left join the broadcast benchmark shingle set →
        # re-group per doc with max(hit)) instead of ``contaminated_ids``'s
        # id-set + join-back: one chain means this job consumes the scored
        # cache through a single branch, which is what lets the cache
        # materialize here without the cold-cache branch race (and without
        # the r5 shape's dedicated materialization job). Same answer: a doc
        # is contaminated iff any of its distinct shingles hits the set.
        if benchmark is not None:
            bench_shingles = (
                with_shingles(benchmark, text_col, decontam_shingle_n)
                .select(F.explode("shingles").alias("__s"))
                .distinct()
                .withColumn("__hit", F.lit(1))
            )
            sh = with_shingles(
                survivors.select(
                    F.col(id_col),
                    exact_key([text_col]).alias("__k"),
                    F.col(text_col),
                ),
                text_col,
                decontam_shingle_n,
                out="__sh",
            )
            flagged = (
                sh.select(
                    F.col(id_col), F.col("__k"),
                    F.explode_outer("__sh").alias("__s"),
                )
                .join(F.broadcast(bench_shingles), "__s", "left")
                .groupBy(id_col, "__k")
                .agg(F.max("__hit").alias("__c"))
            )
        else:
            flagged = survivors.select(
                F.col(id_col),
                exact_key([text_col]).alias("__k"),
                F.lit(None).cast("int").alias("__c"),
            )
        wk = Window.partitionBy("__k")
        keeper = F.min(
            F.when(F.col("__c").isNull(), F.col(id_col))
        ).over(wk)
        reason1 = F.when(F.col("__c") == 1, F.lit("contaminated")).when(
            F.col(id_col) != keeper, F.lit("exact_dup")
        )
        survivors = _drop(
            flagged.withColumn("reason", reason1).filter(
                F.col("reason").isNotNull()
            ),
            survivors,
        )

        # --- fused audit job 2: near-dup + per-source cap -------------------
        # near-dup drops the higher id of each verified pair (transitive
        # chains collapse toward the smallest id over iterations; one pass
        # is the standard large-scale approximation); the cap then ranks
        # the REMAINDER per source. One window job does both: rank with
        # the near-dup flag added to the window partition (cap_rank's
        # also_partition_by), so clean rows rank exactly as if the
        # near-dups were filtered first — duplicates must not consume a
        # domain's budget.
        if near_dup_pairs is not None:
            pairs = near_dup_pairs.select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            ).filter(F.col("id_a") != F.col("id_b"))
            surv_ids = survivors.select(id_col)
            pairs = pairs.join(
                surv_ids.withColumnRenamed(id_col, "id_a"), "id_a", "left_semi"
            ).join(
                surv_ids.withColumnRenamed(id_col, "id_b"), "id_b", "left_semi"
            )
        else:
            pairs = minhash_dedup(
                survivors,
                text_col,
                id_col,
                num_hashes=num_hashes,
                bands=bands,
                threshold=near_dup_threshold,
            )
        nd_ids = pairs.select(F.col("id_b").alias(id_col)).distinct()
        flagged2 = survivors.select(
            F.col(id_col),
            *( [F.col(source_col)] if max_per_source is not None else [] ),
        ).join(nd_ids.withColumn("__nd", F.lit(1)), id_col, "left")
        if max_per_source is not None:
            rn = cap_rank(
                source_col, id_col, also_partition_by=F.col("__nd")
            )
            reason2 = F.when(F.col("__nd") == 1, F.lit("near_dup")).when(
                rn > max_per_source, F.lit("source_cap")
            )
        else:
            reason2 = F.when(F.col("__nd") == 1, F.lit("near_dup"))
        survivors = _drop(
            flagged2.withColumn("reason", reason2).filter(
                F.col("reason").isNotNull()
            ),
            survivors,
        )

        retained = survivors.drop("__cut")
        if redact:
            # in place: a consumer exporting text_col must never ship PII —
            # keeping the original next to a *_redacted column would
            # silently leak it through every downstream select("text")
            retained = redact_pii(retained, text_col, out=text_col)

        removed = removed_frames[0]
        for f in removed_frames[1:]:
            removed = removed.unionByName(f)

        stats = removed.groupBy("reason").agg(
            F.count(F.lit(1)).alias("n")
        ).unionByName(
            retained.agg(
                F.lit("retained").alias("reason"),
                F.count(F.lit(1)).alias("n"),
            )
        )
    except BaseException:
        unpersist()
        raise

    return {
        "retained": retained,
        "removed": removed,
        "stats": stats,
        "unpersist": unpersist,
    }
