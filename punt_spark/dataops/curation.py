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

Execution shape (r5 redesign, measured 10.25 s → target ≤6 s at sf0.1):
exactly ONE corpus-scale cache — the scored frame, whose scalar stages
(quality / repetition / language) are fused into a single CASE-derived
removal-reason column — plus a chain of SMALL removed-id frames
(contaminated / exact-dup / near-dup / source-cap ids), each persisted and
eagerly materialized so the retained frame is one cache scan anti-joined
against four broadcastable id sets. The previous shape persisted ~6
corpus-scale stage frames; removal-ID frames shrink with the removal rate,
not the corpus, so at 100 TB the persisted footprint here is the scored
corpus once + O(removed) ids. Eager materialization at each boundary is
still required: a lazily-persisted frame consumed by several concurrent
branches of one downstream action is raced — each branch computes the
uncached partitions itself (see pipeline._record_scan_stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import contaminated_ids, exact_dup_drop_ids, minhash_dedup
from .sampling import cap_drop_ids
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
    Pass pre-materialized (e.g. ``localCheckpoint()``-ed) pairs when they
    carry heavy lineage — the frame is consumed by two joins here.

    Call the returned ``unpersist()`` when done with the outputs; an
    exception mid-build releases every cache persisted so far before
    re-raising.
    """
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
        scored = _stage(scored.withColumn("__cut", cut))
        survivors = scored.filter(F.col("__cut").isNull())
        removed_frames: list[DataFrame] = [
            scored.filter(F.col("__cut").isNotNull()).select(
                F.col(id_col), F.col("__cut").alias("reason")
            )
        ]

        def _drop(ids: DataFrame, reason: str, base: DataFrame) -> DataFrame:
            """Materialize a (small) removed-id frame, record its audit
            rows, and anti-join it off the survivor lineage. The id set is
            bounded by the stage's removal count, and the persisted cache
            carries exact size stats — AQE broadcasts it when it fits and
            falls back to a shuffled join for a pathological removal rate
            (a hard broadcast hint here would OOM on a 90%-dup corpus)."""
            ids = _stage(ids.select(id_col))
            removed_frames.append(
                ids.select(F.col(id_col), F.lit(reason).alias("reason"))
            )
            return base.join(ids, id_col, "left_anti")

        if benchmark is not None:
            survivors = _drop(
                contaminated_ids(
                    survivors, benchmark, text_col, id_col, decontam_shingle_n
                ),
                "contaminated",
                survivors,
            )

        # exact dedup: drop every id that is not the min-id representative
        # of its text group (canonical key + min-id rule shared with
        # dedup.exact_dedup via exact_dup_drop_ids)
        survivors = _drop(
            exact_dup_drop_ids(survivors, [text_col], id_col),
            "exact_dup",
            survivors,
        )

        # near-dup: drop the higher id of each verified pair (transitive
        # chains collapse toward the smallest id over iterations; one pass
        # is the standard large-scale approximation)
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
        survivors = _drop(
            pairs.select(F.col("id_b").alias(id_col)).distinct(),
            "near_dup",
            survivors,
        )

        if max_per_source is not None:
            # canonical rank shared with sampling.cap_per_group via
            # cap_drop_ids (which also validates cap >= 1 — a 0 cap must
            # raise, not silently drop the whole corpus)
            survivors = _drop(
                cap_drop_ids(survivors, source_col, id_col, max_per_source),
                "source_cap",
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
