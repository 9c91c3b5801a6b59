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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import decontaminate, exact_dedup, minhash_dedup
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
    """Returns {"retained", "removed", "stats"}.

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
    oracle-replayable hash family). Pairs whose endpoints did not survive
    the earlier stages are ignored (both ends are semi-joined to the
    exact-dedup survivors, exactly what the built-in stage guarantees by
    construction); the higher id of each surviving pair is dropped.

    Execution shape: every stage feeds BOTH its survivor frame and a
    removed-audit branch, so without materialization the upstream lineage
    (quality regexes, shingle explodes, the LSH band join) recomputes
    once per branch — measured ~10 corpus-lineage replays and 15.7 s at
    sf0.1. The stage-boundary frames are therefore ``persist()``-ed
    (MEMORY_AND_DISK; the frames shrink monotonically down the chain);
    call the returned ``unpersist()`` when done with the outputs. At
    100 TB the persisted footprint is bounded by the post-quality corpus
    — the alternative (N lineage replays over the raw corpus) is strictly
    worse.
    """
    scored = with_quality(docs, text_col)
    if max_repetition is not None:
        scored = with_repetition(scored, text_col)
    if keep_langs is not None:
        scored = with_lang_id(scored, text_col)
    persisted: list[DataFrame] = []

    def _stage(df: DataFrame) -> DataFrame:
        # persist AND materialize: a lazily-persisted frame consumed by
        # several concurrent branches of one downstream action is raced —
        # each branch computes the uncached partitions itself (same
        # lesson as pipeline._record_scan_stats), so the cold cost stayed
        # ~N replays until this count() forces the cache to fill ONCE.
        # One extra (useful-work) job per stage; every consumer after it
        # is a cache scan.
        persisted.append(df.persist())
        df.count()
        return df

    scored = _stage(scored)
    removed_frames: list[DataFrame] = []

    quality_ok = scored.filter(F.col("quality_score") >= min_quality)
    removed_frames.append(
        scored.filter(F.col("quality_score") < min_quality).select(
            F.col(id_col), F.lit("low_quality").alias("reason")
        )
    )

    if max_repetition is not None:
        rep_ok = quality_ok.filter(F.col("rep_ratio") <= max_repetition)
        removed_frames.append(
            quality_ok.filter(F.col("rep_ratio") > max_repetition).select(
                F.col(id_col), F.lit("repetition").alias("reason")
            )
        )
        quality_ok = rep_ok

    if keep_langs is not None:
        lang_ok = quality_ok.filter(F.col("lang_pred").isin(*keep_langs))
        removed_frames.append(
            quality_ok.filter(~F.col("lang_pred").isin(*keep_langs)).select(
                F.col(id_col), F.lit("lang").alias("reason")
            )
        )
    else:
        lang_ok = quality_ok

    if benchmark is not None:
        clean = _stage(
            decontaminate(
                lang_ok, benchmark, text_col, id_col, decontam_shingle_n
            )
        )
        removed_frames.append(
            lang_ok.join(clean.select(id_col), id_col, "left_anti").select(
                F.col(id_col), F.lit("contaminated").alias("reason")
            )
        )
        lang_ok = clean

    # exact dedup keeps the min-id representative
    exact_kept = _stage(exact_dedup(lang_ok, [text_col], id_col))
    removed_frames.append(
        lang_ok.join(exact_kept.select(id_col), id_col, "left_anti").select(
            F.col(id_col), F.lit("exact_dup").alias("reason")
        )
    )

    # near-dup: drop the higher id of each verified pair (transitive chains
    # collapse toward the smallest id over iterations; one pass is the
    # standard large-scale approximation)
    if near_dup_pairs is not None:
        surv_a = exact_kept.select(F.col(id_col).alias("id_a"))
        surv_b = exact_kept.select(F.col(id_col).alias("id_b"))
        pairs = near_dup_pairs.join(surv_a, "id_a", "left_semi").join(
            surv_b, "id_b", "left_semi"
        )
    else:
        pairs = minhash_dedup(
            exact_kept,
            text_col,
            id_col,
            num_hashes=num_hashes,
            bands=bands,
            threshold=near_dup_threshold,
        )
    near_dup_ids = _stage(
        pairs.select(F.col("id_b").alias(id_col)).distinct()
    )
    retained = _stage(exact_kept.join(near_dup_ids, id_col, "left_anti"))
    removed_frames.append(
        near_dup_ids.select(F.col(id_col), F.lit("near_dup").alias("reason"))
    )

    if max_per_source is not None:
        from .sampling import cap_per_group

        capped = _stage(
            cap_per_group(retained, source_col, id_col, max_per_source)
        )
        removed_frames.append(
            retained.join(capped.select(id_col), id_col, "left_anti").select(
                F.col(id_col), F.lit("source_cap").alias("reason")
            )
        )
        retained = capped

    if redact:
        # in place: a consumer exporting text_col must never ship PII —
        # keeping the original next to a *_redacted column would silently
        # leak it through every downstream select("text")
        retained = redact_pii(retained, text_col, out=text_col)

    removed = removed_frames[0]
    for f in removed_frames[1:]:
        removed = removed.unionByName(f)

    stats = removed.groupBy("reason").agg(F.count(F.lit(1)).alias("n")).unionByName(
        retained.agg(
            F.lit("retained").alias("reason"), F.count(F.lit(1)).alias("n")
        )
    )

    def unpersist():
        for f in persisted:
            f.unpersist()

    return {
        "retained": retained,
        "removed": removed,
        "stats": stats,
        "unpersist": unpersist,
    }
