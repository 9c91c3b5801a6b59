"""Corpus curation — the composed training-data pipeline: quality gate →
language filter → exact dedup → MinHash near-dup dedup, with full audit
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

from .dedup import exact_dedup, minhash_dedup
from .textstats import with_lang_id, with_quality


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_langs: tuple[str, ...] | None = None,
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
) -> dict[str, DataFrame]:
    """Returns {"retained", "removed", "stats"}.

    removed carries (id, reason) for every dropped doc:
    low_quality | lang | exact_dup | near_dup.
    """
    scored = with_quality(docs, text_col)
    if keep_langs is not None:
        scored = with_lang_id(scored, text_col)

    removed_frames: list[DataFrame] = []

    quality_ok = scored.filter(F.col("quality_score") >= min_quality)
    removed_frames.append(
        scored.filter(F.col("quality_score") < min_quality).select(
            F.col(id_col), F.lit("low_quality").alias("reason")
        )
    )

    if keep_langs is not None:
        lang_ok = quality_ok.filter(F.col("lang_pred").isin(*keep_langs))
        removed_frames.append(
            quality_ok.filter(~F.col("lang_pred").isin(*keep_langs)).select(
                F.col(id_col), F.lit("lang").alias("reason")
            )
        )
    else:
        lang_ok = quality_ok

    # exact dedup keeps the min-id representative
    exact_kept = exact_dedup(lang_ok, [text_col], id_col)
    removed_frames.append(
        lang_ok.join(exact_kept.select(id_col), id_col, "left_anti").select(
            F.col(id_col), F.lit("exact_dup").alias("reason")
        )
    )

    # near-dup: drop the higher id of each verified pair (transitive chains
    # collapse toward the smallest id over iterations; one pass is the
    # standard large-scale approximation)
    pairs = minhash_dedup(
        exact_kept,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=near_dup_threshold,
    )
    near_dup_ids = pairs.select(F.col("id_b").alias(id_col)).distinct()
    retained = exact_kept.join(near_dup_ids, id_col, "left_anti")
    removed_frames.append(
        near_dup_ids.select(F.col(id_col), F.lit("near_dup").alias("reason"))
    )

    removed = removed_frames[0]
    for f in removed_frames[1:]:
        removed = removed.unionByName(f)

    stats = removed.groupBy("reason").agg(F.count(F.lit(1)).alias("n")).unionByName(
        retained.agg(
            F.lit("retained").alias("reason"), F.count(F.lit(1)).alias("n")
        )
    )
    return {"retained": retained, "removed": removed, "stats": stats}
