"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick from a large raw corpus the examples most
distributionally similar to a small target set, with importance weights
from bag-of-hashed-ngram models.

Mechanics: features are word {uni,bi}-grams hashed into ``n_buckets``
buckets via the repo's one md5-bucket core (``sampling.bucket_of`` — the
no-fork rule: DuckDB oracles and sibling operators replay the identical
formula). Target and raw corpora each induce a Laplace-smoothed
categorical distribution over buckets; a candidate's log importance
weight is Σ over its gram occurrences of ln p_target[b] − ln p_raw[b].
Selection is Gumbel-top-k — adding i.i.d. Gumbel noise to the log
weights and taking the top k samples WITHOUT replacement proportionally
to the softmax of the weights (the paper's resampling step) — with the
noise derived from md5 of the doc id, so the draw is deterministic,
partitioning-independent, and engine-replayable.

100 TB shape: the bucket-weight table is ``n_buckets`` rows (broadcast);
scoring is explode → broadcast join → per-doc re-agg whose shuffle
carries ~one row per doc (a doc's grams are partition-local, so partial
aggregation collapses them map-side before the exchange); the raw corpus
never self-joins and the target corpus is small by contract (its counts
reduce to the B-row table). Top-k is a TakeOrderedAndProject, never a
global sort. The raw corpus is read in two column-pruned passes (bucket
counts, then scoring) — inherent to importance weighting, as for any
TF-IDF-shaped statistic: weights need the global counts before any doc
can be scored, and caching the exploded gram rows to save the second
scan would materialize a frame larger than the corpus itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from punt_spark.dataops.sampling import bucket_of, round_signed

_GUMBEL_BUCKETS = 1 << 32


def _toks(text_col: str) -> str:
    return f"filter(split(lower(trim({text_col})), '\\\\s+'), x -> x <> '')"


def _grams_expr(text_col: str) -> str:
    """Unigrams + bigrams as one array; a <2-token doc contributes its
    unigrams only (slice with negative length would throw under ANSI)."""
    t = _toks(text_col)
    return (
        f"CASE WHEN size({t}) < 2 THEN {t} ELSE concat({t}, "
        f"zip_with(slice({t}, 1, size({t}) - 1), "
        f"slice({t}, 2, size({t}) - 1), (a, b) -> concat(a, ' ', b))) END"
    )


def gram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """(id, bucket), one row per gram OCCURRENCE (the paper's model is
    over occurrence counts, not distinct grams)."""
    return df.select(
        F.col(id_col),
        F.explode(F.expr(_grams_expr(text_col))).alias("gram"),
    ).select(id_col, bucket_of(F.col("gram"), salt, n_buckets).alias("bucket"))


def dsir_logratio(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """The B-row bucket table (bucket, lw): lw = ln p_target − ln p_raw
    with add-``alpha`` smoothing, every bucket present (an unseen bucket
    still carries the smoothed floor — dropping it would silently zero
    the penalty for grams the target never produces)."""
    spark = target.sparkSession

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            gram_buckets(df, text_col, id_col, n_buckets, salt)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    all_buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    joined = (
        all_buckets.join(counts(target, "ct"), "bucket", "left")
        .join(counts(raw, "cr"), "bucket", "left")
        .fillna({"ct": 0, "cr": 0})
    )
    # totals fold into a broadcast 1-row aggregate (idf_score pattern) —
    # no collect, no second pass over either corpus
    totals = joined.agg(
        F.sum("ct").alias("__t"), F.sum("cr").alias("__r")
    )
    b = float(n_buckets)
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + alpha) / (F.col("__t") + alpha * b))
            - F.log((F.col("cr") + alpha) / (F.col("__r") + alpha * b))
        ).alias("lw"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """Per-candidate log importance weight (id, logw). Docs with no grams
    (empty/whitespace text) score 0 rather than vanishing — selection
    must rank every candidate it was given."""
    lr = dsir_logratio(target, raw, text_col, id_col, n_buckets, alpha, salt)
    scored = (
        gram_buckets(raw, text_col, id_col, n_buckets, salt)
        .join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lw").alias("logw"))
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .fillna({"logw": 0.0})
    )


def gumbel_noise(id_expr, salt: str = "dsir-gumbel"):
    """Deterministic standard Gumbel draw per id: u = (md5-derived 32-bit
    int + 0.5) / 2³², g = −ln(−ln u). Strictly inside (0, 1) so neither
    ln can hit 0/∞; identical bits in any engine that replays the md5
    formula."""
    u = (
        bucket_of(id_expr.cast("string"), salt, _GUMBEL_BUCKETS) + F.lit(0.5)
    ) / F.lit(float(_GUMBEL_BUCKETS))
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 1.0,
    salt: str = "dsir",
    gumbel_salt: str = "dsir-gumbel",
    round_dp: int = 2,
) -> DataFrame:
    """Gumbel-top-k resample: the k candidates with the largest
    logw + Gumbel(id), i.e. a without-replacement draw ∝ softmax(logw).
    The perturbed key is rounded to ``round_dp`` with an id tie-break so
    the selected SET is reproducible across engines (float-sum order
    perturbs logw at ~1e-13; unrounded ordering could flip a boundary
    pair). Returns (id, logw, key_r) for the selected rows."""
    w = dsir_weights(raw, target, text_col, id_col, n_buckets, alpha, salt)
    keyed = w.withColumn(
        # bind the perturbed key first: round_signed references its
        # argument twice, and the Gumbel term carries an md5 chain
        "__kraw", F.col("logw") + gumbel_noise(F.col(id_col), gumbel_salt)
    ).withColumn(
        # round_signed: a perturbed key in (-0.005, 0) must emit -0.0 to
        # byte-match the DuckDB oracle's DOUBLE round (see sampling)
        "key_r", round_signed(F.col("__kraw"), round_dp)
    ).drop("__kraw")
    return keyed.orderBy(F.col("key_r").desc(), F.col(id_col)).limit(k)
