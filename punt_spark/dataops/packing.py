"""Sequence packing — assemble documents into fixed-token-budget training
sequences, GPT-pretraining style.

Packed pretraining batches concatenate documents back-to-back and cut the
stream at every ``budget`` tokens — documents straddle sequence boundaries
instead of wasting budget on padding. Distributed shape: the corpus is
sharded by a deterministic id hash, each shard concatenates its documents
in a deterministic pseudo-random order (md5 rank — a cheap global shuffle
of the corpus, which packing needs anyway so a sequence isn't all one
domain) and cuts its own token stream. One shuffle on the shard key, one
per-shard window cumsum; a shard holds ~total_tokens/shards tokens, so
partition size is controlled by ``shards`` — never a global window.

Every assignment is a pure function of (id, salt): re-runs, backfills, and
the DuckDB oracle reproduce the exact same packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import salted_md5


def pack_sequences(
    df: DataFrame,
    id_col: str,
    budget: int,
    text_col: str = "text",
    tokens_col: str | None = None,
    shards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Assign each document a training-sequence id and token offset.

    Returns the input plus:
      * ``n_tokens``   — whitespace token count (or ``tokens_col`` as given)
      * ``shard``      — which independent packing stream the doc joined
      * ``seq_id``     — "<shard>/<k>": the k-th budget-sized sequence of
        that shard the document STARTS in
      * ``seq_offset`` — token offset of the document within that sequence
        (a doc with seq_offset + n_tokens > budget straddles into the next
        sequence — by design; that's what padding-free packing does)
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    h = salted_md5(id_col, salt)
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % shards
    ).alias("shard")
    if tokens_col is not None:
        # A NULL token count would silently poison the cumsum (sum() skips
        # NULLs, so LATER rows pack fine while this row gets NULL
        # seq_id/seq_offset with no error) — fail loudly instead; the
        # derived-count branch below is always non-null by construction.
        tokens = F.coalesce(
            F.col(tokens_col).cast("bigint"),
            F.raise_error(
                F.concat(
                    F.lit(f"pack_sequences: NULL {tokens_col!r} for id="),
                    F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
                )
            ).cast("bigint"),
        )
    else:
        tokens = F.when(
            F.length(F.trim(F.col(text_col))) > 0,
            F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
    d = df.withColumn("n_tokens", tokens).withColumn("shard", shard)
    # rowsBetween is REQUIRED: an orderBy-only window defaults to a RANGE
    # frame, which peer-sums rows with tied ordering keys (duplicate or
    # all-NULL ids share one hash + tiebreaker) — each tied doc would get
    # start = (sum of all tied docs) − own_tokens, claiming OVERLAPPING
    # token ranges and silently double-booking the budget. A ROWS frame
    # gives tied rows consecutive non-overlapping cumsums.
    w = (
        Window.partitionBy("shard")
        .orderBy(salted_md5(id_col, salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        d.withColumn("__start", start)
        .withColumn(
            "seq_id",
            F.concat_ws(
                "/",
                F.col("shard").cast("string"),
                F.floor(F.col("__start") / budget).cast("string"),
            ),
        )
        .withColumn("seq_offset", F.pmod(F.col("__start"), F.lit(budget)))
        .drop("__start")
    )
