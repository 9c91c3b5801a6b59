"""Transcript assembly — flatten multi-turn conversations into training
documents.

The punt_spark pipeline's payload is multi-turn agent transcripts
(conv_id, turn_idx, role, text); an LLM training pipeline consumes them as
RENDERED documents — one text per conversation with role markers, turns in
stable order. This is the bridge op between the log-pipeline side (routed
per-turn rows) and the dataops side (per-document dedup / quality /
packing all operate on the rendered text).

Shape at scale: one shuffle on conv_id, then per-row array ops —
``sort_array(collect_list(struct(...)))`` keeps the turn ordering exact
without a window; a conversation's turns must fit one aggregation buffer
(transcripts are KB-scale; a pathological million-turn conv would need a
turn-count cap upstream, same guard class as LSH's max_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sql_str_literal(s: str) -> str:
    """Quote a Python string as a Spark SQL string literal (the separators
    are interpolated into an F.expr — a quote or backslash in them must not
    break out of, or inject into, the expression)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def validate_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str | None = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    order_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Per-conversation structural health checks — the transcript-payload
    gate a training pipeline runs BEFORE rendering/packing (a conversation
    with duplicated or missing turns, consecutive same-role turns, or
    empty texts produces corrupt training documents downstream):

    * ``n_turns``
    * ``dup_turns``          — duplicate ``idx_col`` values (None skips)
    * ``gap_turns``          — missing indices inside [min, max]
    * ``starts_at_zero``     — first index is 0
    * ``alternation_breaks`` — consecutive turns with the same role, in
      deterministic (idx/order, role, text) order
    * ``empty_turns``        — NULL/blank texts
    * ``valid``              — all of the above clean

    Shape at scale: ONE shuffle on the conversation key (a partitioned
    window + the groupBy reuse the same exchange) — never a global sort.
    ``order_cols`` overrides the ordering key when there is no integer
    index (e.g. event streams ordered by (ts, event_id)); index checks
    are skipped when ``idx_col`` is None."""
    if not order_cols and idx_col is None:
        raise ValueError(
            "validate_conversations: order_cols is required when idx_col "
            "is None (an index-less stream still needs a deterministic "
            "turn ordering for the alternation check)"
        )
    order = list(order_cols) if order_cols else [idx_col]
    w = Window.partitionBy(conv_col).orderBy(
        *order, F.col(role_col), F.col(text_col)
    )
    d = df.withColumn("__prev_role", F.lag(role_col).over(w))
    is_empty = (
        F.col(text_col).isNull() | (F.length(F.trim(F.col(text_col))) == 0)
    ).cast("int")
    same_role = (
        F.col("__prev_role").isNotNull()
        & (F.col(role_col) == F.col("__prev_role"))
    ).cast("int")
    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(same_role).alias("alternation_breaks"),
        F.sum(is_empty).alias("empty_turns"),
    ]
    if idx_col is not None:
        aggs += [
            (F.count(F.lit(1)) - F.countDistinct(F.col(idx_col))).alias(
                "dup_turns"
            ),
            (
                F.max(idx_col) - F.min(idx_col) + 1
                - F.countDistinct(F.col(idx_col))
            ).alias("gap_turns"),
            (F.min(idx_col) == 0).alias("starts_at_zero"),
        ]
    out = d.groupBy(conv_col).agg(*aggs)
    ok = (F.col("alternation_breaks") == 0) & (F.col("empty_turns") == 0)
    if idx_col is not None:
        ok = (
            ok
            & (F.col("dup_turns") == 0)
            & (F.col("gap_turns") == 0)
            & F.col("starts_at_zero")
        )
    return out.withColumn("valid", ok)


def render_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    turn_sep: str = "\n",
    role_sep: str = ": ",
) -> DataFrame:
    """(conv, turns…) → one row per conversation:

    * ``text``     — "role: text" lines joined by ``turn_sep``, turns in
      ``order_cols`` order (ties broken by the struct's remaining fields —
      pass a fully-ordering key set for deterministic output)
    * ``n_turns``  — turn count
    * ``roles``    — distinct roles in first-appearance-free sorted order

    The per-turn text equality invariant survives rendering: sorting is on
    the collected struct, so re-partitioning cannot reorder turns.
    """
    # NULL role/text coalesce to '' so the turn still renders (concat of a
    # NULL would make the whole line NULL and array_join would silently
    # drop it while n_turns counted it).
    turn = F.struct(
        *[F.col(c) for c in order_cols],
        F.coalesce(F.col(role_col), F.lit("")).alias("__role"),
        F.coalesce(F.col(text_col), F.lit("")).alias("__text"),
    )
    agg = df.groupBy(conv_col).agg(
        F.sort_array(F.collect_list(turn)).alias("__turns"),
        F.count(F.lit(1)).alias("n_turns"),
        # NULL roles coalesce to '' here too — collect_set silently drops
        # NULLs, which would leave a rendered turn whose speaker is
        # absent from the roles summary
        F.sort_array(
            F.collect_set(F.coalesce(F.col(role_col), F.lit("")))
        ).alias("roles"),
    )
    role_sep_q = _sql_str_literal(role_sep)
    turn_sep_q = _sql_str_literal(turn_sep)
    line = f"concat(t.__role, {role_sep_q}, t.__text)"
    return agg.select(
        F.col(conv_col),
        F.expr(
            f"array_join(transform(__turns, t -> {line}), {turn_sep_q})"
        ).alias("text"),
        "n_turns",
        "roles",
    )


def dedup_boilerplate_turns(
    df: DataFrame,
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("ts",),
    id_col: str = "turn_id",
) -> DataFrame:
    """Corpus-wide TURN-level exact dedup — the transcript analog of
    CCNet/C4 paragraph dedup: identical turn texts recur across
    conversations (canned system prompts, templated tool outputs,
    greeting boilerplate), and training pipelines keep the FIRST
    occurrence in stream order, dropping later copies.

    Keeps, per distinct text: the row that is first under
    ``(order_cols..., id_col)`` (id is the deterministic tie-break —
    stream timestamps collide). Returns the retained frame; pair with
    :func:`boilerplate_turn_stats` for the audit report.

    Shape at scale: one shuffle on the text hash (same key for the
    window and nothing else), no global window, no self-join. Identical-
    text skew (a system prompt repeated 10⁹ times) concentrates one hash
    key — but the window only SORTS within the key to find rank 1, and
    AQE's skew split handles the sort spill; the alternative
    min(struct(...)) aggregate is fully map-side combinable, which is why
    the filter path below uses it rather than the window.
    """
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")).cast("binary"))
    first = F.struct(
        *[F.col(c) for c in order_cols], F.col(id_col)
    )
    keep = (
        df.withColumn("__h", h)
        .groupBy("__h")
        .agg(F.min(first).alias("__first"))
        .select(F.col(f"__first.{id_col}").alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")


def boilerplate_turn_stats(
    df: DataFrame,
    text_col: str = "text",
    order_cols: tuple[str, ...] = ("ts",),
    id_col: str = "turn_id",
    conv_col: str = "conv_id",
) -> DataFrame:
    """Audit report for :func:`dedup_boilerplate_turns`: one row per
    distinct turn text with (content_h, keep id, copy count, distinct
    conversations touched). The stats ride the same groupBy key as the
    dedup itself; the exact ``countDistinct(conv_col)`` plans the
    standard two-phase distinct expand (a (hash, conv) pre-shuffle
    before the hash-key agg — verified in the formatted plan), the
    price of an exact audit; swap in approx_count_distinct when the
    report feeds monitoring rather than an oracle gate."""
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")).cast("binary"))
    first = F.struct(
        *[F.col(c) for c in order_cols], F.col(id_col)
    )
    return (
        df.withColumn("__h", h)
        .groupBy(F.col("__h").alias("content_h"))
        .agg(
            F.min(first).alias("__first"),
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct(F.col(conv_col)).alias("n_convs"),
        )
        .select(
            "content_h",
            F.col(f"__first.{id_col}").alias(f"keep_{id_col}"),
            "n_copies",
            "n_convs",
        )
    )
