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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sql_str_literal(s: str) -> str:
    """Quote a Python string as a Spark SQL string literal (the separators
    are interpolated into an F.expr — a quote or backslash in them must not
    break out of, or inject into, the expression)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


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
        F.sort_array(F.collect_set(role_col)).alias("roles"),
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
