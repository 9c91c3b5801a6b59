"""Alerts — regex match → tumbling-window rollup → rendered action rows.

Reference: /root/reference/lib/punt/alert.go. A ``match`` alert checks a
regex against one source field (alert.go:109-110); the first matching event
opens a rollup window, later matches within ``rollup_window`` seconds pile
in, and the action fires once with the FIRST event's rendered title/
description, the title suffixed ``" (N similar events)"`` when more than one
event rolled up (action.go:113-115, N = count-1).

Batch re-expression: ``filter(rlike)`` → ``groupBy(window(ts, w))`` with
``min_by(..., ts)`` picking the first event per window — an exact,
deterministic analog of the reference's racy wall-clock window.

Templates: the reference renders Go text/template ``{{.field}}``
(alert.go:112-124); our configs use ``{field}``, compiled at plan time into
a ``concat`` of literals and columns — no Python in the row path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .config import AlertConfig

_FIELD_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")


def render_template(template: str) -> Column:
    """Compile "text {field} text" into concat(lit, col, lit, ...)."""
    parts: list[Column] = []
    pos = 0
    for m in _FIELD_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        parts.append(F.coalesce(F.col(m.group(1)).cast("string"), F.lit("")))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def run_alert(df: DataFrame, alert: AlertConfig, ts_col: str = "ts") -> DataFrame:
    """Evaluate one alert over a routed frame. Output: one row per rollup
    window: (alert_name, window_start, window_end, n_events, title,
    description, fields...)."""
    matched = df.filter(F.col(alert.source_field).rlike(alert.match))

    title = render_template(alert.title)
    desc = render_template(alert.description)
    field_cols = {k: render_template(v) for k, v in alert.fields.items()}

    w = F.window(F.col(ts_col), f"{alert.rollup_window_sec} seconds")
    first_by_ts = lambda c: F.min_by(c, F.col(ts_col))  # noqa: E731
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        first_by_ts(title).alias("__title"),
        first_by_ts(desc).alias("description"),
    ] + [first_by_ts(c).alias(f"field_{k}") for k, c in field_cols.items()]

    out = matched.groupBy(w.alias("w")).agg(*aggs)
    # " (N similar events)" suffix when >1 event rolled up (action.go:113-115)
    rendered_title = F.when(
        F.col("n_events") > 1,
        F.concat(
            F.col("__title"),
            F.lit(" ("),
            (F.col("n_events") - 1).cast("string"),
            F.lit(" similar events)"),
        ),
    ).otherwise(F.col("__title"))
    return out.select(
        F.lit(alert.name).alias("alert_name"),
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("n_events"),
        rendered_title.alias("title"),
        F.col("description"),
        *[F.col(f"field_{k}") for k in field_cols],
    )


def run_alerts(
    df: DataFrame, alerts: list[AlertConfig], type_name: str, ts_col: str = "ts"
) -> DataFrame | None:
    """All alerts wired to a type (empty ``sources`` = every type,
    state.go:39-52). Returns a unioned alert frame or None."""
    frames = [
        run_alert(df, a, ts_col)
        for a in alerts
        if not a.sources or type_name in a.sources
    ]
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
