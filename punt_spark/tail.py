"""Live-tail query helpers — filter + sample over a routed stream/table.

Reference: /root/reference/lib/punt/control.go:80-143 — the ``tail`` control
command subscribes to a Type's routed payloads, keeps rows where every
{field: value} filter pair matches exactly (:114-126), then applies a
percentage sample ``rand.Intn(100) > sample → skip`` (:129-133).

Batch form: a filter+sample query on the sink table. Streaming form: the
same transforms over ``readStream`` (the subscriber channel analog).
"""

from __future__ import annotations

from functools import reduce
from operator import and_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tail(
    df: DataFrame,
    filters: dict[str, str] | None = None,
    sample_pct: int = 100,
    seed: int = 42,
) -> DataFrame:
    """Field-equality conjunction (control.go:114-126; values compared as
    strings, matching the reference's string-field comparison) + percentage
    sample (control.go:129-133).

    On a batch frame the sample is Spark's seeded Bernoulli sample; on a
    STREAMING frame (``live_tail``) ``sample()`` is unsupported, so the
    same ~pct% selection is a deterministic hash filter over the row's
    stable identity ((conv_id, turn_idx) when present, else all columns) —
    stable across micro-batch retries, unlike the reference's rand.Intn."""
    out = df
    if filters:
        cond = reduce(
            and_,
            [F.col(k).cast("string") == F.lit(v) for k, v in filters.items()],
        )
        out = out.filter(cond)
    if sample_pct < 100:
        if df.isStreaming:
            keys = (
                ["conv_id", "turn_idx"]
                if {"conv_id", "turn_idx"}.issubset(df.columns)
                else list(df.columns)
            )
            bucket = F.pmod(
                F.xxhash64(*[F.col(k) for k in keys], F.lit(seed)),
                F.lit(100),
            )
            out = out.filter(bucket < sample_pct)
        else:
            out = out.sample(fraction=sample_pct / 100.0, seed=seed)
    return out
