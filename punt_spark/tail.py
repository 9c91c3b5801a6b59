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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_bucket(df: DataFrame, seed: int = 42) -> Column:
    """Deterministic percentage bucket in [0, 100) from the row's stable
    identity: md5 — the Spark/DuckDB-shared hash, so an ANSI-SQL oracle can
    replay the exact selection (same construction as
    ``dataops.sampling.hash_bucket``). Identity is (conv_id, turn_idx) when
    present, else all columns; NULLs hash as a sentinel so null-key rows
    are sampled too instead of silently dropping."""
    keys = (
        ["conv_id", "turn_idx"]
        if {"conv_id", "turn_idx"}.issubset(df.columns)
        else list(df.columns)
    )
    from .dataops.sampling import bucket_of

    id_str = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(k).cast("string"), F.lit("\x00null"))
            for k in keys
        ],
    )
    return bucket_of(id_str, f"tail{seed}\x1f", 100)


def tail(
    df: DataFrame,
    filters: dict[str, str] | None = None,
    sample_pct: int = 100,
    seed: int = 42,
    sample_mode: str = "hash",
) -> DataFrame:
    """Field-equality conjunction (control.go:114-126; values compared as
    strings, matching the reference's string-field comparison) + percentage
    sample (control.go:129-133).

    ``sample_mode="hash"`` (default, batch AND streaming): a deterministic
    md5 bucket over the row's stable identity — reproducible across
    re-runs, partitionings, engines, and micro-batch retries. DOCUMENTED
    DIVERGENCE from the reference's ``rand.Intn`` per-row RNG: determinism
    is strictly more useful for a tail you might replay, and it is the only
    semantics a streaming retry can honor. ``sample_mode="engine"`` keeps
    Spark's seeded Bernoulli sample for reference-faithful RNG behavior
    (batch frames only — streams cannot ``sample()``).

    Second documented divergence, the BOUNDARY: the reference skips only
    when ``rand.Intn(100) > sample`` (control.go:129-133), i.e. keeps
    (sample+1)% of rows — ``--sample 0`` still passes ~1%. Both modes
    here implement exact ``sample_pct``% (keep iff bucket/draw < pct, 0
    keeps nothing), which is what the flag SAYS; replicate the
    reference's off-by-one with ``sample_pct + 1`` if byte-faithful
    behavior is ever needed.
    """
    out = df
    if filters:
        cond = reduce(
            and_,
            [F.col(k).cast("string") == F.lit(v) for k, v in filters.items()],
        )
        out = out.filter(cond)
    if sample_pct < 100:
        if sample_mode == "hash" or df.isStreaming:
            out = out.filter(sample_bucket(df, seed) < sample_pct)
        elif sample_mode == "engine":
            out = out.sample(fraction=sample_pct / 100.0, seed=seed)
        else:
            raise ValueError(f"unknown sample_mode {sample_mode!r}")
    return out
