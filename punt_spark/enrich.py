"""Mutators — field enrichment as typed column transforms & broadcast joins.

Reference: /root/reference/lib/punt/mutators.go (registry :15-24):

* ``unixtime`` (:26-58) — per {input_field: output_field}: string float
  epoch-seconds → formatted timestamp string. Missing input field = silent
  no-op; unparseable value leaves the output unset (the worker ignores
  Mutate errors — cluster.go:280-282). DOCUMENTED DIVERGENCE: the
  reference's ``time.Unix(int64(v), int64(v*1e9))`` double-counts seconds
  (mutators.go:54 — v seconds passed again as nanoseconds); we compute the
  correct epoch conversion.

* ``geoip`` (:60-113) — Maxmind lookup on an IP column emitting metro code
  (int), ISO country (string), [lon,lat] geo-point. Generalized here (per
  BASELINE.json north_star) to ``lookup``: a broadcast hash join against a
  small dimension table keyed on any column (tool / role in the transcript
  pipeline), emitting category (string), risk_code (int), coords
  (array<double>). Missing key = left join → nulls (mutator no-op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import MutatorConfig, go_time_format_to_java

# Default output layout — Go "2006-01-02T15:04:05+00:00" (mutators.go:32).
UNIXTIME_DEFAULT_FORMAT = "yyyy-MM-dd'T'HH:mm:ss'+00:00'"


def apply_unixtime(df: DataFrame, cfg: dict) -> DataFrame:
    """unixtime mutator. cfg: {"fields": {in: out}, "format": go_layout?}."""
    fmt = (
        go_time_format_to_java(cfg["format"]) if "format" in cfg
        else UNIXTIME_DEFAULT_FORMAT
    )
    for in_field, out_field in cfg["fields"].items():
        if in_field not in df.columns:
            # Missing field is a silent no-op (mutators.go:44-46).
            continue
        epoch = F.col(in_field).try_cast("double")
        df = df.withColumn(
            out_field,
            F.date_format(F.timestamp_seconds(epoch), fmt),
        )
    return df


def apply_lookup(
    df: DataFrame,
    cfg: dict,
    lookups: dict[str, DataFrame],
) -> DataFrame:
    """lookup mutator (geoip generalization). cfg: {"on": key_col,
    "prefix": out_prefix?}. ``lookups[key_col]`` is the dimension table whose
    first column is the join key.

    Always a broadcast hash join — the dim is tiny (mutators.go's Maxmind DB
    analog); no shuffle of the fact side.
    """
    key = cfg["on"]
    prefix = cfg.get("prefix", key)
    dim = lookups.get(key)
    # The lookup mutator has a FIXED output contract, mirroring geoip's
    # three fixed outputs (metro code / ISO country / geo-point,
    # mutators.go:100-107): category:string, risk_code:int,
    # coords:array<double>. A fixed contract keeps every sink's schema
    # stable whether or not the dimension table is present.
    contract = {
        "category": "string",
        "risk_code": "int",
        "coords": "array<double>",
    }
    if dim is None or key not in df.columns:
        # No dimension table registered, or the key column itself is absent
        # from this type's payload (e.g. an envelope column under an
        # unpack-take transform): no-op with stable schema (null outputs) —
        # the column-level analog of the mutator's silent missing-input
        # no-op (mutators.go:90-93).
        for c, typ in contract.items():
            df = df.withColumn(f"{prefix}_{c}", F.lit(None).cast(typ))
        return df
    missing = [c for c in contract if c not in dim.columns]
    if missing:
        raise ValueError(
            f"lookup dim for {key!r} lacks contract columns {missing}"
        )
    renamed = dim.select(
        F.col(key),
        *[F.col(c).cast(t).alias(f"{prefix}_{c}") for c, t in contract.items()],
    )
    # A dimension table must be UNIQUE on its key (the geoip reference has
    # exactly one record per IP) — duplicate keys in a hand-built dim
    # would silently MULTIPLY every matching fact row through the left
    # join, inflating sinks and counters with no error. Deterministic
    # dedup: keep the lexicographically-least contract tuple per key.
    renamed = renamed.groupBy(key).agg(
        F.min(F.struct(*[c for c in renamed.columns if c != key])).alias("__d")
    ).select(key, "__d.*")
    return df.join(F.broadcast(renamed), on=key, how="left")


def apply_mutators(
    df: DataFrame,
    mutators: list[MutatorConfig],
    lookups: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Apply a Type's mutator chain in declared order (cluster.go:280-282)."""
    for m in mutators:
        if m.name == "unixtime":
            df = apply_unixtime(df, m.config)
        elif m.name in ("lookup", "geoip"):
            df = apply_lookup(df, m.config, lookups or {})
        else:
            raise ValueError(f"unknown mutator {m.name!r}")
    return df
