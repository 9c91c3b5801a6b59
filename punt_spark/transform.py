"""Transformers — structured-log unpack as from_json column transforms.

Reference: /root/reference/lib/punt/transformers.go (registry :13-24):
* ``direct``       — identity (:27-35)
* ``unpack-merge`` — JSON payload merged into the envelope, ``content``
                     dropped on success (:38-50)
* ``unpack-take``  — JSON payload replaces the envelope (:53-63)

A transformer error drops the row into the ``msgs.failed`` metric
(cluster.go:272-277). Go's json.Unmarshal targets a map — only a JSON
*object* succeeds; we pin the same rule via from_json into MapType, which
yields NULL for malformed input and non-objects.

The pipeline applies transformers per sink (each sink has a statically
known TypeConfig), so there is no row-level branching — each sink's plan is
a straight-line select that stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import TypeConfig

# Envelope columns produced by the parse stage (parser.go ToMapping :36-45
# plus `source` stamped at server.go:213).
ENVELOPE_COLS = ["priority", "ts", "hostname", "tag", "pid", "content", "source"]


def json_ok(content_col: str = "content"):
    """True iff content is a parseable JSON object — the exact condition for
    Go json.Unmarshal-into-map success (transformers.go:44,60)."""
    return F.from_json(F.col(content_col), "map<string,string>").isNotNull()


def apply_transformer(df: DataFrame, typ: TypeConfig) -> tuple[DataFrame, DataFrame]:
    """Apply ``typ``'s transformer. Returns (transformed, failed).

    ``failed`` carries the rows a Go worker would count as ``msgs.failed``
    and drop (cluster.go:273-277).
    """
    if typ.transformer == "direct":
        return df, df.limit(0)

    if typ.transformer not in ("unpack-merge", "unpack-take"):
        raise ValueError(f"unknown transformer {typ.transformer!r}")

    schema = typ.payload_schema or "map<string,string>"
    is_map = schema.startswith("map<")
    ok = json_ok()
    failed = df.filter(~ok)
    good = df.filter(ok)
    payload = F.from_json(F.col("content"), schema)

    meta = [c for c in df.columns if c not in ENVELOPE_COLS and c != "payload"]
    meta_set = set(meta)
    payload_fields = _schema_field_names(good, schema)
    # Payload fields may NOT shadow engine bookkeeping/routing columns
    # (conv_id, turn_idx, role, tool, route_key, ts_day, …): a payload
    # declaring e.g. `role string` would otherwise emit two identically
    # named columns and every downstream join/write dies with
    # AMBIGUOUS_REFERENCE. Envelope names are overridable by design
    # (json.Unmarshal merge semantics); meta names win — routing and the
    # ordering invariant cannot be forged by document content.
    payload_cols = [
        F.col(f"payload.`{f}`").alias(f)
        for f in payload_fields
        if f not in meta_set
    ]
    if is_map:
        # Dynamic payloads (the map<string,string> DEFAULT when no
        # payload_schema is declared) cannot star-expand — `payload.*` is
        # only defined for structs and raised AnalysisException for every
        # configured-but-schemaless unpack type. The whole parsed object
        # lands as ONE `payload` map column instead (the ES dynamic-
        # mapping analog; enforce_mapping/DDL treat it as opaque).
        payload_cols = [payload.alias("payload")]
    if typ.transformer == "unpack-merge":
        # Payload keys override envelope keys (json.Unmarshal merges into the
        # same map, transformers.go:44-47); content dropped on success.
        keep_envelope = [
            c
            for c in ENVELOPE_COLS
            if c in df.columns and c != "content" and c not in payload_fields
        ]
        out = good.withColumn("payload", payload).select(
            *meta, *keep_envelope, *payload_cols
        )
    else:  # unpack-take: payload replaces the envelope (transformers.go:59-63)
        out = good.withColumn("payload", payload).select(*meta, *payload_cols)
    return out, failed


def _schema_field_names(df: DataFrame, schema: str) -> list[str]:
    if schema.startswith("map<"):
        return []
    from pyspark.sql.types import StructType

    return [f.name for f in StructType.fromDDL(schema).fields]
