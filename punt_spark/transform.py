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

# Columns our engine threads through for bookkeeping (routing, ordering
# invariant, sink partitioning) — never touched by transformers.
META_COLS = ["conv_id", "turn_idx", "role", "tool"]


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
    ok = json_ok()
    failed = df.filter(~ok)
    good = df.filter(ok)
    payload = F.from_json(F.col("content"), schema)

    meta = [c for c in df.columns if c not in ENVELOPE_COLS and c != "payload"]
    if typ.transformer == "unpack-merge":
        # Payload keys override envelope keys (json.Unmarshal merges into the
        # same map, transformers.go:44-47); content dropped on success.
        payload_fields = _schema_field_names(good, schema)
        keep_envelope = [
            c
            for c in ENVELOPE_COLS
            if c in df.columns and c != "content" and c not in payload_fields
        ]
        out = good.withColumn("payload", payload).select(
            *meta, *keep_envelope, "payload.*"
        )
    else:  # unpack-take: payload replaces the envelope (transformers.go:59-63)
        out = good.withColumn("payload", payload).select(*meta, "payload.*")
    return out, failed


def _schema_field_names(df: DataFrame, schema: str) -> list[str]:
    if schema.startswith("map<"):
        return []
    from pyspark.sql.types import StructType

    return [f.name for f in StructType.fromDDL(schema).fields]
