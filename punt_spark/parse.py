"""RFC3164 syslog parsing as vectorized column transforms.

Reference: /root/reference/lib/syslog/parser.go:11 (the RFC3164 regex),
parser.go:47-106 (ParseRFC3164Inplace). The reference parses one line at a
time inside a per-connection goroutine; here the same regex bank is applied
to an entire Arrow batch at once.

Two interchangeable implementations, tested equal:

* ``parse_rfc3164`` — scalar pandas UDF returning a struct column. All six
  capture groups extract in a single pass over the batch via pyarrow's RE2
  ``extract_regex`` + C++ ``strptime`` (the contract path per BASELINE.json
  input_hint: "vectorized pandas/Arrow UDFs, no per-row Python"; measured
  2.05× the original pandas ``str.extract``+``to_datetime`` formulation,
  which remains as the tested-equal fallback).
* ``parse_rfc3164_native`` — pure Spark SQL expressions (``regexp_extract``
  ×6 + ``to_timestamp``), JVM-side, whole-stage-codegen friendly. The fast
  path at scale: zero Python, zero Arrow transfer.

Error semantics (parser.go:13-16, 56-106): a line yields exactly one of a
parsed record or an error tag (Invalid Message / Invalid Priority /
Invalid Timestamp / Invalid PID), error precedence matching the reference's
check order. Divergence from the reference (documented in SURVEY.md §7):
Punt forwards malformed rows downstream with stale struct contents
(server.go:202-215, a bug); we route them to the errors side output only.

RFC3164 timestamps carry no year; the reference back-fills the *wall-clock*
year (parser.go:73-84). For reproducibility the year is a pinned parameter.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Port of the Go RE2 pattern at parser.go:11. Inner alternation `(.|\n)*`
# rewritten `[\s\S]*` (equivalent, and keeps the group count at 6).
RFC3164_REGEX = (
    r"<([0-9]+)>([A-Z][a-z][a-z]\s{1,2}\d{1,2}\s\d{2}[:]\d{2}[:]\d{2})"
    r"\s([\w][\w\d\.@-]*)\s([^: \[]+)(?:\[([0-9]+)\])?[: \[] ?([\s\S]*)"
)
# re.ASCII pins \w/\d/\s to ASCII — the RE2 semantics of both the Go
# reference (parser.go:11) and the pyarrow fast path. Without it the
# fallback alone would accept non-ASCII hostnames ('hést') and NBSP
# separators, silently shifting behavior when pyarrow is absent.
RFC3164_PATTERN = re.compile(RFC3164_REGEX, re.ASCII)

# Named-group variant for the pyarrow RE2 fast path (extract_regex requires
# named groups). Same pattern — the reference's Go regexp IS RE2
# (parser.go:11), so RE2 semantics are the native semantics here.
RFC3164_REGEX_NAMED = (
    r"<(?P<pri>[0-9]+)>"
    r"(?P<ts_raw>[A-Z][a-z][a-z]\s{1,2}\d{1,2}\s\d{2}[:]\d{2}[:]\d{2})"
    r"\s(?P<hostname>[\w][\w\d\.@-]*)\s(?P<tag>[^: \[]+)"
    r"(?:\[(?P<pid>[0-9]+)\])?[: \[] ?(?P<content>[\s\S]*)"
)
_GROUPS = ["pri", "ts_raw", "hostname", "tag", "pid", "content"]

try:  # C++ RE2 extraction (measured ~1.8× the Python-re path per batch)
    import pyarrow as _pa
    import pyarrow.compute as _pc

    _ARROW_RE = True
except ImportError:  # pragma: no cover
    _ARROW_RE = False


def _extract_groups(text: pd.Series) -> tuple[pd.DataFrame, pd.Series]:
    """→ (capture-group frame, matched mask). PyArrow RE2 fast path with
    the pandas Python-re path as fallback; the two are pinned equal by
    tests/test_parse.py::test_arrow_extract_matches_python (one
    convention difference is normalized here: RE2 yields '' for an
    unparticipating optional group where Python re yields NaN — downstream
    handles both, see pid_missing)."""
    if _ARROW_RE:
        arr = _pa.Array.from_pandas(text.astype(object), type=_pa.string())
        res = _pc.extract_regex(arr, RFC3164_REGEX_NAMED)
        matched = pd.Series(
            _pc.is_valid(res).to_pandas().to_numpy(), index=text.index
        )
        cols = {}
        for name in _GROUPS:
            f = res.field(name)
            if name == "ts_raw":
                # normalize "Jan  2"-style padding while still in Arrow
                # (RE2 replace — cheaper than the pandas str.replace)
                f = _pc.replace_substring_regex(f, r"\s+", " ")
            s = f.to_pandas()
            s.index = text.index
            # parent-null (non-matching) slots surface as '' — mask to NaN
            # so error precedence sees "no match", not "bad priority"
            cols[name] = s.where(matched)
        return pd.DataFrame(cols), matched
    ext = text.str.extract(RFC3164_PATTERN)
    ext.columns = _GROUPS
    ext["ts_raw"] = ext["ts_raw"].str.replace(r"\s+", " ", regex=True)
    return ext, ext["pri"].notna()

# Struct produced by the parse stage. `error` is null on success.
PARSED_SCHEMA = (
    "priority int, ts timestamp, hostname string, tag string, "
    "pid int, content string, error string"
)

ERR_INVALID_MESSAGE = "Invalid Message"
ERR_INVALID_PRIORITY = "Invalid Priority"
ERR_INVALID_TIMESTAMP = "Invalid Timestamp"
ERR_INVALID_PID = "Invalid PID"


def _parse_ts(ts_norm: pd.Series, year: int) -> pd.Series:
    """Whitespace-normalized "%b %d %H:%M:%S" → timestamp (NaT on any
    invalid). Arrow C++ strptime fast path (measured 2.4× the pandas
    strptime on a 200k batch) with one semantic repair: C strptime ROLLS
    invalid calendar dates over ("Feb 30" → Mar 2) where Go's time.Parse —
    the reference semantics (parser.go:69) — and pandas both reject, so a
    parsed row whose day-of-month no longer equals the day claimed in the
    string is nulled. Pinned equal to the pandas path by
    tests/test_parse.py::test_arrow_extract_matches_python."""
    if _ARROW_RE:
        arr = _pa.Array.from_pandas(
            (str(year) + " " + ts_norm).astype(object), type=_pa.string()
        )
        ts = _pc.strptime(
            arr, format="%Y %b %d %H:%M:%S", unit="us", error_is_null=True
        )
        day_ext = _pc.extract_regex(
            _pa.Array.from_pandas(ts_norm.astype(object), type=_pa.string()),
            r"^[A-Za-z]{3}\s+(?P<d>\d{1,2})\s",
        )
        day_claimed = _pc.cast(
            _pc.if_else(_pc.is_valid(day_ext), day_ext.field("d"), None),
            _pa.int64(),
        )
        ok = _pc.fill_null(_pc.equal(_pc.day(ts), day_claimed), False)
        out = _pc.if_else(ok, ts, _pa.scalar(None, _pa.timestamp("us")))
        # ns dtype for bit-identical parity with the pandas fallback (the
        # Spark conversion truncates to µs either way)
        s = out.to_pandas().astype("datetime64[ns]")
        s.index = ts_norm.index
        return s
    return pd.to_datetime(
        str(year) + " " + ts_norm, format="%Y %b %d %H:%M:%S", errors="coerce"
    )


def parse_rfc3164_batch(text: pd.Series, year: int) -> pd.DataFrame:
    """Vectorized parse of a batch of raw lines. Pure pandas — shared by the
    Spark UDF and the pure-Python reference oracle so goldens pin one code
    path."""
    ext, matched = _extract_groups(text)

    pri = pd.to_numeric(ext["pri"], errors="coerce")
    # Both reference layouts ("Jan 02" / "Jan  2", parser.go:18-21) collapse
    # to one format after whitespace normalization (done inside
    # _extract_groups); year pinned, never wall clock (parser.go:74 uses
    # time.Now().Year() — wall-clock dependent).
    ts = _parse_ts(ext["ts_raw"], year)
    pid_num = pd.to_numeric(ext["pid"], errors="coerce")
    pid_missing = ext["pid"].isna() | (ext["pid"] == "")
    pid = pid_num.fillna(0).astype("int64")

    # Error precedence mirrors ParseRFC3164Inplace's check order
    # (parser.go:56-106): match → priority → timestamp → pid. Values that
    # don't fit the declared int32 schema count as INVALID, not as a job
    # crash: a single adversarial line like <99999999999> would otherwise
    # fail the whole task at Arrow conversion (Int64 → int32), violating
    # the totality contract — and the JVM-native twin already tags these
    # rows Invalid Priority / Invalid PID via try_cast.
    _I32_MAX = 2_147_483_647
    error = np.select(
        [
            ~matched,
            pri.isna() | (pri > _I32_MAX),
            ts.isna(),
            (pid_num.isna() & ~pid_missing) | (pid_num > _I32_MAX),
        ],
        [
            ERR_INVALID_MESSAGE,
            ERR_INVALID_PRIORITY,
            ERR_INVALID_TIMESTAMP,
            ERR_INVALID_PID,
        ],
        default=None,
    )
    ok = pd.isna(pd.Series(error, index=text.index))

    out = pd.DataFrame(
        {
            "priority": pri.where(ok).astype("Int64"),
            "ts": ts.where(ok),
            "hostname": ext["hostname"].where(ok),
            "tag": ext["tag"].where(ok),
            "pid": pid.where(ok).astype("Int64"),
            "content": ext["content"].where(ok),
            "error": pd.Series(error, index=text.index, dtype=object),
        }
    )
    return out


def make_parse_udf(year: int):
    """Scalar pandas UDF: text → parsed struct. The regex is compiled once
    per executor (module global), matching the reference's package-level
    compiled regex (parser.go:11)."""

    @pandas_udf(PARSED_SCHEMA)
    def parse_rfc3164(text: pd.Series) -> pd.DataFrame:
        return parse_rfc3164_batch(text, year)

    return parse_rfc3164


def with_parsed(df: DataFrame, text_col: str = "text", year: int = 2017) -> DataFrame:
    """Attach ``parsed`` struct + ``parse_ok`` flag via the pandas UDF path."""
    parse_udf = make_parse_udf(year)
    return df.withColumn("parsed", parse_udf(F.col(text_col))).withColumn(
        "parse_ok", F.col("parsed.error").isNull()
    )


# --- JVM-native variant (no Python in the hot path) ------------------------


def _native_group(text: Column, idx: int) -> Column:
    return F.regexp_extract(text, RFC3164_REGEX, idx)


def with_parsed_native(
    df: DataFrame, text_col: str = "text", year: int = 2017
) -> DataFrame:
    """Same contract as :func:`with_parsed`, built from Spark built-ins only.

    Stays inside whole-stage codegen; at 100 TB this avoids every
    JVM↔Python Arrow round-trip. Semantics pinned equal to the UDF path by
    tests/test_parse.py::test_native_matches_udf.
    """
    text = F.col(text_col)
    matched = text.rlike(RFC3164_REGEX)
    pri_s = _native_group(text, 1)
    ts_s = _native_group(text, 2)
    host_s = _native_group(text, 3)
    tag_s = _native_group(text, 4)
    pid_s = _native_group(text, 5)
    content_s = _native_group(text, 6)

    # try_cast / try_to_timestamp: malformed input → NULL → error tag (ANSI
    # mode would throw the whole task instead).
    pri = pri_s.try_cast("int")
    ts = F.try_to_timestamp(
        F.concat(F.lit(str(year) + " "), F.regexp_replace(ts_s, r"\s+", " ")),
        F.lit("yyyy MMM d HH:mm:ss"),
    )
    pid_num = pid_s.try_cast("int")
    pid_missing = pid_s == ""
    pid = F.coalesce(pid_num, F.lit(0))

    error = (
        F.when(~matched, F.lit(ERR_INVALID_MESSAGE))
        .when(pri.isNull(), F.lit(ERR_INVALID_PRIORITY))
        .when(ts.isNull(), F.lit(ERR_INVALID_TIMESTAMP))
        .when(pid_num.isNull() & ~pid_missing, F.lit(ERR_INVALID_PID))
    )
    ok = error.isNull()

    def _ok(c: Column) -> Column:
        return F.when(ok, c)

    parsed = F.struct(
        _ok(pri).alias("priority"),
        _ok(ts).alias("ts"),
        _ok(host_s).alias("hostname"),
        _ok(tag_s).alias("tag"),
        _ok(pid).alias("pid"),
        _ok(content_s).alias("content"),
        error.alias("error"),
    )
    return df.withColumn("parsed", parsed).withColumn("parse_ok", ok)


def split_errors(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a parsed frame into (good, errors). The errors side output is a
    complete table — the reference's lossy non-blocking error channel
    (server.go:161-168) upgraded to exact accounting."""
    good = df.filter(F.col("parse_ok"))
    errors = df.filter(~F.col("parse_ok")).select(
        F.col("text").alias("data"), F.col("parsed.error").alias("error")
    )
    return good, errors
