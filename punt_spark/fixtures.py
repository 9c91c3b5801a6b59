"""Deterministic synthetic fixtures: the transcript input table plus the
route/lookup dimension tables.

Shape per BASELINE.json input_hint: transcripts(conv_id string, turn_idx
int32, role string, text string, tool string, ts timestamp). ``text`` is a
rendered RFC3164 line so the parse stage has real work; content mixes plain
text / JSON / malformed / multi-line plus the reference's golden test lines
(lib/syslog/parser_test.go:10,20; buffer_test.go:51). conv_id draw is
Zipf-skewed so a few conversations are hot — exercising the salted
repartition called out in SURVEY.md §4.

Everything is numpy/pandas-vectorized (a 1M-row fixture builds in seconds)
and seeded — same (seed, n) → byte-identical table.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .config import PipelineConfig, default_config

# Golden lines from the reference's unit tests — must round-trip exactly.
GOLDEN_SIMPLE = (
    "<190>Feb 22 04:23:32 test-hostname-with-stuff-1-32 "
    "my-application: this is a test oh boy!"
)  # parser_test.go:9-17
GOLDEN_MULTILINE = (
    "<34>Oct 11 22:14:15 mymachine su: 'su root' failed for lonvick\n"
    "on /dev/pts/8"
)  # parser_test.go:19-25
GOLDEN_AUDIT = (
    "<133>Mar 14 04:20:29 example-host-prod-1-1 audit "
    "type=SYSCALL msg=audit(1489465219.995:1699): test"
)  # buffer_test.go:50-59 (payload after octet framing)

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["grep", "bash", "browser", "none", "python", "editor"])
TAGS = np.array(
    ["logs", "audit", "app-json", "metrics-json", "my-application", "unknown-tag"]
)
TAG_WEIGHTS = np.array([0.35, 0.2, 0.15, 0.1, 0.1, 0.1])

WORDS = np.array(
    "request served handler cache miss hit retry timeout queue flush worker "
    "session token login logout upload download stream shard replica "
    "connect disconnect publish consume ack nack scan seek commit".split()
)


def make_transcripts(
    n: int = 10_000, seed: int = 42, year: int = 2017, n_convs: int | None = None
) -> pd.DataFrame:
    """Build the transcript table. ~3% malformed lines, ~18% JSON content,
    ~2% multi-line, ~1% alert-magic lines, goldens pinned at rows 0-2."""
    rng = np.random.default_rng(seed)
    n_convs = n_convs or max(10, n // 20)

    # Zipf-skewed conversation draw: value 1 dominates → one hot conv_id.
    conv_raw = rng.zipf(1.5, size=n) % n_convs
    conv_id = np.char.add("conv-", np.char.zfill(conv_raw.astype("U8"), 8))

    # turn_idx: dense 0..k-1 per conversation, in row order (stable-ordering
    # invariant key per input_hint).
    s = pd.Series(conv_id)
    turn_idx = s.groupby(s).cumcount().to_numpy().astype("int32")

    role = ROLES[rng.integers(0, len(ROLES), n)]
    tool = TOOLS[rng.integers(0, len(TOOLS), n)]
    tag = rng.choice(TAGS, size=n, p=TAG_WEIGHTS)

    # Timestamps: monotone overall (hence monotone within conv), spanning a
    # FIXED 4-day window at any n — larger scale factors mean denser traffic
    # (bigger hourly buckets), not more buckets, matching how a real
    # 10^12-turn table scales. (≥4 distinct days so ts-day partitioning +
    # keep-N retention have work.)
    base = pd.Timestamp(f"{year}-03-10 00:00:00")
    step_us = max(1, (4 * 86400 * 1_000_000) // n)
    ts = base + pd.to_timedelta(np.arange(n) * step_us, unit="us")

    pri = rng.integers(0, 192, n)
    pid = rng.integers(1, 32768, n)
    has_pid = rng.random(n) < 0.5
    hostname = np.char.add("host-", (conv_raw % 50).astype("U4"))

    # content mix
    u = rng.random(n)
    is_json = u < 0.18
    is_magic = (u >= 0.18) & (u < 0.19)
    is_multiline = (u >= 0.19) & (u < 0.21)

    w1 = WORDS[rng.integers(0, len(WORDS), n)]
    w2 = WORDS[rng.integers(0, len(WORDS), n)]
    w3 = WORDS[rng.integers(0, len(WORDS), n)]
    plain = pd.Series(w1) + " " + pd.Series(w2) + " " + pd.Series(w3)

    level = np.where(rng.random(n) < 0.2, "error", "info")
    epoch = (1489465219.0 + rng.integers(0, 10_000_000, n) / 1000.0).astype("U18")
    users = np.char.add("u", (conv_raw % 100).astype("U4"))
    jsonc = (
        '{"level":"' + pd.Series(level) + '","user":"' + pd.Series(users)
        + '","epoch":"' + pd.Series(epoch) + '"}'
    )

    content = plain.copy()
    content[is_json] = jsonc[is_json]
    content[is_magic] = " magic " + plain[is_magic]
    content[is_multiline] = plain[is_multiline] + "\ncontinued line"

    # Render RFC3164. Mix both reference timestamp layouts (parser.go:18-21):
    # zero-padded "Jan 02" on even rows, space-padded "Jan  2" on odd rows.
    mon = ts.strftime("%b")
    day2 = ts.strftime("%d")
    day_sp = np.where(
        ts.day < 10, " " + ts.day.astype("U2"), ts.day.astype("U2")
    )
    day = np.where(np.arange(n) % 2 == 0, day2, day_sp)
    hms = ts.strftime("%H:%M:%S")
    ts_str = pd.Series(mon) + " " + pd.Series(day) + " " + pd.Series(hms)

    pid_part = pd.Series(
        np.where(has_pid, np.char.add(np.char.add("[", pid.astype("U8")), "]"), "")
    )
    text = (
        "<" + pd.Series(pri.astype("U4")) + ">" + ts_str + " "
        + pd.Series(hostname) + " " + pd.Series(tag) + pid_part + ": " + content
    )

    # ~3% malformed: no <PRI> / bad timestamp / truncated (exercises the
    # errors side output, reference server.go:161-168).
    m = rng.random(n)
    bad_nopri = m < 0.01
    bad_ts = (m >= 0.01) & (m < 0.02)
    bad_trunc = (m >= 0.02) & (m < 0.03)
    text[bad_nopri] = "no priority header here " + plain[bad_nopri]
    text[bad_ts] = "<13>Xyz 99 99:99:99 " + pd.Series(hostname)[bad_ts] + " oops: x"
    text[bad_trunc] = "<55>"

    # Pin the reference goldens at fixed rows so unit tests can address them.
    if n >= 3:
        text.iloc[0] = GOLDEN_SIMPLE
        text.iloc[1] = GOLDEN_MULTILINE
        text.iloc[2] = GOLDEN_AUDIT

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text.astype(object),
            "tool": tool,
            # microsecond precision: Spark's parquet reader rejects
            # TIMESTAMP(NANOS); the input_hint schema is timestamp(us)
            "ts": pd.Series(ts).astype("datetime64[us]"),
        }
    )


def routes_pdf(cfg: PipelineConfig | None = None) -> pd.DataFrame:
    """Route registry as a (tiny, broadcastable) table — the reference's
    State.Types map (state.go:31-33)."""
    cfg = cfg or default_config()
    rows = [
        {
            "tag": t.name,
            "prefix": t.prefix,
            "mapping_type": t.mapping_type,
            "date_format": t.java_date_format,
            "transformer": t.transformer,
            "sink": t.sink_name,
        }
        for t in cfg.types.values()
    ]
    return pd.DataFrame(rows)


def lookup_tool_pdf() -> pd.DataFrame:
    """Enrichment dim keyed on tool — generalization of the GeoIP mutator
    (mutators.go:60-113): category ≈ country ISO code, risk_code ≈ metro
    code, coords ≈ [lon, lat] geo-point."""
    tools = ["grep", "bash", "browser", "none", "python", "editor"]
    return pd.DataFrame(
        {
            "tool": tools,
            "category": ["search", "shell", "web", "idle", "code", "code"],
            "risk_code": np.arange(len(tools), dtype="int32") * 10,
            "coords": [[float(i), float(-i)] for i in range(len(tools))],
        }
    )


def lookup_role_pdf() -> pd.DataFrame:
    roles = ["user", "assistant", "system", "tool"]
    return pd.DataFrame(
        {
            "role": roles,
            "category": ["human", "model", "platform", "machine"],
            "risk_code": np.arange(len(roles), dtype="int32") + 100,
            "coords": [[float(i) / 2, 1.0 + i] for i in range(len(roles))],
        }
    )


def write_fixtures(out_dir: str, n: int = 10_000, seed: int = 42, year: int = 2017):
    """Write transcripts + dims as parquet under out_dir.

    Large fixtures are written as a DIRECTORY of part files (like any real
    table): Spark assigns splits per file, so the scan — and therefore the
    parse stage — parallelizes without a raw-text shuffle.
    """
    os.makedirs(out_dir, exist_ok=True)
    pdf = make_transcripts(n, seed, year)
    tpath = os.path.join(out_dir, "transcripts.parquet")
    n_files = max(1, min(64, n // 25_000))
    if n_files == 1:
        pdf.to_parquet(tpath, index=False, row_group_size=100_000)
    else:
        os.makedirs(tpath, exist_ok=True)
        step = (len(pdf) + n_files - 1) // n_files
        for i in range(n_files):
            pdf.iloc[i * step : (i + 1) * step].to_parquet(
                os.path.join(tpath, f"part-{i:04d}.parquet"),
                index=False,
                row_group_size=100_000,
            )
    routes_pdf().to_parquet(os.path.join(out_dir, "routes.parquet"), index=False)
    lookup_tool_pdf().to_parquet(os.path.join(out_dir, "lookup_tool.parquet"), index=False)
    lookup_role_pdf().to_parquet(os.path.join(out_dir, "lookup_role.parquet"), index=False)
    return out_dir
