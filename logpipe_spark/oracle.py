"""Pure-Python reference parser/router — the stand-in for the C reference.

The reference's correctness contract is manual end-to-end comparison: source
bytes must reappear, byte-identical and count-conserved, in each routed sink
(`README.md:404-445`; perf check :1155-1164 vs :1309-1316). This module
re-derives that golden output row-by-row in plain Python (no Spark, no
numpy tricks) so the Spark pipeline can be checked against an independent
implementation:

- per-sink row counts          (count conservation)
- routed rows in (conv_id, turn_idx) order (text-equality invariant)
- parse columns                 (extraction parity)
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from logpipe_spark.globs import is_match

CALL_RE = re.compile(r"^CALL (\w+)\(([^)]*)\) -> (\w+)")
ERROR_RE = re.compile(r"^ERROR (\d{3}) (.*)$")
META_RE = re.compile(
    r"^\[\[system=([^\]]*)\]\[server=([^\]]*)\]\[offset=(\d+)\]\[line=(\d+)\]\](.*)$"
)

PARSE_COLS = [
    "tool_called",
    "call_args",
    "call_status",
    "error_code",
    "error_msg",
    "meta_system",
    "meta_server",
    "meta_offset",
    "meta_line",
    "n_fields",
]


def parse_text(text: str) -> dict:
    """Reference extraction of one turn's text (intent of
    filter-unpack-metadata + the ES `$N` tokenizer; the reference's
    6-char key compare / strnlen bugs at
    `src-plugins/logpipe-filter-unpack-metadata.c:126-144` are NOT
    reproduced — intent, not bug)."""
    out = dict.fromkeys(PARSE_COLS)
    m = CALL_RE.match(text)
    if m:
        out["tool_called"], out["call_args"], out["call_status"] = m.groups()
    m = ERROR_RE.match(text)
    if m:
        out["error_code"] = int(m.group(1))
        out["error_msg"] = m.group(2)
    m = META_RE.match(text)
    if m:
        out["meta_system"] = m.group(1)
        out["meta_server"] = m.group(2)
        out["meta_offset"] = int(m.group(3))
        out["meta_line"] = int(m.group(4))
    # runs of separators collapse (logpipe-output-es.c:642-661)
    out["n_fields"] = len([f for f in text.split(" ") if f])
    return out


def route_row(rules: list[dict], row: dict) -> str | None:
    """First-match-wins rule walk (glob include/exclude order of
    `logpipe-input-file.c:593-739`). Returns sink name or None = dropped."""
    for rule in sorted(rules, key=lambda r: r["rule_id"]):
        value = row[rule["match_col"]]
        if value is None:
            continue  # NULL never matches (Spark predicates on NULL → false)
        if is_match(rule["pattern"], value):
            if rule["exclude"] or rule["sink"] == "DROP":
                return None
            return rule["sink"]
    return None


def run_reference(
    transcripts: pd.DataFrame,
    dim: pd.DataFrame,
    rules: list[dict],
) -> dict:
    """Full golden run: parse + enrich + route every turn.

    Returns dict with:
      - ``routed``: DataFrame of all kept turns + parse cols + enrich cols +
        ``sink``, sorted by (sink, conv_id, turn_idx)
      - ``sink_counts``: Counter {sink: n_rows}
      - ``dropped``: int
      - ``unmatched_dim``: int  (rows whose (tool, role) missed the dim)
    """
    dim_map = {
        (r["tool"], r["role"]): r for r in dim.to_dict("records")
    }
    routed_rows: list[dict] = []
    sink_counts: Counter = Counter()
    dropped = 0
    unmatched = 0
    for row in transcripts.to_dict("records"):
        rec = dict(row)
        rec.update(parse_text(row["text"]))
        d = dim_map.get((row["tool"], row["role"]))
        if d is None:
            unmatched += 1
            rec["sink_hint"] = None
            rec["priority"] = None
            rec["tool_family"] = None
        else:
            rec["sink_hint"] = d["sink_hint"]
            rec["priority"] = d["priority"]
            rec["tool_family"] = d["tool_family"]
        sink = route_row(rules, row)
        if sink is None:
            dropped += 1
            continue
        rec["sink"] = sink
        sink_counts[sink] += 1
        routed_rows.append(rec)

    routed = pd.DataFrame(routed_rows)
    if len(routed):
        routed = routed.sort_values(["sink", "conv_id", "turn_idx"]).reset_index(drop=True)
    return {
        "routed": routed,
        "sink_counts": sink_counts,
        "dropped": dropped,
        "unmatched_dim": unmatched,
    }
