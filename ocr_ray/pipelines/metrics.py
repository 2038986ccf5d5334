"""Per-stage throughput metrics from Ray Data execution stats
(north_rule: "emits per-stage throughput metrics"; replaces the reference's
commented-out timing scaffolding, celery_app.py:945-995).

``stage_metrics`` parses ``Dataset.stats()`` into structured rows:
operator name, wall seconds, rows in/out, output bytes, rows/s. Meant to be
printed by drivers and recorded by bench.py.
"""

from __future__ import annotations

import re

# map operators report "... N blocks produced in Xs"; all-to-all operators
# report "executed in Xs" (which equals the dataset's end-to-end wall, not
# the operator's own time — read task_seconds for those instead)
_OP_RE = re.compile(
    r"^Operator (\d+) (.+?): (?:.*?produced in|executed in) ([\d.]+)s", re.M
)
_ROWS_RE = re.compile(r"Output num rows per block: .*?, (\d+) total")
_BYTES_RE = re.compile(r"Output size bytes per block: .*?, (\d+) total")
_WALL_RE = re.compile(r"Remote wall time: .*?, ([\d.]+)(us|ms|s) total")

_UNIT = {"us": 1e-6, "ms": 1e-3, "s": 1.0}


def stage_metrics(stats: str) -> list[dict]:
    """Parse a Dataset.stats() string into per-operator metric rows."""
    out = []
    blocks = re.split(r"\n(?=Operator \d+ )", stats)
    for block in blocks:
        m = _OP_RE.search(block)
        if not m:
            continue
        idx, name, secs = int(m.group(1)), m.group(2), float(m.group(3))
        rows = _ROWS_RE.search(block)
        nbytes = _BYTES_RE.search(block)
        wall = _WALL_RE.search(block)
        n_rows = int(rows.group(1)) if rows else 0
        rec = {
            "stage": name,
            "index": idx,
            "seconds": secs,
            "rows_out": n_rows,
            "bytes_out": int(nbytes.group(1)) if nbytes else 0,
            "task_seconds": (
                float(wall.group(1)) * _UNIT[wall.group(2)] if wall else 0.0
            ),
            "rows_per_s": round(n_rows / secs, 1) if secs > 0 else 0.0,
        }
        out.append(rec)
    return out


def format_metrics(metrics: list[dict]) -> str:
    lines = [f"{'stage':58s} {'secs':>8s} {'rows':>10s} {'MB':>8s} {'rows/s':>10s}"]
    for m in metrics:
        lines.append(
            f"{m['stage'][:58]:58s} {m['seconds']:8.2f} {m['rows_out']:10d} "
            f"{m['bytes_out'] / 1e6:8.1f} {m['rows_per_s']:10.1f}"
        )
    return "\n".join(lines)
