"""Terminal dashboard for the PATHTRACER_METRICS JSONL stream.

The renderer appends one record per progress interval (utils/metrics.py):
``{"pass": N, "wall_s": S, "segments": K, "mrays_per_sec": M,
"nonfinite": F}``.  This tool renders a run (or several concatenated
runs) as a throughput table with a unicode sparkline and flags intervals
with non-finite accumulator entries — the ROADMAP "metrics dashboard"
item, kept dependency-free.

Usage:
    PATHTRACER_METRICS=/tmp/run.jsonl python -m path_trace_golang_tpu.cli ...
    python tools/metrics_report.py /tmp/run.jsonl
"""

from __future__ import annotations

import json
import sys

BARS = "▁▂▃▄▅▆▇█"


def sparkline(values):
    if not values:
        return ""
    lo, hi = min(values), max(values)
    span = (hi - lo) or 1.0
    return "".join(BARS[int((v - lo) / span * (len(BARS) - 1))] for v in values)


def report(path: str) -> int:
    records = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    if not records:
        print(f"{path}: no records")
        return 1

    total_wall = sum(r["wall_s"] for r in records)
    total_segs = sum(r["segments"] for r in records)
    rates = [r["mrays_per_sec"] for r in records]
    bad = [r for r in records if r.get("nonfinite", 0)]

    print(f"{path}: {len(records)} intervals, last pass {records[-1]['pass']}")
    print(
        f"  total: {total_segs / 1e6:.1f}M segments in {total_wall:.2f}s "
        f"-> {total_segs / total_wall / 1e6 if total_wall else 0:.1f} Mrays/s overall"
    )
    print(
        f"  per-interval Mrays/s: min {min(rates):.1f}  median "
        f"{sorted(rates)[len(rates) // 2]:.1f}  max {max(rates):.1f}"
    )
    print(f"  {sparkline(rates)}")
    if bad:
        print(f"  !! non-finite accumulator entries in {len(bad)} interval(s):")
        for r in bad[:5]:
            print(f"     pass {r['pass']}: {r['nonfinite']} entries")
    else:
        print("  accumulator finite in every interval")
    return 0


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    rc = 0
    for path in argv:
        rc = max(rc, report(path))
    return rc


if __name__ == "__main__":
    sys.exit(main())
