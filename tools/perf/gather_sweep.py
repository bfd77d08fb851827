"""Sweep the gather-walk ROUND_POPS knob on real TPU.

HISTORICAL NOTE: this sweep originally also varied GROUP_ROWS; that
knob is GONE — the in-kernel row-group relayout is a confirmed Mosaic
compile defect (tools/repro/mosaic_reshape_repro.py; wrong-image data
preserved in tools/perf/gather_sweep.json).  The GROUP_ROWS half of a
"GxP" config is now ignored with a warning.

Runs tools/perf/bvh_bench.py --render-only (10k-triangle UV sphere,
512x512, 1 pass, depth 8) in a fresh subprocess per config — the knobs
are read at bvh import — and records Mrays/s per config.

Usage: python tools/perf/gather_sweep.py [configs...]
  configs default: 1x1 1x2   (GROUP_ROWSxROUND_POPS; G must be 1)
Writes tools/perf/gather_sweep.json.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))


def main() -> int:
    configs = sys.argv[1:] or ["1x1", "1x2"]
    rows = []
    for cfg in configs:
        g, p = cfg.split("x")
        if g != "1":
            print(f"{cfg}: GROUP_ROWS is fixed at 1 (Mosaic defect, see "
                  f"tools/repro/mosaic_reshape_repro.py) — running as 1x{p}")
        env = dict(
            os.environ,
            PATHTRACER_BVH_ROUND_POPS=p,
        )
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "bvh_bench.py"), "--render-only"],
            env=env,
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=3000,
        )
        out = r.stdout + r.stderr
        m = re.search(r"([0-9.]+) Mrays/s", out)
        mean = re.search(r"image mean ([0-9.]+)", out)
        row = {
            "group_rows": int(g),
            "round_pops": int(p),
            "mrays": float(m.group(1)) if m else None,
            "img_mean": float(mean.group(1)) if mean else None,
            "ok": r.returncode == 0,
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        if not row["ok"]:
            row["tail"] = out.strip().splitlines()[-3:]
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(os.path.join(HERE, "gather_sweep.json"), "w") as f:
        json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
