"""Render example outputs for every reference scene and builtin demo.

Run on the TPU: ``python examples/render_examples.py [--quick]``.
Writes PNGs + a manifest with per-scene stats into this directory.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import path_trace_golang_tpu as pt
from path_trace_golang_tpu.scene import builtin, io as scene_io

QUICK = "--quick" in sys.argv
OUT = os.path.dirname(os.path.abspath(__file__))

CASES = [
    # (name, width, height, passes, depth)
    ("example_simple", 800, 450, 16, 10),
    ("test_scene", 800, 450, 16, 10),
    ("metal_glass_room", 800, 450, 24, 16),
    ("test_comprehensive", 800, 500, 16, 10),
    ("gpu_showcase", 800, 450, 24, 12),
    ("demo_cornell", 512, 512, 24, 12),
    ("demo_showcase", 800, 450, 24, 12),
    ("demo_mesh", 800, 450, 24, 8),
]


def load(name):
    p = builtin.find_scene(name)
    if p:
        return scene_io.load(p)
    return builtin.builtin_scene(name)


def main():
    import subprocess
    import time

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=OUT, timeout=10,
        ).stdout.strip()
    except Exception:  # noqa: BLE001 — stamp is best-effort
        commit = "unknown"
    manifest = {"_generated": {"date": time.strftime("%Y-%m-%d"), "commit": commit}}
    for name, w, h, passes, depth in CASES:
        if QUICK:
            w, h, passes = w // 4, h // 4, 2
        sc = load(name)
        if sc is None:
            print(f"skip {name}: not found", file=sys.stderr)
            continue
        r = pt.Renderer(contract="gpu", seed=7)
        img = r.render(sc, pt.RenderConfig(w, h, passes, depth))
        out = os.path.join(OUT, f"{name}.png")
        pt.save_png(out, img)
        s = r.stats
        manifest[name] = {
            "resolution": f"{w}x{h}",
            "passes": s.passes,
            "samples_per_pixel": s.samples_per_pixel,
            "max_depth": depth,
            "wall_seconds": round(s.wall_seconds, 2),
            "mrays_per_sec": round(s.mrays_per_sec, 1),
            "image_mean": round(float(img.mean()), 2),
        }
        print(f"{name}: {s.wall_seconds:.1f}s, {s.mrays_per_sec:.1f} Mrays/s", file=sys.stderr)
    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest, indent=1))


if __name__ == "__main__":
    main()
