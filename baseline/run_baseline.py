"""Measure the reference-CPU-build baseline via the C++ proxy.

The image has no Go toolchain (BASELINE.md attempt log), so the Go CPU
build (cmd/render -headless) is stood in for by baseline/cpu_proxy.cpp — a
line-faithful C++17 port of the same hot path (renderer.go:286-404,
materials.go:74-224, objects.go, camera.go) with the same NumCPU-thread /
32x32-tile worker model.  C++ -O2 is, if anything, GENEROUS to the Go
baseline (no GC, faster RNG), so speedup claims derived from it are
conservative.

Runs the five reference scene configs (BASELINE.md) plus the headline
config (gpu_showcase @1080p, projected to 1024 true samples/px) and writes
baseline/results.json.

Usage: python baseline/run_baseline.py [--quick]
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF_SCENES = "/root/reference/scenes"
PROXY = os.path.join(HERE, "cpu_proxy")

# (scene, W, H, spp, depth) — per-scene settings from the JSON files
# (SURVEY.md §6); metal_glass_room has zero settings => preview mode
# defaults (util.go:35-40).
CONFIGS = [
    ("example_simple", 400, 225, 20, 10),
    ("test_scene", 1920, 1080, 1, 10),
    ("metal_glass_room", 400, 225, 20, 20),
    ("test_comprehensive", 400, 250, 20, 10),
    ("gpu_showcase", 800, 450, 1, 12),
]

# Headline: gpu_showcase @1080p.  Measured at a reduced spp and projected
# linearly (Monte-Carlo cost is exactly linear in spp).
HEADLINE = ("gpu_showcase", 1920, 1080, 4, 12)
HEADLINE_TARGET_SPP = 1024  # true samples/px (= 64 of our 16-strata passes)


def build() -> None:
    if os.path.exists(PROXY) and os.path.getmtime(PROXY) >= os.path.getmtime(
        os.path.join(HERE, "cpu_proxy.cpp")
    ):
        return
    subprocess.run(
        [
            "g++", "-O2", "-march=native", "-std=c++17",
            "-o", PROXY, os.path.join(HERE, "cpu_proxy.cpp"), "-lpthread",
        ],
        check=True,
    )


def export(scene: str) -> str:
    out = os.path.join(HERE, f"{scene}.txt")
    if not os.path.exists(out):
        subprocess.run(
            [sys.executable, os.path.join(HERE, "export_scene.py"),
             os.path.join(REF_SCENES, f"{scene}.json"), out],
            check=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
    return out


def run(scene_txt: str, w: int, h: int, spp: int, depth: int, threads: int) -> dict:
    out = subprocess.run(
        [PROXY, scene_txt, str(w), str(h), str(spp), str(depth), str(threads)],
        check=True,
        capture_output=True,
        text=True,
    )
    return json.loads(out.stdout.strip())


def main() -> int:
    quick = "--quick" in sys.argv
    build()
    ncpu = os.cpu_count() or 1
    results = {"host_ncpu": ncpu, "configs": [], "headline": None}

    for scene, w, h, spp, depth in CONFIGS:
        txt = export(scene)
        run_spp = max(1, spp // 4) if quick else spp
        r = run(txt, w, h, run_spp, depth, ncpu)
        scale = spp / run_spp
        r["scene"] = scene
        r["config_spp"] = spp
        r["projected_secs"] = round(r["secs"] * scale, 3)
        results["configs"].append(r)
        print(
            f"{scene:20s} {w}x{h} spp={spp} depth={depth}: "
            f"{r['mrays']:.2f} Mrays/s ({ncpu} thr), "
            f"wall-clock {r['projected_secs']:.1f}s",
            file=sys.stderr,
        )

    scene, w, h, spp, depth = HEADLINE
    txt = export(scene)
    r = run(txt, w, h, 1 if quick else spp, depth, ncpu)
    measured_spp = 1 if quick else spp
    per_sample = r["secs"] / measured_spp
    r["scene"] = scene
    r["measured_spp"] = measured_spp
    r["projected_secs_1024spp"] = round(per_sample * HEADLINE_TARGET_SPP, 1)
    results["headline"] = r
    print(
        f"HEADLINE {scene} @{w}x{h}: {r['mrays']:.2f} Mrays/s ({ncpu} thr); "
        f"projected wall-clock to {HEADLINE_TARGET_SPP} true spp: "
        f"{r['projected_secs_1024spp']:.0f}s",
        file=sys.stderr,
    )

    with open(os.path.join(HERE, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["headline"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
