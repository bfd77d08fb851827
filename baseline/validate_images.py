"""Image-level cross-validation: framework CPU contract vs the C++ proxy.

The proxy (baseline/cpu_proxy.cpp) is a line-faithful float64 port of the
reference's CPU hot path (renderer.go:286-404, materials.go:74-224,
objects.go:37-222, camera.go:19-74) and writes PPM images; this script
renders the same reference scenes through the framework's ``cpu``
physics contract and compares the two Monte-Carlo estimates
statistically (the oracle methodology, SURVEY.md §4): the RNG streams
differ, so the comparison is per-channel global means plus per-block
means within sampling error — not bitwise.

This closes the one fidelity loop the NumPy oracle cannot: the oracle is
in-repo and same-author; the proxy is the closest obtainable stand-in
for the reference Go binary in this image (BASELINE.md attempt log).

Usage: python baseline/validate_images.py [--quick]
Writes baseline/validate_images.json; exits nonzero on any failure.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# Pin to host CPU before any backend initializes: the image's
# sitecustomize force-sets jax_platforms="axon,cpu", so the env var
# alone is not enough (see tests/conftest.py), and the float64 cpu
# contract belongs on the host anyway.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

REF_SCENES = "/root/reference/scenes"
PROXY = os.path.join(HERE, "cpu_proxy")

# (scene, W, H, spp, depth).  Sizes are small and spp high enough that
# per-block sampling error stays a few u8 counts; the proxy is fast.
CONFIGS = [
    ("example_simple", 160, 90, 96, 8),
    ("metal_glass_room", 160, 90, 96, 12),
    ("test_comprehensive", 160, 100, 96, 8),
]

BLOCK = 10  # compare per-(10x10 px) block means


def proxy_render(scene: str, w: int, h: int, spp: int, depth: int) -> np.ndarray:
    """Render via the C++ proxy; returns u8 [h, w, 3]."""
    from run_baseline import build, export  # noqa: E402

    build()
    txt = export(scene)
    ppm = os.path.join(HERE, f"{scene}_{w}x{h}.ppm")
    subprocess.run(
        [PROXY, txt, str(w), str(h), str(spp), str(depth), str(os.cpu_count() or 1), ppm],
        check=True,
        capture_output=True,
    )
    with open(ppm, "rb") as f:
        assert f.readline().strip() == b"P6"
        dims = f.readline().split()
        assert [int(dims[0]), int(dims[1])] == [w, h]
        assert f.readline().strip() == b"255"
        data = np.frombuffer(f.read(), np.uint8)
    return data.reshape(h, w, 3)


def framework_render(scene: str, w: int, h: int, spp: int, depth: int) -> np.ndarray:
    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu import scene as S

    sc = S.load(os.path.join(REF_SCENES, f"{scene}.json"))
    r = pt.Renderer(contract="cpu", seed=29)
    return r.render(sc, pt.RenderConfig(width=w, height=h, samples_per_px=spp, max_depth=depth))


def compare(ours: np.ndarray, theirs: np.ndarray, spp: int) -> dict:
    """Statistical comparison of two u8 renders of the same scene.

    Returns a dict of stats with an 'ok' verdict.  Thresholds follow
    tests/test_oracle.py: global channel means within 5% (abs floor 2
    u8 counts), per-block means with median relative error < 8% and
    >= 85% of blocks within 25%.
    """
    a = ours.astype(np.float64)
    b = theirs.astype(np.float64)
    h, w = a.shape[:2]
    bh, bw = h // BLOCK, w // BLOCK
    ab = a[: bh * BLOCK, : bw * BLOCK].reshape(bh, BLOCK, bw, BLOCK, 3).mean(axis=(1, 3))
    bb = b[: bh * BLOCK, : bw * BLOCK].reshape(bh, BLOCK, bw, BLOCK, 3).mean(axis=(1, 3))
    rel = np.abs(ab - bb) / np.maximum(np.abs(bb), 0.15 * np.abs(bb).mean())

    chan = []
    ok = True
    for ch in range(3):
        am, bm = a[..., ch].mean(), b[..., ch].mean()
        dev = abs(am - bm) / max(abs(bm), 1.0)
        chan.append({"ours": round(am, 2), "proxy": round(bm, 2), "rel": round(dev, 4)})
        if dev > 0.05 and abs(am - bm) > 2.0:
            ok = False
    med = float(np.median(rel))
    frac25 = float((rel < 0.25).mean())
    if med >= 0.08 or frac25 <= 0.85:
        ok = False
    return {
        "ok": ok,
        "channels": chan,
        "block_rel_median": round(med, 4),
        "block_frac_within_25pct": round(frac25, 4),
    }


def main() -> int:
    quick = "--quick" in sys.argv
    results = {"block": BLOCK, "cases": []}
    failed = False
    for scene, w, h, spp, depth in CONFIGS:
        if quick:
            spp = max(16, spp // 4)
        theirs = proxy_render(scene, w, h, spp, depth)
        ours = framework_render(scene, w, h, spp, depth)
        stats = compare(ours, theirs, spp)
        stats.update({"scene": scene, "w": w, "h": h, "spp": spp, "depth": depth})
        results["cases"].append(stats)
        print(
            f"{scene:20s} {w}x{h}@{spp}spp d{depth}: "
            f"{'OK  ' if stats['ok'] else 'FAIL'} "
            f"block median {stats['block_rel_median']:.3f}, "
            f"within-25% {stats['block_frac_within_25pct']:.2f}, "
            f"means {[c['ours'] for c in stats['channels']]} vs "
            f"{[c['proxy'] for c in stats['channels']]}",
            file=sys.stderr,
        )
        failed |= not stats["ok"]

    with open(os.path.join(HERE, "validate_images.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"ok": not failed, "cases": len(results["cases"])}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.path.insert(0, HERE)
    sys.exit(main())
