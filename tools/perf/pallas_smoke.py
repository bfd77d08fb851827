"""TPU smoke: Pallas kernel path vs XLA path, bit-exact checks.

Covers the two eligibility extensions the XLA-only CPU suite cannot:
  * padded grids (active masks) through trace() / render_one_pass
  * the per-lane gather BVH traversal vs the dense page sweep

Usage: python tools/perf/pallas_smoke.py  (on the TPU host)
Exits nonzero on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import numpy as np


def main() -> int:
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()

    import path_trace_golang_tpu as pt
    from path_trace_golang_tpu import integrator as integ
    from path_trace_golang_tpu.scene import load
    from path_trace_golang_tpu.soa import pack_scene

    sc = load("/root/reference/scenes/example_simple.json")
    pack = pack_scene(sc, 64, 64)
    ok = True

    # --- padded trace(): N=1000 is not a multiple of 128 (8 rows minus
    # 24 lanes) — must route through the kernel AND match the XLA path
    n = 1000
    r = np.random.RandomState(7)
    orig = np.tile(np.array([[0.0, 1.0, 4.0]], np.float32), (n, 1))
    dirv = r.uniform(-1, 1, (n, 3)).astype(np.float32)
    dirv /= np.linalg.norm(dirv, axis=1, keepdims=True)
    state = np.arange(n, dtype=np.uint32) * 2654435761 + 1
    cfg = integ.TraceConfig(contract="gpu", max_depth=6)

    import jax.numpy as jnp

    args = (jnp.asarray(orig), jnp.asarray(dirv), jnp.asarray(state))
    rad_k, st_k, seg_k = jax.jit(
        lambda o, d, s: integ.trace(o, d, s, pack, cfg)
    )(*args)

    os.environ["PATHTRACER_NO_PALLAS"] = "1"
    rad_x, st_x, seg_x = jax.jit(
        lambda o, d, s: integ.trace(o, d, s, pack, cfg), backend="tpu"
    )(*args)
    del os.environ["PATHTRACER_NO_PALLAS"]

    # States (RNG streams, i.e. every sampling decision) must be
    # bit-equal; radiance may differ at rounding level — Mosaic and XLA
    # schedule fma/rsqrt differently and 1-ULP deltas amplify through
    # GGX/fresnel chains (measured: <=1.1% rel on 2 of 1000 rays).
    st_eq = np.array_equal(np.asarray(st_k), np.asarray(st_x))
    rad_close = np.allclose(np.asarray(rad_k), np.asarray(rad_x), rtol=5e-2, atol=1e-5)
    seg_match = int(seg_k) == int(seg_x)
    print(
        f"padded trace(1000): states {'OK' if st_eq else 'FAIL'}, "
        f"radiance {'OK' if rad_close else 'FAIL'}, "
        f"segments {int(seg_k)} vs {int(seg_x)} {'OK' if seg_match else 'FAIL'}"
    )
    ok &= st_eq and rad_close and seg_match

    # --- full render through the driver: width*height not a lane multiple
    r1 = pt.Renderer(contract="gpu", seed=5)
    img_k = r1.render(sc, pt.RenderConfig(100, 70, 2, 6))
    os.environ["PATHTRACER_NO_PALLAS"] = "1"
    r2 = pt.Renderer(contract="gpu", seed=5)
    img_x = r2.render(sc, pt.RenderConfig(100, 70, 2, 6))
    del os.environ["PATHTRACER_NO_PALLAS"]
    same = np.array_equal(img_k, img_x)
    print(
        f"padded render(100x70): kernel-vs-XLA {'OK' if same else 'FAIL'} "
        f"(means {img_k.mean():.2f} vs {img_x.mean():.2f})"
    )
    ok &= same

    # --- mesh scene: gather traversal vs dense sweep (kernel path both)
    from tools.perf.bvh_bench import uv_sphere
    from path_trace_golang_tpu.scene import model as M

    verts, faces = uv_sphere(20, 16)  # 640 tris -> paged walk
    msc = M.Scene(
        camera=M.Camera(position=M.Vec3(0, 1.5, 4.5), target=M.Vec3(0, 1, 0), fov=50.0),
        materials=[
            M.Material(id="grey", type="lambert", albedo=M.Color(0.6, 0.6, 0.65)),
            M.Material(id="gold", type="metal", albedo=M.Color(0.9, 0.7, 0.3), smoothness=0.6),
            M.Material(id="sun", type="emissive", emit=M.Color(1, 0.95, 0.8), power=40.0),
        ],
        objects=[
            M.Object(id="floor", type="plane", material_id="grey", position=M.Vec3(0, 0, 0)),
            M.Object(id="blob", type="mesh", material_id="gold",
                     mesh={"vertices": [list(v) for v in verts], "faces": [list(f) for f in faces]}),
            M.Object(id="lamp", type="sphere_light", material_id="sun",
                     position=M.Vec3(3, 5, 2), size=M.Vec3(0.8, 0.8, 0.8)),
        ],
        # dim sky: the gpu contract's 16x stratification quirk saturates
        # bright scenes to near-white, which would make this bit-compare
        # insensitive — keep plenty of sub-255 pixels in frame
        sky=M.Sky(type="gradient", horizon=M.Color(0.06, 0.07, 0.09), zenith=M.Color(0.02, 0.03, 0.05)),
    )
    r3 = pt.Renderer(contract="gpu", seed=9)
    img_g = r3.render(msc, pt.RenderConfig(128, 128, 1, 6))
    os.environ["PATHTRACER_BVH_GATHER"] = "0"
    r4 = pt.Renderer(contract="gpu", seed=9)
    img_d = r4.render(msc, pt.RenderConfig(128, 128, 1, 6))
    del os.environ["PATHTRACER_BVH_GATHER"]
    same_m = np.array_equal(img_g, img_d)
    print(
        f"mesh render(128x128): gather-vs-dense {'OK' if same_m else 'FAIL'} "
        f"(means {img_g.mean():.2f} vs {img_d.mean():.2f})"
    )
    ok &= same_m

    print("PALLAS_SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
