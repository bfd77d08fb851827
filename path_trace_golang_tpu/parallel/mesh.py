"""Multi-chip scale-out: shard_map over a ("px", "spp") device mesh.

The reference's only parallelism is data-parallel pixels (goroutine tile
queue, renderer.go:114-163; 16x16 GL workgroups, gpu.go:2221-2223) plus
progressive sample passes (gpu.go:2214-2218).  The TPU-native mapping
(SURVEY.md §2.3):

* **px axis** — pixels sharded across devices.  Zero collectives during a
  pass (pixels are independent); the accumulation buffer lives sharded.
* **spp axis** — sample passes sharded: each spp-shard renders the same
  pixels with a different counter seed and one ``psum`` over ICI merges
  the per-pass sums into the accumulation buffer.

Both axes compose: a (P, S) mesh renders P pixel shards x S simultaneous
passes per dispatch.  Multi-slice DCN scale-out is embarrassingly parallel
by tile and needs no further communication.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..integrator import TraceConfig, trace_config_for_scene
from ..render import RenderConfig, RenderStats, trace_pass_lanes
from ..post import finalize_cpu_contract, finalize_gpu_contract
from ..scene.model import Scene
from ..soa import ScenePack, pack_scene
from ..utils import config as env_config

__all__ = ["make_mesh", "MeshRenderer"]


def make_mesh(
    n_px: Optional[int] = None, n_spp: int = 1, devices=None
) -> Mesh:
    """Build a ("px", "spp") mesh.  Defaults to all local devices on px."""
    devices = devices if devices is not None else jax.devices()
    if n_px is None:
        n_px = len(devices) // n_spp
    if n_px * n_spp > len(devices):
        raise ValueError(
            f"mesh {n_px}x{n_spp} needs {n_px * n_spp} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[: n_px * n_spp]).reshape(n_px, n_spp)
    return Mesh(dev, axis_names=("px", "spp"))


@partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "tcfg",
        "width",
        "height",
        "n_strata",
        "samples",
        "has_aperture",
        "normalize_pass",
        "n_pad",
    ),
    donate_argnames=("accum",),
)
def _sharded_pass(
    accum,
    pack: ScenePack,
    base_seed,
    pass_base,
    *,
    mesh: Mesh,
    tcfg: TraceConfig,
    width: int,
    height: int,
    n_strata: int,
    samples: int,
    has_aperture: bool,
    normalize_pass: bool,
    n_pad: int,
):
    """One dispatch: every (px, spp) shard traces its pixel block for its
    own pass seed; per-pass sums are psum'd over "spp" into the sharded
    accumulation buffer."""
    n_px = mesh.shape["px"]
    n_spp = mesh.shape["spp"]
    block = n_pad // n_px

    def shard_fn(accum_blk, pack_rep):
        ip = lax.axis_index("px")
        isp = lax.axis_index("spp")
        idx = ip * block + jnp.arange(block, dtype=jnp.int32)
        # each spp shard renders a distinct pass (seed = base + pass id)
        frame_seed = (base_seed + (pass_base + isp)).astype(jnp.uint32)
        col, segs = trace_pass_lanes(
            pack_rep,
            frame_seed,
            idx,
            tcfg=tcfg,
            width=width,
            height=height,
            n_strata=n_strata,
            samples=samples,
            has_aperture=has_aperture,
            normalize_pass=normalize_pass,
        )
        col = lax.psum(col, "spp")  # merge simultaneous passes over ICI
        segs = lax.psum(segs, ("px", "spp"))
        return accum_blk + col, segs

    accum, segs = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("px", None), P()),  # accum sharded on px; scene replicated
        out_specs=(P("px", None), P()),
        check_vma=False,
    )(accum, pack)
    return accum, segs


class MeshRenderer:
    """Progressive renderer over a device mesh.

    Per dispatch it advances ``n_spp`` passes at once (one per spp shard).
    Pixel rows are sharded over "px".  The lane RNG is keyed by
    (x, y, pass) — not by device placement — so the *sample set* matches
    the single-chip renderer exactly; pixel values agree statistically but
    not bitwise, because XLA compiles different fusion/FMA schedules for
    different program shapes and a 1-ulp difference can flip a
    Fresnel/roulette branch into a different (equally valid) path.
    Re-running the same mesh program with the same seed IS bit-stable.
    """

    def __init__(
        self,
        mesh: Optional[Mesh] = None,
        contract: str = "gpu",
        normalize_pass: bool = False,
        seed: int = 1,
        faithful_fog: bool = False,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.contract = contract
        self.normalize_pass = normalize_pass
        self.seed = seed
        self.faithful_fog = faithful_fog
        self.stats = RenderStats()

    def render(
        self,
        sc: Scene,
        cfg: RenderConfig,
        progress: Optional[Callable[[int, np.ndarray], None]] = None,
    ) -> np.ndarray:
        import time

        t0 = time.perf_counter()
        w, h = cfg.width, cfg.height
        n = w * h
        n_px = self.mesh.shape["px"]
        n_spp = self.mesh.shape["spp"]
        n_pad = -(-n // n_px) * n_px

        pack = pack_scene(sc, w, h)
        tcfg = trace_config_for_scene(
            pack, sc, cfg.max_depth, self.contract, faithful_fog=self.faithful_fog
        )
        has_aperture = sc.camera.aperture > 0
        if self.contract == "gpu":
            n_strata, samples = 4, 16
        else:
            n_strata, samples = 1, 1

        sharding = NamedSharding(self.mesh, P("px", None))
        accum = jax.device_put(jnp.zeros((n_pad, 3), jnp.float32), sharding)
        pack_rep = jax.device_put(
            pack, jax.tree_util.tree_map(lambda _: NamedSharding(self.mesh, P()), pack)
        )

        passes = max(1, cfg.samples_per_px)
        dispatches = -(-passes // n_spp)
        total_passes = dispatches * n_spp  # rounded up to whole dispatches
        update_every = max(1, dispatches // 10)
        total_segs = jnp.zeros((), jnp.float32)  # i32 overflows on long renders

        for d in range(dispatches):
            accum, segs = _sharded_pass(
                accum,
                pack_rep,
                jnp.uint32(self.seed),
                jnp.uint32(d * n_spp),
                mesh=self.mesh,
                tcfg=tcfg,
                width=w,
                height=h,
                n_strata=n_strata,
                samples=samples,
                has_aperture=has_aperture,
                normalize_pass=self.normalize_pass,
                n_pad=n_pad,
            )
            total_segs = total_segs + segs.astype(jnp.float32)
            if progress is not None and ((d % update_every) == update_every - 1 or d == dispatches - 1):
                progress((d + 1) * n_spp, self._finalize(accum, (d + 1) * n_spp, w, h, n))

        img = self._finalize(accum, total_passes, w, h, n)
        self.stats = RenderStats(
            passes=total_passes,
            samples_per_pixel=total_passes * samples,
            ray_segments=int(total_segs),
            wall_seconds=time.perf_counter() - t0,
        )
        return img

    def _finalize(self, accum, count, w, h, n):
        flat = np.asarray(accum)[:n].reshape(h, w, 3)
        if self.contract == "gpu":
            dn = env_config.get_denoise_config()
            return np.asarray(
                finalize_gpu_contract(
                    jnp.asarray(flat),
                    jnp.asarray(count),
                    denoise=dn.enabled,
                    denoise_sigma_s=dn.sigma_s,
                    denoise_sigma_r=dn.sigma_r,
                )
            )
        return np.asarray(finalize_cpu_contract(jnp.asarray(flat), jnp.asarray(count)))
