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
from .. import render as render_mod
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
        "n_passes",
        "chunk",
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
    n_passes: int = 1,
    chunk: int = 0,
):
    """One dispatch: every (px, spp) shard traces its pixel block for its
    own pass window; per-pass sums are psum'd over "spp" into the sharded
    accumulation buffer.

    ``n_passes`` widens the per-shard regeneration window (each spp shard
    renders ``n_passes`` consecutive passes, so one dispatch advances
    ``n_spp * n_passes`` passes).  ``chunk`` (0 = whole block) bounds the
    lanes in flight per trace so a 1080p shard doesn't materialize all of
    its state at once — the single-chip driver's chunking, inside the
    shard."""
    n_px = mesh.shape["px"]
    n_spp = mesh.shape["spp"]
    block = n_pad // n_px
    csize = block if chunk <= 0 else min(chunk, block)
    n_chunks = -(-block // csize)

    def shard_fn(accum_blk, pack_rep):
        ip = lax.axis_index("px")
        isp = lax.axis_index("spp")
        # each spp shard renders a distinct window of passes
        # (seed = base + pass id; pass ids [pass_base + isp*n_passes, ...))
        frame_seed = (base_seed + (pass_base + isp * n_passes)).astype(jnp.uint32)
        cols = []
        segs = jnp.zeros((), jnp.int32)
        for c in range(n_chunks):
            lo = c * csize
            hi = min(lo + csize, block)
            idx = ip * block + lo + jnp.arange(hi - lo, dtype=jnp.int32)
            col_c, seg_c = trace_pass_lanes(
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
                n_passes=n_passes,
            )
            cols.append(col_c)
            segs = segs + seg_c
        col = cols[0] if n_chunks == 1 else jnp.concatenate(cols, axis=0)
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
        chunk: int = 0,
        checkpoint_path: Optional[str] = None,
        checkpoint_keep: Optional[int] = None,
    ):
        import os

        self.mesh = mesh if mesh is not None else make_mesh()
        self.contract = contract
        self.normalize_pass = normalize_pass
        self.seed = seed
        self.faithful_fog = faithful_fog
        self.chunk = chunk
        self.checkpoint_path = checkpoint_path or os.environ.get(
            "PATHTRACER_CHECKPOINT", ""
        ) or None
        if checkpoint_keep is None:
            checkpoint_keep = int(os.environ.get("PATHTRACER_CHECKPOINT_KEEP", "0") or 0)
        self.checkpoint_keep = checkpoint_keep
        self.stats = RenderStats()

    def render(
        self,
        sc: Scene,
        cfg: RenderConfig,
        progress: Optional[Callable[[int, np.ndarray], None]] = None,
        cancel: Optional[Callable[[], bool]] = None,
    ) -> np.ndarray:
        import os
        import time

        from ..integrator import regen_enabled
        from ..utils import checkpoint as ckpt_mod
        from ..utils import metrics as metrics_mod

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

        # pass-window batching composes with spp sharding: one dispatch
        # advances n_spp * window passes (render.py's windowing, per shard)
        window = 1
        if regen_enabled(tcfg):
            window = max(1, int(os.environ.get("PATHTRACER_PASS_WINDOW", "8")))
        passes = max(1, cfg.samples_per_px)
        # a dispatch advances n_spp * window passes; never overshoot the
        # requested pass count by more than the n_spp round-up
        window = max(1, min(window, -(-passes // n_spp)))
        if progress is not None or cancel is not None or self.checkpoint_path:
            # interactive: cap the window so dispatches keep the ~10%
            # update / cancellation cadence
            window = max(1, min(window, passes // max(1, 10 * n_spp)))
        per_dispatch = n_spp * window
        dispatches = -(-passes // per_dispatch)
        update_every = max(1, dispatches // 10)
        total_passes = dispatches * per_dispatch  # rounded up to whole dispatches
        total_segs = jnp.zeros((), jnp.float32)  # i32 overflows on long renders

        sharding = NamedSharding(self.mesh, P("px", None))
        pack_rep = jax.device_put(
            pack, jax.tree_util.tree_map(lambda _: NamedSharding(self.mesh, P()), pack)
        )

        # --- checkpoint / resume (parity with render.Renderer) ---
        digest = (
            ckpt_mod.scene_digest(sc, cfg, self.contract, self.normalize_pass, samples)
            + f":mesh{n_px}x{n_spp}w{window}"
        )
        start_dispatch = 0
        accum = None
        if self.checkpoint_path:
            ck = ckpt_mod.load_checkpoint(self.checkpoint_path, keep=self.checkpoint_keep)
            if (
                ck is not None
                and ck.compatible_with(digest)
                and ck.seed == self.seed
                and ck.accum.shape == (n_pad, 3)
                and ck.passes % per_dispatch == 0
                and ck.passes < total_passes
            ):
                accum = jax.device_put(jnp.asarray(ck.accum), sharding)
                start_dispatch = ck.passes // per_dispatch
        if accum is None:
            accum = jax.device_put(jnp.zeros((n_pad, 3), jnp.float32), sharding)

        nonfinite = 0
        completed = start_dispatch
        # Dynamic-walk scenes: sync per dispatch for the same documented
        # hazard Renderer.render guards against — queued multi-second walk
        # dispatches would push the next host sync past the RPC deadline
        # and kill the worker (render.max_chunk_lanes).
        walk_capped = render_mod.max_chunk_lanes(sc) < (1 << 62)
        for d in range(start_dispatch, dispatches):
            accum, segs = _sharded_pass(
                accum,
                pack_rep,
                jnp.uint32(self.seed),
                jnp.uint32(d * per_dispatch),
                mesh=self.mesh,
                tcfg=tcfg,
                width=w,
                height=h,
                n_strata=n_strata,
                samples=samples,
                has_aperture=has_aperture,
                normalize_pass=self.normalize_pass,
                n_pad=n_pad,
                n_passes=window,
                # dynamic-walk scenes cap the per-trace lane count (libtpu
                # fault above ~1536x128 lanes — see render.max_chunk_lanes)
                chunk=min(self.chunk or (1 << 62), render_mod.max_chunk_lanes(sc)),
            )
            if walk_capped:
                jax.block_until_ready(accum)
            total_segs = total_segs + segs.astype(jnp.float32)
            completed = d + 1
            if (d % update_every) == update_every - 1 or d == dispatches - 1:
                nonfinite = int(metrics_mod.nonfinite_count(accum))
                done_passes = completed * per_dispatch
                if self.checkpoint_path:
                    ckpt_mod.save_checkpoint(
                        self.checkpoint_path,
                        ckpt_mod.Checkpoint(
                            accum=np.asarray(accum),
                            passes=done_passes,
                            seed=self.seed,
                            digest=digest,
                            width=w,
                            height=h,
                        ),
                        keep=self.checkpoint_keep,
                    )
                if progress is not None:
                    progress(done_passes, self._finalize(accum, done_passes, w, h, n, preview=True))
            if cancel is not None and cancel():
                break

        done_passes = completed * per_dispatch
        img = self._finalize(accum, max(done_passes, 1), w, h, n)
        self.stats = RenderStats(
            passes=done_passes,
            samples_per_pixel=done_passes * samples,
            ray_segments=int(total_segs),
            wall_seconds=time.perf_counter() - t0,
            nonfinite=nonfinite,
            resumed_from=start_dispatch * per_dispatch,
        )
        return img

    def _finalize(self, accum, count, w, h, n, preview: bool = False):
        from ..post import box_smooth

        flat = np.asarray(accum)[:n].reshape(h, w, 3)
        if self.contract == "gpu":
            if preview:
                # progress frames skip denoise/smooth (gpu.go:2291-2293)
                return np.asarray(
                    finalize_gpu_contract(jnp.asarray(flat), jnp.asarray(count), denoise=False)
                )
            dn = env_config.get_denoise_config()
            u8 = finalize_gpu_contract(
                jnp.asarray(flat),
                jnp.asarray(count),
                denoise=dn.enabled,
                denoise_sigma_s=dn.sigma_s,
                denoise_sigma_r=dn.sigma_r,
            )
            sm = env_config.get_smooth_config()
            if not preview and sm.enabled and sm.radius > 0 and sm.strength > 0:
                u8 = box_smooth(u8, sm.radius, sm.strength)
            return np.asarray(u8)
        return np.asarray(finalize_cpu_contract(jnp.asarray(flat), jnp.asarray(count)))
