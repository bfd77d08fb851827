"""Render orchestration: progressive passes, accumulation, streaming.

Re-design of the reference's two render drivers:

* ``renderOnce`` (gpu.go:1799-2528): per-pass progressive dispatch with an
  on-device accumulation buffer, periodic tonemapped readback (~every 10%
  of passes) and final denoise/smooth.
* ``renderIntoCPU`` (renderer.go:44-246): tile-queue workers — on TPU the
  tile queue becomes a flat lane dimension processed in fixed-size chunks,
  all pixels in a chunk in flight simultaneously.

One pass == one dispatch of the compute kernel with ``uSamplesPerPx = 1``
(gpu.go:2214-2218).  Faithfully to the shader's stratified-sampling
arithmetic (gpu.go:1683-1730), a 1-spp dispatch actually takes **16
stratified samples whose SUM is accumulated and counted as one sample** —
the accumulated mean is 16x the physical radiance, and ACES tonemapping is
applied to that (this is the single largest brightness-defining behavior
of the reference; see PHYSICS.md Q1).  Set ``normalize_pass=True`` for a
physically-normalized render instead.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .integrator import TraceConfig, trace, trace_config_for_scene
from .ops.camera import camera_rays
from .ops.rng import LaneRng, seed_lanes
from .post import box_smooth, finalize_cpu_contract, finalize_gpu_contract
from .scene.model import RenderSettings, Scene
from .soa import ScenePack, pack_scene
from .utils import config as env_config

__all__ = [
    "RenderConfig",
    "RenderStats",
    "Renderer",
    "render_into",
    "render_scene",
    "render_settings_for_mode",
    "set_backend",
    "get_backend",
    "BACKEND_CPU",
    "BACKEND_GPU",
]

_F = jnp.float32

# Backend switch parity (internal/engine/backend.go:5-28).  Both contracts
# execute on the TPU; the names select the *physics contract* the backend
# implemented in the reference.
BACKEND_CPU = "cpu"
BACKEND_GPU = "gpu"
_backend = BACKEND_CPU

# Decorrelation constant for the fog estimate's independent counter stream
# (see pass_body_grid): golden-ratio bits, any fixed odd constant works.
FOG_STREAM_XOR = 0x9E3779B9


@partial(jax.jit, static_argnums=0)
def _device_zeros(n_pad: int):
    """Fresh (n_pad, 3) f32 zeros materialized ON DEVICE.

    Eager ``jnp.zeros`` on the remote (axon) backend builds the array on
    the host and uploads it — 88-110 ms of the measured fixed per-render
    cost at 512x512 (PERF.md round 4 phase table).  A jitted constant
    program writes the zeros device-side: one dispatch, no transfer."""
    return jnp.zeros((n_pad, 3), dtype=jnp.float32)


@partial(jax.jit, static_argnames=("n", "h", "w"))
def _crop_grid(accum, n: int, h: int, w: int):
    """Un-pad the (n_pad, 3) accumulator to the (h, w, 3) pixel grid.

    Jitted so the finalize path issues NO eager ops: on the remote
    backend every eager op is its own uncached program compile on first
    use (part of the measured first-render warmup) and its own dispatch
    round-trip every render thereafter."""
    return lax.slice(accum, (0, 0), (n, 3)).reshape(h, w, 3)


@partial(jax.jit, donate_argnames=("buf",))
def _zero_into(buf):
    """Zero a RECYCLED accumulator in place (donated input: the output
    reuses the buffer's device allocation — no 3 MB re-allocation)."""
    return jnp.zeros_like(buf)


# finished renders park their (donated-chain) accumulator here, keyed by
# padded lane count; the next same-shape render re-zeros it in place
# instead of allocating fresh device zeros (~0.1 s on the tunnel)
_ACCUM_POOL: dict = {}


def max_chunk_lanes(sc: Scene) -> int:
    """Per-dispatch lane cap for this scene.

    Scenes whose triangle count routes to the hybrid dynamic BVH walk
    (ops/bvh.py) are capped at 512 rows per dispatch: the walk's
    worst-case time per dispatch is bounded (jump budget + lockstep
    tail, PERF.md round 3) but scales with rows through the tail's
    vector work — 512 rows keeps a pathological dispatch in the ~20 s
    range, safely under the tunnel/runtime RPC deadline that kills the
    worker ("TPU worker process crashed", how this surfaced), while
    amortizing the jump phase's per-packet scalar syncs over as many
    lanes as possible."""
    from .ops import bvh as bvh_mod

    # Mirrors pack_scene's eligibility rules exactly (soa.py): triangles
    # need >=3 vertices; meshes need non-empty vertices AND faces — so the
    # cap never engages for scenes that pack zero (or few) triangles.
    n_tris = 0
    for o in sc.objects:
        if o.type == "triangle" and o.vertices and len(o.vertices) >= 3:
            n_tris += 1
        elif o.type == "mesh" and o.mesh:
            verts = o.mesh.get("vertices") or ()
            faces = o.mesh.get("faces") or ()
            if len(verts) and len(faces):
                n_tris += len(faces)
    if n_tris and bvh_mod.use_dynamic_walk(n_tris):
        # The cap exists only to keep one dispatch under the tunnel RPC
        # deadline; every dispatch also costs a host sync (round trip).
        # Round 5 raised it 512 -> 2048 rows after the walk sped up ~5x
        # (in-process A/B: 3.0 -> 5.0 Mrays/s on the 10k-tri bench; a
        # full 2048-row depth-8 dispatch runs ~1.6 s, far under the
        # deadline).  Env-tunable in rows; 0 = uncapped (also drops the
        # per-dispatch sync).
        rows = int(os.environ.get("PATHTRACER_DISPATCH_CAP_ROWS", "2048") or 0)
        return rows * 128 if rows > 0 else (1 << 62)
    return 1 << 62


def set_backend(b: str) -> None:
    global _backend
    if b not in (BACKEND_CPU, BACKEND_GPU):
        raise ValueError(f"unknown backend {b!r}")
    _backend = b


def get_backend() -> str:
    return _backend


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Internal render parameters (engine.RenderConfig, renderer.go:17-22)."""

    width: int
    height: int
    samples_per_px: int
    max_depth: int


@dataclasses.dataclass
class RenderStats:
    passes: int = 0
    samples_per_pixel: int = 0
    ray_segments: int = 0
    wall_seconds: float = 0.0
    nonfinite: int = 0  # non-finite accum entries at last check (SURVEY.md §5)
    resumed_from: int = 0  # passes restored from a checkpoint

    @property
    def mrays_per_sec(self) -> float:
        if self.wall_seconds <= 0:
            return 0.0
        return self.ray_segments / self.wall_seconds / 1e6


def render_settings_for_mode(mode: str) -> RenderSettings:
    """Mode presets (util.go:25-42): final 1920x1080/1000spp/depth 80,
    preview 400x225/20spp/depth 20."""
    if mode == "final":
        return RenderSettings(width=1920, height=1080, samples_per_px=1000, max_depth=80)
    return RenderSettings(width=400, height=225, samples_per_px=20, max_depth=20)


# ---------------------------------------------------------------------------
# Per-pass device kernel
# ---------------------------------------------------------------------------


def pass_body_grid(
    pack: ScenePack,
    frame_seed,
    px,
    py,
    *,
    tcfg: TraceConfig,
    width: int,
    height: int,
    n_strata: int,
    samples: int,
    has_aperture: bool,
    normalize_pass: bool,
    trace_fn,
    active=None,
    n_passes: int = 1,
):
    """One full progressive pass on pixel-coordinate lane grids.

    Sample loop follows the shader's main() (gpu.go:1673-1732): per sample,
    draw the stratum jitter, build the camera ray, trace, sum; plus the
    fog-once-per-pass estimate (PHYSICS.md D6) when configured.
    ``trace_fn(orig, dirv, state) -> (rad, state, segs)`` injects the trace
    backend, so this body is shared by the XLA driver, the shard_map
    multi-chip driver, and the whole-pass Pallas kernel (which calls it
    with the in-kernel trace function).  Returns (col V3, segs i32).
    """
    from .integrator import fog_prepass_grid, pass_regen_gpu, regen_enabled
    from .ops.vec import V3

    shape = px.shape
    state0 = seed_lanes(px, py, frame_seed)

    inv_w = _F(1.0) / _F(width - 1 if width > 1 else 1)
    inv_h = _F(1.0) / _F(height - 1 if height > 1 else 1)
    fy = (_F(height - 1) - py.astype(jnp.float32))
    pxf = px.astype(jnp.float32)

    fog_once = tcfg.enable_fog_march and not tcfg.fog_in_trace
    col_pre = V3.zeros(shape)
    if fog_once:
        # One fog march per pass (PHYSICS.md D6): estimate the in-scatter
        # term on a single jittered primary ray and weight it by the
        # sample count — same expectation as the reference's per-sample
        # march at ~1/16 the cost.  The march draws from its OWN counter
        # stream (frame_seed ^ FOG_STREAM_XOR) instead of advancing the
        # trace state, so per-lane trace chains are identical whether
        # passes run one-at-a-time, in a window, or spp-sharded across
        # devices — sharding cannot change the image beyond fp scheduling.
        def fog_pass(p, acc):
            fs = jnp.asarray(frame_seed, jnp.uint32) + p.astype(jnp.uint32)
            rng0 = LaneRng(seed_lanes(px, py, fs ^ jnp.uint32(FOG_STREAM_XOR)))
            jx = rng0.next()
            jy = rng0.next()
            u0 = (pxf + jx) * inv_w
            v0 = (fy + jy) * inv_h
            fog_o, fog_d = camera_rays(u0, v0, pack.cam, width, height, rng0, has_aperture, pack.lens_disk)
            fog_rad, _fog_state = fog_prepass_grid(fog_o, fog_d, rng0.state, pack)
            return acc + fog_rad * _F(samples)

        if n_passes == 1:
            col_pre = fog_pass(jnp.int32(0), col_pre)
        else:
            # loop, don't unroll: a window of 8 unrolled fog marches was
            # ~26 s of client-side trace+lower alone at 1080p (plus the
            # matching XLA compile blowup); the accumulation order is
            # identical, so images are bit-equal to the unrolled form.
            # The f32-mul zero init keeps the Mosaic carry layout
            # concrete (see integrator.pass_regen_gpu's note).
            zf = pxf * _F(0.0)
            col_pre = lax.fori_loop(0, n_passes, fog_pass, V3(zf, zf, zf))
        if active is not None:
            col_pre = V3.where(active, col_pre, V3.zeros(shape))

    if regen_enabled(tcfg):
        # Merged sample+bounce loop with per-lane path regeneration: the
        # straggler-proof schedule for deep bounce budgets (see
        # integrator.pass_regen_gpu).  Ignores trace_fn — the physics is
        # traced inline against this pack (inside the Pallas kernel the
        # pack's tables are the kernel refs).
        col, _state, segs = pass_regen_gpu(
            pack,
            px,
            py,
            state0,
            cfg=tcfg,
            width=width,
            height=height,
            n_strata=n_strata,
            samples=samples,
            has_aperture=has_aperture,
            frame_seed=frame_seed,
            n_passes=n_passes,
            col_init=col_pre,
            active=active,
        )
        if normalize_pass:
            # keep accum in "per-pass sum" units: the driver bumps the
            # pass count by n_passes for a window dispatch
            col = col * _F(1.0 / samples)
        return col, segs

    if n_passes != 1:
        raise ValueError("n_passes > 1 requires the regeneration loop (gpu contract)")

    def sample_body(s, carry):
        state, col, segs = carry
        rng = LaneRng(state)
        jx = rng.next()
        jy = rng.next()
        if n_strata > 1:
            sx = (s % n_strata).astype(jnp.float32)
            sy = (s // n_strata).astype(jnp.float32)
            su = (sx + jx) * _F(1.0 / n_strata)
            sv = (sy + jy) * _F(1.0 / n_strata)
        else:
            su, sv = jx, jy
        u = (pxf + su) * inv_w
        v = (fy + sv) * inv_h
        orig, dirv = camera_rays(u, v, pack.cam, width, height, rng, has_aperture, pack.lens_disk)
        rad, new_state, seg = trace_fn(orig, dirv, rng.state)
        return new_state, col + rad, segs + seg

    _state, col, segs = lax.fori_loop(
        0, samples, sample_body, (state0, col_pre, jnp.zeros((), jnp.int32))
    )
    if normalize_pass:
        col = col * _F(1.0 / samples)
    return col, segs


def trace_pass_lanes(
    pack: ScenePack,
    frame_seed,
    idx,
    *,
    tcfg: TraceConfig,
    width: int,
    height: int,
    n_strata: int,
    samples: int,
    has_aperture: bool,
    normalize_pass: bool,
    n_passes: int = 1,
):
    """Trace one full pass for the given flat pixel indices ``idx`` (i32[N]).

    Routes to the whole-pass Pallas kernel on TPU when eligible, else runs
    the shared pass body with the per-sample trace dispatcher.
    Returns (col f32[N,3], segments i32).
    """
    import os

    from .integrator import trace_grid
    from .ops import pallas_trace
    from .ops.vec import LANE, V3

    n = idx.shape[0]
    rows = -(-n // LANE)
    if rows > 8:
        # multiples of 8 sublanes keep padded grids Pallas-eligible
        # (Mosaic block-shape rule, ops/pallas_trace.pallas_supported)
        rows = -(-rows // 8) * 8
    n_pad = rows * LANE

    # Mesh scenes on the in-kernel gather walk run WIDE lane rows
    # (rows/G, G*128): each per-row gather round then serves G*128 lanes,
    # amortizing the walk's pop/early-stop/while overhead G-fold — the
    # row-grouping win with no in-kernel reshape (which miscompiles under
    # Mosaic, PERF.md round 4).  Flat lane order is preserved, so the
    # physics is untouched; only the vreg layout changes.
    lane_w = LANE
    from .ops import bvh as bvh_mod

    # Default 1 (off): measured a 13% LOSS on the 10k-tri bench (2.7 vs
    # 3.1 Mrays/s same-session) — per-round gather/test work scales with
    # width while only the pop/loop overhead amortizes, and rounds per
    # group = max wanted over G*128 lanes > the per-128 max.  Kept
    # env-gated: it IS correct (unlike the in-kernel reshape) and may pay
    # at other page counts.
    wide = int(os.environ.get("PATHTRACER_WIDE_LANES", "1") or 0)
    if (
        wide > 1
        and pack.n_triangles
        and bvh_mod.use_dynamic_walk(pack.n_triangles)
        and rows % wide == 0
        and (rows // wide) % 8 == 0
        and os.environ.get("PATHTRACER_NO_PALLAS", "") not in ("1", "true", "on")
        and pallas_trace.pallas_supported((rows // wide, wide * LANE), pack, tcfg, None)
    ):
        lane_w = wide * LANE
        rows //= wide

    if n_pad != n:
        idx = jnp.pad(idx, (0, n_pad - n))
        active = (jnp.arange(n_pad) < n).reshape(rows, lane_w)
    else:
        active = None
    grid_idx = idx.reshape(rows, lane_w)
    px = grid_idx % width
    py = grid_idx // width

    kwargs = dict(
        tcfg=tcfg,
        width=width,
        height=height,
        n_strata=n_strata,
        samples=samples,
        has_aperture=has_aperture,
        normalize_pass=normalize_pass,
        n_passes=n_passes,
    )

    if (
        os.environ.get("PATHTRACER_NO_PALLAS", "") not in ("1", "true", "on")
        and pallas_trace.pallas_supported((rows, lane_w), pack, tcfg, active)
    ):
        col, segs = pallas_trace.render_pass_pallas(
            pack, frame_seed, px, py, active=active, **kwargs
        )
    else:
        col, segs = pass_body_grid(
            pack,
            frame_seed,
            px,
            py,
            trace_fn=lambda o, d, s: trace_grid(o, d, s, pack, tcfg, active),
            active=active,
            **kwargs,
        )
    col_rows = jnp.stack(
        [col.x.reshape(n_pad), col.y.reshape(n_pad), col.z.reshape(n_pad)], axis=-1
    )[:n]
    return col_rows, segs


@partial(
    jax.jit,
    static_argnames=("tcfg", "width", "height", "n_strata", "samples", "has_aperture", "chunk", "normalize_pass", "n_passes"),
    donate_argnames=("accum",),
)
def _render_pass_chunk(
    accum,
    pack: ScenePack,
    frame_seed,
    start,
    *,
    tcfg: TraceConfig,
    width: int,
    height: int,
    n_strata: int,
    samples: int,
    has_aperture: bool,
    chunk: int,
    normalize_pass: bool,
    n_passes: int = 1,
):
    """Trace one pass window for ``chunk`` consecutive lanes; add into accum."""
    idx = start + jnp.arange(chunk, dtype=jnp.int32)
    col, segs = trace_pass_lanes(
        pack,
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
    cur = lax.dynamic_slice(accum, (start, jnp.int32(0)), (chunk, 3))
    accum = lax.dynamic_update_slice(accum, cur + col, (start, jnp.int32(0)))
    return accum, segs


# ---------------------------------------------------------------------------
# Renderer
# ---------------------------------------------------------------------------


class Renderer:
    """Progressive path-trace renderer.

    ``contract`` None means "follow the global backend switch".
    ``progress`` callbacks receive ``(pass_index, u8_image[H,W,3])`` roughly
    every 10% of passes (gpu.go:2209-2212), replacing the reference's Fyne
    canvas refresh with tile streaming (SURVEY.md §5 checkpoint analog).
    """

    def __init__(
        self,
        contract: Optional[str] = None,
        chunk: Optional[int] = None,
        normalize_pass: bool = False,
        seed: int = 1,
        faithful_fog: Optional[bool] = None,
        checkpoint_path: Optional[str] = None,
        checkpoint_keep: Optional[int] = None,
        metrics_sink=None,
    ):
        self.contract = contract
        self.chunk = chunk or env_config.get_chunk_size()
        self.normalize_pass = normalize_pass
        self.seed = seed
        if faithful_fog is None:
            faithful_fog = os.environ.get("PATHTRACER_FAITHFUL_FOG", "") in ("1", "true", "on")
        self.faithful_fog = faithful_fog
        self.checkpoint_path = checkpoint_path or os.environ.get("PATHTRACER_CHECKPOINT", "") or None
        if checkpoint_keep is None:
            checkpoint_keep = int(os.environ.get("PATHTRACER_CHECKPOINT_KEEP", "0") or 0)
        self.checkpoint_keep = checkpoint_keep
        self.metrics_sink = metrics_sink
        self.stats = RenderStats()

    def render(
        self,
        sc: Scene,
        cfg: RenderConfig,
        progress: Optional[Callable[[int, np.ndarray], None]] = None,
        cancel: Optional[Callable[[], bool]] = None,
    ) -> np.ndarray:
        contract = self.contract or get_backend()
        if contract == BACKEND_GPU:
            try:
                return self._render(sc, cfg, BACKEND_GPU, progress, cancel)
            except Exception as e:  # GPU->CPU fallback (renderer.go:250-263)
                import sys

                if os.environ.get("PATHTRACER_NO_FALLBACK", "") in ("1", "true", "on"):
                    # honesty toggle for CI/bench: a compile or runtime
                    # regression in the gpu contract must FAIL, not
                    # silently demote every render to the slow contract
                    raise
                print(
                    f"GPU-contract render error: {e}\nFalling back to CPU contract.",
                    file=sys.stderr,
                )
                return self._render(sc, cfg, BACKEND_CPU, progress, cancel)
        return self._render(sc, cfg, contract, progress, cancel)

    def _render(self, sc, cfg, contract, progress, cancel) -> np.ndarray:
        t0 = time.perf_counter()
        # PATHTRACER_TIME_PHASES=1: print a per-render phase-time table
        # (diagnostics; inserts device syncs at phase boundaries, so the
        # totals it reports are slightly pessimistic vs a normal render)
        _tp = os.environ.get("PATHTRACER_TIME_PHASES", "") in ("1", "true", "on")
        _marks: list = []

        def _mark(name, sync=None):
            if _tp:
                if sync is not None:
                    jax.block_until_ready(sync)
                _marks.append((name, time.perf_counter()))

        w, h = cfg.width, cfg.height
        n = w * h
        lane_cap = max_chunk_lanes(sc)
        chunk = min(self.chunk, max(n, 1), lane_cap)
        n_chunks = -(-n // chunk)
        n_pad = n_chunks * chunk
        # Dynamic-walk scenes also sync per dispatch: queueing many
        # multi-second walk dispatches makes the next host sync block for
        # minutes, which trips the tunnel/runtime RPC deadline and kills
        # the worker (PERF.md round 3); one ~0.25 ms sync per dispatch is
        # noise next to the walks themselves.
        sync_each_chunk = lane_cap < (1 << 62)

        pack = pack_scene(sc, w, h)
        _mark("pack_scene")
        tcfg = trace_config_for_scene(
            pack, sc, cfg.max_depth, contract, faithful_fog=self.faithful_fog
        )
        _mark("trace_config")
        has_aperture = sc.camera.aperture > 0

        if contract == BACKEND_GPU:
            n_strata, samples = 4, 16  # shader strata arithmetic at 1 spp/pass
        else:
            n_strata, samples = 1, 1

        passes = max(1, cfg.samples_per_px)
        # progress cadence: the reference GPU driver reads back every
        # ~10% of passes (gpu.go:2229); its CPU renderer reports every
        # ~5% of tiles (renderer.go:226-235).  Our cpu contract streams
        # per-pass like the gpu one, so "~5% of the work" maps to every
        # ~5% of passes.
        update_every = max(1, passes // (20 if contract == BACKEND_CPU else 10))
        # f32 accumulator: per-pass counts are i32 (fits easily) but long
        # renders overflow 2^31 total segments; f32 rounding error here is
        # <= 16 segments per ~263M-segment pass — irrelevant for Mrays/s
        total_segs = jnp.zeros((), jnp.float32)

        # --- checkpoint / exact resume (SURVEY.md §5) ---
        from .utils import checkpoint as ckpt_mod
        from .utils import metrics as metrics_mod

        digest = ckpt_mod.scene_digest(sc, cfg, contract, self.normalize_pass, samples)
        start_pass = 0
        accum = None
        if self.checkpoint_path:
            ck = ckpt_mod.load_checkpoint(self.checkpoint_path, keep=self.checkpoint_keep)
            if (
                ck is not None
                and ck.compatible_with(digest)
                and ck.seed == self.seed
                and ck.accum.shape == (n_pad, 3)
                and ck.passes < passes
            ):
                accum = jnp.asarray(ck.accum)
                start_pass = ck.passes
        if accum is None:
            pooled = _ACCUM_POOL.pop(n_pad, None)
            accum = _zero_into(pooled) if pooled is not None else _device_zeros(n_pad)
        _mark("accum_init", sync=accum)

        metrics = metrics_mod.MetricsLog(sink=self.metrics_sink)
        nonfinite = 0

        def current_image(accum, count):
            flat = _crop_grid(accum, n, h, w)
            if contract == BACKEND_GPU:
                dn = env_config.get_denoise_config()
                u8 = finalize_gpu_contract(
                    flat,
                    jnp.asarray(count),
                    denoise=dn.enabled,
                    denoise_sigma_s=dn.sigma_s,
                    denoise_sigma_r=dn.sigma_r,
                )
                sm = env_config.get_smooth_config()
                if sm.enabled and sm.radius > 0 and sm.strength > 0:
                    u8 = box_smooth(u8, sm.radius, sm.strength)
                return u8
            return finalize_cpu_contract(flat, jnp.asarray(count))

        def preview_image(accum, count):
            # progress frames skip denoise/smooth (gpu.go:2291-2293)
            flat = _crop_grid(accum, n, h, w)
            if contract == BACKEND_GPU:
                return finalize_gpu_contract(flat, jnp.asarray(count), denoise=False)
            return finalize_cpu_contract(flat, jnp.asarray(count))

        # Pass-window batching: with the regeneration loop, several
        # progressive passes can run in ONE dispatch — the per-window idle
        # tail (lanes waiting on the block's last path) is then amortized
        # over `window` passes.  Interactive use (progress / cancel /
        # checkpoint) caps the window at the update cadence so streaming
        # and cancellation latency keep the reference's ~10% granularity.
        from .integrator import regen_enabled

        window = 1
        if regen_enabled(tcfg):
            window = max(1, int(os.environ.get("PATHTRACER_PASS_WINDOW", "8")))
            if progress is not None or cancel is not None or self.checkpoint_path:
                window = min(window, update_every)

        # Surveillance laziness: the per-interval nonfinite count and
        # segment total each cost a BLOCKING scalar readback (a full
        # device-link round-trip — ~0.1 s of the measured 0.32 s fixed
        # per-render cost on the tunnel, PERF.md round 4).  When nothing
        # observes intervals mid-render (no metrics sink/file, no
        # checkpoint, no progress callback), skip them entirely and fold
        # the whole surveillance read into ONE batched device_get with
        # the final image; the failure-detection contract (SURVEY.md §5)
        # is unchanged — every render still ends with a nonfinite count
        # in RenderStats and a final MetricsLog record.
        observed = (
            metrics.sink is not None
            or bool(getattr(metrics, "_path", ""))
            or bool(self.checkpoint_path)
            or progress is not None
        )

        completed = start_pass
        p = start_pass
        while p < passes:
            nw = min(window, passes - p)
            frame_seed = jnp.uint32(self.seed + p)
            for c in range(n_chunks):
                accum, segs = _render_pass_chunk(
                    accum,
                    pack,
                    frame_seed,
                    jnp.int32(c * chunk),
                    tcfg=tcfg,
                    width=w,
                    height=h,
                    n_strata=n_strata,
                    samples=samples,
                    has_aperture=has_aperture,
                    chunk=chunk,
                    normalize_pass=self.normalize_pass,
                    n_passes=nw,
                )
                total_segs = total_segs + segs.astype(jnp.float32)
                if sync_each_chunk:
                    jax.block_until_ready(accum)
            p += nw
            completed = p
            _mark(f"pass_window@{p}", sync=accum)
            if observed and ((p % update_every) < nw or p == passes):
                nonfinite = int(metrics_mod.nonfinite_count(accum))
                metrics.interval(p, int(total_segs), nonfinite)
                _mark(f"interval@{p}")
                if self.checkpoint_path:
                    ckpt_mod.save_checkpoint(
                        self.checkpoint_path,
                        ckpt_mod.Checkpoint(
                            accum=np.asarray(accum),
                            passes=p,
                            seed=self.seed,
                            digest=digest,
                            width=w,
                            height=h,
                        ),
                        keep=self.checkpoint_keep,
                    )
                if progress is not None:
                    progress(p, np.asarray(preview_image(accum, p)))
            if cancel is not None and cancel():
                break

        if observed:
            img = np.asarray(current_image(accum, max(completed, 1)))
            segs_total = int(total_segs)
        else:
            # one batched transfer: device_get starts async host copies
            # for every leaf before blocking, so image + surveillance
            # scalars ride one link round-trip instead of three
            img, nf_v, segs_v = jax.device_get(
                (
                    current_image(accum, max(completed, 1)),
                    metrics_mod.nonfinite_count(accum),
                    total_segs,
                )
            )
            img = np.asarray(img)
            nonfinite = int(nf_v)
            segs_total = int(segs_v)
            metrics.interval(completed, segs_total, nonfinite)
        _mark("final_fetch")
        _ACCUM_POOL[n_pad] = accum  # recycle for the next same-shape render
        if _tp and _marks:
            import sys

            prev = t0
            for name, tm in _marks:
                print(f"  phase {name:<18} {(tm - prev) * 1e3:8.1f} ms", file=sys.stderr)
                prev = tm
        wall = time.perf_counter() - t0
        self.stats = RenderStats(
            passes=completed,
            samples_per_pixel=completed * samples,
            ray_segments=segs_total,
            wall_seconds=wall,
            nonfinite=nonfinite,
            resumed_from=start_pass,
        )
        self.metrics = metrics
        return img


# ---------------------------------------------------------------------------
# Facade API (engine/util.go parity)
# ---------------------------------------------------------------------------


def render_into(
    sc: Scene,
    cfg: RenderConfig,
    progress: Optional[Callable[[int, np.ndarray], None]] = None,
) -> np.ndarray:
    """RenderInto analog (renderer.go:34-41): honors the backend switch."""
    return Renderer().render(sc, cfg, progress=progress)


def render_scene(sc: Scene, settings: RenderSettings) -> np.ndarray:
    """RenderScene analog (util.go:13-22)."""
    cfg = RenderConfig(
        width=settings.width,
        height=settings.height,
        samples_per_px=settings.samples_per_px,
        max_depth=settings.max_depth,
    )
    return render_into(sc, cfg)
