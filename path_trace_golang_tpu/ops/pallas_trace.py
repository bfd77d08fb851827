"""Pallas TPU kernel: the full wavefront bounce loop, VMEM-resident.

The XLA path compiles the bounce body into several large fusions whose
carried state round-trips HBM on every `while` iteration (profiled at
~20-25% VPU utilization).  This kernel runs the WHOLE per-lane path-trace
loop for a block of lanes inside one Pallas program: ray state lives in
VMEM/registers across bounces, the tiny scene tables (materials, objects,
camera/sky/fog blocks) sit in SMEM for scalar access, and each block's
``while`` exits as soon as *its* lanes are all dead — a free, coarse form
of wavefront compaction (blocks covering sky or emissive regions stop
after 1-2 bounces).

The kernel body **reuses the exact integrator code** (`_trace_gpu` /
`_trace_cpu` from integrator.py): Pallas kernels are traced jnp programs,
so the physics lives in one place and this module only changes where the
bytes live.  Requirements for eligibility (checked by `pallas_supported`):
TPU backend, row count divisible by the block size, <= 8 lights (the >8
subset path gathers dynamically).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..soa import ScenePack
from .vec import LANE, V3

__all__ = ["trace_grid_pallas", "render_pass_pallas", "pallas_supported", "BLOCK_ROWS"]

# Lanes per block = BLOCK_ROWS * 128.  Small blocks keep the while-loop
# carry manageable (Mosaic unrolls block rows into (8,128) vregs — very
# large blocks explode compile time and registers; 256 rows fails to
# compile) and give per-block early exit when a block's paths all die.
# Swept on v5e at 1080p/gpu_showcase: 8->231ms, 16->191ms, 32->186ms,
# 64->200ms per 262k-lane chunk-pass.
BLOCK_ROWS = 32


def pallas_supported(shape, pack: ScenePack, cfg, active) -> bool:
    """Static eligibility check for the Pallas fast path."""
    if active is not None:
        return False
    if len(shape) != 2 or shape[1] != LANE:
        return False
    if shape[0] % _block_rows(shape, getattr(cfg, "max_depth", 12)) != 0:
        return False
    if pack.n_lights > 8:  # dynamic light-subset path gathers per lane
        return False
    if pack.n_triangles > 128:  # SMEM + Mosaic instr budget for the BVH unroll
        return False
    if jax.default_backend() not in ("tpu",):  # includes axon-canonical tpu
        return False
    return True


def _block_rows(shape, max_depth: int = 12) -> int:
    # Deep-bounce configs (the reference's 'final' preset runs depth 80+
    # with russian roulette only in the last 3 bounces) are dominated by
    # straggler paths that keep a whole block's while-loop alive; smaller
    # blocks let early exit reclaim them (measured 100x wall-clock skew at
    # depth 80 with 32-row blocks).
    r = shape[0]
    br = min(BLOCK_ROWS if max_depth <= 24 else 8, r)
    while r % br:
        br //= 2
    return max(br, 1)


def trace_grid_pallas(orig: V3, dirv: V3, state, pack: ScenePack, cfg):
    """Pallas-backed drop-in for integrator.trace_grid (gpu/cpu contracts).

    Returns (radiance V3, new_state, segments i32 scalar).
    """
    from .. import integrator as integ

    shape = orig.x.shape
    rows = shape[0]
    br = _block_rows(shape, cfg.max_depth)
    n_blocks = rows // br

    trace_fn = integ._trace_cpu if cfg.contract == "cpu" else integ._trace_gpu

    def kernel(
        mat_ref,
        obj_ref,
        light_ref,
        cam_ref,
        sky_ref,
        fog_ref,
        tri_ref,
        bvh_ref,
        ox_ref,
        oy_ref,
        oz_ref,
        dx_ref,
        dy_ref,
        dz_ref,
        st_ref,
        rx_ref,
        ry_ref,
        rz_ref,
        sto_ref,
        seg_ref,
    ):
        pack_k = dataclasses.replace(
            pack,
            mat=mat_ref,
            obj=obj_ref,
            light_idx=light_ref,
            cam=cam_ref,
            sky=sky_ref,
            fog=fog_ref,
            tri=tri_ref,
            bvh_bounds=bvh_ref,
        )
        o = V3(ox_ref[:], oy_ref[:], oz_ref[:])
        d = V3(dx_ref[:], dy_ref[:], dz_ref[:])
        rad, st, segs = trace_fn(o, d, st_ref[:], pack_k, cfg)
        rx_ref[:] = rad.x
        ry_ref[:] = rad.y
        rz_ref[:] = rad.z
        sto_ref[:] = st
        seg_ref[pl.program_id(0), 0] = segs

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    lane_in = pl.BlockSpec((br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lane_out = pl.BlockSpec((br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.uint32),
        jax.ShapeDtypeStruct((n_blocks, 1), jnp.int32),
    )
    rx, ry, rz, st_out, segs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            smem(),  # mat
            smem(),  # obj
            smem(),  # light_idx
            smem(),  # cam
            smem(),  # sky
            smem(),  # fog
            smem(),  # tri
            smem(),  # bvh_bounds
            lane_in,
            lane_in,
            lane_in,
            lane_in,
            lane_in,
            lane_in,
            lane_in,
        ],
        out_specs=(
            lane_out,
            lane_out,
            lane_out,
            lane_out,
            pl.BlockSpec((n_blocks, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=out_shape,
    )(
        pack.mat,
        pack.obj,
        pack.light_idx,
        pack.cam,
        pack.sky,
        pack.fog,
        pack.tri,
        pack.bvh_bounds,
        orig.x,
        orig.y,
        orig.z,
        dirv.x,
        dirv.y,
        dirv.z,
        state,
    )
    return V3(rx, ry, rz), st_out, jnp.sum(segs)


def render_pass_pallas(
    pack: ScenePack,
    frame_seed,
    px,
    py,
    *,
    tcfg,
    width: int,
    height: int,
    n_strata: int,
    samples: int,
    has_aperture: bool,
    normalize_pass: bool,
):
    """Whole-pass Pallas kernel: camera ray-gen, the 16-sample stratified
    loop, the fog-once estimate, and the full bounce loop all execute
    inside one program per lane block — no XLA<->kernel round trips within
    a pass.  Shares the exact pass body with the XLA driver
    (render.pass_body_grid).

    px/py: i32 pixel-coordinate lane grids.  Returns (col V3, segs i32).
    """
    from .. import integrator as integ
    from .. import render as render_mod

    shape = px.shape
    rows = shape[0]
    br = _block_rows(shape, tcfg.max_depth)
    n_blocks = rows // br

    trace_core = integ._trace_cpu if tcfg.contract == "cpu" else integ._trace_gpu

    def kernel(
        mat_ref,
        obj_ref,
        light_ref,
        cam_ref,
        sky_ref,
        fog_ref,
        tri_ref,
        bvh_ref,
        seed_ref,
        px_ref,
        py_ref,
        cx_ref,
        cy_ref,
        cz_ref,
        seg_ref,
    ):
        pack_k = dataclasses.replace(
            pack,
            mat=mat_ref,
            obj=obj_ref,
            light_idx=light_ref,
            cam=cam_ref,
            sky=sky_ref,
            fog=fog_ref,
            tri=tri_ref,
            bvh_bounds=bvh_ref,
        )
        col, segs = render_mod.pass_body_grid(
            pack_k,
            seed_ref[0],
            px_ref[:],
            py_ref[:],
            tcfg=tcfg,
            width=width,
            height=height,
            n_strata=n_strata,
            samples=samples,
            has_aperture=has_aperture,
            normalize_pass=normalize_pass,
            trace_fn=lambda o, d, s: trace_core(o, d, s, pack_k, tcfg),
        )
        cx_ref[:] = col.x
        cy_ref[:] = col.y
        cz_ref[:] = col.z
        seg_ref[pl.program_id(0), 0] = segs

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    lane_in = pl.BlockSpec((br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lane_out = pl.BlockSpec((br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct((n_blocks, 1), jnp.int32),
    )
    cx, cy, cz, segs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            smem(),  # mat
            smem(),  # obj
            smem(),  # light_idx
            smem(),  # cam
            smem(),  # sky
            smem(),  # fog
            smem(),  # tri
            smem(),  # bvh_bounds
            smem(),  # frame_seed
            lane_in,  # px
            lane_in,  # py
        ],
        out_specs=(
            lane_out,
            lane_out,
            lane_out,
            pl.BlockSpec((n_blocks, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=out_shape,
    )(
        pack.mat,
        pack.obj,
        pack.light_idx,
        pack.cam,
        pack.sky,
        pack.fog,
        pack.tri,
        pack.bvh_bounds,
        jnp.asarray([frame_seed]).astype(jnp.uint32),
        px,
        py,
    )
    return V3(cx, cy, cz), jnp.sum(segs)


def gpu_phase_pallas(carry, pack: ScenePack, cfg, d_end: int):
    """Pallas-backed resumable bounce phase (integrator.gpu_phase) for the
    deep-depth compaction driver: full lane state in and out, per-block
    early exit within the phase.  Uses small (8-row) blocks — phases exist
    precisely because stragglers dominate deep configs.
    """
    from .. import integrator as integ

    d0, o, dv, thr, rad, alive_i, st, gobj, gdist, segs = carry
    shape = o.x.shape
    rows = shape[0]
    br = min(8, rows)
    while rows % br:
        br //= 2
    n_blocks = rows // br

    def kernel(
        mat_ref,
        obj_ref,
        light_ref,
        cam_ref,
        sky_ref,
        fog_ref,
        tri_ref,
        bvh_ref,
        d0_ref,
        ox_ref, oy_ref, oz_ref,
        dx_ref, dy_ref, dz_ref,
        tx_ref, ty_ref, tz_ref,
        rx_ref, ry_ref, rz_ref,
        al_ref, st_ref, go_ref, gd_ref,
        oox, ooy, ooz,
        odx, ody, odz,
        otx, oty, otz,
        orx, ory, orz,
        oal, ost, ogo, ogd,
        oseg,
    ):
        pack_k = dataclasses.replace(
            pack,
            mat=mat_ref,
            obj=obj_ref,
            light_idx=light_ref,
            cam=cam_ref,
            sky=sky_ref,
            fog=fog_ref,
            tri=tri_ref,
            bvh_bounds=bvh_ref,
        )
        carry_k = (
            d0_ref[0],
            V3(ox_ref[:], oy_ref[:], oz_ref[:]),
            V3(dx_ref[:], dy_ref[:], dz_ref[:]),
            V3(tx_ref[:], ty_ref[:], tz_ref[:]),
            V3(rx_ref[:], ry_ref[:], rz_ref[:]),
            al_ref[:],
            st_ref[:],
            go_ref[:],
            gd_ref[:],
            jnp.zeros((), jnp.int32),
        )
        # d_end rides in as a traced scalar so every phase reuses ONE
        # compiled kernel
        out = integ.gpu_phase(carry_k, pack_k, cfg, d0_ref[1])
        (_d, o2, dv2, thr2, rad2, al2, st2, go2, gd2, seg2) = out
        oox[:] = o2.x
        ooy[:] = o2.y
        ooz[:] = o2.z
        odx[:] = dv2.x
        ody[:] = dv2.y
        odz[:] = dv2.z
        otx[:] = thr2.x
        oty[:] = thr2.y
        otz[:] = thr2.z
        orx[:] = rad2.x
        ory[:] = rad2.y
        orz[:] = rad2.z
        oal[:] = al2
        ost[:] = st2
        ogo[:] = go2
        ogd[:] = gd2
        oseg[pl.program_id(0), 0] = seg2

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    lane = lambda: pl.BlockSpec((br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731

    f32 = lambda: jax.ShapeDtypeStruct(shape, jnp.float32)  # noqa: E731
    out_shape = (
        f32(), f32(), f32(),  # orig
        f32(), f32(), f32(),  # dir
        f32(), f32(), f32(),  # throughput
        f32(), f32(), f32(),  # radiance
        jax.ShapeDtypeStruct(shape, jnp.int32),   # alive
        jax.ShapeDtypeStruct(shape, jnp.uint32),  # rng
        jax.ShapeDtypeStruct(shape, jnp.int32),   # glass obj
        f32(),                                     # glass dist
        jax.ShapeDtypeStruct((n_blocks, 1), jnp.int32),
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[smem()] * 9 + [lane()] * 16,
        out_specs=tuple([lane()] * 16)
        + (pl.BlockSpec((n_blocks, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),),
        out_shape=out_shape,
    )(
        pack.mat,
        pack.obj,
        pack.light_idx,
        pack.cam,
        pack.sky,
        pack.fog,
        pack.tri,
        pack.bvh_bounds,
        jnp.stack([jnp.asarray(d0, jnp.int32), jnp.asarray(d_end, jnp.int32)]),
        o.x, o.y, o.z,
        dv.x, dv.y, dv.z,
        thr.x, thr.y, thr.z,
        rad.x, rad.y, rad.z,
        alive_i, st, gobj, gdist,
    )
    (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz, al, st2, go, gd, seg_blocks) = outs
    return (
        jnp.int32(d_end),
        V3(ox, oy, oz),
        V3(dx, dy, dz),
        V3(tx, ty, tz),
        V3(rx, ry, rz),
        al,
        st2,
        go,
        gd,
        segs + jnp.sum(seg_blocks),
    )
