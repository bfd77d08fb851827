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
TPU backend, row count divisible by the block size, and the BVH tables
fitting the SMEM budget (~2k triangles; any light count is fine — the
>8-light window is a masked static unroll, ops/lights.py).
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
# 64->200ms per 262k-lane chunk-pass; re-swept in round 3 after the
# sincos change (w8 Mrays/s: 16->246, 32->253, 64->231) — 32 holds.
BLOCK_ROWS = 32
# BVH tables at or below this triangle count ride in SMEM (see kernels)
SMEM_TRI_MAX = 2048
# VMEM bytes budgeted to the limb-planed gather table.  The walk holds
# one round's test window + the table itself live; Mosaic's scoped-vmem
# default (16 MB) is raised via vmem_limit_bytes on the mesh kernels
# (VMEM_LIMIT).  Round 5 stores the limbs as f32 (2x the old bf16
# table: bf16 dynamic slices miscompile — ops/bvh.py table banner), so
# the budget doubles to keep the page ceiling: 32 MB admits ~1,160
# pages (~148k triangles) for plain meshes (A=14 deduped columns),
# ~700 pages (~90k) for smooth ones (A=23), with the windowed per-round
# loads (bvh.GATHER_WINDOW pages, not P_pad) well inside the remaining
# scoped headroom under VMEM_LIMIT.
GATHER_VMEM_BUDGET = 32 << 20
# Scoped-vmem ceiling requested for mesh-gather kernels (bytes).  v5e
# has 128 MB of VMEM per core; the Mosaic default budget is 16 MB to
# leave room for pipeline buffers — this kernel uses unblocked inputs
# and owns the core, so raising it is safe.
VMEM_LIMIT = 100 << 20


def _gather_mode(pack: ScenePack) -> bool:
    """Static: this scene's mesh routes to the per-lane gather walk, so
    the kernel reads page_gather and never touches tri / bvh_bounds /
    page_tiles (bvh.traverse_triangles_paged dispatch)."""
    from .bvh import use_dynamic_walk, gather_enabled

    return pack.n_triangles > 0 and use_dynamic_walk(pack.n_triangles) and (
        gather_enabled()
    )


def _compiler_params(pack: ScenePack):
    """Raise the Mosaic scoped-vmem ceiling for mesh-gather kernels
    (their per-round limb loads exceed the 16 MB default at ~30k+
    triangles — see VMEM_LIMIT); leave non-mesh kernels at the default
    scheduling regime."""
    if _gather_mode(pack):
        return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
    return None


def _mesh_tables(pack: ScenePack):
    """The (tri, bvh_bounds, page_tiles) arrays to ship into the kernel:
    the real tables, or 1-element dummies when the gather walk is the
    statically chosen traversal and never reads them — page_tiles alone
    costs P x 12 KB of VMEM that pure dead weight would otherwise pin."""
    if _gather_mode(pack):
        z = jnp.zeros((1, 1), jnp.float32)
        return z, z, jnp.zeros((1, 1, 1), jnp.float32)
    return pack.tri, pack.bvh_bounds, pack.page_tiles


def pallas_supported(shape, pack: ScenePack, cfg, active) -> bool:
    """Static eligibility check for the Pallas fast path.

    ``active`` padding masks ride into the kernel as one extra lane
    input (the integrator's trace_fn consumes them directly), so padded
    grids — the public ``trace()`` row-vector API — stay eligible.

    Lane rows may be WIDER than one native 128-lane vreg row (up to
    4x128): the render driver reshapes mesh-scene grids to (rows/G,
    G*128) at the kernel boundary so the per-lane BVH gather walk
    amortizes its per-round pop/loop overhead over G*128 lanes — the
    row-grouping win without any in-kernel reshape (the in-kernel
    (rows,128)->(rows/G,G*128) shape cast miscompiles under Mosaic;
    PERF.md round 4)."""
    if len(shape) != 2 or shape[1] % LANE or not LANE <= shape[1] <= 4 * LANE:
        return False
    br = _block_rows(shape, getattr(cfg, "max_depth", 12))
    if shape[0] % br != 0:
        return False
    # Mosaic lowering wants block sublanes divisible by 8 (or the whole
    # array); integrator.trace pads row counts to a multiple of 8
    if br % 8 != 0 and br != shape[0]:
        return False
    # VMEM budget for the BVH gather table: the limb-stacked bf16 table
    # (soa.page_gather, built by bvh.pack_gather_limbs) is the only
    # mesh array the gather walk reads — budget it directly against
    # ~16 MB/core VMEM, leaving headroom for lane state, the one-hot
    # matmul operands, and Mosaic spills.  Round 3's ceiling was 96
    # pages (~12k triangles) with the f32 table + in-kernel limb copies
    # live at once; precomputed limbs + dummied-out dead tables
    # (page_tiles/tri, unused by the gather walk) lift it ~4x.
    # Larger meshes fall back to the XLA path (ROADMAP: HBM-resident
    # pages DMA'd into a VMEM scratch remove this ceiling).
    if _gather_mode(pack):
        gt = pack.page_gather
        if gt.size * gt.dtype.itemsize > GATHER_VMEM_BUDGET:
            return False
    elif pack.n_triangles > 96 * 128:
        return False
    if jax.default_backend() not in ("tpu",):  # includes axon-canonical tpu
        return False
    return True


def _block_rows(shape, max_depth: int = 12, regen: bool = False) -> int:
    # Without path regeneration, deep-bounce configs (the reference's
    # 'final' preset runs depth 80+ with russian roulette only in the last
    # 3 bounces) are dominated by straggler paths that keep a whole
    # block's while-loop alive; smaller blocks let early exit reclaim
    # them.  With regeneration (integrator.pass_regen_gpu) block
    # iterations track the SUM of each lane's path lengths, which
    # concentrates — full-size blocks stay optimal at any depth.
    # Wide lane rows (shape[1] = G*128, mesh-gather scenes) keep the
    # LANE COUNT per block constant: fewer, wider sublane rows.
    wfac = max(shape[1] // LANE, 1)
    base = BLOCK_ROWS if (regen or max_depth <= 24) else 8
    base = max(base // wfac, 1)
    r = shape[0]
    br = min(base, r)
    while r % br:
        br //= 2
    return max(br, 1)


def trace_grid_pallas(orig: V3, dirv: V3, state, pack: ScenePack, cfg, active=None):
    """Pallas-backed drop-in for integrator.trace_grid (gpu/cpu contracts).

    ``active``: optional bool padding mask (True = live lane); rides in
    as one more lane input so padded grids keep the kernel path.
    Returns (radiance V3, new_state, segments i32 scalar).
    """
    from .. import integrator as integ

    shape = orig.x.shape
    rows = shape[0]
    br = _block_rows(shape, cfg.max_depth)
    n_blocks = rows // br

    trace_fn = integ._trace_cpu if cfg.contract == "cpu" else integ._trace_gpu
    tri_in, bvh_in, ptile_in = _mesh_tables(pack)

    def kernel(
        mat_ref,
        obj_ref,
        light_ref,
        cam_ref,
        sky_ref,
        fog_ref,
        tri_ref,
        bvh_ref,
        ptile_ref,
        pgat_ref,
        ox_ref,
        oy_ref,
        oz_ref,
        dx_ref,
        dy_ref,
        dz_ref,
        st_ref,
        *rest,
    ):
        if active is not None:
            act_ref, rest = rest[0], rest[1:]
        rx_ref, ry_ref, rz_ref, sto_ref, seg_ref = rest
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
            page_tiles=ptile_ref,
            page_gather=pgat_ref,
        )
        o = V3(ox_ref[:], oy_ref[:], oz_ref[:])
        d = V3(dx_ref[:], dy_ref[:], dz_ref[:])
        act = None if active is None else (act_ref[:] != 0)
        rad, st, segs = trace_fn(o, d, st_ref[:], pack_k, cfg, active=act)
        rx_ref[:] = rad.x
        ry_ref[:] = rad.y
        rz_ref[:] = rad.z
        sto_ref[:] = st
        seg_ref[pl.program_id(0), 0] = segs

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    # The static unrolled walk's tri/bounds tables ride in SMEM (they are
    # tiny: <= STATIC_TRI_MAX rows, scalar-fetched); the paged walk's
    # lane-width tables are vector-gathered and always live in VMEM.
    table = smem if pack.n_triangles <= SMEM_TRI_MAX else vmem
    lane_w = shape[1]
    lane_in = pl.BlockSpec((br, lane_w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lane_out = pl.BlockSpec((br, lane_w), lambda i: (i, 0), memory_space=pltpu.VMEM)

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
        compiler_params=_compiler_params(pack),
        in_specs=[
            smem(),  # mat
            smem(),  # obj
            smem(),  # light_idx
            smem(),  # cam
            smem(),  # sky
            smem(),  # fog
            table(),  # tri
            table(),  # bvh_bounds
            vmem(),  # page_tiles
            vmem(),  # page_gather
            lane_in,
            lane_in,
            lane_in,
            lane_in,
            lane_in,
            lane_in,
            lane_in,
        ]
        + ([lane_in] if active is not None else []),
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
        tri_in,
        bvh_in,
        ptile_in,
        pack.page_gather,
        orig.x,
        orig.y,
        orig.z,
        dirv.x,
        dirv.y,
        dirv.z,
        state,
        *(() if active is None else (active.astype(jnp.int32),)),
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
    n_passes: int = 1,
    active=None,
):
    """Whole-pass Pallas kernel: camera ray-gen, the stratified sample
    loop (or the merged regeneration loop, integrator.pass_regen_gpu), the
    fog-once estimate, and the full bounce loop all execute inside one
    program per lane block — no XLA<->kernel round trips within a pass.
    Shares the exact pass body with the XLA driver (render.pass_body_grid).
    ``n_passes > 1`` renders a whole window of progressive passes in one
    launch (regeneration loop only).

    px/py: i32 pixel-coordinate lane grids; ``active`` an optional bool
    padding mask riding in as one extra lane input.
    Returns (col V3, segs i32).
    """
    from .. import integrator as integ
    from .. import render as render_mod

    shape = px.shape
    rows = shape[0]
    br = _block_rows(shape, tcfg.max_depth, regen=integ.regen_enabled(tcfg))
    n_blocks = rows // br

    trace_core = integ._trace_cpu if tcfg.contract == "cpu" else integ._trace_gpu
    tri_in, bvh_in, ptile_in = _mesh_tables(pack)

    def kernel(
        mat_ref,
        obj_ref,
        light_ref,
        cam_ref,
        sky_ref,
        fog_ref,
        tri_ref,
        bvh_ref,
        ptile_ref,
        pgat_ref,
        seed_ref,
        px_ref,
        py_ref,
        *rest,
    ):
        if active is not None:
            act_ref, rest = rest[0], rest[1:]
        cx_ref, cy_ref, cz_ref, seg_ref = rest
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
            page_tiles=ptile_ref,
            page_gather=pgat_ref,
        )
        act = None if active is None else (act_ref[:] != 0)
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
            n_passes=n_passes,
            trace_fn=lambda o, d, s: trace_core(o, d, s, pack_k, tcfg, active=act),
            active=act,
        )
        cx_ref[:] = col.x
        cy_ref[:] = col.y
        cz_ref[:] = col.z
        seg_ref[pl.program_id(0), 0] = segs

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    # The static unrolled walk's tri/bounds tables ride in SMEM (they are
    # tiny: <= STATIC_TRI_MAX rows, scalar-fetched); the paged walk's
    # lane-width tables are vector-gathered and always live in VMEM.
    table = smem if pack.n_triangles <= SMEM_TRI_MAX else vmem
    lane_w = shape[1]
    lane_in = pl.BlockSpec((br, lane_w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lane_out = pl.BlockSpec((br, lane_w), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct((n_blocks, 1), jnp.int32),
    )
    cx, cy, cz, segs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        compiler_params=_compiler_params(pack),
        in_specs=[
            smem(),  # mat
            smem(),  # obj
            smem(),  # light_idx
            smem(),  # cam
            smem(),  # sky
            smem(),  # fog
            table(),  # tri
            table(),  # bvh_bounds
            vmem(),  # page_tiles
            vmem(),  # page_gather
            smem(),  # frame_seed
            lane_in,  # px
            lane_in,  # py
        ]
        + ([lane_in] if active is not None else []),
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
        tri_in,
        bvh_in,
        ptile_in,
        pack.page_gather,
        jnp.asarray([frame_seed]).astype(jnp.uint32),
        px,
        py,
        *(() if active is None else (active.astype(jnp.int32),)),
    )
    return V3(cx, cy, cz), jnp.sum(segs)


# NOTE: the round-1 "deep-depth compaction" experiment (phased bounce
# kernel + alive-first multi-operand lax.sort between phases) was removed:
# path regeneration (integrator.pass_regen_gpu) makes the deep-depth
# straggler problem disappear with zero data movement — measured 128.5
# Mrays/s at depth 80 on gpu_showcase@1080p vs 8.2 for 8-row blocks and
# 2.5 for the sort-based compaction it replaced.
