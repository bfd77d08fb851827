"""Microbench: where does the dense paged sweep's time go?

Runs a traversal-only Pallas kernel over one 10k-triangle paged table
with three loop variants, on coherent and incoherent packets:

* ``dense``   — the shipping loop: per-lane prepass + min-cursor while
                (skips unwanted pages) + dense (tri, ray) sweep.
* ``all``     — fori over ALL pages, unconditional fetch + sweep: no
                prepass, no cursor, no per-lane mask carries.  On
                incoherent packets (cursor visits ~all pages anyway) the
                dense-vs-all gap IS the cursor/carry overhead.
* ``fetch``   — fori over all pages, fetch only (accumulate one tile
                element), no sweep: isolates the dynamic-fetch cost.

Usage: python tools/perf/paged_probe.py [n_lat n_lon]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_trace_golang_tpu.ops import bvh as B
from path_trace_golang_tpu.ops.vec import LANE, V3

ROWS = 32
N_BLOCKS = 16


GATHER = False


PROBE_PACK = None


def build_table(n_lat=80, n_lon=64):
    from bvh_bench import uv_sphere

    verts, faces = uv_sphere(n_lat, n_lon)

    # a real ScenePack for the "real" variant (shipping traversal incl.
    # the material merge)
    global PROBE_PACK
    from path_trace_golang_tpu.soa import pack_scene
    from path_trace_golang_tpu.scene import model as M

    PROBE_PACK = pack_scene(
        M.Scene(
            camera=M.Camera(position=M.Vec3(0, 1.5, 4.5), target=M.Vec3(0, 1, 0)),
            materials=[M.Material(id="g", type="lambert", albedo=M.Color(0.6, 0.6, 0.65))],
            objects=[
                M.Object(id="b", type="mesh", material_id="g",
                         mesh={"vertices": [list(v) for v in verts],
                               "faces": [list(f) for f in faces]})
            ],
        ),
        512,
        512,
    )

    v = np.asarray(verts, np.float64)
    f = np.asarray(faces, np.int64)
    v0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - v0
    e2 = v[f[:, 2]] - v0
    t = len(f)
    paged, tiles, _bbox = B.build_paged_bvh(
        v0, e1, e2, np.zeros(t, np.int64), np.arange(t), np.zeros(t, bool), None
    )
    gather = B.build_gather_table(tiles, paged)
    return paged, jnp.asarray(tiles), jnp.asarray(gather)


def traversal_keys(variant, paged, tiles_ref, o, d):
    global B_gather
    B_gather = tiles_ref  # gather variant passes the gather table instead
    """Per-lane winner key for one block; mirrors traverse_triangles_paged
    minus the winner-resolve tail (keys only)."""
    t_min = jnp.float32(1e-3)
    big_t = o.x * 0.0 + jnp.float32(B._BIG_T)
    best_key0 = lax.bitcast_convert_type(big_t, jnp.int32) | jnp.int32(
        B._KEY_SLOT_MASK
    )
    n_pages = paged.n_pages

    if variant == "fetch":
        def body(p, carry):
            tile = tiles_ref[p]
            return carry + tile[0, 0].astype(jnp.int32)

        acc = lax.fori_loop(0, n_pages, body, jnp.int32(0))
        return best_key0 + acc  # data dependency so nothing is DCE'd

    if variant == "all":
        def body(p, best_key):
            tile = tiles_ref[p]
            return B._sweep_page_keys(
                tile, o, d, t_min, best_key, None, None, True
            )

        return lax.fori_loop(0, n_pages, body, best_key0)

    if variant == "real":
        # the SHIPPING closest-hit gather traversal, winner resolve and
        # state merge included (B_gather holds the gather table ref)
        fz = o.x * 0.0
        iz = fz.astype(jnp.int32)
        import dataclasses as _dc

        pack = _dc.replace(
            PROBE_PACK,
            page_gather=B_gather,
            page_tiles=B_gather,  # unused by the gather path
        )
        state = dict(
            best_t=fz + 1e20, best_m=iz, best_type=iz, best_mat=iz,
            best_mtyp=iz, b_rough=fz, b_ior=fz, b_smooth=fz, b_refl=fz,
            b_abss=fz, b_albedo=V3(fz, fz, fz), b_emit=V3(fz, fz, fz),
            b_absorb=V3(fz, fz, fz), b_tint=V3(fz, fz, fz), nx=fz, ny=fz,
            nz=fz,
        )
        st, _v = B._traverse_gather(
            o, d, pack, t_min, state, exclude_obj=None, t_max=None, lite=False
        )
        return lax.bitcast_convert_type(st["best_t"], jnp.int32)

    if variant == "gather":
        # per-lane gather loop (keys only), mirroring _traverse_gather:
        # bf16-limb one-hot matmul, direction-aware pop, exact early-stop
        g_limbs = tuple(
            l[: B._A_TEST * B.PAGE_TRIS, :] for l in B._limb_views(B_gather)
        )
        p_pad = g_limbs[0].shape[1]
        ax = paged.sort_axis
        margin = jnp.float32(paged.sort_margin)
        o_ax, d_ax = (o.x, o.y, o.z)[ax], (d.x, d.y, d.z)[ax]
        center_fit = B._center_fit_of(paged)
        bwords, _splits = B._page_prepass_bucketed(
            o, d, V3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z), paged, t_min, big_t,
            fwd=d_ax >= 0,
        )
        sent = jnp.int32(n_pages)
        w_n = paged.mask_words
        nw = len(bwords) * w_n
        rows = o.x.shape[0]
        key_rows = []
        for s in range(rows):
            sl = lambda a: a[s : s + 1, :]  # noqa: E731
            o_r = V3(sl(o.x), sl(o.y), sl(o.z))
            d_r = V3(sl(d.x), sl(d.y), sl(d.z))
            fwd_r = sl(d_ax) >= 0
            inv_ax_r = jnp.float32(1.0) / sl(d_ax)
            o_ax_r = sl(o_ax)
            flat0 = [sl(w) for wb in bwords for w in wb]
            carry0 = tuple(flat0) + (sl(best_key0),)

            def cond(carry):
                w_any = carry[0]
                for w in carry[1:nw]:
                    w_any = w_any | w
                return jnp.max(w_any) > 0

            def body(carry):
                bws = [
                    list(carry[b * w_n : (b + 1) * w_n])
                    for b in range(len(bwords))
                ]
                bk = carry[nw]
                p_l, bws, selb = B._pop_bucketed(bws, sent, fwd_r, n_pages)
                page_key, c_ax, dev = B._gather_round(
                    g_limbs, p_l, p_pad, o_r, d_r, t_min, bk, None, None,
                    center_fit=center_fit,
                )
                nk = jnp.minimum(bk, page_key)
                t_entry = (c_ax - o_ax_r) * inv_ax_r - (margin + dev) * jnp.abs(
                    inv_ax_r
                )
                stop = t_entry > B._key_upper_t(nk)
                for b in range(len(bws)):
                    bws[b] = [
                        jnp.where(stop & selb[b], 0, w) for w in bws[b]
                    ]
                flat = [w for wb in bws for w in wb]
                return tuple(flat) + (nk,)

            out = lax.while_loop(cond, body, carry0)
            key_rows.append(out[nw])
        return jnp.concatenate(key_rows, axis=0)

    # dense: the shipping cursor loop
    inv = V3(1.0 / d.x, 1.0 / d.y, 1.0 / d.z)
    words = B._page_prepass(o, d, inv, paged, t_min, big_t)
    sent = jnp.int32(n_pages)
    p0 = jnp.min(B._next_wanted(words, sent))
    w_n = paged.mask_words
    carry0 = (p0,) + tuple(words) + (best_key0,)

    def cond(c):
        return c[0] < n_pages

    def body(c):
        p = c[0]
        words = list(c[1 : 1 + w_n])
        best_key = c[1 + w_n]
        tile = tiles_ref[p]
        best_key = B._sweep_page_keys(tile, o, d, t_min, best_key, None, None, True)
        for j in range(w_n):
            words[j] = words[j] & ~B._scalar_word_bit(p, j)
        p_next = jnp.min(B._next_wanted(words, sent))
        return (p_next,) + tuple(words) + (best_key,)

    out = lax.while_loop(cond, body, carry0)
    return out[1 + w_n]


REPS = 16


def make_fn(variant, paged, tiles):
    def kernel(ptile_ref, ox, oy, oz, dx, dy, dz, out_ref):
        d = V3(dx[:], dy[:], dz[:])

        def rep(i, key):
            # un-foldable zero: keeps a data dependency between reps so
            # the compiler cannot hoist or DCE the repeated traversal
            eps = jnp.where(key == jnp.int32(0x12345678), jnp.float32(1e-6), 0.0)
            o = V3(ox[:] + eps, oy[:], oz[:])
            return traversal_keys(variant, paged, ptile_ref, o, d)

        out_ref[:] = lax.fori_loop(0, REPS, rep, jnp.zeros(ox.shape, jnp.int32))

    lane = lambda: pl.BlockSpec(  # noqa: E731
        (ROWS, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    @jax.jit
    def run(o, d):
        return pl.pallas_call(
            kernel,
            grid=(N_BLOCKS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [lane()] * 6,
            out_specs=lane(),
            out_shape=jax.ShapeDtypeStruct((ROWS * N_BLOCKS, LANE), jnp.int32),
        )(tiles, o.x, o.y, o.z, d.x, d.y, d.z)

    return run


def packets(kind, seed=11):
    shape = (ROWS * N_BLOCKS, LANE)
    r = np.random.RandomState(seed)
    if kind == "incoherent":
        o = V3(*(jnp.asarray(r.uniform(-3, 3, shape).astype(np.float32)) for _ in range(3)))
        d = V3(*(jnp.asarray(r.uniform(-1, 1, shape).astype(np.float32)) for _ in range(3))).normalize()
    else:
        # camera-ish: common origin, directions in a narrow cone at the mesh
        o = V3(jnp.full(shape, 0.0), jnp.full(shape, 1.5), jnp.full(shape, 4.5))
        jit = np.linspace(-0.15, 0.15, shape[0] * LANE, dtype=np.float32).reshape(shape)
        d = V3(jnp.asarray(jit), jnp.asarray(jit * 0.5) - 0.1, -jnp.ones(shape)).normalize()
    return o, d


def main():
    args = sys.argv[1:]
    n_lat = int(args[0]) if args else 80
    n_lon = int(args[1]) if len(args) > 1 else 64
    paged, tiles, gather = build_table(n_lat, n_lon)
    print(f"pages: {paged.n_pages}, lanes {ROWS * N_BLOCKS * LANE}")

    results = {}
    for kind in ("incoherent", "coherent"):
        o, d = packets(kind)
        for variant in ("fetch", "all", "dense", "gather", "real"):
            fn = make_fn(variant, paged, gather if variant in ("gather", "real") else tiles)
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(o, d))
            compile_s = time.perf_counter() - t0
            n_rep = 5
            t0 = time.perf_counter()
            for _ in range(n_rep):
                out = jax.block_until_ready(fn(o, d))
            dt = (time.perf_counter() - t0) / n_rep
            per_block_us = dt / N_BLOCKS / REPS * 1e6
            results[(kind, variant)] = per_block_us
            hits = int((np.asarray(out) != np.asarray(out).max()).sum())
            print(
                f"{kind:10s} {variant:6s}: {dt * 1e3:7.2f} ms/launch "
                f"({per_block_us:7.1f} us/block of {ROWS}x{LANE}) "
                f"compile {compile_s:.0f}s  improved-lanes {hits}"
            )
    d_i = results[("incoherent", "dense")]
    a_i = results[("incoherent", "all")]
    f_i = results[("incoherent", "fetch")]
    print(
        f"\nincoherent: cursor+carry overhead = {d_i - a_i:.1f} us/block "
        f"({(d_i - a_i) / d_i:.0%} of dense); fetch floor = {f_i:.1f} us/block; "
        f"sweep arithmetic = {a_i - f_i:.1f} us/block"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
