"""Path-tracing integrators: the TPU wavefront bounce loop.

The reference ships two different physics contracts (SURVEY.md top-fact 2):

* **gpu contract** — the GLSL compute shader's iterative ``rayColor``
  (gpu.go:1300-1671): NEE, GGX metals, tracked-glass-state dielectrics with
  Beer–Lambert, volumetric single-scatter fog, russian roulette.
* **cpu contract** — the recursive Go ``rayColorOpt`` (renderer.go:286-404)
  with the simpler materials from materials.go: no NEE, lerp-toward-cosine
  metals, exit-scan Beer–Lambert, no fog.

Both are implemented here as one SPMD bounce loop over lanes (= pixels in
flight): a ``lax.while_loop`` whose per-lane state carries throughput /
radiance / alive masks.  There is no warp divergence to fight on TPU —
every material branch is evaluated for the full lane vector and lanes
select their branch with masks, which is the reference shader's own
execution model on a SIMT GPU.  All lane state is component-wise
(ops/vec.py) on [rows, 128] grids for full VPU lane utilization.
Deliberate deviations from the reference are listed in PHYSICS.md (D1-D5).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from .ops import fog as fog_ops
from .ops import geometry, optics, sampling
from .ops import lights as lights_ops
from .ops.geometry import BIG_T, Hit, intersect_world
from .ops.rng import LaneRng, seed_lanes
from .ops.sky import background_color
from .ops.vec import LANE, V3
from .soa import (
    MAT_DIELECTRIC,
    MAT_EMISSIVE,
    MAT_LAMBERT,
    MAT_METAL,
    MAT_MIRROR,
    OBJ_BOX,
    OBJ_PLANE,
    OBJ_SPHERE,
    ScenePack,
)

__all__ = [
    "TraceConfig",
    "trace",
    "trace_grid",
    "trace_config_for_scene",
    "fog_prepass_grid",
]

_F = jnp.float32


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Static (compile-time) trace parameters.

    Feature flags are derived from the scene so that unused subsystems
    (fog march, rough-metal specular NEE, dielectric state) compile to
    nothing — the XLA analog of the shader's dynamically-skipped branches.
    """

    max_depth: int
    contract: str = "gpu"  # "gpu" | "cpu"  (engine backend switch analog)
    enable_fog_march: bool = False  # fogGpuVolumetric && lights present
    fog_in_trace: bool = True  # False = driver marches fog once per pass (D6)
    enable_nee: bool = True
    has_rough_metal: bool = True
    has_dielectric: bool = True
    rr_threshold: int = 3  # gpu.go:1649 / renderer.go:375
    regen: bool = True  # merged sample+bounce loop (pass_regen_gpu)
    # Dead/masked lanes mark zero pages in the dynamic BVH walk (rounds
    # per row are max-driven).  Physics-neutral; part of the jit key so
    # PATHTRACER_NO_WALK_SKIP=1 A/Bs recompile.
    walk_skip: bool = True
    # PERF ATTRIBUTION ONLY (PATHTRACER_BVH_DROP=closest,shadow,spec):
    # force-skips the named dynamic mesh walks entirely.  PHYSICS-WRONG
    # images — the knob exists to time each walk's share of a render in
    # one process (tools/perf/walk_attrib.py); never set it in real use.
    debug_drop: tuple = ()


def _parse_bvh_drop(raw: str) -> tuple:
    """Parse PATHTRACER_BVH_DROP strictly: a typo must fail loudly, not
    silently time the base configuration (ADVICE r3).  Note the knob is
    inert under the cpu contract (no dynamic mesh walks there)."""
    toks = [w.strip() for w in raw.split(",") if w.strip()]
    bad = [w for w in toks if w not in ("closest", "shadow", "spec")]
    if bad:
        raise ValueError(
            f"PATHTRACER_BVH_DROP: unknown walk name(s) {bad!r}; "
            "valid tokens are closest, shadow, spec"
        )
    return tuple(sorted(toks))


def trace_config_for_scene(
    sc_pack: ScenePack,
    scene,
    max_depth: int,
    contract: str = "gpu",
    faithful_fog: bool = False,
) -> TraceConfig:
    """Build a TraceConfig with feature flags read off the scene.

    ``faithful_fog=True`` re-marches the volumetric fog for every
    stratified sample like the reference shader (gpu.go:1311-1341); the
    default estimates it once per pass (PHYSICS.md D6) — same expectation,
    ~1/16 of the fog cost.
    """
    has_rough_metal = False
    has_dielectric = False
    for m in scene.materials:
        if m.type == "metal":
            rough = (1.0 - min(max(m.smoothness, 0.0), 1.0)) if m.smoothness > 0 else m.rough
            if rough > 1e-4:
                has_rough_metal = True
        if m.type == "dielectric":
            has_dielectric = True
    fogm = (
        scene.fog is not None
        and scene.fog.gpu_volumetric
        and sc_pack.n_lights > 0
        and contract == "gpu"
    )
    import os

    regen = (
        contract == "gpu"
        and not (bool(fogm) and bool(faithful_fog))
        and os.environ.get("PATHTRACER_NO_REGEN", "") not in ("1", "true", "on")
    )
    return TraceConfig(
        max_depth=max_depth,
        contract=contract,
        enable_fog_march=bool(fogm),
        fog_in_trace=bool(faithful_fog),
        enable_nee=(contract == "gpu"),
        has_rough_metal=has_rough_metal,
        has_dielectric=has_dielectric,
        regen=regen,
        walk_skip=os.environ.get("PATHTRACER_NO_WALK_SKIP", "")
        not in ("1", "true", "on"),
        debug_drop=_parse_bvh_drop(os.environ.get("PATHTRACER_BVH_DROP", "")),
    )


# ---------------------------------------------------------------------------
# GPU contract
# ---------------------------------------------------------------------------


def _fog_prepass(orig: V3, dirv: V3, state, pack: ScenePack):
    """Single-scatter march along the primary ray (gpu.go:1311-1341).

    24 fixed steps to min(firstHit, 40); per step, transmittance
    ``exp(-sigma_t(pos) * t)`` times the in-fog light estimate.
    Returns (radiance_add V3, rng_state).
    """
    hit = intersect_world(orig, dirv, pack, _F(0.001))
    t_max = jnp.minimum(
        jnp.where(hit.hit, hit.t, fog_ops.FOG_MARCH_TMAX), fog_ops.FOG_MARCH_TMAX
    )
    step = t_max * _F(1.0 / fog_ops.FOG_MARCH_STEPS)
    shape = orig.x.shape
    fog_color = V3.broadcast_scalars(shape, pack.fog[4], pack.fog[5], pack.fog[6])

    def body(i, carry):
        rad, st = carry
        rng = LaneRng(st)
        t = (i.astype(jnp.float32) + _F(0.5)) * step
        pos = orig + dirv * t
        sigma_s, _sigma_a, sigma_t = fog_ops.medium_coeffs(pos, pack.fog)
        tr = jnp.exp(-sigma_t * t)
        ls = fog_ops.estimate_volume_light(pos, dirv, pack, rng)
        dl = fog_color * ls * (sigma_s * tr * step)
        ok = (sigma_t > 0) & (sigma_s > 0) & (step > 0)
        rad = rad + V3.where(ok, dl, V3.zeros(shape))
        return rad, rng.state

    rad, state = lax.fori_loop(0, fog_ops.FOG_MARCH_STEPS, body, (V3.zeros(shape), state))
    return rad, state


def _shade_gpu(hit: Hit, dirv: V3, throughput: V3, radiance: V3, rng: LaneRng, pack: ScenePack, cfg: TraceConfig, alive=None):
    """One GPU-contract surface interaction for all lanes (gpu.go:1398-1646).

    Material constants come from the hit record (select-chain, gather-free).
    Returns (new_dir, attenuation, radiance, scattered_ok, enter_glass,
    exit_glass, travel, absorption, abs_scale, tint).

    ``alive``: bool lane grid from the bounce loop; dead lanes' outputs
    are discarded by the caller, so their secondary rays (NEE shadow,
    specular NEE) mark zero pages in the dynamic BVH walk
    (cfg.walk_skip) — work pruning only, identical radiance.
    """
    shape = dirv.x.shape
    zero3 = V3.zeros(shape)
    if not cfg.walk_skip:
        alive = None

    typ = hit.mtyp
    n = hit.normal
    p = hit.p
    view_dir = dirv.normalize()

    is_lambert = typ == MAT_LAMBERT
    is_metal = typ == MAT_METAL
    is_mirror = typ == MAT_MIRROR
    is_diel = typ == MAT_DIELECTRIC
    is_emissive = typ == MAT_EMISSIVE

    # emissive adds Le (gpu.go:1409-1411)
    radiance = radiance + V3.where(is_emissive, throughput * hit.emit, zero3)

    # ---- Lambert: cosine bounce + NEE (gpu.go:1419-1425) ----
    lambert_dir = sampling.cosine_direction(n, rng.next(), rng.next())
    if cfg.enable_nee and pack.n_lights > 0:
        # only lambert and rough-metal lanes consume `direct`; everyone
        # else skips the shadow walk's mesh pages (walk_skip)
        nee_skip = None
        if alive is not None:
            uses_direct = is_lambert
            if cfg.has_rough_metal:
                uses_direct = uses_direct | is_metal
            nee_skip = ~(alive & hit.hit & uses_direct)
        if "shadow" in cfg.debug_drop:  # attribution only (see TraceConfig)
            nee_skip = jnp.full(shape, True)
        direct = lights_ops.estimate_direct_light(
            p, n, hit.albedo, pack, rng, skip=nee_skip
        )
    else:
        direct = zero3
    radiance = radiance + V3.where(is_lambert, throughput * direct, zero3)

    # ---- Metal / mirror (gpu.go:1427-1496) ----
    metal_rough = jnp.where(hit.smoothness > 0, _F(1.0) - hit.smoothness, hit.rough)
    eff_refl = jnp.where(hit.reflectivity > 0, hit.reflectivity, _F(1.0))
    is_rough_metal = is_metal & (metal_rough > _F(1e-4))

    mirror_dir = optics.reflect(view_dir, n)
    if cfg.has_rough_metal:
        ggx_dir = sampling.sample_ggx(view_dir, n, metal_rough, rng.next(), rng.next())
        metal_dir = V3.where(is_rough_metal, ggx_dir, mirror_dir)
    else:
        metal_dir = mirror_dir

    mr2 = metal_rough * metal_rough
    spec_w = jnp.clip(_F(1.0) / (_F(1.0) + mr2 * _F(2.0)), _F(0.1), _F(0.9))
    diff_w = _F(1.0) - spec_w
    # rough-metal diffuse NEE reuses the same unbiased estimator computed
    # above (the shader calls estimateDirectLight again on a disjoint
    # thread branch; one evaluation per lane is statistically identical).
    radiance = radiance + V3.where(
        is_rough_metal,
        throughput * direct * (diff_w * eff_refl * _F(0.5)),
        zero3,
    )
    atten_metal = V3.where(
        is_rough_metal,
        hit.albedo * (spec_w * eff_refl + diff_w * _F(0.3)),
        hit.albedo * eff_refl,
    )
    metal_dot = metal_dir.dot(n)
    metal_dead = (is_metal | is_mirror) & (metal_dot <= _F(1e-6))

    # rough-metal "specular NEE": trace the perfect reflection, credit
    # emissive hits (gpu.go:1474-1496)
    if cfg.has_rough_metal and cfg.enable_nee:
        refl_orig = p + n * _F(0.001)
        # only live rough-metal lanes with an above-horizon reflection
        # consume this query — everyone else skips the mesh walk
        spec_skip = None
        if alive is not None:
            spec_skip = ~(alive & is_rough_metal & ~metal_dead)
        if "spec" in cfg.debug_drop:  # attribution only (see TraceConfig)
            spec_skip = jnp.full(shape, True)
        rhit = intersect_world(
            refl_orig, mirror_dir, pack, _F(0.001), lite=True, skip=spec_skip
        )
        dist_sq = jnp.maximum(rhit.t * rhit.t, _F(1e-20))
        cos_light = jnp.maximum(_F(0), -(rhit.normal.dot(mirror_dir)))
        direct_reflect = rhit.emit * (cos_light / dist_sq)
        ok = is_rough_metal & ~metal_dead & rhit.hit & (rhit.mtyp == MAT_EMISSIVE)
        radiance = radiance + V3.where(
            ok, throughput * direct_reflect * hit.albedo * _F(0.5), zero3
        )

    # ---- Dielectric (gpu.go:1498-1642) ----
    enter_glass = jnp.zeros(shape, bool)
    exit_glass = jnp.zeros(shape, bool)
    travel = jnp.zeros(shape, jnp.float32)
    atten_diel = V3.full(shape, 1.0)
    diel_dir = mirror_dir
    if cfg.has_dielectric:
        ior = hit.ior
        cos_t = jnp.minimum(-(view_dir.dot(n)), _F(1.0))
        sin_t = jnp.sqrt(jnp.maximum(_F(0.0), _F(1.0) - cos_t * cos_t))
        entering = hit.front_face
        inv_ior = _F(1.0) / jnp.maximum(ior, _F(1e-6))
        eta = jnp.where(entering, inv_ior, ior)
        rel_ior = jnp.where(entering, ior, inv_ior)
        tir = eta * sin_t > _F(1.0)
        reflect_prob = optics.schlick(cos_t, rel_ior)
        reflect_prob = jnp.where(
            entering, reflect_prob, jnp.maximum(reflect_prob, _F(0.05))
        )  # exit-side floor (gpu.go:1529-1532)
        u_fresnel = rng.next()
        do_reflect = tir | (u_fresnel < reflect_prob)

        refr_dir = optics.refract(view_dir, n, eta)
        diel_dir = V3.where(do_reflect, optics.reflect(view_dir, n), refr_dir).normalize()

        refracting = is_diel & ~do_reflect
        enter_glass = refracting & entering
        exit_glass = refracting & ~entering

        # travel distance through own object (gpu.go:1547-1592); the hit
        # record carries the winner's geometry, so no table gathers
        exit_orig = p + diel_dir * _F(0.001)
        half = hit.obj_size * _F(0.5)
        b_ok, b_t = geometry.box_exit_t(exit_orig, diel_dir, hit.obj_pos - half, hit.obj_pos + half)
        s_ok, s_t = geometry.sphere_exit_t(exit_orig, diel_dir, hit.obj_pos, hit.obj_size.x)
        travel = jnp.where(
            (hit.obj_type == OBJ_BOX) & b_ok,
            b_t,
            jnp.where((hit.obj_type == OBJ_SPHERE) & s_ok, s_t, _F(0.0)),
        )
        travel = jnp.where(enter_glass, travel, _F(0.0))

        # Beer–Lambert with the reference's 0.1 + 0.9*exp mix and tint
        # (gpu.go:1597-1638)
        eff_abs = hit.absorption * hit.abs_scale
        absorb_enter = (-(eff_abs * travel)).exp()
        has_tint = hit.tint.any_positive()
        one3 = V3.full(shape, 1.0)
        tint_mul = V3.where(has_tint, hit.tint, one3)
        enter_mul = (absorb_enter * _F(0.9) + _F(0.1)) * tint_mul
        atten_diel = V3.where(enter_glass & (travel > 0), enter_mul, atten_diel)

    # ---- combine ----
    new_dir = V3.where(is_lambert, lambert_dir, V3.where(is_diel, diel_dir, metal_dir))
    attenuation = V3.where(
        is_lambert,
        hit.albedo,
        V3.where(
            is_diel,
            atten_diel,
            V3.where(is_metal | is_mirror, atten_metal, hit.albedo),
        ),
    )
    # emissive (and any unknown type) stops the path; metal below-horizon
    # too.  PHYSICS.md D4: the shader computes scattered=false here but
    # never tests it — we terminate, matching the CPU contract's intent.
    scattered_ok = ~(is_emissive | metal_dead)
    return (
        new_dir,
        attenuation,
        radiance,
        scattered_ok,
        enter_glass,
        exit_glass,
        travel,
        hit.absorption,
        hit.abs_scale,
        hit.tint,
    )


def _trace_gpu(orig: V3, dirv: V3, state, pack: ScenePack, cfg: TraceConfig, active=None):
    shape = orig.x.shape
    radiance = V3.zeros(shape)

    if cfg.enable_fog_march and cfg.fog_in_trace:
        fog_on = pack.fog[3] > _F(0.5)
        fog_radiance, state = _fog_prepass(orig, dirv, state, pack)
        gate = jnp.where(fog_on, _F(1.0), _F(0.0))
        radiance = radiance + fog_radiance * gate
        if active is not None:
            radiance = V3.where(active, radiance, V3.zeros(shape))

    throughput = V3.full(shape, 1.0)
    alive0 = jnp.ones(shape, dtype=bool) if active is None else active
    glass_obj = jnp.full(shape, -1, dtype=jnp.int32)
    glass_dist = jnp.zeros(shape, dtype=jnp.float32)
    segments = jnp.zeros((), dtype=jnp.int32)

    carry = (
        jnp.zeros((), dtype=jnp.int32),
        orig,
        dirv,
        throughput,
        radiance,
        alive0.astype(jnp.int32),
        state,
        glass_obj,
        glass_dist,
        segments,
    )
    carry = gpu_phase(carry, pack, cfg, cfg.max_depth)
    _d, _o, _dir, _tp, radiance, _alive, state, _go, _gd, segments = carry
    return radiance, state, segments


def gpu_phase(carry, pack: ScenePack, cfg: TraceConfig, d_end: int):
    """Run the GPU-contract bounce loop from the carry's current bounce
    index up to ``d_end`` (static).  The carry layout is
    (d, orig, dirv, throughput, radiance, alive_i32, rng_state, glass_obj,
    glass_dist, segments); resumable, which the deep-depth compaction
    driver uses to re-pack straggler lanes between phases."""
    shape = carry[1].x.shape
    # legacy sky fog condition (gpu.go:1392)
    sky_fog = (pack.fog[0] > 0) & (pack.fog[2] > _F(0.5))

    def cond(carry):
        d = carry[0]
        alive_i = carry[5]
        # alive rides the carry as int32: Mosaic cannot legalize i1
        # vectors in scf.while carries
        return (d < d_end) & (jnp.max(alive_i) > 0)

    def body(carry):
        d, orig, dirv, throughput, radiance, alive_i, st, glass_obj, glass_dist, segments = carry
        alive = alive_i > 0
        segments = segments + jnp.sum(alive_i)
        rng = LaneRng(st)

        # without dielectrics glass_obj is constant -1: skip the exclusion
        # entirely (statically drops the obj compare per object and one
        # gathered attribute block per BVH round); dead lanes mark zero
        # BVH pages (walk_skip)
        hit = intersect_world(
            orig, dirv, pack, _F(0.001),
            exclude_obj=glass_obj if cfg.has_dielectric else None,
            skip=jnp.full(shape, True) if "closest" in cfg.debug_drop
            else (~alive if cfg.walk_skip else None),
        )

        # miss -> sky (+ legacy fog), terminate (gpu.go:1389-1396)
        unit_d = dirv.normalize()
        bg = background_color(unit_d, pack.sky)
        bg_fogged = fog_ops.apply_legacy_fog(bg, 50.0, pack.fog)
        bg = V3.where(sky_fog, bg_fogged, bg)
        miss = alive & ~hit.hit
        zero3 = V3.zeros(shape)
        radiance = radiance + V3.where(miss, throughput * bg, zero3)
        alive = alive & hit.hit

        live_throughput = V3.where(alive, throughput, zero3)
        (
            new_dir,
            attenuation,
            radiance,
            scattered_ok,
            enter_glass,
            exit_glass,
            travel,
            absorption,
            abs_scale,
            tint,
        ) = _shade_gpu(hit, dirv, live_throughput, radiance, rng, pack, cfg, alive=alive)

        # glass-state bookkeeping (gpu.go:1545, 1615, 1598, 1638)
        if cfg.has_dielectric:
            # exit applies Beer–Lambert on the *accumulated* distance with
            # the exited material's coefficients (gpu.go:1620-1637)
            eff_abs = absorption * abs_scale
            absorb_exit = (-(eff_abs * glass_dist)).exp()
            has_tint = tint.any_positive()
            one3 = V3.full(shape, 1.0)
            tint_mul = V3.where(has_tint, tint, one3)
            exit_mul = (absorb_exit * _F(0.9) + _F(0.1)) * tint_mul
            exit_apply = alive & exit_glass & (glass_dist > 0)
            attenuation = V3.where(exit_apply, attenuation * exit_mul, attenuation)

            enter_ok = alive & enter_glass
            exit_ok = alive & exit_glass
            glass_obj = jnp.where(enter_ok, hit.obj_idx, jnp.where(exit_ok, -1, glass_obj))
            glass_dist = jnp.where(
                enter_ok & (travel > 0), travel, jnp.where(exit_ok, _F(0.0), glass_dist)
            )

        # russian roulette on remaining depth (gpu.go:1648-1660)
        remaining = cfg.max_depth - d
        u_rr = rng.next()
        max_comp = attenuation.max_comp()
        rr_active = remaining <= cfg.rr_threshold
        rr_prob = jnp.minimum(max_comp, _F(0.95))
        rr_kill = rr_active & ((max_comp < _F(1e-6)) | (u_rr > rr_prob))
        rr_scale = jnp.where(rr_active & ~rr_kill, _F(1.0) / jnp.maximum(rr_prob, _F(1e-6)), _F(1.0))
        attenuation = attenuation * rr_scale

        alive = alive & scattered_ok & ~rr_kill
        throughput = V3.where(alive, throughput * attenuation, throughput)
        new_orig = hit.p + hit.normal * _F(0.001)
        orig = V3.where(alive, new_orig, orig)
        dirv = V3.where(alive, new_dir, dirv)
        return (d + 1, orig, dirv, throughput, radiance, alive.astype(jnp.int32), rng.state, glass_obj, glass_dist, segments)

    return lax.while_loop(cond, body, carry)


def regen_enabled(cfg: TraceConfig) -> bool:
    """Whether the merged sample+bounce regeneration loop drives GPU-contract
    passes.  Faithful in-trace fog marches once per *sample* (gpu.go:1311)
    which regeneration would have to re-run masked for all lanes — that
    mode keeps the classic per-sample loop.  ``PATHTRACER_NO_REGEN=1``
    (read at TraceConfig construction — it is part of the jit key) forces
    the classic loop for A/B comparisons."""
    return (
        cfg.regen
        and cfg.contract == "gpu"
        and not (cfg.enable_fog_march and cfg.fog_in_trace)
    )


def pass_regen_gpu(
    pack: ScenePack,
    px,
    py,
    state0,
    *,
    cfg: TraceConfig,
    width: int,
    height: int,
    n_strata: int,
    samples: int,
    has_aperture: bool,
    frame_seed=None,
    n_passes: int = 1,
    col_init: V3 | None = None,
    active=None,
):
    """GPU-contract progressive pass with per-lane path regeneration.

    Merges the shader main()'s stratified-sample loop (gpu.go:1683-1730)
    and the iterative rayColor bounce loop (gpu.go:1300-1671) into ONE
    while loop: the moment a lane's path terminates it draws its next
    stratified sample's camera ray and keeps bouncing, instead of idling
    until the block's slowest path finishes.  Per-block iterations drop
    from ``samples x E[max path length over the block's lanes]`` to
    ``~E[max over lanes of the SUM of that lane's own path lengths]`` —
    the sum of ``samples`` path lengths concentrates sharply (law of large
    numbers), which removes the straggler collapse on deep bounce budgets
    (the reference final preset, depth 80-160) with ZERO lane movement: no
    sorts, no gathers, just one extra select per iteration.  Physics is
    the same `_shade_gpu` / `intersect_world` / RR code; only the
    iteration schedule (and therefore per-lane RNG consumption) differs,
    which is statistically neutral for a counter-hash RNG.

    Per-lane loop state: ``s`` samples started, ``d`` bounce index of the
    current path (russian roulette keys off ``max_depth - d`` per lane,
    gpu.go:1648-1660), plus the usual ray/throughput/glass state.

    ``n_passes > 1`` widens the regeneration window to several progressive
    passes in ONE dispatch (``samples * n_passes`` paths per lane): the
    idle tail — lanes waiting for the block's last path after exhausting
    their own samples — is paid once per window instead of once per pass,
    and it grows only ~sqrt(window) while useful work grows linearly.  At
    each pass boundary the lane reseeds to ``seed_lanes(px, py,
    frame_seed + pass_idx)``, the same per-pass counter seed the classic
    driver uses (D1), so a window render is reproducible at pass
    granularity.  Returns (col V3 = sum over all samples, state, segments).
    """
    shape = px.shape
    zero3 = V3.zeros(shape)
    col = col_init if col_init is not None else zero3
    sky_fog = (pack.fog[0] > 0) & (pack.fog[2] > _F(0.5))

    inv_w = _F(1.0) / _F(width - 1 if width > 1 else 1)
    inv_h = _F(1.0) / _F(height - 1 if height > 1 else 1)
    pxf = px.astype(jnp.float32)
    fy = _F(height - 1) - py.astype(jnp.float32)
    inv_strata = _F(1.0 / n_strata)

    # Mosaic workaround: splat (broadcast-constant) i32 inits make layout
    # inference assign the while carry a replicated layout that the loop
    # body's concrete values cannot relayout into ("Invalid relayout ...
    # replicated in destination but not in source").  Deriving the zeros
    # from a kernel input gives the carries a concrete layout from the
    # start.  The detour through f32 is deliberate: integer x&0 / x*0 are
    # constant-folded back into splats by MLIR's canonicalizer, but
    # mulf(x, 0.0) is not foldable without fastmath (x could be NaN/inf —
    # bitcast of an RNG state never is).
    zero_i = (
        lax.bitcast_convert_type(state0, jnp.int32).astype(jnp.float32)
        * jnp.float32(0.0)
    ).astype(jnp.int32)
    total_samples = samples * n_passes
    s0 = zero_i
    if active is not None:
        # padding lanes never start a sample
        s0 = jnp.where(active, s0, jnp.int32(total_samples))

    carry = (
        s0,  # samples started
        zero_i,  # d: bounce index of current path
        zero_i,  # alive
        V3.zeros(shape),  # orig
        V3.zeros(shape),  # dir
        V3.full(shape, 1.0),  # throughput
        col,
        state0,
        zero_i - 1,  # glass obj
        jnp.zeros(shape, jnp.float32),  # glass dist
        jnp.zeros((), jnp.int32),  # segments
    )

    def cond(carry):
        s, _d, alive_i = carry[0], carry[1], carry[2]
        return jnp.max(alive_i + (jnp.int32(total_samples) - s)) > 0

    def body(carry):
        s, d, alive_i, orig, dirv, throughput, col, st, glass_obj, glass_dist, segments = carry

        # ---- regenerate: dead lanes with samples left start the next one
        regen = (alive_i == 0) & (s < total_samples)
        if n_passes > 1:
            pass_idx = s // samples
            stratum = s - pass_idx * samples
            # per-pass rng reset (D1): the first sample of pass p draws
            # from seed_lanes(px, py, frame_seed + p), as the classic
            # per-pass driver would
            boundary = regen & (s > 0) & (stratum == 0)
            reseed = seed_lanes(
                px, py, jnp.asarray(frame_seed, jnp.uint32) + pass_idx.astype(jnp.uint32)
            )
            st = jnp.where(boundary, reseed, st)
        else:
            stratum = s
        rng = LaneRng(st)
        jx = rng.next()
        jy = rng.next()
        if n_strata > 1:
            su = ((stratum % n_strata).astype(jnp.float32) + jx) * inv_strata
            sv = ((stratum // n_strata).astype(jnp.float32) + jy) * inv_strata
        else:
            su, sv = jx, jy
        u = (pxf + su) * inv_w
        v = (fy + sv) * inv_h
        from .ops.camera import camera_rays

        cam_o, cam_d = camera_rays(u, v, pack.cam, width, height, rng, has_aperture, pack.lens_disk)
        orig = V3.where(regen, cam_o, orig)
        dirv = V3.where(regen, cam_d, dirv)
        throughput = V3.where(regen, V3.full(shape, 1.0), throughput)
        d = jnp.where(regen, 0, d)
        glass_obj = jnp.where(regen, -1, glass_obj)
        glass_dist = jnp.where(regen, _F(0.0), glass_dist)
        s = jnp.where(regen, s + 1, s)
        alive = (alive_i > 0) | regen

        # ---- one bounce (identical to gpu_phase's body, per-lane depth)
        segments = segments + jnp.sum(alive.astype(jnp.int32))
        # without dielectrics glass_obj is constant -1: skip the exclusion
        # (statically drops the obj compare per object and one gathered
        # attribute block per BVH round) — same gate as gpu_phase
        hit = intersect_world(
            orig, dirv, pack, _F(0.001),
            exclude_obj=glass_obj if cfg.has_dielectric else None,
            skip=jnp.full(shape, True) if "closest" in cfg.debug_drop
            else (~alive if cfg.walk_skip else None),
        )

        unit_d = dirv.normalize()
        bg = background_color(unit_d, pack.sky)
        bg_fogged = fog_ops.apply_legacy_fog(bg, 50.0, pack.fog)
        bg = V3.where(sky_fog, bg_fogged, bg)
        miss = alive & ~hit.hit
        col = col + V3.where(miss, throughput * bg, zero3)
        alive = alive & hit.hit

        live_throughput = V3.where(alive, throughput, zero3)
        (
            new_dir,
            attenuation,
            col,
            scattered_ok,
            enter_glass,
            exit_glass,
            travel,
            absorption,
            abs_scale,
            tint,
        ) = _shade_gpu(hit, dirv, live_throughput, col, rng, pack, cfg, alive=alive)

        if cfg.has_dielectric:
            eff_abs = absorption * abs_scale
            absorb_exit = (-(eff_abs * glass_dist)).exp()
            has_tint = tint.any_positive()
            one3 = V3.full(shape, 1.0)
            tint_mul = V3.where(has_tint, tint, one3)
            exit_mul = (absorb_exit * _F(0.9) + _F(0.1)) * tint_mul
            exit_apply = alive & exit_glass & (glass_dist > 0)
            attenuation = V3.where(exit_apply, attenuation * exit_mul, attenuation)

            enter_ok = alive & enter_glass
            exit_ok = alive & exit_glass
            glass_obj = jnp.where(enter_ok, hit.obj_idx, jnp.where(exit_ok, -1, glass_obj))
            glass_dist = jnp.where(
                enter_ok & (travel > 0), travel, jnp.where(exit_ok, _F(0.0), glass_dist)
            )

        # russian roulette on per-lane remaining depth (gpu.go:1648-1660)
        remaining = jnp.int32(cfg.max_depth) - d
        u_rr = rng.next()
        max_comp = attenuation.max_comp()
        rr_active = remaining <= cfg.rr_threshold
        rr_prob = jnp.minimum(max_comp, _F(0.95))
        rr_kill = rr_active & ((max_comp < _F(1e-6)) | (u_rr > rr_prob))
        rr_scale = jnp.where(
            rr_active & ~rr_kill, _F(1.0) / jnp.maximum(rr_prob, _F(1e-6)), _F(1.0)
        )
        attenuation = attenuation * rr_scale

        d = jnp.where(alive, d + 1, d)
        alive = alive & scattered_ok & ~rr_kill & (d < cfg.max_depth)
        throughput = V3.where(alive, throughput * attenuation, throughput)
        new_orig = hit.p + hit.normal * _F(0.001)
        orig = V3.where(alive, new_orig, orig)
        dirv = V3.where(alive, new_dir, dirv)
        return (
            s,
            d,
            alive.astype(jnp.int32),
            orig,
            dirv,
            throughput,
            col,
            rng.state,
            glass_obj,
            glass_dist,
            segments,
        )

    carry = lax.while_loop(cond, body, carry)
    (_s, _d, _al, _o, _dv, _thr, col, state, _go, _gd, segments) = carry
    return col, state, segments


# ---------------------------------------------------------------------------
# CPU contract (renderer.go rayColorOpt + materials.go scatter)
# ---------------------------------------------------------------------------


def _dielectric_exit_scan(orig: V3, dirv: V3, pack: ScenePack):
    """Closest dielectric *backface* hit along a refracted ray
    (renderer.go:316-371): candidates must be dielectric, not front-facing,
    with squared distance from the ray origin in (1e-8, 1000).

    Unrolled over the static object list, visiting only dielectric objects.
    Returns (found bool, exit_p V3).
    """
    best_t = jnp.full(orig.x.shape, BIG_T)

    for m, typ, (cx, cy, cz), (sx, sy, sz), t, ok in geometry._object_candidates(
        orig, dirv, pack, _F(1e-4)  # exitTMin (renderer.go:322)
    ):
        if pack.mat_types[pack.obj_mats[m]] != MAT_DIELECTRIC:
            continue
        px, py, pz = orig.x + dirv.x * t, orig.y + dirv.y * t, orig.z + dirv.z * t
        if typ == OBJ_SPHERE:
            # backface iff dot(dir, p - center) >= 0
            front = (dirv.x * (px - cx) + dirv.y * (py - cy) + dirv.z * (pz - cz)) < 0
        elif typ == OBJ_PLANE:
            front = dirv.y < 0
        else:  # box: nearest-face normal chain (objects.go:186-219 analog)
            hx, hy = sx * _F(0.5), sy * _F(0.5)
            lx, ly, lz = px - cx, py - cy, pz - cz
            eps = _F(1e-4)
            on_x = jnp.abs(jnp.abs(lx) - hx) < eps
            on_y = jnp.abs(jnp.abs(ly) - hy) < eps
            ndot = jnp.where(
                on_x,
                dirv.x * jnp.sign(lx),
                jnp.where(on_y, dirv.y * jnp.sign(ly), dirv.z * jnp.sign(lz)),
            )
            front = ndot < 0
        dist_sq = (px - orig.x) ** 2 + (py - orig.y) ** 2 + (pz - orig.z) ** 2
        ok = ok & ~front & (dist_sq > _F(1e-8)) & (dist_sq < _F(1000.0))
        best_t = jnp.where(ok & (t < best_t), t, best_t)

    found = best_t < BIG_T
    t_safe = jnp.where(found, best_t, _F(0.0))
    exit_p = orig + dirv * t_safe
    return found, exit_p


def _trace_cpu(orig: V3, dirv: V3, state, pack: ScenePack, cfg: TraceConfig, active=None):
    """CPU-contract integrator (renderer.go:286-404, materials.go:74-224)."""
    shape = orig.x.shape
    radiance = V3.zeros(shape)
    throughput = V3.full(shape, 1.0)
    alive0 = jnp.ones(shape, dtype=bool) if active is None else active
    segments = jnp.zeros((), dtype=jnp.int32)

    def cond(carry):
        d = carry[0]
        alive_i = carry[5]
        return (d < cfg.max_depth) & (jnp.max(alive_i) > 0)

    def body(carry):
        d, orig, dirv, throughput, radiance, alive_i, st, segments = carry
        alive = alive_i > 0
        segments = segments + jnp.sum(alive_i)
        rng = LaneRng(st)
        zero3 = V3.zeros(shape)

        hit = intersect_world(orig, dirv, pack, _F(0.001))
        unit_d = dirv.normalize()
        bg = background_color(unit_d, pack.sky)
        miss = alive & ~hit.hit
        radiance = radiance + V3.where(miss, throughput * bg, zero3)
        alive = alive & hit.hit

        typ = hit.mtyp
        # CPU loader: metal rough = 1 - smoothness when smoothness > 0
        # (materials.go:36-39); lambert rough straight from scene.
        rough = jnp.where(
            (typ == MAT_METAL) & (hit.smoothness > 0),
            jnp.clip(_F(1.0) - hit.smoothness, _F(0.0), _F(1.0)),
            jnp.clip(hit.rough, _F(0.0), _F(1.0)),
        )
        ior = jnp.where(hit.ior == 0, _F(1.5), hit.ior)  # materials.go:42-45

        n = hit.normal
        p = hit.p
        view_dir = dirv.normalize()

        is_lambert = typ == MAT_LAMBERT
        is_metal = typ == MAT_METAL
        is_mirror = typ == MAT_MIRROR
        is_diel = typ == MAT_DIELECTRIC
        is_emissive = typ == MAT_EMISSIVE

        # emitted (materials.go:67-72); emissive does not scatter
        radiance = radiance + V3.where(alive & is_emissive, throughput * hit.emit, zero3)

        # Lambert: cosine + small rough jitter (materials.go:76-97); the
        # CPU core uses a proper-ONB cosine frame (math.go:94-131)
        cos_dir = sampling.cosine_direction_onb(n, rng.next(), rng.next())
        jit_ball = sampling.unit_ball(*rng.next3())
        lam_dir = (cos_dir + jit_ball * (rough * _F(0.1))).normalize()
        lambert_dir = V3.where(rough > _F(1e-6), lam_dir, cos_dir)

        # Metal: lerp mirror -> cosine-around-mirror by alpha=rough^2
        # (materials.go:99-160)
        reflected = optics.reflect(view_dir, n)
        cos_around_refl = sampling.cosine_direction_onb(reflected, rng.next(), rng.next())
        alpha = rough * rough
        blended = reflected * (_F(1.0) - alpha) + cos_around_refl * alpha
        blen2 = blended.length_sq()
        blended = V3.where(blen2 < _F(1e-8), reflected, blended.normalize())
        wrong_hemi = blended.dot(n) <= 0
        rough_metal_dir = V3.where(wrong_hemi, reflected, blended)
        metal_dir = V3.where(rough > _F(1e-6), rough_metal_dir, reflected)

        # Dielectric (materials.go:162-200): note reflectance uses the
        # *refraction ratio* (1/ior on entry), unlike the GPU contract.
        cos_t = jnp.minimum(-(view_dir.dot(n)), _F(1.0))
        sin_t = jnp.sqrt(jnp.maximum(_F(0.0), _F(1.0) - cos_t * cos_t))
        entering = hit.front_face
        ratio = jnp.where(entering, _F(1.0) / ior, ior)
        cannot = ratio * sin_t > _F(1.0)
        refl_prob = optics.schlick(cos_t, ratio)
        u_fr = rng.next()
        do_reflect = cannot | (refl_prob > u_fr)
        diel_dir = V3.where(
            do_reflect, optics.reflect(view_dir, n), optics.refract(view_dir, n, ratio)
        )

        new_dir = V3.where(
            is_lambert,
            lambert_dir,
            V3.where(is_diel, diel_dir, V3.where(is_metal | is_mirror, metal_dir, lambert_dir)),
        )
        one3 = V3.full(shape, 1.0)
        attenuation = V3.where(is_diel, one3, hit.albedo)
        scattered_ok = ~is_emissive

        # Beer–Lambert via exit scan (renderer.go:316-371)
        new_orig = p
        if cfg.has_dielectric:
            scan_lanes = is_diel & entering & ~do_reflect & alive
            found, exit_p = _dielectric_exit_scan(p, new_dir, pack)
            delta = exit_p - p
            dist = delta.length()
            has_abs = hit.absorption.any_positive()
            beer = (-(hit.absorption * dist)).exp()
            apply = scan_lanes & found
            attenuation = V3.where(apply & has_abs, beer, attenuation)
            new_orig = V3.where(apply, exit_p, new_orig)
        # NOTE: the CPU reference applies the exit scan to *reflected*
        # dielectric rays too (it only checks rec.frontFace,
        # renderer.go:319); in practice a reflected ray leaves the surface
        # and finds no backface within range.  We scan only refracted
        # entering rays — identical observable behavior, fewer sweeps.

        # Russian roulette (renderer.go:373-393)
        remaining = cfg.max_depth - d
        u_rr = rng.next()
        max_comp = attenuation.max_comp()
        rr_active = remaining <= cfg.rr_threshold
        rr_prob = jnp.minimum(max_comp, _F(0.95))
        rr_kill = rr_active & ((max_comp < _F(1e-6)) | (u_rr > rr_prob))
        rr_scale = jnp.where(rr_active & ~rr_kill, _F(1.0) / jnp.maximum(rr_prob, _F(1e-6)), _F(1.0))
        attenuation = attenuation * rr_scale

        alive = alive & scattered_ok & ~rr_kill
        throughput = V3.where(alive, throughput * attenuation, throughput)
        # CPU scatter rays restart exactly at the hit point (no epsilon
        # offset; tMin=0.001 plays that role, renderer.go:292)
        orig = V3.where(alive, new_orig, orig)
        dirv = V3.where(alive, new_dir, dirv)
        return (d + 1, orig, dirv, throughput, radiance, alive.astype(jnp.int32), rng.state, segments)

    carry = (
        jnp.zeros((), dtype=jnp.int32),
        orig,
        dirv,
        throughput,
        radiance,
        alive0.astype(jnp.int32),
        state,
        segments,
    )
    carry = lax.while_loop(cond, body, carry)
    _d, _o, _dir, _tp, radiance, _alive, state, segments = carry
    return radiance, state, segments


def fog_prepass_grid(orig: V3, dirv: V3, state, pack: ScenePack):
    """Public wrapper over the volumetric single-scatter march, for drivers
    running fog once per pass (PHYSICS.md D6).  Gated on the runtime
    gpu_volumetric flag like the shader (gpu.go:1311)."""
    fog_on = pack.fog[3] > _F(0.5)
    rad, state = _fog_prepass(orig, dirv, state, pack)
    gate = jnp.where(fog_on, _F(1.0), _F(0.0))
    return rad * gate, state


def trace_grid(orig: V3, dirv: V3, state, pack: ScenePack, cfg: TraceConfig, active=None):
    """Trace rays on lane grids (component-wise API).

    ``active``: optional bool grid of initially-live lanes (padding mask).
    On TPU, eligible shapes route to the VMEM-resident Pallas kernel
    (ops/pallas_trace.py); the XLA path is the portable fallback and the
    reference implementation for tests.
    Returns (radiance V3, new_state, segments i32 scalar).
    """
    import os

    if os.environ.get("PATHTRACER_NO_PALLAS", "") not in ("1", "true", "on"):
        from .ops import pallas_trace

        if pallas_trace.pallas_supported(orig.x.shape, pack, cfg, active):
            return pallas_trace.trace_grid_pallas(orig, dirv, state, pack, cfg, active)
    if cfg.contract == "cpu":
        return _trace_cpu(orig, dirv, state, pack, cfg, active)
    return _trace_gpu(orig, dirv, state, pack, cfg, active)


def trace(orig, dirv, state, pack: ScenePack, cfg: TraceConfig):
    """Row-vector convenience wrapper: orig/dirv f32[N,3], state u32[N].

    N must be a multiple of 128 OR small (padded internally).  Returns
    (radiance f32[N,3], new_state u32[N], segments).
    """
    n = orig.shape[0]
    rows = -(-n // LANE)
    if rows > 8:
        # multiples of 8 sublanes keep padded grids Pallas-eligible
        # (Mosaic block-shape rule, ops/pallas_trace.pallas_supported)
        rows = -(-rows // 8) * 8
    n_pad = rows * LANE

    def pad(a):
        if n_pad == n:
            return a
        pad_width = [(0, n_pad - n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad_width)

    # component split (XLA fuses the slices/reshapes)
    op = pad(orig)
    dp = pad(dirv)
    o = V3(op[:, 0].reshape(rows, LANE), op[:, 1].reshape(rows, LANE), op[:, 2].reshape(rows, LANE))
    d = V3(dp[:, 0].reshape(rows, LANE), dp[:, 1].reshape(rows, LANE), dp[:, 2].reshape(rows, LANE))
    st = pad(state).reshape(rows, LANE)
    if n_pad != n:
        active = (jnp.arange(n_pad) < n).reshape(rows, LANE)
    else:
        active = None

    rad, st, segments = trace_grid(o, d, st, pack, cfg, active)

    radiance = jnp.stack(
        [rad.x.reshape(n_pad), rad.y.reshape(n_pad), rad.z.reshape(n_pad)], axis=-1
    )[:n]
    # padded lanes start dead via the `active` mask, so the segment count
    # needs no correction here
    return radiance, st.reshape(n_pad)[:n], segments
