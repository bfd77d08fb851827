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
execution model on a SIMT GPU.  Deliberate deviations from the reference
are listed in PHYSICS.md (D1-D5).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .ops import fog as fog_ops
from .ops import geometry, lights, optics, sampling
from .ops.geometry import BIG_T, Hit, intersect_world
from .ops.rng import LaneRng
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

__all__ = ["TraceConfig", "trace", "trace_config_for_scene"]

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
    enable_nee: bool = True
    has_rough_metal: bool = True
    has_dielectric: bool = True
    rr_threshold: int = 3  # gpu.go:1649 / renderer.go:375


def trace_config_for_scene(sc_pack: ScenePack, scene, max_depth: int, contract: str = "gpu") -> TraceConfig:
    """Build a TraceConfig with feature flags read off the scene."""
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
    return TraceConfig(
        max_depth=max_depth,
        contract=contract,
        enable_fog_march=bool(fogm),
        enable_nee=(contract == "gpu"),
        has_rough_metal=has_rough_metal,
        has_dielectric=has_dielectric,
    )


def _norm(v):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _F(1e-20)))


def _material_rows(pack: ScenePack, mat_idx):
    """Fetch per-lane material rows f32[N,20] via one-hot matmul.

    TPU gathers lower to slow scalar loops; a [N,M] one-hot times the
    [M,20] material table instead rides the MXU and fetches all 20 fields
    in one shot (material counts are tiny, M <= ~30).
    """
    m = pack.mat.shape[0]
    onehot = (mat_idx[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]).astype(
        jnp.float32
    )
    return jnp.dot(onehot, pack.mat, preferred_element_type=jnp.float32)


def _max3(v):
    return jnp.maximum(v[:, 0], jnp.maximum(v[:, 1], v[:, 2]))


# ---------------------------------------------------------------------------
# GPU contract
# ---------------------------------------------------------------------------


def _fog_prepass(orig, dirv, state, pack: ScenePack):
    """Single-scatter march along the primary ray (gpu.go:1311-1341).

    24 fixed steps to min(firstHit, 40); per step, transmittance
    ``exp(-sigma_t(pos) * t)`` times the in-fog light estimate.
    Returns (radiance_add f32[N,3], rng_state).
    """
    hit = intersect_world(orig, dirv, pack, _F(0.001))
    t_max = jnp.minimum(jnp.where(hit.hit, hit.t, fog_ops.FOG_MARCH_TMAX), fog_ops.FOG_MARCH_TMAX)
    step = t_max * _F(1.0 / fog_ops.FOG_MARCH_STEPS)
    fog_color = pack.fog[4:7]

    def body(i, carry):
        radiance, st = carry
        rng = LaneRng(st)
        t = (i.astype(jnp.float32) + _F(0.5)) * step
        pos = orig + dirv * t[:, None]
        sigma_s, _sigma_a, sigma_t = fog_ops.medium_coeffs(pos, pack.fog)
        tr = jnp.exp(-sigma_t * t)
        ls = fog_ops.estimate_volume_light(pos, dirv, pack, rng)
        dl = fog_color[None, :] * ls * (sigma_s * tr * step)[:, None]
        ok = (sigma_t > 0) & (sigma_s > 0) & (step > 0)
        radiance = radiance + jnp.where(ok[:, None], dl, _F(0.0))
        return radiance, rng.state

    radiance0 = jnp.zeros_like(orig)
    radiance, state = lax.fori_loop(0, fog_ops.FOG_MARCH_STEPS, body, (radiance0, state))
    return radiance, state


def _shade_gpu(hit: Hit, dirv, throughput, radiance, rng: LaneRng, pack: ScenePack, cfg: TraceConfig):
    """One GPU-contract surface interaction for all lanes (gpu.go:1398-1646).

    Returns (new_dir, attenuation, radiance, scattered_ok, enter_glass,
    exit_glass, travel_distance).
    """
    rows = _material_rows(pack, hit.mat_idx)
    typ = jnp.round(rows[:, 0]).astype(jnp.int32)
    rough = rows[:, 1]
    ior = rows[:, 2]
    smoothness = rows[:, 3]
    albedo = rows[:, 4:7]
    reflectivity = rows[:, 7]
    emit = rows[:, 8:11]
    absorption = rows[:, 12:15]
    abs_scale = rows[:, 15]
    tint = rows[:, 16:19]

    n = hit.normal
    p = hit.p
    view_dir = _norm(dirv)

    is_lambert = typ == MAT_LAMBERT
    is_metal = typ == MAT_METAL
    is_mirror = typ == MAT_MIRROR
    is_diel = typ == MAT_DIELECTRIC
    is_emissive = typ == MAT_EMISSIVE

    # emissive adds Le (gpu.go:1409-1411)
    radiance = radiance + jnp.where(is_emissive[:, None], throughput * emit, _F(0.0))

    # ---- Lambert: cosine bounce + NEE (gpu.go:1419-1425) ----
    u1 = rng.next()
    u2 = rng.next()
    lambert_dir = sampling.cosine_direction(n, u1, u2)
    if cfg.enable_nee and pack.n_lights > 0:
        direct = lights.estimate_direct_light(p, n, albedo, pack, rng)
    else:
        direct = jnp.zeros_like(p)
    radiance = radiance + jnp.where(is_lambert[:, None], throughput * direct, _F(0.0))

    # ---- Metal / mirror (gpu.go:1427-1496) ----
    metal_rough = jnp.where(smoothness > 0, _F(1.0) - smoothness, rough)
    eff_refl = jnp.where(reflectivity > 0, reflectivity, _F(1.0))
    is_rough_metal = is_metal & (metal_rough > _F(1e-4))

    mirror_dir = optics.reflect(view_dir, n)
    if cfg.has_rough_metal:
        g1 = rng.next()
        g2 = rng.next()
        ggx_dir = sampling.sample_ggx(view_dir, n, metal_rough, g1, g2)
        metal_dir = jnp.where(is_rough_metal[:, None], ggx_dir, mirror_dir)
    else:
        metal_dir = mirror_dir

    mr2 = metal_rough * metal_rough
    spec_w = jnp.clip(_F(1.0) / (_F(1.0) + mr2 * _F(2.0)), _F(0.1), _F(0.9))
    diff_w = _F(1.0) - spec_w
    # rough-metal diffuse NEE reuses the same unbiased estimator computed
    # above (the shader calls estimateDirectLight again on a disjoint
    # thread branch; one evaluation per lane is statistically identical).
    radiance = radiance + jnp.where(
        is_rough_metal[:, None],
        throughput * direct * (diff_w * eff_refl * _F(0.5))[:, None],
        _F(0.0),
    )
    atten_metal = jnp.where(
        is_rough_metal[:, None],
        albedo * (spec_w * eff_refl + diff_w * _F(0.3))[:, None],
        albedo * eff_refl[:, None],
    )
    metal_dot = jnp.sum(metal_dir * n, axis=-1)
    metal_dead = (is_metal | is_mirror) & (metal_dot <= _F(1e-6))

    # rough-metal "specular NEE": trace the perfect reflection, credit
    # emissive hits (gpu.go:1474-1496)
    if cfg.has_rough_metal and cfg.enable_nee:
        refl_orig = p + n * _F(0.001)
        rhit = intersect_world(refl_orig, mirror_dir, pack, _F(0.001))
        r_rows = _material_rows(pack, rhit.mat_idx)
        r_emit = r_rows[:, 8:11]
        r_is_emissive = jnp.round(r_rows[:, 0]).astype(jnp.int32) == MAT_EMISSIVE
        dist_sq = jnp.maximum(rhit.t * rhit.t, _F(1e-20))
        cos_light = jnp.maximum(_F(0), jnp.sum(rhit.normal * -mirror_dir, axis=-1))
        direct_reflect = r_emit * (cos_light / dist_sq)[:, None]
        ok = is_rough_metal & ~metal_dead & rhit.hit & r_is_emissive
        radiance = radiance + jnp.where(
            ok[:, None], throughput * direct_reflect * albedo * _F(0.5), _F(0.0)
        )

    # ---- Dielectric (gpu.go:1498-1642) ----
    enter_glass = jnp.zeros_like(is_diel)
    exit_glass = jnp.zeros_like(is_diel)
    travel = jnp.zeros_like(rough)
    atten_diel = jnp.ones_like(p)
    diel_dir = mirror_dir
    if cfg.has_dielectric:
        cos_t = jnp.minimum(jnp.sum(-view_dir * n, axis=-1), _F(1.0))
        sin2 = jnp.maximum(_F(0.0), _F(1.0) - cos_t * cos_t)
        sin_t = jnp.sqrt(sin2)
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
        diel_dir = _norm(jnp.where(do_reflect[:, None], optics.reflect(view_dir, n), refr_dir))

        refracting = is_diel & ~do_reflect
        enter_glass = refracting & entering
        exit_glass = refracting & ~entering

        # travel distance through own object (gpu.go:1547-1592); the hit
        # record carries the winner's geometry, so no table gathers
        own_type = hit.obj_type
        own_pos = hit.obj_pos
        own_size = hit.obj_size
        exit_orig = p + diel_dir * _F(0.001)
        half = own_size * _F(0.5)
        b_ok, b_t = geometry.box_exit_t(exit_orig, diel_dir, own_pos - half, own_pos + half)
        s_ok, s_t = geometry.sphere_exit_t(exit_orig, diel_dir, own_pos, own_size[:, 0])
        travel = jnp.where(
            (own_type == OBJ_BOX) & b_ok,
            b_t,
            jnp.where((own_type == OBJ_SPHERE) & s_ok, s_t, _F(0.0)),
        )
        travel = jnp.where(enter_glass, travel, _F(0.0))

        # Beer–Lambert with the reference's 0.1 + 0.9*exp mix and tint
        # (gpu.go:1597-1638)
        eff_abs = absorption * abs_scale[:, None]
        absorb_enter = jnp.exp(-eff_abs * travel[:, None])
        has_tint = jnp.any(tint > 0, axis=-1)
        tint_mul = jnp.where(has_tint[:, None], tint, _F(1.0))
        enter_mul = (_F(0.1) + absorb_enter * _F(0.9)) * tint_mul
        atten_diel = jnp.where(
            (enter_glass & (travel > 0))[:, None], enter_mul, atten_diel
        )

    # ---- combine ----
    new_dir = jnp.where(
        is_lambert[:, None],
        lambert_dir,
        jnp.where(is_diel[:, None], diel_dir, metal_dir),
    )
    attenuation = jnp.where(
        is_lambert[:, None],
        albedo,
        jnp.where(
            is_diel[:, None],
            atten_diel,
            jnp.where((is_metal | is_mirror)[:, None], atten_metal, albedo),
        ),
    )
    # emissive (and any unknown type) stops the path; metal below-horizon
    # too.  PHYSICS.md D4: the shader computes scattered=false here but
    # never tests it — we terminate, matching the CPU contract's intent.
    scattered_ok = ~(is_emissive | metal_dead)
    return new_dir, attenuation, radiance, scattered_ok, enter_glass, exit_glass, travel, absorption, abs_scale, tint


def _trace_gpu(orig, dirv, state, pack: ScenePack, cfg: TraceConfig):
    n = orig.shape[0]
    radiance = jnp.zeros_like(orig)

    if cfg.enable_fog_march:
        fog_on = pack.fog[3] > _F(0.5)
        fog_radiance, state = _fog_prepass(orig, dirv, state, pack)
        radiance = radiance + jnp.where(fog_on, _F(1.0), _F(0.0)) * fog_radiance

    throughput = jnp.ones_like(orig)
    alive = jnp.ones((n,), dtype=bool)
    glass_obj = jnp.full((n,), -1, dtype=jnp.int32)
    glass_dist = jnp.zeros((n,), dtype=jnp.float32)
    segments = jnp.zeros((), dtype=jnp.int32)

    # legacy sky fog condition (gpu.go:1392)
    sky_fog = (pack.fog[0] > 0) & (pack.fog[2] > _F(0.5))

    def cond(carry):
        d, _o, _dir, _tp, _rad, alive, _st, _go, _gd, _seg = carry
        return (d < cfg.max_depth) & jnp.any(alive)

    def body(carry):
        d, orig, dirv, throughput, radiance, alive, st, glass_obj, glass_dist, segments = carry
        segments = segments + jnp.sum(alive, dtype=jnp.int32)
        rng = LaneRng(st)

        hit = intersect_world(orig, dirv, pack, _F(0.001), exclude_obj=glass_obj)

        # miss -> sky (+ legacy fog), terminate (gpu.go:1389-1396)
        unit_d = _norm(dirv)
        from .ops.sky import background_color

        bg = background_color(unit_d, pack.sky)
        bg_fogged = fog_ops.apply_legacy_fog(bg, 50.0, pack.fog)
        bg = jnp.where(sky_fog, bg_fogged, bg)
        miss = alive & ~hit.hit
        radiance = radiance + jnp.where(miss[:, None], throughput * bg, _F(0.0))
        alive = alive & hit.hit

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
        ) = _shade_gpu(hit, dirv, jnp.where(alive[:, None], throughput, _F(0.0)), radiance, rng, pack, cfg)

        # glass-state bookkeeping (gpu.go:1545, 1615, 1598, 1638)
        if cfg.has_dielectric:
            # exit applies Beer–Lambert on the *accumulated* distance with
            # the exited material's coefficients (gpu.go:1620-1637)
            eff_abs = absorption * abs_scale[:, None]
            absorb_exit = jnp.exp(-eff_abs * glass_dist[:, None])
            has_tint = jnp.any(tint > 0, axis=-1)
            tint_mul = jnp.where(has_tint[:, None], tint, _F(1.0))
            exit_mul = (_F(0.1) + absorb_exit * _F(0.9)) * tint_mul
            exit_apply = (alive & exit_glass & (glass_dist > 0))[:, None]
            attenuation = jnp.where(exit_apply, attenuation * exit_mul, attenuation)

            enter_ok = alive & enter_glass
            exit_ok = alive & exit_glass
            glass_obj = jnp.where(enter_ok, hit.obj_idx, jnp.where(exit_ok, -1, glass_obj))
            glass_dist = jnp.where(
                enter_ok & (travel > 0), travel, jnp.where(exit_ok, _F(0.0), glass_dist)
            )

        # russian roulette on remaining depth (gpu.go:1648-1660)
        remaining = cfg.max_depth - d
        u_rr = rng.next()
        max_comp = _max3(attenuation)
        rr_active = remaining <= cfg.rr_threshold
        rr_prob = jnp.minimum(max_comp, _F(0.95))
        rr_kill = rr_active & ((max_comp < _F(1e-6)) | (u_rr > rr_prob))
        attenuation = jnp.where(
            (rr_active & ~rr_kill)[:, None],
            attenuation / jnp.maximum(rr_prob, _F(1e-6))[:, None],
            attenuation,
        )

        alive = alive & scattered_ok & ~rr_kill
        throughput = jnp.where(alive[:, None], throughput * attenuation, throughput)
        orig = jnp.where(alive[:, None], hit.p + hit.normal * _F(0.001), orig)
        dirv = jnp.where(alive[:, None], new_dir, dirv)
        return (d + 1, orig, dirv, throughput, radiance, alive, rng.state, glass_obj, glass_dist, segments)

    carry = (
        jnp.zeros((), dtype=jnp.int32),
        orig,
        dirv,
        throughput,
        radiance,
        alive,
        state,
        glass_obj,
        glass_dist,
        segments,
    )
    carry = lax.while_loop(cond, body, carry)
    _d, _o, _dir, _tp, radiance, _alive, state, _go, _gd, segments = carry
    return radiance, state, segments


# ---------------------------------------------------------------------------
# CPU contract (renderer.go rayColorOpt + materials.go scatter)
# ---------------------------------------------------------------------------


def _dielectric_exit_scan(orig, dirv, pack: ScenePack):
    """Closest dielectric *backface* hit along a refracted ray
    (renderer.go:316-371): candidates must be dielectric, not front-facing,
    with squared distance from the ray origin in (1e-8, 1000).

    Unrolled over the static object list, visiting only dielectric objects.
    Returns (found bool[N], exit_p f32[N,3]).
    """
    ox, oy, oz = orig[:, 0], orig[:, 1], orig[:, 2]
    dx, dy, dz = dirv[:, 0], dirv[:, 1], dirv[:, 2]
    best_t = jnp.full(orig.shape[:1], BIG_T)

    for m, typ, (cx, cy, cz), (sx, sy, sz), t, ok in geometry._object_candidates(
        orig, dirv, pack, _F(1e-4)  # exitTMin (renderer.go:322)
    ):
        if pack.mat_types[pack.obj_mats[m]] != MAT_DIELECTRIC:
            continue
        px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
        if typ == OBJ_SPHERE:
            # backface iff dot(dir, p - center) >= 0
            front = (dx * (px - cx) + dy * (py - cy) + dz * (pz - cz)) < 0
        elif typ == OBJ_PLANE:
            front = dy < 0
        else:  # box: nearest-face normal chain (objects.go:186-219 analog)
            hx, hy, hz = sx * _F(0.5), sy * _F(0.5), sz * _F(0.5)
            lx, ly, lz = px - cx, py - cy, pz - cz
            eps = _F(1e-4)
            on_x = jnp.abs(jnp.abs(lx) - hx) < eps
            on_y = jnp.abs(jnp.abs(ly) - hy) < eps
            ndot = jnp.where(
                on_x,
                dx * jnp.sign(lx),
                jnp.where(on_y, dy * jnp.sign(ly), dz * jnp.sign(lz)),
            )
            front = ndot < 0
        dist_sq = (px - ox) ** 2 + (py - oy) ** 2 + (pz - oz) ** 2
        ok = ok & ~front & (dist_sq > _F(1e-8)) & (dist_sq < _F(1000.0))
        best_t = jnp.where(ok & (t < best_t), t, best_t)

    found = best_t < BIG_T
    t_safe = jnp.where(found, best_t, _F(0.0))
    exit_p = orig + dirv * t_safe[:, None]
    return found, exit_p


def _trace_cpu(orig, dirv, state, pack: ScenePack, cfg: TraceConfig):
    """CPU-contract integrator (renderer.go:286-404, materials.go:74-224)."""
    n = orig.shape[0]
    radiance = jnp.zeros_like(orig)
    throughput = jnp.ones_like(orig)
    alive = jnp.ones((n,), dtype=bool)
    segments = jnp.zeros((), dtype=jnp.int32)

    from .ops.sky import background_color

    def cond(carry):
        d = carry[0]
        alive = carry[5]
        return (d < cfg.max_depth) & jnp.any(alive)

    def body(carry):
        d, orig, dirv, throughput, radiance, alive, st, segments = carry
        segments = segments + jnp.sum(alive, dtype=jnp.int32)
        rng = LaneRng(st)

        hit = intersect_world(orig, dirv, pack, _F(0.001))
        unit_d = _norm(dirv)
        bg = background_color(unit_d, pack.sky)
        miss = alive & ~hit.hit
        radiance = radiance + jnp.where(miss[:, None], throughput * bg, _F(0.0))
        alive = alive & hit.hit

        rows = _material_rows(pack, hit.mat_idx)
        typ = jnp.round(rows[:, 0]).astype(jnp.int32)
        albedo = rows[:, 4:7]
        emit = rows[:, 8:11]
        # CPU loader: metal rough = 1 - smoothness when smoothness > 0
        # (materials.go:36-39); lambert rough straight from scene.
        smoothness = rows[:, 3]
        rough_raw = rows[:, 1]
        rough = jnp.where(
            (typ == MAT_METAL) & (smoothness > 0),
            jnp.clip(_F(1.0) - smoothness, _F(0.0), _F(1.0)),
            jnp.clip(rough_raw, _F(0.0), _F(1.0)),
        )
        ior = jnp.where(rows[:, 2] == 0, _F(1.5), rows[:, 2])  # materials.go:42-45
        absorption = rows[:, 12:15]

        nrm = hit.normal
        p = hit.p
        view_dir = _norm(dirv)

        is_lambert = typ == MAT_LAMBERT
        is_metal = typ == MAT_METAL
        is_mirror = typ == MAT_MIRROR
        is_diel = typ == MAT_DIELECTRIC
        is_emissive = typ == MAT_EMISSIVE

        # emitted (materials.go:67-72); emissive does not scatter
        radiance = radiance + jnp.where((alive & is_emissive)[:, None], throughput * emit, _F(0.0))

        # Lambert: cosine + small rough jitter (materials.go:76-97)
        u1 = rng.next()
        u2 = rng.next()
        cos_dir = sampling.cosine_direction(nrm, u1, u2)
        jit_ball = sampling.unit_ball(*rng.next3())
        lam_dir = cos_dir + jit_ball * (rough * _F(0.1))[:, None]
        lam_dir = _norm(lam_dir)
        lambert_dir = jnp.where((rough > _F(1e-6))[:, None], lam_dir, cos_dir)

        # Metal: lerp mirror -> cosine-around-mirror by alpha=rough^2
        # (materials.go:99-160)
        reflected = optics.reflect(view_dir, nrm)
        m1 = rng.next()
        m2 = rng.next()
        cos_around_refl = sampling.cosine_direction(reflected, m1, m2)
        alpha = (rough * rough)[:, None]
        blended = reflected * (_F(1.0) - alpha) + cos_around_refl * alpha
        blen2 = jnp.sum(blended * blended, axis=-1)
        blended = jnp.where((blen2 < _F(1e-8))[:, None], reflected, _norm(blended))
        wrong_hemi = jnp.sum(blended * nrm, axis=-1) <= 0
        rough_metal_dir = jnp.where(wrong_hemi[:, None], reflected, blended)
        metal_dir = jnp.where((rough > _F(1e-6))[:, None], rough_metal_dir, reflected)

        # Dielectric (materials.go:162-200): note reflectance uses the
        # *refraction ratio* (1/ior on entry), unlike the GPU contract.
        cos_t = jnp.minimum(jnp.sum(-view_dir * nrm, axis=-1), _F(1.0))
        sin_t = jnp.sqrt(jnp.maximum(_F(0.0), _F(1.0) - cos_t * cos_t))
        entering = hit.front_face
        ratio = jnp.where(entering, _F(1.0) / ior, ior)
        cannot = ratio * sin_t > _F(1.0)
        refl_prob = optics.schlick(cos_t, ratio)
        u_fr = rng.next()
        do_reflect = cannot | (refl_prob > u_fr)
        diel_dir = jnp.where(
            do_reflect[:, None], optics.reflect(view_dir, nrm), optics.refract(view_dir, nrm, ratio)
        )

        new_dir = jnp.where(
            is_lambert[:, None],
            lambert_dir,
            jnp.where(
                is_diel[:, None],
                diel_dir,
                jnp.where((is_metal | is_mirror)[:, None], metal_dir, lambert_dir),
            ),
        )
        attenuation = jnp.where(is_diel[:, None], jnp.ones_like(albedo), albedo)
        scattered_ok = ~is_emissive

        # Beer–Lambert via exit scan (renderer.go:316-371)
        new_orig = p
        if cfg.has_dielectric:
            scan_lanes = is_diel & entering & ~do_reflect & alive
            found, exit_p = _dielectric_exit_scan(p, new_dir, pack)
            delta = exit_p - p
            dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, axis=-1), _F(0.0)))
            has_abs = jnp.any(absorption > 0, axis=-1)
            beer = jnp.exp(-absorption * dist[:, None])
            apply = scan_lanes & found
            attenuation = jnp.where(
                (apply & has_abs)[:, None], beer, attenuation
            )
            new_orig = jnp.where(apply[:, None], exit_p, new_orig)
        # NOTE: the CPU reference applies the exit scan to *reflected*
        # dielectric rays too (it only checks rec.frontFace,
        # renderer.go:319); in practice a reflected ray leaves the surface
        # and finds no backface within range.  We scan only refracted
        # entering rays — identical observable behavior, fewer sweeps.

        # Russian roulette (renderer.go:373-393)
        remaining = cfg.max_depth - d
        u_rr = rng.next()
        max_comp = _max3(attenuation)
        rr_active = remaining <= cfg.rr_threshold
        rr_prob = jnp.minimum(max_comp, _F(0.95))
        rr_kill = rr_active & ((max_comp < _F(1e-6)) | (u_rr > rr_prob))
        attenuation = jnp.where(
            (rr_active & ~rr_kill)[:, None],
            attenuation / jnp.maximum(rr_prob, _F(1e-6))[:, None],
            attenuation,
        )

        alive = alive & scattered_ok & ~rr_kill
        throughput = jnp.where(alive[:, None], throughput * attenuation, throughput)
        # CPU scatter rays restart exactly at the hit point (no epsilon
        # offset; tMin=0.001 plays that role, renderer.go:292)
        orig = jnp.where(alive[:, None], new_orig, orig)
        dirv = jnp.where(alive[:, None], new_dir, dirv)
        return (d + 1, orig, dirv, throughput, radiance, alive, rng.state, segments)

    carry = (
        jnp.zeros((), dtype=jnp.int32),
        orig,
        dirv,
        throughput,
        radiance,
        alive,
        state,
        segments,
    )
    carry = lax.while_loop(cond, body, carry)
    _d, _o, _dir, _tp, radiance, _alive, state, segments = carry
    return radiance, state, segments


def trace(orig, dirv, state, pack: ScenePack, cfg: TraceConfig):
    """Trace a batch of primary rays to completion.

    orig/dirv: f32[N,3]; state: uint32[N] lane RNG states.
    Returns (radiance f32[N,3], new_state uint32[N], segments i32 scalar).
    """
    if cfg.contract == "cpu":
        return _trace_cpu(orig, dirv, state, pack, cfg)
    return _trace_gpu(orig, dirv, state, pack, cfg)
