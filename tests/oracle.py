"""Independent NumPy oracle of the GPU physics contract.

A from-scratch, pure-NumPy path tracer written against PHYSICS.md (the
same contract the JAX implementation targets), deliberately structured
differently — [N, M] candidate matrices, argmin closest-hit, numpy RNG
draws in its own order — so that agreement with the framework is evidence
of physics correctness rather than shared code.  Fog is excluded (covered
by dedicated analytic tests); everything else is in: sky, lambert + NEE
with the <=8-light loop and 500-luminance clamp, GGX metals (corrected
sign, PHYSICS.md D3) with specular NEE, mirrors, dielectrics with the
tracked-glass-object semantics (Q2) and the 0.1+0.9*exp Beer-Lambert mix,
russian roulette, 16x stratified passes (Q1).

Comparison is statistical (equal expected value, independent sample
streams), not bitwise.
"""

from __future__ import annotations

import numpy as np

F = np.float32
BIG = np.float32(1e20)


def _normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


class Oracle:
    def __init__(self, scene, width, height, max_depth, rng=None):
        from path_trace_golang_tpu.soa import pack_scene

        self.pack = pack_scene(scene, width, height)
        self.mat = np.asarray(self.pack.mat, np.float64)
        self.obj = np.asarray(self.pack.obj, np.float64)
        self.cam = np.asarray(self.pack.cam, np.float64)
        self.sky = np.asarray(self.pack.sky, np.float64)
        self.lights = list(self.pack.light_objs)
        self.width, self.height, self.max_depth = width, height, max_depth
        self.rng = rng or np.random.default_rng(0)
        self.aperture = scene.camera.aperture

    # --- geometry -------------------------------------------------------

    def hit_world(self, o, d, t_min=1e-3, exclude=None):
        """Closest hit via [N, M] candidate matrix + argmin.

        Returns dict of arrays: hit, t, p, n (face-flipped), front, oi, mi.
        """
        n = o.shape[0]
        m = self.obj.shape[0]
        pos = self.obj[:, 4:7]
        size = self.obj[:, 8:11]
        typ = self.obj[:, 0].astype(int)

        t_all = np.full((n, m), BIG, np.float64)
        for j in range(m):
            if typ[j] == 0:  # sphere
                oc = o - pos[j]
                a = np.sum(d * d, axis=-1)
                hb = np.sum(oc * d, axis=-1)
                c = np.sum(oc * oc, axis=-1) - size[j, 0] ** 2
                disc = hb * hb - a * c
                ok = disc >= 1e-8
                sq = np.sqrt(np.maximum(disc, 0))
                near = (-hb - sq) / a
                far = (-hb + sq) / a
                t = np.where(near >= t_min, near, far)
                t_all[:, j] = np.where(ok & (t >= t_min), t, BIG)
            elif typ[j] == 1:  # plane, +Y normal
                denom = d[:, 1]
                ok = np.abs(denom) >= 1e-6
                t = (pos[j, 1] - o[:, 1]) / np.where(ok, denom, 1.0)
                t_all[:, j] = np.where(ok & (t >= t_min), t, BIG)
            else:  # box
                half = size[j] * 0.5
                with np.errstate(divide="ignore", invalid="ignore"):
                    inv = 1.0 / d
                t1 = (pos[j] - half - o) * inv
                t2 = (pos[j] + half - o) * inv
                lo = np.minimum(t1, t2)
                hi = np.maximum(t1, t2)
                t0 = np.maximum(lo.max(axis=-1), t_min)
                t1x = hi.min(axis=-1)
                t_all[:, j] = np.where(t1x > t0, t0, BIG)

        if exclude is not None:
            t_all[np.arange(n), np.clip(exclude, 0, m - 1)] = np.where(
                exclude >= 0, BIG, t_all[np.arange(n), np.clip(exclude, 0, m - 1)]
            )

        oi = np.argmin(t_all, axis=-1)
        t = t_all[np.arange(n), oi]
        hit = t < BIG
        t_safe = np.where(hit, t, 0.0)
        p = o + d * t_safe[:, None]

        # outward normals
        nrm = np.zeros((n, 3))
        for j in range(m):
            sel = oi == j
            if not sel.any():
                continue
            if typ[j] == 0:
                nrm[sel] = (p[sel] - pos[j]) / max(size[j, 0], 1e-20)
            elif typ[j] == 1:
                nrm[sel] = [0, 1, 0]
            else:
                half = size[j] * 0.5
                loc = p[sel] - pos[j]
                al = np.abs(loc)
                nj = np.zeros_like(loc)
                on_x = np.abs(al[:, 0] - half[0]) < 1e-4
                on_y = ~on_x & (np.abs(al[:, 1] - half[1]) < 1e-4)
                on_z = ~on_x & ~on_y
                nj[on_x, 0] = np.sign(loc[on_x, 0])
                nj[on_y, 1] = np.sign(loc[on_y, 1])
                nj[on_z, 2] = np.sign(loc[on_z, 2])
                nrm[sel] = nj
        front = np.sum(d * nrm, axis=-1) < 0
        nrm = np.where(front[:, None], nrm, -nrm)
        return dict(hit=hit, t=t, p=p, n=nrm, front=front, oi=oi, mi=self.obj[oi, 1].astype(int))

    def occluded(self, o, d, t_max):
        h = self.hit_world(o, d, t_min=1e-3)
        return h["hit"] & (h["t"] <= t_max)

    # --- shading helpers --------------------------------------------------

    def sky_color(self, d):
        st = int(round(self.sky[0]))
        if st == 2:
            t = np.clip((d[:, 1] + 1) * 0.5, 0, 1)[:, None]
            return self.sky[8:11] * (1 - t) + self.sky[12:15] * t
        return np.broadcast_to(self.sky[4:7], d.shape).copy()

    def nee(self, p, n, albedo):
        """estimateDirectLight: all lights (scenes here have <= 8)."""
        count = len(self.lights)
        if count == 0:
            return np.zeros_like(p)
        total = np.zeros_like(p)
        for lo in self.lights:
            if int(self.obj[lo, 0]) != 0:
                continue
            c, r = self.obj[lo, 4:7], self.obj[lo, 8]
            emit = self.mat[int(self.obj[lo, 1]), 8:11]
            z = 1 - 2 * self.rng.random(p.shape[0])
            phi = 2 * np.pi * self.rng.random(p.shape[0])
            rr = np.sqrt(np.maximum(0, 1 - z * z))
            ln = np.stack([rr * np.cos(phi), rr * np.sin(phi), z], -1)
            lp = c + r * ln
            to_l = lp - p
            d2 = np.sum(to_l**2, -1)
            dist = np.sqrt(np.maximum(d2, 1e-20))
            wi = to_l / dist[:, None]
            blocked = self.occluded(p + n * 1e-3, wi, dist - 2e-3)
            cs = np.maximum(0, np.sum(n * wi, -1))
            cl = np.maximum(0, -np.sum(ln * wi, -1))
            ok = (d2 > 1e-6) & ~blocked & (cs > 0) & (cl > 0)
            area = 4 * np.pi * r * r
            contrib = albedo / np.pi * emit * (cs * cl / np.maximum(d2, 1e-6) * min(area, 1e6))[:, None]
            lum = contrib @ np.array([0.2126, 0.7152, 0.0722])
            scale = np.where(lum > 500.0, 500.0 / np.maximum(lum, 1e-6), 1.0)
            total += np.where(ok[:, None], contrib * scale[:, None], 0.0)
        return total / count

    def cosine_dir(self, n):
        """Skewed-frame cosine sampling (PHYSICS.md Q3)."""
        nn = n.shape[0]
        phi = 2 * np.pi * self.rng.random(nn)
        r2 = self.rng.random(nn)
        ct, st = np.sqrt(r2), np.sqrt(np.maximum(0, 1 - r2))
        use_y = np.abs(n[:, 0]) > 0.9
        axis = np.where(use_y[:, None], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0])
        v = _normalize(np.cross(n, axis))
        d = axis * (st * np.cos(phi))[:, None] + v * (st * np.sin(phi))[:, None] + n * ct[:, None]
        return _normalize(d)

    def ggx_dir(self, inc, n, rough):
        nn = n.shape[0]
        a2 = (rough**2) ** 2
        r1, r2 = self.rng.random(nn), self.rng.random(nn)
        ct = np.sqrt(np.maximum(0, (1 - r2) / (1 + (a2 - 1) * r2)))
        st = np.sqrt(np.maximum(0, 1 - ct * ct))
        phi = 2 * np.pi * r1
        use_x = np.abs(n[:, 2]) >= 0.999
        up = np.where(use_x[:, None], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0])
        tang = _normalize(np.cross(up, n))
        bit = np.cross(n, tang)
        h = _normalize(tang * (st * np.cos(phi))[:, None] + bit * (st * np.sin(phi))[:, None] + n * ct[:, None])
        refl = inc - 2 * np.sum(inc * h, -1, keepdims=True) * h
        below = np.sum(refl * n, -1) <= 0
        mirror = inc - 2 * np.sum(inc * n, -1, keepdims=True) * n
        return _normalize(np.where(below[:, None], mirror, refl))

    # --- integrator -------------------------------------------------------

    def ray_color(self, o, d):
        n_rays = o.shape[0]
        radiance = np.zeros((n_rays, 3))
        thr = np.ones((n_rays, 3))
        alive = np.ones(n_rays, bool)
        glass = np.full(n_rays, -1)
        glass_d = np.zeros(n_rays)
        o, d = o.copy(), d.copy()

        for depth_i in range(self.max_depth):
            if not alive.any():
                break
            h = self.hit_world(o, d, exclude=glass)
            miss = alive & ~h["hit"]
            radiance[miss] += thr[miss] * self.sky_color(_normalize(d[miss]))
            alive = alive & h["hit"]

            mi = h["mi"]
            mrow = self.mat[mi]
            typ = np.round(mrow[:, 0]).astype(int)
            albedo, emit = mrow[:, 4:7], mrow[:, 8:11]

            em = alive & (typ == 3)
            radiance[em] += thr[em] * emit[em]

            vd = _normalize(d)
            nrm = h["n"]
            new_dir = np.zeros_like(d)
            atten = albedo.copy()
            dead = ~alive | (typ == 3)

            # lambert
            lam = alive & (typ == 0)
            if lam.any():
                new_dir[lam] = self.cosine_dir(nrm[lam])
                radiance[lam] += thr[lam] * self.nee(h["p"][lam], nrm[lam], albedo[lam])

            # metal / mirror
            met = alive & ((typ == 1) | (typ == 4))
            if met.any():
                rough = np.where(mrow[:, 3] > 0, 1 - mrow[:, 3], mrow[:, 1])
                refl = np.where(mrow[:, 7] > 0, mrow[:, 7], 1.0)
                mirror = vd - 2 * np.sum(vd * nrm, -1, keepdims=True) * nrm
                isr = met & (typ == 1) & (rough > 1e-4)
                nd = mirror.copy()
                if isr.any():
                    nd[isr] = self.ggx_dir(vd[isr], nrm[isr], rough[isr])
                new_dir[met] = nd[met]
                sw = np.clip(1 / (1 + rough**2 * 2), 0.1, 0.9)
                dw = 1 - sw
                if isr.any():
                    direct = self.nee(h["p"][isr], nrm[isr], albedo[isr])
                    radiance[isr] += thr[isr] * direct * (dw[isr] * refl[isr] * 0.5)[:, None]
                    # specular NEE: perfect reflection toward emissives
                    ro = h["p"][isr] + nrm[isr] * 1e-3
                    rh = self.hit_world(ro, mirror[isr])
                    rm = self.mat[rh["mi"]]
                    r_em = np.round(rm[:, 0]).astype(int) == 3
                    cl = np.maximum(0, -np.sum(rh["n"] * mirror[isr], -1))
                    dr = rm[:, 8:11] * (cl / np.maximum(rh["t"] ** 2, 1e-20))[:, None]
                    add = np.where((rh["hit"] & r_em)[:, None], thr[isr] * dr * albedo[isr] * 0.5, 0)
                    radiance[isr] += add
                at = np.where(
                    isr[:, None],
                    albedo * (sw * refl + dw * 0.3)[:, None],
                    albedo * refl[:, None],
                )
                atten[met] = at[met]
                below = met & (np.sum(new_dir * nrm, -1) <= 1e-6)
                dead = dead | below

            # dielectric
            die = alive & (typ == 2)
            if die.any():
                ior = mrow[:, 2]
                ct = np.minimum(-np.sum(vd * nrm, -1), 1.0)
                stheta = np.sqrt(np.maximum(0, 1 - ct * ct))
                entering = h["front"]
                eta = np.where(entering, 1 / np.maximum(ior, 1e-6), ior)
                rel = np.where(entering, ior, 1 / np.maximum(ior, 1e-6))
                tir = eta * stheta > 1
                r0 = ((rel - 1) / (rel + 1)) ** 2
                prob = r0 + (1 - r0) * (1 - ct) ** 5
                prob = np.where(entering, prob, np.maximum(prob, 0.05))
                u = self.rng.random(n_rays)
                do_refl = tir | (u < prob)
                mirror = vd - 2 * np.sum(vd * nrm, -1, keepdims=True) * nrm
                # refract
                rp = eta[:, None] * (vd + ct[:, None] * nrm)
                par = np.sqrt(np.maximum(0, 1 - np.minimum(np.sum(rp * rp, -1), 1)))
                refr = rp - par[:, None] * nrm
                refr = np.where(tir[:, None], mirror, refr)
                dd = _normalize(np.where(do_refl[:, None], mirror, refr))
                new_dir[die] = dd[die]
                atten[die] = 1.0

                refracting = die & ~do_refl
                ent = refracting & entering
                ext = refracting & ~entering
                # analytic exit distance through own object
                travel = np.zeros(n_rays)
                if ent.any():
                    for j in np.unique(h["oi"][ent]):
                        selj = ent & (h["oi"] == j)
                        eo = h["p"][selj] + dd[selj] * 1e-3
                        if int(self.obj[j, 0]) == 0:
                            c, r = self.obj[j, 4:7], self.obj[j, 8]
                            oc = eo - c
                            hb = np.sum(oc * dd[selj], -1)
                            cc = np.sum(oc * oc, -1) - r * r
                            disc = hb * hb - cc
                            texit = -hb + np.sqrt(np.maximum(disc, 0))
                            travel[selj] = np.where((disc > 0) & (texit > 1e-3), texit, 0)
                        elif int(self.obj[j, 0]) == 2:
                            half = self.obj[j, 8:11] * 0.5
                            with np.errstate(divide="ignore", invalid="ignore"):
                                inv = 1.0 / dd[selj]
                            t1 = (self.obj[j, 4:7] - half - eo) * inv
                            t2 = (self.obj[j, 4:7] + half - eo) * inv
                            t0 = np.maximum(np.minimum(t1, t2).max(-1), 1e-3)
                            t1x = np.maximum(t1, t2).min(-1)
                            travel[selj] = np.where((t1x > t0) & (t1x >= 1e-3), t1x, 0)
                    eff = mrow[:, 12:15] * mrow[:, 15:16]
                    absorb = np.exp(-eff * travel[:, None])
                    tint = mrow[:, 16:19]
                    tmul = np.where((tint > 0).any(-1, keepdims=True), tint, 1.0)
                    mul = (0.1 + 0.9 * absorb) * tmul
                    app = ent & (travel > 0)
                    atten[app] = mul[app]
                if ext.any():
                    eff = mrow[:, 12:15] * mrow[:, 15:16]
                    absorb = np.exp(-eff * glass_d[:, None])
                    tint = mrow[:, 16:19]
                    tmul = np.where((tint > 0).any(-1, keepdims=True), tint, 1.0)
                    mul = (0.1 + 0.9 * absorb) * tmul
                    app = ext & (glass_d > 0)
                    atten[app] *= mul[app]
                glass = np.where(ent, h["oi"], np.where(ext, -1, glass))
                glass_d = np.where(ent & (travel > 0), travel, np.where(ext, 0.0, glass_d))

            # russian roulette
            remaining = self.max_depth - depth_i
            if remaining <= 3:
                mc = atten.max(-1)
                pr = np.minimum(mc, 0.95)
                u = self.rng.random(n_rays)
                kill = (mc < 1e-6) | (u > pr)
                atten = np.where(kill[:, None], atten, atten / np.maximum(pr, 1e-6)[:, None])
                dead = dead | kill

            alive = alive & ~dead
            thr[alive] *= atten[alive]
            o = np.where(alive[:, None], h["p"] + nrm * 1e-3, o)
            d = np.where(alive[:, None], new_dir, d)
        return radiance

    def render(self, passes=8):
        """Render with 16 stratified samples per pass, SUMS counted as one
        sample (PHYSICS.md Q1).  Returns the linear accumulated mean."""
        w, h = self.width, self.height
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        px = xs.ravel().astype(np.float64)
        fy = (h - 1 - ys).ravel().astype(np.float64)
        n = w * h
        accum = np.zeros((n, 3))
        cam = self.cam
        aspect = cam[15] if cam[15] != 0 else w / h
        theta = cam[12] * np.pi / 180
        vh = 2 * np.tan(theta / 2)
        vw = aspect * vh
        origin, target, up = cam[0:3], cam[4:7], cam[8:11]
        wv = _normalize((origin - target)[None])[0]
        uv = _normalize(np.cross(up, wv)[None])[0]
        vv = np.cross(wv, uv)
        focus = cam[14] if cam[14] != 0 else np.linalg.norm(origin - target)
        horiz, vert = vw * focus * uv, vh * focus * vv
        ll = origin - horiz / 2 - vert / 2 - wv * focus
        lens_r = self.aperture / 2

        for _p in range(passes):
            for sy in range(4):
                for sx in range(4):
                    su = (sx + self.rng.random(n)) / 4
                    sv = (sy + self.rng.random(n)) / 4
                    u = (px + su) / (w - 1)
                    v = (fy + sv) / (h - 1)
                    if lens_r > 0:
                        z = 1 - 2 * self.rng.random(n)
                        phi = 2 * np.pi * self.rng.random(n)
                        rr = np.sqrt(np.maximum(0, 1 - z * z)) * np.cbrt(self.rng.random(n))
                        off = (rr * np.cos(phi))[:, None] * uv + (rr * np.sin(phi))[:, None] * vv
                        off *= lens_r
                        o = origin + off
                        d = _normalize(ll + u[:, None] * horiz + v[:, None] * vert - origin - off)
                    else:
                        o = np.broadcast_to(origin, (n, 3)).copy()
                        d = _normalize(ll + u[:, None] * horiz + v[:, None] * vert - origin)
                    accum += self.ray_color(o, d)
        return (accum / passes).reshape(h, w, 3)


class OracleCPU(Oracle):
    """CPU-contract oracle (renderer.go rayColorOpt + materials.go):
    no NEE/fog, lambert rough jitter, lerp metal, refraction-ratio Schlick,
    exit-scan Beer-Lambert with ray teleport to the exit point."""

    def ray_color(self, o, d):
        n_rays = o.shape[0]
        radiance = np.zeros((n_rays, 3))
        thr = np.ones((n_rays, 3))
        alive = np.ones(n_rays, bool)
        o, d = o.copy(), d.copy()

        for depth_i in range(self.max_depth):
            if not alive.any():
                break
            h = self.hit_world(o, d)
            miss = alive & ~h["hit"]
            radiance[miss] += thr[miss] * self.sky_color(_normalize(d[miss]))
            alive = alive & h["hit"]

            mrow = self.mat[h["mi"]]
            typ = np.round(mrow[:, 0]).astype(int)
            albedo, emit = mrow[:, 4:7], mrow[:, 8:11]
            rough = np.where((typ == 1) & (mrow[:, 3] > 0), 1 - mrow[:, 3], np.clip(mrow[:, 1], 0, 1))
            rough = np.clip(rough, 0, 1)
            ior = np.where(mrow[:, 2] == 0, 1.5, mrow[:, 2])

            em = alive & (typ == 3)
            radiance[em] += thr[em] * emit[em]
            dead = ~alive | (typ == 3)

            vd = _normalize(d)
            nrm = h["n"]
            new_dir = np.zeros_like(d)
            atten = albedo.copy()
            new_orig = h["p"].copy()

            def cosine_onb(normal):
                nn = normal.shape[0]
                phi = 2 * np.pi * self.rng.random(nn)
                r2 = self.rng.random(nn)
                ct, st = np.sqrt(r2), np.sqrt(np.maximum(0, 1 - r2))
                use_y = np.abs(normal[:, 0]) > 0.9
                axis = np.where(use_y[:, None], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0])
                w = normal
                v = _normalize(np.cross(w, axis))
                u = np.cross(v, w)
                return u * (st * np.cos(phi))[:, None] + v * (st * np.sin(phi))[:, None] + w * ct[:, None]

            lam = alive & (typ == 0)
            if lam.any():
                cdir = cosine_onb(nrm)
                # unit-ball jitter * rough * 0.1 (materials.go:84-91)
                z = 1 - 2 * self.rng.random(n_rays)
                phi = 2 * np.pi * self.rng.random(n_rays)
                rr = np.sqrt(np.maximum(0, 1 - z * z))
                rad3 = np.cbrt(self.rng.random(n_rays))
                ball = np.stack([rr * np.cos(phi), rr * np.sin(phi), z], -1) * rad3[:, None]
                jit = _normalize(cdir + ball * (rough * 0.1)[:, None])
                new_dir[lam] = np.where((rough > 1e-6)[lam, None], jit[lam], cdir[lam])

            met = alive & ((typ == 1) | (typ == 4))
            if met.any():
                reflected = vd - 2 * np.sum(vd * nrm, -1, keepdims=True) * nrm
                cav = cosine_onb(reflected)
                alpha = (rough * rough)[:, None]
                blend = reflected * (1 - alpha) + cav * alpha
                l2 = np.sum(blend * blend, -1)
                blend = np.where((l2 < 1e-8)[:, None], reflected, _normalize(blend))
                wrong = np.sum(blend * nrm, -1) <= 0
                rblend = np.where(wrong[:, None], reflected, blend)
                nd = np.where((rough > 1e-6)[:, None], rblend, reflected)
                new_dir[met] = nd[met]

            die = alive & (typ == 2)
            if die.any():
                ct = np.minimum(-np.sum(vd * nrm, -1), 1.0)
                stheta = np.sqrt(np.maximum(0, 1 - ct * ct))
                entering = h["front"]
                ratio = np.where(entering, 1 / ior, ior)
                cannot = ratio * stheta > 1
                r0 = ((1 - ratio) / (1 + ratio)) ** 2  # Schlick on the ratio (materials.go:192,226-231)
                prob = r0 + (1 - r0) * (1 - ct) ** 5
                u = self.rng.random(n_rays)
                do_refl = cannot | (prob > u)
                mirror = vd - 2 * np.sum(vd * nrm, -1, keepdims=True) * nrm
                rp = ratio[:, None] * (vd + ct[:, None] * nrm)
                par = np.sqrt(np.maximum(0, 1 - np.minimum(np.sum(rp * rp, -1), 1)))
                refr = rp - par[:, None] * nrm
                refr = np.where(cannot[:, None], mirror, refr)
                dd = np.where(do_refl[:, None], mirror, refr)
                new_dir[die] = dd[die]
                atten[die] = 1.0

                # exit scan (renderer.go:316-371): closest dielectric
                # backface along the scattered ray, distSq in (1e-8, 1000)
                scan = die & entering & ~do_refl
                if scan.any():
                    hx = self.hit_world(h["p"], dd, t_min=1e-4)
                    # need backface dielectric check per candidate; the
                    # closest-hit record suffices for convex single-glass
                    # test scenes: accept if dielectric and backface
                    mrow2 = self.mat[hx["mi"]]
                    is_diel2 = np.round(mrow2[:, 0]).astype(int) == 2
                    delta = hx["p"] - h["p"]
                    d2 = np.sum(delta**2, -1)
                    okx = scan & hx["hit"] & is_diel2 & ~hx["front"] & (d2 > 1e-8) & (d2 < 1000.0)
                    absn = mrow[:, 12:15]
                    has_abs = (absn > 0).any(-1)
                    beer = np.exp(-absn * np.sqrt(np.maximum(d2, 0))[:, None])
                    app = okx & has_abs
                    atten[app] = beer[app]
                    new_orig[okx] = hx["p"][okx]

            remaining = self.max_depth - depth_i
            if remaining <= 3:
                mc = atten.max(-1)
                pr = np.minimum(mc, 0.95)
                u = self.rng.random(n_rays)
                kill = (mc < 1e-6) | (u > pr)
                atten = np.where(kill[:, None], atten, atten / np.maximum(pr, 1e-6)[:, None])
                dead = dead | kill

            alive = alive & ~dead
            thr[alive] *= atten[alive]
            o = np.where(alive[:, None], new_orig, o)
            d = np.where(alive[:, None], new_dir, d)
        return radiance

    def render(self, passes=8):
        """CPU contract: one jittered sample per pass (no strata, no 16x)."""
        w, h = self.width, self.height
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        px = xs.ravel().astype(np.float64)
        fy = (h - 1 - ys).ravel().astype(np.float64)
        n = w * h
        accum = np.zeros((n, 3))
        cam = self.cam
        aspect = cam[15] if cam[15] != 0 else w / h
        theta = cam[12] * np.pi / 180
        vh = 2 * np.tan(theta / 2)
        vw = aspect * vh
        origin, target, up = cam[0:3], cam[4:7], cam[8:11]
        wv = _normalize((origin - target)[None])[0]
        uv = _normalize(np.cross(up, wv)[None])[0]
        vv = np.cross(wv, uv)
        focus = cam[14] if cam[14] != 0 else np.linalg.norm(origin - target)
        horiz, vert = vw * focus * uv, vh * focus * vv
        ll = origin - horiz / 2 - vert / 2 - wv * focus
        lens_r = self.aperture / 2
        for _p in range(passes):
            u = (px + self.rng.random(n)) / (w - 1)
            v = (fy + self.rng.random(n)) / (h - 1)
            if lens_r > 0:
                z = 1 - 2 * self.rng.random(n)
                phi = 2 * np.pi * self.rng.random(n)
                rr = np.sqrt(np.maximum(0, 1 - z * z)) * np.cbrt(self.rng.random(n))
                off = ((rr * np.cos(phi))[:, None] * uv + (rr * np.sin(phi))[:, None] * vv) * lens_r
                o = origin + off
                dd = _normalize(ll + u[:, None] * horiz + v[:, None] * vert - origin - off)
            else:
                o = np.broadcast_to(origin, (n, 3)).copy()
                dd = _normalize(ll + u[:, None] * horiz + v[:, None] * vert - origin)
            accum += self.ray_color(o, dd)
        return (accum / passes).reshape(h, w, 3)
