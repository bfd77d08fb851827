"""Post-processing tests vs scalar NumPy reimplementations of the
reference algorithms."""

import numpy as np
import pytest

from path_trace_golang_tpu import post


def _aces_ref(x):
    """Scalar float64 reimplementation of acesTonemap (gpu.go:22-47)."""
    if x <= 0:
        return 0.0
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    r = (x * (a * x + b)) / (x * (c * x + d) + e)
    return min(max(r, 0.0), 1.0)


def test_aces_matches_reference():
    xs = np.array([0.0, 0.05, 0.18, 0.5, 1.0, 2.0, 8.0, 100.0], np.float32)
    got = np.asarray(post.aces_tonemap(xs))
    want = np.array([_aces_ref(float(x)) for x in xs], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_tonemap_u8_rounding():
    lin = np.full((2, 2, 3), 0.25, np.float32)
    # gpu contract: aces(0.25) -> ~0.2387..., sqrt -> ~0.4886, *255+0.5
    u8 = np.asarray(post.tonemap_to_u8(lin, use_aces=True))
    want = int(np.sqrt(_aces_ref(0.25)) * 255.0 + 0.5)
    assert (u8 == want).all()
    # cpu contract: sqrt(0.25)=0.5 -> 0.5*255.999 = 127.99 -> 127
    u8 = np.asarray(post.tonemap_to_u8(lin, use_aces=False))
    assert (u8 == 127).all()


def _bilateral_ref(img_u8, sigma_s=1.0, sigma_r=0.15):
    """Direct loop port of the reference denoise (gpu.go:2355-2439)."""
    h, w, _ = img_u8.shape
    img = img_u8.astype(np.float64) / 255.0
    out = np.zeros_like(img_u8)
    for y in range(h):
        for x in range(w):
            c = img[y, x]
            sw = 0.0
            acc = np.zeros(3)
            for ky in (-1, 0, 1):
                ny = y + ky
                if ny < 0 or ny >= h:
                    continue
                for kx in (-1, 0, 1):
                    nx = x + kx
                    if nx < 0 or nx >= w:
                        continue
                    nb = img[ny, nx]
                    ds2 = kx * kx + ky * ky
                    dr2 = ((c - nb) ** 2).sum()
                    wgt = np.exp(-ds2 / (2 * sigma_s**2)) * np.exp(-dr2 / (2 * sigma_r**2))
                    sw += wgt
                    acc += nb * wgt
            v = np.clip(acc / sw, 0, 1) if sw > 0 else c
            out[y, x] = (v * 255.0 + 0.5).astype(np.uint8)
    return out


def test_bilateral_matches_reference_loops():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(7, 9, 3), dtype=np.uint8)
    got = np.asarray(post.bilateral_denoise(img))
    want = _bilateral_ref(img)
    # float32 vs float64 weight differences can shift a value by 1 LSB
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def _box_ref(img_u8, radius, strength):
    """Loop port of the box smooth (gpu.go:2441-2520)."""
    h, w, _ = img_u8.shape
    out = np.zeros_like(img_u8)
    for y in range(h):
        for x in range(w):
            acc = np.zeros(3)
            cnt = 0
            for ky in range(-radius, radius + 1):
                ny = y + ky
                if ny < 0 or ny >= h:
                    continue
                for kx in range(-radius, radius + 1):
                    nx = x + kx
                    if nx < 0 or nx >= w:
                        continue
                    acc += img_u8[ny, nx]
                    cnt += 1
            avg = acc / cnt
            v = (1 - strength) * img_u8[y, x] + strength * avg
            out[y, x] = np.clip(v + 0.5, 0, 255).astype(np.uint8)
    return out


def test_box_smooth_matches_reference_loops():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    got = np.asarray(post.box_smooth(img, radius=2, strength=0.5))
    want = _box_ref(img, 2, 0.5)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_finalize_averages_by_sample_count():
    import jax.numpy as jnp

    accum = jnp.full((4, 4, 3), 2.0, jnp.float32)
    u8_2 = np.asarray(post.finalize_cpu_contract(accum, jnp.int32(2)))  # mean 1.0
    assert (u8_2 == 255).all()
    u8_8 = np.asarray(post.finalize_cpu_contract(accum, jnp.int32(8)))  # mean .25
    assert (u8_8 == 127).all()
