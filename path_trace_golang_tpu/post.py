"""Post-processing: tonemap, gamma, denoise, smooth.

Re-design of the reference's host-side post stack:

* ACES filmic approximation per channel (``acesTonemap``, gpu.go:22-47)
* sqrt gamma (gamma 2.0, matching the CPU renderer renderer.go:193-195 and
  the GPU readback gpu.go:2268-2270) and byte packing with +0.5 rounding
  (gpu.go:2281-2284)
* 3x3 bilateral denoise in byte-sRGB space, sigma_s=1.0 / sigma_r=0.15
  (gpu.go:2355-2439)
* optional box blur radius 1-5 blended by strength (gpu.go:2441-2520)

Everything is expressed as jnp so the whole display path jits and fuses;
the convolutions use static 3x3 / (2r+1)^2 shift-and-add (boundary-aware
normalization identical to the reference's skip-out-of-bounds loops).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "aces_tonemap",
    "gamma_encode",
    "tonemap_to_u8",
    "bilateral_denoise",
    "box_smooth",
    "finalize_gpu_contract",
    "finalize_cpu_contract",
]

_F = jnp.float32


def aces_tonemap(x):
    """ACES approximation x(ax+b)/(x(cx+d)+e), clamped to [0,1] (gpu.go:22-47)."""
    a, b, c, d, e = _F(2.51), _F(0.03), _F(2.43), _F(0.59), _F(0.14)
    x = jnp.maximum(x, _F(0.0))
    num = x * (a * x + b)
    den = x * (c * x + d) + e
    return jnp.clip(num / jnp.maximum(den, _F(1e-20)), _F(0.0), _F(1.0))


def gamma_encode(x):
    """gamma 2.0 (sqrt), clamped (renderer.go:193-195 / gpu.go:2268-2279)."""
    return jnp.clip(jnp.sqrt(jnp.maximum(x, _F(0.0))), _F(0.0), _F(1.0))


def tonemap_to_u8(linear, use_aces: bool):
    """Linear HDR [H,W,3] -> u8 [H,W,3].

    GPU contract: ACES then sqrt gamma, round via +0.5 (gpu.go:2262-2284).
    CPU contract: sqrt gamma then scale by 255.999 truncation
    (renderer.go:196-221).
    """
    if use_aces:
        v = gamma_encode(aces_tonemap(linear))
        return (v * _F(255.0) + _F(0.5)).astype(jnp.uint8)
    v = gamma_encode(linear)
    return jnp.clip(v * _F(255.999), _F(0.0), _F(255.999)).astype(jnp.uint8)


def _shift2d(img, dy, dx):
    """Shift with zero padding; also returns the validity mask."""
    h, w = img.shape[0], img.shape[1]
    shifted = jnp.roll(img, (dy, dx), axis=(0, 1))
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    valid = (row - dy >= 0) & (row - dy < h) & (col - dx >= 0) & (col - dx < w)
    return jnp.where(valid[..., None], shifted, 0.0), valid


def bilateral_denoise(u8_img, sigma_s=1.0, sigma_r=0.15):
    """3x3 bilateral filter in byte-sRGB space (gpu.go:2355-2439).

    u8_img: uint8 [H,W,3].  Weights: exp(-ds^2/2ss^2) * exp(-|dc|^2/2sr^2)
    with colors normalized to [0,1]; out-of-bounds neighbors are skipped
    (zero weight), matching the reference's boundary handling.
    """
    img = u8_img.astype(jnp.float32) / _F(255.0)
    two_ss2 = _F(2.0 * sigma_s * sigma_s)
    two_sr2 = _F(2.0 * sigma_r * sigma_r)

    sum_c = jnp.zeros_like(img)
    sum_w = jnp.zeros(img.shape[:2], dtype=jnp.float32)
    for ky in (-1, 0, 1):
        for kx in (-1, 0, 1):
            nb, valid = _shift2d(img, ky, kx)
            ds2 = _F(float(kx * kx + ky * ky))
            diff = img - nb
            dr2 = jnp.sum(diff * diff, axis=-1)
            w = jnp.exp(-ds2 / two_ss2) * jnp.exp(-dr2 / two_sr2)
            w = jnp.where(valid, w, 0.0)
            sum_w = sum_w + w
            sum_c = sum_c + nb * w[..., None]
    out = jnp.where(sum_w[..., None] > 0, sum_c / jnp.maximum(sum_w, _F(1e-20))[..., None], img)
    out = jnp.clip(out, 0.0, 1.0)
    return (out * _F(255.0) + _F(0.5)).astype(jnp.uint8)


def box_smooth(u8_img, radius: int, strength: float):
    """Box blur blended with the original by ``strength`` (gpu.go:2441-2520).

    Boundary pixels average over the in-bounds window only (per-pixel
    count), exactly like the reference's nested skip loops.
    """
    radius = max(1, min(5, int(radius)))
    strength = min(1.0, max(0.0, float(strength)))
    img = u8_img.astype(jnp.float32)
    sum_c = jnp.zeros_like(img)
    count = jnp.zeros(img.shape[:2], dtype=jnp.float32)
    for ky in range(-radius, radius + 1):
        for kx in range(-radius, radius + 1):
            nb, valid = _shift2d(img, ky, kx)
            sum_c = sum_c + nb
            count = count + valid.astype(jnp.float32)
    avg = sum_c / jnp.maximum(count, _F(1.0))[..., None]
    out = img * _F(1.0 - strength) + avg * _F(strength)
    out = jnp.clip(out, 0.0, 255.0)
    return (out + _F(0.5)).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("denoise", "denoise_sigma_s", "denoise_sigma_r"))
def finalize_gpu_contract(accum, sample_count, denoise=True, denoise_sigma_s=1.0, denoise_sigma_r=0.15):
    """Accumulation buffer -> display bytes, GPU-contract display path.

    accum: f32[H,W,3] running radiance sum; sample_count: accumulated pass
    count (gpu.go:1742-1747 averaging + readback processing).  The box
    smooth step is applied separately (it is disabled by default,
    gpu.go:141).
    """
    mean = accum / jnp.maximum(sample_count.astype(jnp.float32), _F(1.0))
    u8 = tonemap_to_u8(mean, use_aces=True)
    if denoise:
        u8 = bilateral_denoise(u8, denoise_sigma_s, denoise_sigma_r)
    return u8


@jax.jit
def finalize_cpu_contract(accum, sample_count):
    """CPU-contract display path: average + sqrt gamma only (renderer.go:189-221)."""
    mean = accum / jnp.maximum(sample_count.astype(jnp.float32), _F(1.0))
    return tonemap_to_u8(mean, use_aces=False)
