"""Compute kernels: RNG, geometry, sampling, optics, sky, fog, lights, camera."""

from . import camera, fog, geometry, lights, optics, rng, sampling, sky  # noqa: F401
