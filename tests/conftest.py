"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding is exercised without TPU hardware via XLA's host
platform device count, per SURVEY.md §4's test strategy.

Environment note: this image's sitecustomize registers an 'axon' TPU
backend in every interpreter and force-sets ``jax_platforms="axon,cpu"``
via jax config (so the JAX_PLATFORMS env var alone is NOT enough).  We
re-update the config to plain cpu *before any backend initializes*; this
also keeps tests off the single TPU client, which serializes across
processes and would deadlock concurrent runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: integrator graphs are large and the CI host is
# small; cache across pytest runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.local_device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)
