"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding is exercised without TPU hardware via XLA's host
platform device count, per SURVEY.md §4's test strategy.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
