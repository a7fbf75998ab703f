"""Test configuration: force JAX onto a simulated 8-device CPU mesh.

The reference could only exercise its distributed path on a real MPI
cluster (SURVEY.md §4); here every multi-device code path is testable on a
single host via XLA's simulated devices. Must run before jax is imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "true")
