"""Test harness config: CPU-simulated 8-device mesh.

Multi-chip hardware is unavailable in CI; the standard JAX approach is a
virtual host-platform device mesh (SURVEY.md §4 "Distributed").

Note: this image registers the axon TPU plugin from sitecustomize before
test code runs, so setting JAX_PLATFORMS in the environment is not enough —
jax.config must be updated explicitly before any backend initialisation.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
