"""Test harness config: CPU-simulated 8-device mesh.

Multi-chip hardware is unavailable in CI; the standard JAX approach is a
virtual host-platform device mesh (SURVEY.md §4 "Distributed").
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
