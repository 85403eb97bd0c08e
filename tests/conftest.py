"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import
so sharding tests run without TPU hardware (SURVEY.md §4). The environment
pre-sets JAX_PLATFORMS=axon (the TPU tunnel), so we must override — not
setdefault — both platform variables."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
