"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests exercise real multi-device paths without TPU hardware.

Note: the environment's sitecustomize force-registers the 'axon' TPU platform
and overrides JAX_PLATFORMS, so we must update jax.config *after* import."""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
