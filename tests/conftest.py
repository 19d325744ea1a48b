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

import gc

import pytest


def _map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: the limit this guards doesn't apply
        return 0


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_mappings():
    """Keep the process under vm.max_map_count across the full suite.

    Every XLA:CPU executable holds ~5-7 anonymous mmap regions (ORC JIT
    code/rodata/data sections), and module-level jitted functions keep one
    executable per shape bucket alive for the life of the process. A full
    suite run accumulates tens of thousands of mappings and eventually
    SEGFAULTS inside LLVM when an mmap fails at vm.max_map_count (65530)
    — the round-4 "cross-file state" crash at test_serving.py, which hit
    whichever compile happened to cross the limit (measured: gc alone
    frees nothing; jax.clear_caches()+gc returns to baseline). Clearing
    only above a threshold keeps cheap modules from paying cross-module
    recompiles."""
    yield
    if _map_count() > 25_000:
        jax.clear_caches()
        gc.collect()


def pytest_configure(config):
    """Auto-build native/videodec when a toolchain is present, so the 6
    native-decoder tests run for real on a fresh checkout instead of
    silently skipping (the cmake build takes ~10 s)."""
    import shutil
    import subprocess

    repo = Path(__file__).resolve().parent.parent
    so = repo / "native" / "videodec" / "build" / "libvideodec.so"
    if so.exists():
        return
    if shutil.which("cmake") is None or shutil.which("c++") is None:
        return
    try:
        subprocess.run(
            ["bash", str(repo / "script" / "build_native.sh")],
            check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, OSError) as e:  # missing ffmpeg devel etc.
        sys.stderr.write(f"[conftest] native videodec build skipped: {e}\n")
