"""Test harness: force the CPU backend with 8 virtual devices.

The container preloads JAX with the axon TPU platform via sitecustomize, so env
vars alone are too late; ``jax.config`` still works as long as no computation has
run.  Multi-chip sharding tests then run on an emulated 8-device CPU mesh
(SURVEY.md §4 item 4); benches run separately on the real TPU via bench.py.
"""

import os
import sys

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    Full-suite runs accumulate ~200 compiled XLA CPU executables; past that
    point one of the late segmentation compiles (tests/test_tiles.py) asks
    the allocator for a pathological ~66 TB block (kernel __vm_enough_memory
    denial in dmesg) and intermittently SEGFAULTS the whole run — state-
    dependent: the same test alone never attempts that allocation.  Clearing
    between modules keeps the live-executable set small; within-module
    compile reuse (where shapes actually repeat) is unaffected.
    """
    yield
    jax.clear_caches()
