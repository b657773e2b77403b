"""Test harness: force the CPU backend with 8 virtual devices.

The container preloads JAX with the axon TPU platform via sitecustomize, so env
vars alone are too late; ``jax.config`` still works as long as no computation has
run.  Multi-chip sharding tests then run on an emulated 8-device CPU mesh
(SURVEY.md §4 item 4); benches run separately on the real TPU via bench.py.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
