"""Test harness config: force CPU with a virtual 8-device mesh.

Must run before jax is imported anywhere (SURVEY.md section 4: multi-device tests
via xla_force_host_platform_device_count).  Bench/production code paths pick the
real TPU; tests stay hermetic on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax and registers the axon TPU plugin
# before conftest runs, so the env var alone is too late — force the platform
# through the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")

# Cover the TPU-only tiled barrel-shift gather on the CPU suite (it is gated
# off on CPU in production because XLA-CPU's native gather is already fast).
from kvmatch_tpu.ops import ed as _ed

_ed.GATHER_TILED_ON_CPU = True

# The probe's barrel-shift addressing (parallel/query.py:_row_at_shift) stays
# on its CPU default (legacy dynamic_slice) here: flipping it globally slows
# the whole suite ~3x (13 extra full-width rolls per probed segment).
# tests/test_dense_route.py::test_barrel_probe_bit_identical covers the
# barrel code path explicitly.
