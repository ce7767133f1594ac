"""Test harness config.

Tests run on the CPU backend with 8 virtual devices (the prescribed way to
exercise multi-chip sharding logic without real chips); bench.py targets the
real TPU.

Note: this image's sitecustomize force-registers the 'axon' TPU backend and
presets JAX_PLATFORMS=axon, so an env-var override is not enough — the
platform must be switched via jax.config after import.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update(
    "jax_platforms", os.environ.get("MINIVECTORDB_TPU_TEST_PLATFORM", "cpu")
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
