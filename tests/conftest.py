"""Test configuration.

Tests run on CPU with a forced 8-device topology so sharding / collective
paths are exercised without TPU hardware (the TPU analog of testing
multi-node without a cluster), and with x64 enabled so numerical parity
checks against the float64 Julia reference semantics are meaningful.

Note: the environment's site hook may pre-set jax_platforms (e.g. to a
remote TPU relay), so the platform is forced via jax.config *after* import,
not only via env vars.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The spatial-contact suites (Ant) compile very large scalar graphs; the
# persistent cache makes every suite run after the first start in seconds.
from mpopis_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
