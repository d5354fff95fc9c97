"""Test configuration: run on a virtual 8-device CPU mesh.

The container force-registers a tunneled TPU backend ("axon") via
sitecustomize and sets JAX_PLATFORMS=axon in the ambient environment, so
env vars alone are not enough — we re-select the CPU platform through
jax.config after import. Multi-chip sharding is then validated without TPU
hardware on 8 virtual CPU devices (SURVEY §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS fallback above covers older jax

from jax._src import xla_bridge as _xb

if _xb.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()
