"""Test configuration: force CPU JAX with 8 virtual devices.

The container's sitecustomize registers the 'axon' TPU-tunnel backend and
force-selects it via ``jax.config.update("jax_platforms", "axon,cpu")`` at
interpreter startup -- plain env vars cannot override that. Tests must run
on the local CPU backend (fast compiles, 8 virtual devices for sharding
tests), so we update the config back BEFORE any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
