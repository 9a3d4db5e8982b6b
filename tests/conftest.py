"""Test config: force a virtual 8-device CPU platform.

The container's sitecustomize registers the remote 'axon' TPU platform at
interpreter start (and jax is already imported by it), so we flip the
platform via jax.config before any backend initializes. Multi-chip sharding
tests then run on 8 fake CPU devices (xla_force_host_platform_device_count)
— the framework's test strategy; the reference has no test suite at all
(SURVEY §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
