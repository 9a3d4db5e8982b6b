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


def pytest_configure(config):
    """Build the native C++ lib up front so the byte-identity tests vs the
    C++ rangecoder/wavio always run (round-2 review: they skipped silently
    on a fresh checkout). Skipping is only acceptable when no compiler
    exists in the environment."""
    import shutil
    import subprocess
    from pathlib import Path

    io_dir = Path(__file__).resolve().parents[1] / "vrvq_tpu" / "native" / "io"
    if shutil.which("g++") is None and shutil.which("c++") is None:
        return  # the tests' skipif handles this case loudly-enough
    # always run make (near-free when up to date): the tree may hold a
    # stale libvrvqio.so while a later-added lib (libvrvqff.so) is unbuilt
    proc = subprocess.run(
        ["make", "-C", str(io_dir)], capture_output=True, text=True,
        timeout=300,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"native lib build failed (required when a compiler is "
            f"present):\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
