"""Test config: run JAX on a virtual 8-device CPU mesh.

The surrounding environment pins ``JAX_PLATFORMS=axon`` (a remote TPU
tunnel); tests must override it *before* the first backend initialisation —
per-op dispatch over the tunnel makes unit tests orders of magnitude slower.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
