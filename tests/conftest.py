"""Test env: run everything on an 8-virtual-device CPU backend.

The axon sitecustomize hook registers the tunneled TPU backend at
interpreter startup, so JAX_PLATFORMS=cpu set here is too late to stop
that — but the CPU backend is created lazily, so XLA_FLAGS set now still
applies to it. We force 8 virtual CPU devices (SURVEY.md §4 multi-host
test strategy) and steer placement with jax_default_device; mesh tests ask
for jax.devices("cpu") explicitly.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_default_matmul_precision", "highest")
