"""Test env: run everything on an 8-virtual-device CPU backend.

The axon sitecustomize hook registers the tunneled TPU backend at
interpreter startup (and imports jax there, so the JAX_PLATFORMS *env
var* is already baked in) — but platform SELECTION is lazy, so
`jax.config.update("jax_platforms", "cpu")` before the first backend
init still restricts the process to CPU. Without it, `jax.devices()`
under ambient `JAX_PLATFORMS=axon` resolves to the single tunneled TPU:
any test that builds a default mesh would silently dispatch through the
tunnel (slow, contended, and hard-down sometimes). XLA_FLAGS set now
still applies to the lazily-created CPU backend; we force 8 virtual CPU
devices (SURVEY.md §4 multi-host test strategy).

When the tunnel is hard-down, interpreter startup itself can hang in the
sitecustomize register() retry loop BEFORE pytest runs — launch with
`env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest ...`
to skip tunnel registration entirely (see CLAUDE.md).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_default_matmul_precision", "highest")
