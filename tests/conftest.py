"""Test harness: CPU backend with an 8-device virtual mesh.

Multi-chip sharding is validated on virtual CPU devices (the driver's
dryrun_multichip does the same); TPU-only perf paths are exercised via
Pallas interpret mode.

Note: this image's sitecustomize registers a remote TPU ('axon') PJRT
backend at interpreter start and the env pins JAX_PLATFORMS=axon, so we must
switch platforms via jax.config (env vars are too late / overridden).
XLA_FLAGS is still read lazily at CPU-client creation, so setting it here
works as long as no jax computation ran yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
