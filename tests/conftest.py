"""Test harness: force CPU + float64, virtual 8-device mesh available.

Tests never touch the real TPU: physics parity vs the MuJoCo oracle needs
float64.  NB the image's axon TPU plugin ignores the JAX_PLATFORMS env var
(its sitecustomize re-registers the backend), so the platform MUST be forced
through jax.config after import — env vars alone silently leave you on TPU
with float64 emulation (~1e-7 errors).
"""

import os

# for any subprocesses the tests may spawn
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
