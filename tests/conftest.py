"""Test config: force CPU with an 8-device virtual mesh so multi-chip sharding
paths compile/execute without TPU hardware (SURVEY.md env notes).

Note: this container's sitecustomize registers the axon TPU PJRT plugin in
every interpreter, so JAX_PLATFORMS in the environment is not sufficient —
we must set the platform through jax.config before any backend is queried.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
