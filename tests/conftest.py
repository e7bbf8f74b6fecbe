"""Test config: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's recommendation: distributed (pjit) programs are tested
on CPU with ``--xla_force_host_platform_device_count=8`` instead of real
multi-chip hardware.

The container's ``sitecustomize`` registers the experimental "axon" TPU
backend and sets ``jax_platforms`` via ``jax.config`` at interpreter start,
which overrides the ``JAX_PLATFORMS`` env var — so tests must override the
config value again (backends have not initialized yet at conftest import).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert not jax._src.xla_bridge.backends_are_initialized(), (
    "JAX backends initialized before conftest could force CPU"
)
