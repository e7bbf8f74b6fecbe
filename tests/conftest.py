"""Test config: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's recommendation: distributed (pjit) programs are tested
on CPU with ``--xla_force_host_platform_device_count=8`` instead of real
multi-chip hardware. Must run before JAX initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
