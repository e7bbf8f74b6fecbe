"""Custom ops: on-device MAS (lax.scan DP), native host MAS (C++/OpenMP),
fused Pallas mel kernel."""

from .mas import b_mas, maximum_path

__all__ = ["b_mas", "maximum_path"]
