"""Utilities: masking, plotting, profiling."""

from .masking import get_mask_from_lengths, mask_from_lens

__all__ = ["get_mask_from_lengths", "mask_from_lens"]
