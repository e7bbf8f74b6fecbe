"""Shared neural building blocks: micro-layers and the FFT transformer."""

from .layers import ConvNorm, ConvReLUNorm, LinearNorm, Mish
from .transformer import (
    FFTransformer, FFTransformerLayer, MultiHeadAttn, PositionwiseConvFF,
    positional_embedding,
)

__all__ = ["ConvNorm", "ConvReLUNorm", "LinearNorm", "Mish",
           "FFTransformer", "FFTransformerLayer", "MultiHeadAttn",
           "PositionwiseConvFF", "positional_embedding"]
