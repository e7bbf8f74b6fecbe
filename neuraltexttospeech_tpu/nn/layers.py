"""Shared micro-layers for all model families.

TPU-native re-design of the reference's shared Keras layers
(``FastPitch_TF/common/layers.py:9-62``: ``LinearNorm`` / ``ConvNorm`` /
``ConvReLUNorm``) as flax modules. Conventions:

- activations are ``[batch, time, channels]`` (lane dim = channels, which XLA
  tiles onto the MXU for the conv-as-matmul lowering);
- every module takes an optional ``dtype`` so the whole stack can run in
  bfloat16 with float32 params;
- dropout uses flax's ``deterministic`` flag instead of Keras training mode.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["LinearNorm", "ConvNorm", "ConvReLUNorm", "Mish"]


class LinearNorm(nn.Module):
    """Dense layer (reference ``common/layers.py:9-18``)."""

    features: int
    use_bias: bool = True
    activation: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype)(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class ConvNorm(nn.Module):
    """1-D conv with SAME padding (reference ``common/layers.py:21-42``).

    The reference keeps an optional BatchNorm; we expose the same knob but
    models in this suite never enable it, so it stays a plain conv by default.
    """

    features: int
    kernel_size: int = 1
    strides: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.strides,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class ConvReLUNorm(nn.Module):
    """conv -> ReLU -> LayerNorm -> dropout (reference ``common/layers.py:45-62``).

    LayerNorm epsilon mirrors the TF default (1e-3) so statistics match the
    reference semantics.
    """

    features: int
    kernel_size: int = 1
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class Mish(nn.Module):
    """x * tanh(softplus(x)) — Grad-TTS UNet activation
    (reference ``Grad-TTS_TF/model/diffusion.py``)."""

    @nn.compact
    def __call__(self, x):
        return x * jnp.tanh(nn.softplus(x))
