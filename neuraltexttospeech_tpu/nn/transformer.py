"""Feed-forward Transformer (FFT) blocks — FastPitch/FastSpeech2 backbone.

TPU-native re-design of the reference FFT stack
(``FastPitch_TF/transformer.py``): sinusoidal positional embeddings
(:11-30), ``MultiHeadAttn`` with a fused QKV projection (:120-238),
``PositionwiseConvFF`` two-conv FFN (:72-110), post-LN residual layers
(:241-273), and the embedding/mask-handling ``FFTransformer`` wrapper
(:276-332).

Differences from the reference (deliberate, for TPU):
- attention keeps the ``[B, H, T, D]`` layout and one batched einsum per
  projection instead of head-folded reshapes — XLA maps these directly onto
  the MXU;
- masking uses a large negative additive bias instead of ``tf.where(-inf)``
  (same softmax result, no NaN risk for fully-masked padding rows);
- everything is shape-static and jit-traceable; sequence lengths arrive as
  tensors and become boolean masks.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.masking import mask_from_lens

__all__ = [
    "positional_embedding",
    "MultiHeadAttn",
    "PositionwiseConvFF",
    "FFTransformerLayer",
    "FFTransformer",
]

_NEG = -1e9


def positional_embedding(seq_len: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """[seq_len, dim] sinusoidal table — reference ``transformer.py:11-30``.

    inv_freq = 1 / 10000^(2i/dim); emb = concat(sin, cos) along features.
    Computed with NumPy at trace time: it is a constant under jit.
    """
    inv_freq = 1.0 / (10000.0 ** (np.arange(0.0, dim, 2.0) / dim))
    pos = np.arange(seq_len, dtype=np.float64)
    sinusoid = pos[:, None] * inv_freq[None, :]
    table = np.concatenate([np.sin(sinusoid), np.cos(sinusoid)], axis=-1)
    return jnp.asarray(table, dtype=dtype)


class MultiHeadAttn(nn.Module):
    """Self-attention with fused QKV (reference ``transformer.py:120-238``)."""

    n_head: int
    d_model: int
    d_head: int
    dropout: float = 0.1
    dropatt: float = 0.1
    pre_lnorm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attn_mask=None, *, deterministic: bool = True):
        """x: [B, T, C]; attn_mask: [B, T] bool, True = valid key."""
        residual = x
        ln = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)
        if self.pre_lnorm:
            x = ln(x)

        B, T = x.shape[0], x.shape[1]
        qkv = nn.Dense(3 * self.n_head * self.d_head, dtype=self.dtype)(x)
        qkv = qkv.reshape(B, T, 3, self.n_head, self.d_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, T, H, D]

        scale = 1.0 / np.sqrt(self.d_head)
        score = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if attn_mask is not None:
            bias = jnp.where(attn_mask[:, None, None, :], 0.0, _NEG)
            score = score + bias.astype(score.dtype)
        prob = nn.softmax(score, axis=-1)
        prob = nn.Dropout(self.dropatt)(prob, deterministic=deterministic)

        out = jnp.einsum("bhqk,bkhd->bqhd", prob, v)
        out = out.reshape(B, T, self.n_head * self.d_head)
        out = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype)(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)

        if self.pre_lnorm:
            return residual + out
        return ln(residual + out)


class PositionwiseConvFF(nn.Module):
    """conv(k) -> ReLU -> conv(k) -> dropout FFN (reference ``transformer.py:72-110``)."""

    d_model: int
    d_inner: int
    kernel_size: int = 3
    # second conv kernel; None = same as kernel_size (FastSpeech2 uses [9, 1],
    # reference ``FastSpeech2_TF/config/LJSpeech/model.yaml`` conv_kernel_size)
    kernel_size_2: Optional[int] = None
    dropout: float = 0.1
    pre_lnorm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        residual = x
        k2 = self.kernel_size_2 or self.kernel_size
        ln = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)
        if self.pre_lnorm:
            x = ln(x)
        x = nn.Conv(self.d_inner, (self.kernel_size,), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.d_model, (k2,), padding="SAME", dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if self.pre_lnorm:
            return residual + x
        return ln(residual + x)


class FFTransformerLayer(nn.Module):
    """Attention + ConvFF block with mask re-application
    (reference ``transformer.py:241-273``)."""

    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    kernel_size: int
    dropout: float
    dropatt: float
    kernel_size_2: Optional[int] = None
    pre_lnorm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        """mask: [B, T] bool (True inside sequence)."""
        m = mask[..., None].astype(x.dtype)
        x = MultiHeadAttn(
            self.n_head, self.d_model, self.d_head,
            dropout=self.dropout, dropatt=self.dropatt,
            pre_lnorm=self.pre_lnorm, dtype=self.dtype,
        )(x, attn_mask=mask, deterministic=deterministic)
        x = x * m
        x = PositionwiseConvFF(
            self.d_model, self.d_inner, self.kernel_size,
            kernel_size_2=self.kernel_size_2,
            dropout=self.dropout, pre_lnorm=self.pre_lnorm, dtype=self.dtype,
        )(x, deterministic=deterministic)
        return x * m


class FFTransformer(nn.Module):
    """FFT stack with optional input embedding (reference ``transformer.py:276-332``).

    Returns ``(out, mask)`` where mask is [B, T] bool, like the reference's
    ``(out, mask[..., None])``.
    """

    n_layer: int
    n_head: int
    d_model: int
    d_head: int
    d_inner: int
    kernel_size: int
    dropout: float
    dropatt: float
    dropemb: float = 0.0
    embed_input: bool = True
    n_emb: Optional[int] = None
    padding_idx: int = 0
    kernel_size_2: Optional[int] = None
    pre_lnorm: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        if self.embed_input:
            self.word_emb = nn.Embed(self.n_emb, self.d_model, dtype=self.dtype)
        self.emb_drop = nn.Dropout(self.dropemb)
        self.blocks = [
            FFTransformerLayer(
                self.n_head, self.d_model, self.d_head, self.d_inner,
                self.kernel_size, self.dropout, self.dropatt,
                kernel_size_2=self.kernel_size_2,
                pre_lnorm=self.pre_lnorm, dtype=self.dtype,
            )
            for _ in range(self.n_layer)
        ]

    def embed(self, token_ids):
        """Expose the symbol embedding table (FastPitch aligner reads it,
        reference ``model.py:306``)."""
        return self.word_emb(token_ids)

    def __call__(self, x, seq_lens=None, conditioning=None, *, deterministic: bool = True):
        if self.embed_input:
            mask = x != self.padding_idx  # [B, T]
            x = self.word_emb(x)
        else:
            assert seq_lens is not None, "seq_lens required when embed_input=False"
            mask = mask_from_lens(seq_lens, x.shape[1])

        pos = positional_embedding(x.shape[1], self.d_model, dtype=x.dtype)
        pos = pos[None, :, :] * mask[..., None].astype(x.dtype)
        out = x + pos
        if conditioning is not None:
            out = out + conditioning
        out = self.emb_drop(out, deterministic=deterministic)

        for block in self.blocks:
            out = block(out, mask, deterministic=deterministic)
        return out, mask
