"""TalkNet 2 — QuartzNet-based grapheme-duration / pitch / spectrogram
predictors, TPU-native.

Re-design of ``TalkNet_TF/``: the reference ships a complete generic
QuartzNet ASR model (``quartznet.py:126-215``: 5 blocks × R repeats of
time-separable conv modules with BatchNorm + residual, CTC loss, greedy
decoder, WER callback, ``StringMap`` vocab ``quartznet.py:285-342``) and
**stubs** the TalkNet wrapper (``talknet.py:15-141`` — GaussianEmbedding and
the duration/pitch/spec nets are ``pass``). This module implements both: the
backbone and the working TalkNet 2 heads.

- depthwise-separable convs are ``nn.Conv(feature_group_count=C)`` +
  pointwise 1×1 — XLA maps both onto the MXU;
- CTC is ``optax.ctc_loss``; greedy decoding is a vectorized argmax +
  collapse; WER is a host-side edit distance (replacing the ``jiwer``
  dependency);
- ``GaussianEmbedding`` expands per-grapheme embeddings over frames with a
  Gaussian weighting centered on each token's duration span (TalkNet 2
  semantics for the stub at ``talknet.py:15-24``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..utils.masking import mask_from_lens

__all__ = ["QuartzNetConfig", "QuartzNet", "ctc_loss", "greedy_decode",
           "word_error_rate", "StringMap", "GaussianEmbedding",
           "GraphemeDuration", "PitchPredictor", "SpectrogramModel",
           "TalkNet2Config"]


@dataclasses.dataclass(frozen=True)
class QuartzNetConfig:
    """Model = (5 blocks × block_repeat) × module_repeat
    (reference ``config.py:14-21``; 5x5 / 10x5 / 15x5)."""

    block_repeat: int = 1
    module_repeat: int = 5
    block_params: Tuple[Tuple[int, int], ...] = (
        (256, 33), (256, 39), (512, 51), (512, 63), (512, 75))
    initial_filters: int = 256
    initial_kernel: int = 33
    initial_stride: int = 2
    penultimate_filters: int = 512
    penultimate_kernel: int = 87
    final_filters: int = 1024
    dtype: Optional[jnp.dtype] = None


def _sep_conv(x, filters, kernel, *, stride=1, dilation=1, dtype=None):
    """Depthwise (grouped) + pointwise separable 1-D conv.

    Symmetric explicit padding mirrors the reference's
    ``ZeroPadding1D(k//2)`` + valid conv (``quartznet.py:61-86,143-171``):
    identical to SAME at stride 1, but at the initial stride-2 conv SAME
    would pad (15, 16) where the reference pads (16, 16)."""
    c_in = x.shape[-1]
    pad = dilation * (kernel - 1) // 2
    x = nn.Conv(c_in, (kernel,), strides=(stride,),
                kernel_dilation=(dilation,), feature_group_count=c_in,
                padding=[(pad, pad)], use_bias=False, dtype=dtype)(x)
    return nn.Conv(filters, (1,), use_bias=False, dtype=dtype)(x)


class _BN(nn.Module):
    momentum: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return nn.BatchNorm(use_running_average=not train,
                            momentum=self.momentum, dtype=self.dtype)(x)


class QuartzNetBlock(nn.Module):
    """R× [sepconv → BN → ReLU] + pointwise residual
    (reference ``quartznet.py:91-124``)."""

    filters: int
    kernel: int
    repeat: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        res = nn.Conv(self.filters, (1,), use_bias=False,
                      dtype=self.dtype)(x)
        res = _BN(dtype=self.dtype)(res, train=train)
        for i in range(self.repeat):
            x = _sep_conv(x, self.filters, self.kernel, dtype=self.dtype)
            x = _BN(dtype=self.dtype)(x, train=train)
            if i < self.repeat - 1:
                x = nn.relu(x)
        return nn.relu(x + res)


class QuartzNet(nn.Module):
    """Backbone + log-softmax head (reference ``quartznet.py:126-215``).

    [B, T, c_input] → [B, T//2, c_output] log-probs.
    """

    c_output: int
    config: QuartzNetConfig = QuartzNetConfig()
    stride: Optional[int] = None      # override initial stride (TTS heads use 1)
    log_softmax_output: bool = True   # ASR/CTC head; False for regression heads

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.config
        stride = self.stride if self.stride is not None else c.initial_stride
        x = _sep_conv(x, c.initial_filters, c.initial_kernel,
                      stride=stride, dtype=c.dtype)
        x = _BN(dtype=c.dtype)(x, train=train)
        x = nn.relu(x)
        x = nn.Dropout(0.1)(x, deterministic=not train)

        for filters, kernel in c.block_params:
            for _ in range(c.block_repeat):
                x = QuartzNetBlock(filters, kernel, c.module_repeat,
                                   dtype=c.dtype)(x, train=train)

        x = _sep_conv(x, c.penultimate_filters, c.penultimate_kernel,
                      dilation=2, dtype=c.dtype)
        x = _BN(momentum=0.9, dtype=c.dtype)(x, train=train)
        x = nn.relu(x)
        x = nn.Conv(c.final_filters, (1,), use_bias=False, dtype=c.dtype)(x)
        x = _BN(momentum=0.9, dtype=c.dtype)(x, train=train)
        x = nn.relu(x)
        x = nn.Conv(self.c_output, (1,), dtype=c.dtype)(x)
        if self.log_softmax_output:
            return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)
        return x.astype(jnp.float32)


def ctc_loss(log_probs, logit_lens, labels, label_lens, blank_id: int = 0):
    """Mean CTC loss (reference ``quartznet.py:219`` keras ctc_batch_cost)."""
    B, T, _ = log_probs.shape
    logit_pad = (~mask_from_lens(logit_lens, T)).astype(jnp.float32)
    label_pad = (~mask_from_lens(label_lens, labels.shape[1])).astype(
        jnp.float32)
    per = optax.ctc_loss(log_probs, logit_pad, labels, label_pad,
                         blank_id=blank_id)
    return jnp.mean(per)


def greedy_decode(log_probs, logit_lens, blank_id: int = 0) -> List[List[int]]:
    """Argmax + collapse-repeats + drop-blanks
    (reference ``quartznet.py`` greedy decoder)."""
    ids = np.asarray(jnp.argmax(log_probs, axis=-1))
    lens = np.asarray(logit_lens)
    out = []
    for row, n in zip(ids, lens):
        seq, prev = [], -1
        for s in row[:n]:
            if s != prev and s != blank_id:
                seq.append(int(s))
            prev = s
        out.append(seq)
    return out


def word_error_rate(refs: Sequence[str], hyps: Sequence[str]) -> float:
    """Corpus WER by edit distance (replaces the reference's jiwer dep,
    used by its ``ASRCallbackEval``, ``quartznet.py:252``)."""
    total_err = total_words = 0
    for ref, hyp in zip(refs, hyps):
        r, h = ref.split(), hyp.split()
        d = np.zeros((len(r) + 1, len(h) + 1), np.int32)
        d[:, 0] = np.arange(len(r) + 1)
        d[0, :] = np.arange(len(h) + 1)
        for i in range(1, len(r) + 1):
            for j in range(1, len(h) + 1):
                sub = d[i - 1, j - 1] + (r[i - 1] != h[j - 1])
                d[i, j] = min(sub, d[i - 1, j] + 1, d[i, j - 1] + 1)
        total_err += int(d[len(r), len(h)])
        total_words += len(r)
    return total_err / max(total_words, 1)


class StringMap:
    """char ↔ id lookup (reference ``quartznet.py:285-342``). id 0 = CTC blank."""

    def __init__(self, alphabet: str = " abcdefghijklmnopqrstuvwxyz'"):
        self.id_to_char = ["<blank>"] + list(alphabet)
        self.char_to_id = {c: i for i, c in enumerate(self.id_to_char)}

    def __len__(self):
        return len(self.id_to_char)

    def encode(self, text: str) -> List[int]:
        return [self.char_to_id[c] for c in text.lower()
                if c in self.char_to_id]

    def decode(self, ids: Sequence[int]) -> str:
        return "".join(self.id_to_char[i] for i in ids if i != 0)


# ----------------------------------------------------------- TalkNet 2 heads

@dataclasses.dataclass(frozen=True)
class TalkNet2Config:
    n_symbols: int = 148
    emb_dim: int = 256
    n_mel_channels: int = 80
    backbone: QuartzNetConfig = QuartzNetConfig(block_repeat=1,
                                                module_repeat=5)
    max_duration: int = 128
    dtype: Optional[jnp.dtype] = None


class GaussianEmbedding(nn.Module):
    """Spread per-token embeddings over frames with Gaussian weights centred
    on each token's duration span (implements the stub at
    ``talknet.py:15-24``)."""

    n_symbols: int
    emb_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, text, durs, mel_max_len: int):
        """text [B, T_text] ids, durs [B, T_text] frames → [B, T_mel, emb]."""
        emb = nn.Embed(self.n_symbols, self.emb_dim, dtype=self.dtype)(text)
        durs = durs.astype(jnp.float32)
        ends = jnp.cumsum(durs, axis=1)
        centers = ends - durs / 2.0                     # [B, T_text]
        sigma = jnp.maximum(durs / 2.0, 1e-2)
        frames = jnp.arange(mel_max_len, dtype=jnp.float32)[None, :, None]
        # [B, T_mel, T_text] normalized gaussian responsibility
        logit = -0.5 * jnp.square(
            (frames - centers[:, None, :]) / sigma[:, None, :])
        logit = jnp.where(durs[:, None, :] > 0, logit, -1e9)
        w = jax.nn.softmax(logit, axis=-1)
        return jnp.einsum("bmt,btc->bmc", w, emb)


class GraphemeDuration(nn.Module):
    """Per-token duration predictor: embed → QuartzNet (stride 1) → scalar
    (implements the stub at ``talknet.py:78-93``)."""

    config: TalkNet2Config

    @nn.compact
    def __call__(self, text, text_lens, *, train: bool = False):
        c = self.config
        x = nn.Embed(c.n_symbols, c.emb_dim, dtype=c.dtype)(text)
        x = QuartzNet(1, c.backbone, stride=1, log_softmax_output=False)(x, train=train)
        durs = x[..., 0]
        return durs * mask_from_lens(text_lens, text.shape[1]).astype(
            durs.dtype)


class PitchPredictor(nn.Module):
    """Frame-level (f0, voiced-logit) from duration-expanded embeddings
    (implements the stub at ``talknet.py:96-104``)."""

    config: TalkNet2Config

    @nn.compact
    def __call__(self, text, durs, mel_max_len: int, *, train: bool = False):
        c = self.config
        x = GaussianEmbedding(c.n_symbols, c.emb_dim, dtype=c.dtype)(
            text, durs, mel_max_len)
        x = QuartzNet(2, c.backbone, stride=1, log_softmax_output=False)(x, train=train)
        return x[..., 0], x[..., 1]     # f0 (normalized), voiced logit


class SpectrogramModel(nn.Module):
    """mel generator from expanded embeddings + pitch conditioning
    (implements the stub at ``talknet.py:107-131``)."""

    config: TalkNet2Config

    @nn.compact
    def __call__(self, text, durs, f0, mel_max_len: int, *,
                 train: bool = False):
        c = self.config
        x = GaussianEmbedding(c.n_symbols, c.emb_dim, dtype=c.dtype)(
            text, durs, mel_max_len)
        pitch_emb = nn.Conv(c.emb_dim, (3,), padding="SAME",
                            dtype=c.dtype)(f0[..., None])
        x = x + pitch_emb
        return QuartzNet(c.n_mel_channels, c.backbone, stride=1,
                         log_softmax_output=False)(x, train=train)
