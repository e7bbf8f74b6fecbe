"""Grad-TTS — score-based diffusion text→mel, TPU-native.

Re-design of ``Grad-TTS_TF/model/`` (tts.py 355 + text_encoder.py 501 +
diffusion.py 382 LoC):

- **TextEncoder**: scaled symbol embeddings, ConvReLUNorm prenet, 6
  transformer layers with windowed relative-position attention
  (window_size=4, ``text_encoder.py:207-340``), conv FFN, mel-prior head
  ``mu_x`` and a stop-gradient duration predictor;
- **Diffusion decoder**: 2-D UNet score estimator (``diffusion.py:177-291``)
  — GroupNorm+Mish blocks, linear attention, ReZero residuals — over
  ``stack([mu, x])`` as channels; linear β(t) schedule
  (``get_noise``, ``diffusion.py:294-299``); reverse SDE/ODE Euler sampler
  as one ``lax.scan`` over the step axis instead of the reference's Python
  loop (``diffusion.py:333-358``);
- **MAS** alignment reuses the shared on-device kernel (``ops/mas.py``) —
  the component the reference needed Cython/OpenMP + eager numpy for
  (``model/monotonic_align/``);
- the random 2-second segment cut inside the loss (``tts.py:275-329``,
  host numpy in the reference) is a vmapped ``lax.dynamic_slice`` — fully
  jittable, static ``out_size``.

Hyperparameters mirror ``Grad-TTS_TF/params.py`` (192 enc channels, 768
filter, 2 heads, 6 layers, dec_dim 64, β ∈ [0.05, 20], pe_scale 1000,
``add_blank`` interspersal).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.mas import maximum_path
from ..utils.masking import mask_from_lens

__all__ = ["GradTTSConfig", "GradTTS", "TextEncoder", "Diffusion",
           "fix_len_compatibility", "generate_path", "duration_loss"]


@dataclasses.dataclass(frozen=True)
class GradTTSConfig:
    n_symbols: int = 149            # len(symbols) + 1 blank (add_blank)
    n_feats: int = 80
    n_spks: int = 1
    spk_emb_dim: int = 64
    # encoder
    n_enc_channels: int = 192
    filter_channels: int = 768
    filter_channels_dp: int = 256
    n_enc_layers: int = 6
    enc_kernel: int = 3
    enc_dropout: float = 0.1
    n_heads: int = 2
    window_size: int = 4
    # decoder
    dec_dim: int = 64
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    groups: int = 8
    # 1e-5 = upstream torch GroupNorm default (what Grad-TTS was trained
    # with); the reference's tfa GroupNormalization silently used 1e-3 —
    # set 1e-3 to transplant weights from a reference-trained TF model.
    groupnorm_epsilon: float = 1e-5
    beta_min: float = 0.05
    beta_max: float = 20.0
    pe_scale: float = 1000.0
    # training
    out_size: int = 172             # fix_len_compatibility(2*22050//256)
    learning_rate: float = 1e-4
    dtype: Optional[jnp.dtype] = None


def fix_len_compatibility(length: int, num_downsamplings: int = 2) -> int:
    """Round up to a multiple of 2^num_downsamplings
    (reference ``model/utils.py:16-20``)."""
    m = 2 ** num_downsamplings
    return ((length + m - 1) // m) * m


def generate_path(duration, mask):
    """durations [B, T_text] → hard alignment [B, T_text, T_mel]
    (reference ``model/utils.py:28-44``: cumsum + sequence-mask diff)."""
    B, T_text, T_mel = mask.shape
    cum = jnp.cumsum(duration, axis=1)
    path = mask_from_lens(cum.reshape(-1), T_mel).reshape(B, T_text, T_mel)
    path = path.astype(mask.dtype)
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask


def duration_loss(logw, logw_hat, lengths):
    """(reference ``model/utils.py:47-50``)."""
    return jnp.sum(jnp.square(logw - logw_hat)) / jnp.maximum(
        jnp.sum(lengths.astype(jnp.float32)), 1.0)


# ------------------------------------------------------------- text encoder

class ConvReluNormPrenet(nn.Module):
    """3×[conv5 → LayerNorm → ReLU → dropout] + residual projection
    (reference ``text_encoder.py`` ConvReluNorm)."""

    channels: int
    kernel_size: int = 5
    n_layers: int = 3
    dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        m = mask[..., None].astype(x.dtype)
        org = x
        for _ in range(self.n_layers):
            x = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype)(x * m)
            x = nn.LayerNorm(epsilon=1e-4, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = org + nn.Conv(self.channels, (1,),
                          kernel_init=nn.initializers.zeros,
                          dtype=self.dtype)(x)
        return x * m


class RelPositionMultiHeadAttention(nn.Module):
    """Self-attention with windowed relative position embeddings
    (reference ``text_encoder.py:207-340``, window_size=4)."""

    channels: int
    n_heads: int
    window_size: int = 4
    p_dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        """x: [B, T, C]; mask: [B, T] bool."""
        H = self.n_heads
        k_ch = self.channels // H
        B, T, _ = x.shape

        q = nn.Conv(self.channels, (1,), dtype=self.dtype)(x)
        k = nn.Conv(self.channels, (1,), dtype=self.dtype)(x)
        v = nn.Conv(self.channels, (1,), dtype=self.dtype)(x)
        q = q.reshape(B, T, H, k_ch)
        k = k.reshape(B, T, H, k_ch)
        v = v.reshape(B, T, H, k_ch)

        scale = 1.0 / math.sqrt(k_ch)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale

        # Relative-position logits: shared (per head-dim) learned embeddings
        # over offsets [-w, w]; offsets beyond the window contribute ZERO
        # (the reference pads the embedding table with zeros before its
        # rel→abs gather, ``text_encoder.py:275-295`` — clamping would reuse
        # the edge embedding instead and break weight transplant).
        W = self.window_size
        init = nn.initializers.normal(stddev=k_ch ** -0.5)
        emb_rel_k = self.param("emb_rel_k", init, (2 * W + 1, k_ch))
        emb_rel_v = self.param("emb_rel_v", init, (2 * W + 1, k_ch))
        offsets = np.arange(T)[None, :] - np.arange(T)[:, None]     # [T,T]
        idx = np.clip(offsets, -W, W) + W
        in_window = (np.abs(offsets) <= W).astype(np.float32)[..., None]
        rel_k = emb_rel_k[idx] * in_window                # [T, T, d]
        rel_logits = jnp.einsum("bqhd,qkd->bhqk", q, rel_k) * scale
        scores = scores + rel_logits

        bias = jnp.where(mask[:, None, None, :], 0.0, -1e4)
        p_attn = jax.nn.softmax(scores + bias.astype(scores.dtype), axis=-1)
        p_attn = nn.Dropout(self.p_dropout)(p_attn, deterministic=deterministic)

        out = jnp.einsum("bhqk,bkhd->bqhd", p_attn, v)
        rel_v = emb_rel_v[idx] * in_window                # [T, T, d]
        out = out + jnp.einsum("bhqk,qkd->bqhd", p_attn, rel_v)
        out = out.reshape(B, T, self.channels)
        return nn.Conv(self.channels, (1,), dtype=self.dtype)(out)


class EncFFN(nn.Module):
    """conv(k) → ReLU → dropout → conv(k) (reference ``text_encoder.py:342-369``)."""

    out_channels: int
    filter_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        m = mask[..., None].astype(x.dtype)
        x = nn.Conv(self.filter_channels, (self.kernel_size,),
                    padding="SAME", dtype=self.dtype)(x * m)
        x = nn.relu(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype)(x * m)
        return x * m


class DurationPredictor(nn.Module):
    """2×[conv3 → ReLU → LayerNorm → dropout] → proj
    (reference ``text_encoder.py:112-142``)."""

    filter_channels: int = 256
    kernel_size: int = 3
    p_dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        m = mask[..., None].astype(x.dtype)
        for _ in range(2):
            x = nn.Conv(self.filter_channels, (self.kernel_size,),
                        padding="SAME", dtype=self.dtype)(x * m)
            x = nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-4, dtype=self.dtype)(x)
            x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        return nn.Conv(1, (1,), dtype=self.dtype)(x * m) * m


class TextEncoder(nn.Module):
    """(reference ``text_encoder.py:422-501``). Returns (mu_x, logw, mask)."""

    config: GradTTSConfig

    @nn.compact
    def __call__(self, x, x_lengths, spk=None, *, deterministic: bool = True):
        c = self.config
        mask = mask_from_lens(x_lengths, x.shape[1])
        emb = nn.Embed(
            c.n_symbols, c.n_enc_channels,
            embedding_init=nn.initializers.normal(
                stddev=c.n_enc_channels ** -0.5))(x)
        h = emb * math.sqrt(c.n_enc_channels)
        h = ConvReluNormPrenet(c.n_enc_channels, dtype=c.dtype)(
            h, mask, deterministic=deterministic)
        if spk is not None:
            h = jnp.concatenate(
                [h, jnp.broadcast_to(spk[:, None, :],
                                     (*h.shape[:2], spk.shape[-1]))], axis=-1)
            h = nn.Conv(c.n_enc_channels, (1,), dtype=c.dtype)(h)

        for _ in range(c.n_enc_layers):
            y = RelPositionMultiHeadAttention(
                c.n_enc_channels, c.n_heads, c.window_size, c.enc_dropout,
                dtype=c.dtype)(h, mask, deterministic=deterministic)
            y = nn.Dropout(c.enc_dropout)(y, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-4, dtype=c.dtype)(h + y)
            y = EncFFN(c.n_enc_channels, c.filter_channels, c.enc_kernel,
                       c.enc_dropout, dtype=c.dtype)(
                h, mask, deterministic=deterministic)
            y = nn.Dropout(c.enc_dropout)(y, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=1e-4, dtype=c.dtype)(h + y)
        h = h * mask[..., None].astype(h.dtype)

        mu_x = nn.Conv(c.n_feats, (1,), dtype=c.dtype)(h)
        mu_x = mu_x * mask[..., None].astype(mu_x.dtype)
        logw = DurationPredictor(
            c.filter_channels_dp, dtype=c.dtype)(
            jax.lax.stop_gradient(h), mask,
            deterministic=deterministic)[..., 0]
        return mu_x, logw, mask


# ---------------------------------------------------------------- UNet score

class UNetBlock(nn.Module):
    """conv3×3 → GroupNorm → Mish, masked (reference ``diffusion.py:57-69``)."""

    dim_out: int
    groups: int = 8
    dtype: Optional[jnp.dtype] = None
    gn_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask):
        x = nn.Conv(self.dim_out, (3, 3), padding="SAME",
                    dtype=self.dtype)(x * mask)
        # epsilon default follows the upstream torch GroupNorm the reference
        # was porting (the reference's tfa layer silently used 1e-3 —
        # configurable via GradTTSConfig.groupnorm_epsilon)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=self.gn_epsilon,
                         dtype=self.dtype)(x)
        x = x * jnp.tanh(nn.softplus(x))
        return x * mask


class UNetResnetBlock(nn.Module):
    """(reference ``diffusion.py:72-99``)."""

    dim_out: int
    groups: int = 8
    dtype: Optional[jnp.dtype] = None
    gn_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, time_emb):
        h = UNetBlock(self.dim_out, self.groups, dtype=self.dtype,
                      gn_epsilon=self.gn_epsilon)(x, mask)
        t = nn.Dense(self.dim_out, dtype=self.dtype)(
            time_emb * jnp.tanh(nn.softplus(time_emb)))
        h = h + t[:, None, None, :]
        h = UNetBlock(self.dim_out, self.groups, dtype=self.dtype,
                      gn_epsilon=self.gn_epsilon)(h, mask)
        if x.shape[-1] != self.dim_out:
            res = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype)(x * mask)
        else:
            res = x * mask
        return h + res


class LinearAttention2D(nn.Module):
    """Efficient kv-context linear attention (reference ``diffusion.py:102-148``)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, Hh, Ww, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv.reshape(B, Hh * Ww, 3 * self.heads,
                                        self.dim_head), 3, axis=2)
        k = jax.nn.softmax(k, axis=1)   # softmax over spatial positions
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, Hh, Ww, hidden)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype)(out)


class ReZeroAttention(nn.Module):
    """x + g·attn(x), g zero-init (reference ``diffusion.py:46-53,151-158``)."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.zeros, (1,))
        return x + g * LinearAttention2D(self.dim, dtype=self.dtype)(x)


class GradLogPEstimator2D(nn.Module):
    """UNet over stacked [mu, x] channels (reference ``diffusion.py:177-291``).

    x, mu: [B, n_feats, T] → score [B, n_feats, T]. T must be divisible by
    2^len(dim_mults)-1 downsamples (``fix_len_compatibility``).
    """

    config: GradTTSConfig

    @nn.compact
    def __call__(self, x, mask, mu, t, spk=None):
        c = self.config
        dim = c.dec_dim

        # time embedding: sinusoidal (pe_scale) → MLP
        half = dim // 2
        freqs = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
        te = c.pe_scale * t[:, None] * freqs[None, :]
        temb = jnp.concatenate([jnp.sin(te), jnp.cos(te)], axis=-1)
        temb = nn.Dense(dim * 4, dtype=c.dtype)(temb)
        temb = temb * jnp.tanh(nn.softplus(temb))
        temb = nn.Dense(dim, dtype=c.dtype)(temb)

        feats = [mu, x]
        if spk is not None:
            s = nn.Dense(c.spk_emb_dim * 4, dtype=c.dtype)(spk)
            s = s * jnp.tanh(nn.softplus(s))
            s = nn.Dense(c.n_feats, dtype=c.dtype)(s)
            feats.append(jnp.broadcast_to(s[:, :, None], mu.shape))
        h = jnp.stack(feats, axis=-1)           # [B, n_feats, T, 2(+1)]
        m = mask[:, None, :, None].astype(h.dtype)  # [B, 1, T, 1]

        dims = [dim * m_ for m_ in c.dim_mults]
        hiddens, masks = [], [m]
        for i, d in enumerate(dims):
            is_last = i == len(dims) - 1
            h = UNetResnetBlock(d, c.groups, dtype=c.dtype,
                                gn_epsilon=c.groupnorm_epsilon)(
                h, masks[-1], temb)
            h = UNetResnetBlock(d, c.groups, dtype=c.dtype,
                                gn_epsilon=c.groupnorm_epsilon)(
                h, masks[-1], temb)
            h = ReZeroAttention(d, dtype=c.dtype)(h)
            hiddens.append(h)
            if not is_last:
                h = nn.Conv(d, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=c.dtype)(h * masks[-1])
                masks.append(masks[-1][:, :, ::2, :])

        mid = dims[-1]
        h = UNetResnetBlock(mid, c.groups, dtype=c.dtype,
                            gn_epsilon=c.groupnorm_epsilon)(h, masks[-1], temb)
        h = ReZeroAttention(mid, dtype=c.dtype)(h)
        h = UNetResnetBlock(mid, c.groups, dtype=c.dtype,
                            gn_epsilon=c.groupnorm_epsilon)(h, masks[-1], temb)

        for i, d in enumerate(reversed(dims[:-1])):
            mk = masks[-(i + 1)]
            h = jnp.concatenate([h, hiddens[-(i + 1)]], axis=-1)
            h = UNetResnetBlock(d, c.groups, dtype=c.dtype,
                                gn_epsilon=c.groupnorm_epsilon)(h, mk, temb)
            h = UNetResnetBlock(d, c.groups, dtype=c.dtype,
                                gn_epsilon=c.groupnorm_epsilon)(h, mk, temb)
            h = ReZeroAttention(d, dtype=c.dtype)(h)
            # transpose_kernel=True: gradient-of-conv semantics + TF kernel
            # layout (reference UpSample = keras Conv2DTranspose,
            # ``diffusion.py:26-33``) so reference weights map verbatim.
            h = nn.ConvTranspose(d, (4, 4), strides=(2, 2), padding="SAME",
                                 transpose_kernel=True, dtype=c.dtype)(h * mk)

        h = UNetBlock(dim, c.groups, dtype=c.dtype,
                      gn_epsilon=c.groupnorm_epsilon)(h, m)
        out = nn.Conv(1, (1, 1), dtype=c.dtype)(h * m)
        return (out * m)[..., 0]                 # [B, n_feats, T]


def get_noise(t, beta_min, beta_max, cumulative=False):
    """Linear β(t) (reference ``diffusion.py:294-299``)."""
    if cumulative:
        return beta_min * t + 0.5 * (beta_max - beta_min) * t ** 2
    return beta_min + (beta_max - beta_min) * t


class Diffusion(nn.Module):
    """Forward/reverse SDE + score loss (reference ``diffusion.py:302-383``)."""

    config: GradTTSConfig

    def setup(self):
        self.estimator = GradLogPEstimator2D(self.config)

    def forward_diffusion(self, x0, mask, mu, t, rng):
        c = self.config
        cum = get_noise(t[:, None, None], c.beta_min, c.beta_max,
                        cumulative=True)
        mean = x0 * jnp.exp(-0.5 * cum) + mu * (1.0 - jnp.exp(-0.5 * cum))
        variance = 1.0 - jnp.exp(-cum)
        z = jax.random.normal(rng, x0.shape)
        xt = mean + z * jnp.sqrt(variance)
        m = mask[:, None, :]
        return xt * m, z * m

    def reverse_diffusion(self, z, mask, mu, n_timesteps: int,
                          stoc: bool = False, spk=None, rng=None):
        """Euler solver as lax.scan (reference Python loop
        ``diffusion.py:333-358``)."""
        c = self.config
        h = 1.0 / n_timesteps
        m = mask[:, None, :]
        xt = z * m
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def step(mod, carry, i):
            xt, key = carry
            t = (1.0 - (i + 0.5) * h) * jnp.ones((z.shape[0],))
            noise_t = get_noise(t[:, None, None], c.beta_min, c.beta_max)
            score = mod.estimator(xt, mask, mu, t, spk)
            if stoc:
                dxt_det = (0.5 * (mu - xt) - score) * noise_t * h
                key, sub = jax.random.split(key)
                dxt_stoc = jax.random.normal(sub, z.shape) * jnp.sqrt(
                    noise_t * h)
                dxt = dxt_det + dxt_stoc
            else:
                dxt = 0.5 * (mu - xt - score) * noise_t * h
            return ((xt - dxt) * m, key), None

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False})
        (xt, _), _ = scan(self, (xt, rng),
                          jnp.arange(n_timesteps, dtype=jnp.float32))
        return xt

    def loss_t(self, x0, mask, mu, t, rng, spk=None):
        c = self.config
        xt, z = self.forward_diffusion(x0, mask, mu, t, rng)
        cum = get_noise(t[:, None, None], c.beta_min, c.beta_max,
                        cumulative=True)
        est = self.estimator(xt, mask, mu, t, spk)
        est = est * jnp.sqrt(1.0 - jnp.exp(-cum))
        loss = jnp.sum(jnp.square(est + z)) / (
            jnp.maximum(jnp.sum(mask), 1.0) * c.n_feats)
        return loss, xt

    def compute_loss(self, x0, mask, mu, rng, spk=None, offset: float = 1e-5):
        t_rng, z_rng = jax.random.split(rng)
        t = jax.random.uniform(t_rng, (x0.shape[0],), minval=offset,
                               maxval=1.0 - offset)
        return self.loss_t(x0, mask, mu, t, z_rng, spk)

    def __call__(self, z, mask, mu, n_timesteps: int, stoc: bool = False,
                 spk=None, rng=None):
        return self.reverse_diffusion(z, mask, mu, n_timesteps, stoc, spk, rng)


# ------------------------------------------------------------------ GradTTS

class GradTTS(nn.Module):
    """Full model (reference ``model/tts.py``)."""

    config: GradTTSConfig = GradTTSConfig()

    def setup(self):
        c = self.config
        self.encoder = TextEncoder(c)
        self.decoder = Diffusion(c)
        if c.n_spks > 1:
            self.spk_emb = nn.Embed(c.n_spks, c.spk_emb_dim)

    def _spk(self, spk):
        if self.config.n_spks > 1 and spk is not None:
            return self.spk_emb(spk)
        return None

    def __call__(self, x, x_lengths, n_timesteps: int,
                 temperature: float = 1.0, stoc: bool = False, spk=None,
                 length_scale: float = 1.0, max_mel_len: Optional[int] = None,
                 rng=None, noise=None):
        """Synthesis (reference ``tts.py:62-157``): text → (encoder mel,
        decoder mel, alignment, mel lengths).

        ``noise`` optionally fixes the terminal latent's noise term
        (``z = mu_y + noise / temperature``, shape [B, n_feats, T_mel]) —
        used by the end-to-end oracle parity test; default samples it."""
        c = self.config
        spk_v = self._spk(spk)
        mu_x, logw, x_mask = self.encoder(x, x_lengths, spk_v)

        w = jnp.exp(logw) * x_mask.astype(logw.dtype)
        w_ceil = jnp.ceil(w) * length_scale
        y_lengths = jnp.maximum(
            jnp.sum(w_ceil, axis=1), 1.0).astype(jnp.int32)
        if max_mel_len is None:
            max_mel_len = fix_len_compatibility(int(x.shape[1]) * 12)
        max_mel_len = fix_len_compatibility(max_mel_len)
        y_lengths = jnp.minimum(y_lengths, max_mel_len)
        y_mask = mask_from_lens(y_lengths, max_mel_len)

        attn_mask = (x_mask[:, :, None] & y_mask[:, None, :])
        attn = generate_path(w_ceil, attn_mask.astype(jnp.float32))

        # mu_y [B, T_mel, n_feats] = attnᵀ · mu_x
        mu_y = jnp.einsum("bxy,bxc->byc", attn, mu_x)
        mu_y_t = jnp.swapaxes(mu_y, 1, 2)        # [B, n_feats, T_mel]

        if rng is None:
            rng = jax.random.PRNGKey(0)
        z_rng, d_rng = jax.random.split(rng)
        if noise is None:
            noise = jax.random.normal(z_rng, mu_y_t.shape)
        z = mu_y_t + noise / temperature
        dec = self.decoder(z, y_mask, mu_y_t, n_timesteps, stoc,
                           spk_v, d_rng)
        return mu_y, jnp.swapaxes(dec, 1, 2), attn, y_lengths

    def compute_loss(self, x, x_lengths, y, y_lengths, rng, spk=None,
                     out_size: Optional[int] = None):
        """(dur_loss, prior_loss, diff_loss) (reference ``tts.py:193-356``).

        y: [B, T_mel, n_feats]; T_mel must be a multiple of 4 when
        ``out_size`` is None.
        """
        c = self.config
        spk_v = self._spk(spk)
        mu_x, logw, x_mask = self.encoder(
            x, x_lengths, spk_v, deterministic=False)
        y_mask = mask_from_lens(y_lengths, y.shape[1])
        attn_mask = x_mask[:, :, None] & y_mask[:, None, :]

        # Gaussian log-prior distance matrix via matmuls (tts.py:236-253).
        const = -0.5 * math.log(2 * math.pi) * c.n_feats
        mu_f = mu_x.astype(jnp.float32)
        y_f = y.astype(jnp.float32)
        # [B, T_text, T_mel] = -0.5 Σ_c (y² − 2 y μ + μ²) + const
        log_prior = (
            -0.5 * jnp.sum(y_f ** 2, axis=-1)[:, None, :]
            + jnp.einsum("bxc,byc->bxy", mu_f, y_f)
            - 0.5 * jnp.sum(mu_f ** 2, axis=-1)[:, :, None]
            + const
        )

        # MAS expects [B, T_mel, T_text]
        attn = maximum_path(
            jnp.swapaxes(log_prior, 1, 2), x_lengths, y_lengths)
        attn = jnp.swapaxes(attn, 1, 2)          # [B, T_text, T_mel]
        attn = jax.lax.stop_gradient(attn)

        logw_hat = jnp.log(1e-8 + jnp.sum(attn, axis=-1)) * x_mask
        dur_loss = duration_loss(logw, logw_hat, x_lengths)

        # Random out_size segment cut as vmapped dynamic_slice (tts.py:275-329).
        if out_size is not None and out_size < y.shape[1]:
            cut_rng, rng = jax.random.split(rng)
            max_offset = jnp.maximum(y_lengths - out_size, 0)
            u = jax.random.uniform(cut_rng, (y.shape[0],))
            offsets = (u * (max_offset + 1).astype(jnp.float32)).astype(
                jnp.int32)

            def cut_y(yb, off):
                return jax.lax.dynamic_slice(
                    yb, (off, 0), (out_size, c.n_feats))

            def cut_attn(ab, off):
                return jax.lax.dynamic_slice(
                    ab, (0, off), (ab.shape[0], out_size))

            y = jax.vmap(cut_y)(y, offsets)
            attn = jax.vmap(cut_attn)(attn, offsets)
            y_cut_lengths = jnp.minimum(y_lengths - offsets, out_size)
            y_lengths = y_cut_lengths
            y_mask = mask_from_lens(y_lengths, out_size)

        mu_y = jnp.einsum("bxy,bxc->byc", attn, mu_x)  # [B, T_mel, n_feats]
        mu_y_t = jnp.swapaxes(mu_y, 1, 2)
        y_t = jnp.swapaxes(y, 1, 2)

        diff_loss, _ = self.decoder.compute_loss(
            y_t, y_mask, mu_y_t, rng, spk_v)

        m = y_mask[:, :, None].astype(jnp.float32)
        prior_loss = jnp.sum(
            0.5 * (jnp.square(y - mu_y) + math.log(2 * math.pi)) * m)
        prior_loss = prior_loss / (jnp.maximum(jnp.sum(m), 1.0) * c.n_feats)

        return dur_loss, prior_loss, diff_loss
