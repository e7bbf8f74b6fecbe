"""FastPitch — parallel text→mel acoustic model, TPU-native.

Re-design of the reference ``FastPitch_TF/model.py`` (409 LoC) +
``attention.py`` (ConvAttention) for JAX/XLA:

- ``regulate_len`` (reference ``model.py:22-52``) and ``average_pitch``
  (``model.py:55-98``) stay matmul/cumsum formulations — they map 1:1 onto
  the MXU/VPU;
- the aligner's Gaussian distance matrix is computed via the
  ``|q|² + |k|² − 2·q·kᵀ`` expansion (one batched matmul) instead of the
  reference's broadcasted 4-D subtraction (``attention.py:131-137``), cutting
  the memory traffic by the attention-channel factor;
- attention binarization runs **on device** through ``ops.mas.maximum_path``
  instead of the reference's eager tf→numpy→Python-loop round-trip
  (``model.py:227-256``);
- all shapes are static: ``mel_max_len`` bounds the length regulator at
  trace time, and real lengths travel as tensors → masks.

Hyperparameter defaults mirror ``FastPitch_TF/arg_parser.py`` (384-dim
symbols, 6+6 FFT layers, 1 head, d_head 64, 1536 conv filters).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import ConvReLUNorm
from ..nn.transformer import FFTransformer
from ..ops.mas import maximum_path
from ..utils.masking import mask_from_lens

__all__ = [
    "FastPitchConfig",
    "FastPitch",
    "FastPitchOutput",
    "ConvAttention",
    "TemporalPredictor",
    "regulate_len",
    "average_pitch",
]

_NEG = -1e9


@dataclasses.dataclass(frozen=True)
class FastPitchConfig:
    """Defaults = reference ``FastPitch_TF/arg_parser.py`` argument groups."""

    n_mel_channels: int = 80
    n_symbols: int = 148
    padding_idx: int = 0
    symbols_embedding_dim: int = 384
    # input FFT
    in_fft_n_layers: int = 6
    in_fft_n_heads: int = 1
    in_fft_d_head: int = 64
    in_fft_conv1d_kernel_size: int = 3
    in_fft_conv1d_filter_size: int = 1536
    p_in_fft_dropout: float = 0.1
    p_in_fft_dropatt: float = 0.1
    p_in_fft_dropemb: float = 0.0
    # output FFT
    out_fft_n_layers: int = 6
    out_fft_n_heads: int = 1
    out_fft_d_head: int = 64
    out_fft_conv1d_kernel_size: int = 3
    out_fft_conv1d_filter_size: int = 1536
    p_out_fft_dropout: float = 0.1
    p_out_fft_dropatt: float = 0.1
    p_out_fft_dropemb: float = 0.0
    # duration predictor
    dur_predictor_kernel_size: int = 3
    dur_predictor_filter_size: int = 256
    p_dur_predictor_dropout: float = 0.1
    dur_predictor_n_layers: int = 2
    # pitch predictor
    pitch_predictor_kernel_size: int = 3
    pitch_predictor_filter_size: int = 256
    p_pitch_predictor_dropout: float = 0.1
    pitch_predictor_n_layers: int = 2
    pitch_embedding_kernel_size: int = 3
    pitch_conditioning_formants: int = 1
    # energy
    energy_conditioning: bool = True
    energy_predictor_kernel_size: int = 3
    energy_predictor_filter_size: int = 256
    p_energy_predictor_dropout: float = 0.1
    energy_predictor_n_layers: int = 2
    energy_embedding_kernel_size: int = 3
    # speakers
    n_speakers: int = 1
    speaker_emb_weight: float = 1.0
    # attention
    n_attn_channels: int = 80
    # compute dtype (None = float32; jnp.bfloat16 for TPU throughput)
    dtype: Optional[jnp.dtype] = None


class FastPitchOutput(NamedTuple):
    """Training-forward outputs, mirroring the reference return tuple
    (``model.py:360-363``)."""

    mel_out: jax.Array          # [B, T_mel, n_mel]
    dec_mask: jax.Array         # [B, T_mel] bool
    dur_pred: jax.Array         # [B, T_text]
    log_dur_pred: jax.Array     # [B, T_text]
    pitch_pred: jax.Array       # [B, n_formants, T_text]
    pitch_tgt: jax.Array        # [B, n_formants, T_text]
    energy_pred: Optional[jax.Array]   # [B, T_text]
    energy_tgt: Optional[jax.Array]    # [B, T_text]
    attn_soft: jax.Array        # [B, T_mel, T_text]
    attn_hard: jax.Array        # [B, T_mel, T_text]
    attn_hard_dur: jax.Array    # [B, T_text]
    attn_logprob: jax.Array     # [B, T_mel, T_text]


def regulate_len(durations, enc_out, pace: float = 1.0, mel_max_len: Optional[int] = None):
    """Expand per-symbol encodings to frames via a 0/1 selection matmul
    (reference ``model.py:22-52``).

    Static output length = ``mel_max_len`` (required under jit); real decoded
    lengths are returned for masking.
    """
    assert mel_max_len is not None, "mel_max_len must be static under jit"
    reps = jnp.floor(durations.astype(jnp.float32) / pace + 0.5).astype(jnp.int32)
    dec_lens = jnp.sum(reps, axis=1)

    reps_cumsum = jnp.cumsum(
        jnp.pad(reps, ((0, 0), (1, 0))), axis=1
    ).astype(jnp.float32)[:, None, :]  # [B, 1, T_text+1]
    rng = jnp.arange(mel_max_len, dtype=jnp.float32)[None, :, None]
    mult = (reps_cumsum[:, :, :-1] <= rng) & (reps_cumsum[:, :, 1:] > rng)
    enc_rep = jnp.matmul(mult.astype(enc_out.dtype), enc_out)
    dec_lens = jnp.minimum(dec_lens, mel_max_len)
    return enc_rep, dec_lens


def average_pitch(pitch, durs):
    """Average per-frame pitch over each symbol's duration span via cumsum +
    gather (reference ``model.py:55-98``). Zero frames are excluded from the
    mean (unvoiced frames don't drag the average down).

    pitch: [B, F, T_frames]; durs: [B, T_text] -> [B, F, T_text].
    """
    durs = durs.astype(jnp.int32)
    dce = jnp.cumsum(durs, axis=1)                       # [B, T_text]
    dcs = jnp.pad(dce[:, :-1], ((0, 0), (1, 0)))

    nonzero_cums = jnp.pad(
        jnp.cumsum((pitch != 0.0).astype(jnp.float32), axis=2), ((0, 0), (0, 0), (1, 0))
    )
    pitch_cums = jnp.pad(
        jnp.cumsum(pitch.astype(jnp.float32), axis=2), ((0, 0), (0, 0), (1, 0))
    )

    n_formants = pitch.shape[1]
    dce_b = jnp.broadcast_to(dce[:, None, :], (durs.shape[0], n_formants, durs.shape[1]))
    dcs_b = jnp.broadcast_to(dcs[:, None, :], dce_b.shape)

    pitch_sums = (
        jnp.take_along_axis(pitch_cums, dce_b, axis=2)
        - jnp.take_along_axis(pitch_cums, dcs_b, axis=2)
    )
    pitch_nelems = (
        jnp.take_along_axis(nonzero_cums, dce_b, axis=2)
        - jnp.take_along_axis(nonzero_cums, dcs_b, axis=2)
    )
    return jnp.where(pitch_nelems == 0.0, 0.0, pitch_sums / jnp.maximum(pitch_nelems, 1.0))


class TemporalPredictor(nn.Module):
    """Duration/pitch/energy predictor head (reference ``model.py:101-121``)."""

    filter_size: int
    kernel_size: int
    dropout: float
    n_layers: int = 2
    n_predictions: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, enc_out, enc_mask, *, deterministic: bool = True):
        """enc_out: [B, T, C]; enc_mask: [B, T] bool -> [B, T, n_predictions]."""
        m = enc_mask[..., None].astype(enc_out.dtype)
        out = enc_out * m
        for _ in range(self.n_layers):
            out = ConvReLUNorm(
                self.filter_size, kernel_size=self.kernel_size,
                dropout=self.dropout, dtype=self.dtype,
            )(out, deterministic=deterministic)
        out = nn.Dense(self.n_predictions, dtype=self.dtype)(out)
        return out * m


class ConvAttention(nn.Module):
    """Mel-query / text-key Gaussian alignment attention
    (reference ``FastPitch_TF/attention.py:56-156``, "3xconv" variant).

    Returns ``(attn_soft, attn_logprob)``, both [B, T_mel, T_text].
    """

    n_mel_channels: int = 80
    n_text_channels: int = 512
    n_attn_channels: int = 80
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, queries, keys, key_mask=None, attn_prior=None):
        """queries: mel [B, T_mel, n_mel]; keys: text emb [B, T_text, C]."""
        # key_proj: ConvNorm(2C, k3) -> ReLU -> ConvNorm(attn, k1)
        k = nn.Conv(self.n_text_channels * 2, (3,), padding="SAME", dtype=self.dtype)(keys)
        k = nn.relu(k)
        keys_enc = nn.Conv(self.n_attn_channels, (1,), dtype=self.dtype)(k)

        # query_proj: ConvNorm(2M, k3) -> ReLU -> ConvNorm(M, k1) -> ReLU -> ConvNorm(attn, k1)
        q = nn.Conv(self.n_mel_channels * 2, (3,), padding="SAME", dtype=self.dtype)(queries)
        q = nn.relu(q)
        q = nn.Conv(self.n_mel_channels, (1,), dtype=self.dtype)(q)
        q = nn.relu(q)
        queries_enc = nn.Conv(self.n_attn_channels, (1,), dtype=self.dtype)(q)

        # -0.0005 * ||q - k||²  via  |q|² + |k|² − 2 q·kᵀ  (one MXU matmul,
        # vs the reference's [B, T_mel, T_text, C] broadcast at attention.py:131).
        qf = queries_enc.astype(jnp.float32)
        kf = keys_enc.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=-1)  # [B, T_mel]
        k_sq = jnp.sum(kf * kf, axis=-1)  # [B, T_text]
        cross = jnp.einsum("bmc,btc->bmt", qf, kf)
        dist = q_sq[:, :, None] + k_sq[:, None, :] - 2.0 * cross
        attn = -0.0005 * dist  # [B, T_mel, T_text]

        attn = jax.nn.log_softmax(attn, axis=-1)
        if attn_prior is not None:
            attn = attn + jnp.log(attn_prior + 1e-8)
        attn_logprob = attn

        if key_mask is not None:
            attn = jnp.where(key_mask[:, None, :], attn, _NEG)
        attn_soft = jax.nn.softmax(attn, axis=-1)
        return attn_soft, attn_logprob


class FastPitch(nn.Module):
    """Full FastPitch model (reference ``FastPitch_TF/model.py:124-410``)."""

    config: FastPitchConfig = FastPitchConfig()

    def setup(self):
        c = self.config
        self.encoder = FFTransformer(
            n_layer=c.in_fft_n_layers, n_head=c.in_fft_n_heads,
            d_model=c.symbols_embedding_dim, d_head=c.in_fft_d_head,
            d_inner=c.in_fft_conv1d_filter_size,
            kernel_size=c.in_fft_conv1d_kernel_size,
            dropout=c.p_in_fft_dropout, dropatt=c.p_in_fft_dropatt,
            dropemb=c.p_in_fft_dropemb, embed_input=True,
            n_emb=c.n_symbols, padding_idx=c.padding_idx, dtype=c.dtype,
        )
        if c.n_speakers > 1:
            self.speaker_emb = nn.Embed(c.n_speakers, c.symbols_embedding_dim)
        self.duration_predictor = TemporalPredictor(
            filter_size=c.dur_predictor_filter_size,
            kernel_size=c.dur_predictor_kernel_size,
            dropout=c.p_dur_predictor_dropout,
            n_layers=c.dur_predictor_n_layers, dtype=c.dtype,
        )
        self.decoder = FFTransformer(
            n_layer=c.out_fft_n_layers, n_head=c.out_fft_n_heads,
            d_model=c.symbols_embedding_dim, d_head=c.out_fft_d_head,
            d_inner=c.out_fft_conv1d_filter_size,
            kernel_size=c.out_fft_conv1d_kernel_size,
            dropout=c.p_out_fft_dropout, dropatt=c.p_out_fft_dropatt,
            dropemb=c.p_out_fft_dropemb, embed_input=False, dtype=c.dtype,
        )
        self.pitch_predictor = TemporalPredictor(
            filter_size=c.pitch_predictor_filter_size,
            kernel_size=c.pitch_predictor_kernel_size,
            dropout=c.p_pitch_predictor_dropout,
            n_layers=c.pitch_predictor_n_layers,
            n_predictions=c.pitch_conditioning_formants, dtype=c.dtype,
        )
        self.pitch_emb = nn.Conv(
            c.symbols_embedding_dim, (c.pitch_embedding_kernel_size,),
            padding="SAME", dtype=c.dtype,
        )
        if c.energy_conditioning:
            self.energy_predictor = TemporalPredictor(
                filter_size=c.energy_predictor_filter_size,
                kernel_size=c.energy_predictor_kernel_size,
                dropout=c.p_energy_predictor_dropout,
                n_layers=c.energy_predictor_n_layers, dtype=c.dtype,
            )
            self.energy_emb = nn.Conv(
                c.symbols_embedding_dim, (c.energy_embedding_kernel_size,),
                padding="SAME", dtype=c.dtype,
            )
        self.proj = nn.Dense(c.n_mel_channels, dtype=c.dtype)
        self.attention = ConvAttention(
            n_mel_channels=c.n_mel_channels,
            n_text_channels=c.symbols_embedding_dim,
            n_attn_channels=c.n_attn_channels, dtype=c.dtype,
        )

    def _speaker_vec(self, speaker):
        c = self.config
        if c.n_speakers <= 1 or speaker is None:
            return None
        return self.speaker_emb(speaker)[:, None, :] * c.speaker_emb_weight

    def __call__(self, text, input_lens, mel_tgt, mel_lens,
                 pitch_dense, energy_dense=None, speaker=None, attn_prior=None,
                 *, use_gt_pitch: bool = True, pace: float = 1.0,
                 max_duration: float = 75.0, deterministic: bool = True):
        """Training forward (reference ``model.py:259-363``).

        text: [B, T_text] int ids; mel_tgt: [B, T_mel, n_mel];
        pitch_dense: [B, n_formants, >=T_mel]; energy_dense: [B, T_mel];
        attn_prior: [B, T_mel, T_text].
        """
        c = self.config
        mel_max_len = mel_tgt.shape[1]

        spk_emb = self._speaker_vec(speaker)
        enc_out, enc_mask = self.encoder(
            text, conditioning=spk_emb, deterministic=deterministic
        )

        log_dur_pred = self.duration_predictor(
            enc_out, enc_mask, deterministic=deterministic
        )[..., 0]
        dur_pred = jnp.clip(jnp.exp(log_dur_pred) - 1.0, 0.0, max_duration)

        pitch_pred = jnp.swapaxes(
            self.pitch_predictor(enc_out, enc_mask, deterministic=deterministic), 1, 2
        )  # [B, F, T_text]

        # Alignment on raw symbol embeddings (reference model.py:303-316).
        text_emb = self.encoder.embed(text)
        key_mask = mask_from_lens(input_lens, text.shape[1])
        attn_soft, attn_logprob = self.attention(
            mel_tgt, text_emb, key_mask=key_mask, attn_prior=attn_prior
        )

        # On-device MAS binarization (replaces host round-trip model.py:227-256).
        attn_hard = jax.lax.stop_gradient(
            maximum_path(jnp.log(attn_soft + 1e-12), input_lens, mel_lens)
        )
        attn_hard_dur = jnp.sum(attn_hard, axis=1)  # [B, T_text]
        dur_tgt = attn_hard_dur

        pitch_tgt = average_pitch(pitch_dense[:, :, :mel_max_len], dur_tgt)
        if use_gt_pitch:
            pitch_emb = self.pitch_emb(jnp.swapaxes(pitch_tgt, 1, 2))
        else:
            pitch_emb = self.pitch_emb(jnp.swapaxes(pitch_pred, 1, 2))
        enc_out = enc_out + pitch_emb

        if c.energy_conditioning:
            energy_pred = self.energy_predictor(
                enc_out, enc_mask, deterministic=deterministic
            )[..., 0]
            energy_tgt = average_pitch(energy_dense[:, None, :mel_max_len], dur_tgt)
            energy_tgt = jnp.log(1.0 + energy_tgt)
            energy_emb = self.energy_emb(jnp.swapaxes(energy_tgt, 1, 2))
            energy_tgt = energy_tgt[:, 0, :]
            enc_out = enc_out + energy_emb
        else:
            energy_pred = None
            energy_tgt = None

        len_regulated, dec_lens = regulate_len(dur_tgt, enc_out, pace, mel_max_len)
        dec_out, dec_mask = self.decoder(
            len_regulated, seq_lens=dec_lens, deterministic=deterministic
        )
        mel_out = self.proj(dec_out)
        return FastPitchOutput(
            mel_out=mel_out, dec_mask=dec_mask, dur_pred=dur_pred,
            log_dur_pred=log_dur_pred, pitch_pred=pitch_pred, pitch_tgt=pitch_tgt,
            energy_pred=energy_pred, energy_tgt=energy_tgt,
            attn_soft=attn_soft, attn_hard=attn_hard,
            attn_hard_dur=attn_hard_dur, attn_logprob=attn_logprob,
        )

    def infer(self, text, input_lens, *, pace: float = 1.0,
              max_mel_len: int = 2048, speaker=None,
              dur_tgt=None, pitch_tgt=None, energy_tgt=None,
              max_duration: float = 75.0, pitch_transform=None):
        """Inference: predicted durations/pitch/energy drive synthesis.

        The reference stubs this method (``model.py:365-369`` is ``pass``);
        this implements the capability following the upstream FastPitch
        semantics. Returns (mel_out [B, max_mel_len, n_mel], dec_lens,
        dur_pred, pitch_pred).
        """
        c = self.config
        spk_emb = self._speaker_vec(speaker)
        enc_out, enc_mask = self.encoder(text, conditioning=spk_emb)

        log_dur_pred = self.duration_predictor(enc_out, enc_mask)[..., 0]
        dur_pred = jnp.clip(jnp.exp(log_dur_pred) - 1.0, 0.0, max_duration)
        if dur_tgt is not None:
            dur_pred = dur_tgt

        pitch_pred = jnp.swapaxes(self.pitch_predictor(enc_out, enc_mask), 1, 2)
        if pitch_transform is not None:
            pitch_pred = pitch_transform(pitch_pred)
        pitch = pitch_pred if pitch_tgt is None else pitch_tgt
        enc_out = enc_out + self.pitch_emb(jnp.swapaxes(pitch, 1, 2))

        if c.energy_conditioning:
            energy_pred = self.energy_predictor(enc_out, enc_mask)[..., 0]
            energy = energy_pred if energy_tgt is None else energy_tgt
            enc_out = enc_out + self.energy_emb(energy[..., None])

        len_regulated, dec_lens = regulate_len(dur_pred, enc_out, pace, max_mel_len)
        dec_out, _ = self.decoder(len_regulated, seq_lens=dec_lens)
        mel_out = self.proj(dec_out)
        return mel_out, dec_lens, dur_pred, pitch_pred
