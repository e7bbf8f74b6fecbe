"""FastSpeech 2 — MFA-supervised parallel text→mel, TPU-native.

The reference ``FastSpeech2_TF/`` is a scaffold (YAML configs + MFA
preprocessing pipeline; model/dataset stubbed — SURVEY §2.2). This
implements the full capability its configs describe
(``config/LJSpeech/model.yaml``: 4-layer encoder / 6-layer decoder FFT,
hidden 256, heads 2, conv filter 1024 kernel [9, 1], variance predictors
with 256-bin quantized pitch/energy embeddings, 5-conv postnet):

- FFT backbone reuses the shared ``nn/transformer.py`` stack (same blocks
  as FastPitch — the reference duplicated them per model dir);
- variance adaptor: duration predictor drives the matmul length regulator
  from ``models/fastpitch.py``; phoneme-level pitch/energy are bucketized
  (linear quantization over dataset stats) into embedding tables;
- supervision comes from MFA TextGrid durations prepared by
  ``data/fs2_preprocess.py``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.transformer import FFTransformer
from ..utils.masking import mask_from_lens
from .fastpitch import TemporalPredictor, regulate_len

__all__ = ["FastSpeech2Config", "FastSpeech2", "FastSpeech2Output",
           "fastspeech2_loss"]


@dataclasses.dataclass(frozen=True)
class FastSpeech2Config:
    """Defaults = ``FastSpeech2_TF/config/LJSpeech/model.yaml``."""

    n_symbols: int = 148
    padding_idx: int = 0
    n_mel_channels: int = 80
    encoder_layer: int = 4
    encoder_head: int = 2
    encoder_hidden: int = 256
    decoder_layer: int = 6
    decoder_head: int = 2
    decoder_hidden: int = 256
    conv_filter_size: int = 1024
    conv_kernel_size: Tuple[int, int] = (9, 1)
    encoder_dropout: float = 0.2
    decoder_dropout: float = 0.2
    variance_filter_size: int = 256
    variance_kernel_size: int = 3
    variance_dropout: float = 0.5
    n_bins: int = 256
    # dataset statistics (stats.json from preprocessing); normalized
    # pitch/energy are roughly standard-normal, so ±4σ default bounds.
    pitch_min: float = -4.0
    pitch_max: float = 4.0
    energy_min: float = -4.0
    energy_max: float = 4.0
    max_seq_len: int = 1000
    postnet: bool = True
    postnet_dim: int = 512
    postnet_kernel: int = 5
    postnet_layers: int = 5
    dtype: Optional[jnp.dtype] = None


class FastSpeech2Output(NamedTuple):
    mel_out: jax.Array
    mel_postnet: Optional[jax.Array]
    log_dur_pred: jax.Array
    pitch_pred: jax.Array
    energy_pred: jax.Array
    dec_lens: jax.Array
    dec_mask: jax.Array


class _Postnet(nn.Module):
    """5-conv residual refiner, LayerNorm variant (the Tacotron-style
    postnet with batch-independent normalization so the shared params-only
    trainer applies)."""

    config: FastSpeech2Config

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        c = self.config
        for i in range(c.postnet_layers):
            last = i == c.postnet_layers - 1
            feats = c.n_mel_channels if last else c.postnet_dim
            x = nn.Conv(feats, (c.postnet_kernel,), padding="SAME",
                        dtype=c.dtype)(x)
            x = nn.LayerNorm(dtype=c.dtype)(x)
            if not last:
                x = jnp.tanh(x)
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
        return x


class FastSpeech2(nn.Module):
    config: FastSpeech2Config = FastSpeech2Config()

    def setup(self):
        c = self.config
        ff = dict(d_inner=c.conv_filter_size,
                  kernel_size=c.conv_kernel_size[0],
                  kernel_size_2=c.conv_kernel_size[1], dtype=c.dtype)
        self.encoder = FFTransformer(
            n_layer=c.encoder_layer, n_head=c.encoder_head,
            d_model=c.encoder_hidden, d_head=c.encoder_hidden // c.encoder_head,
            dropout=c.encoder_dropout, dropatt=c.encoder_dropout,
            embed_input=True, n_emb=c.n_symbols, padding_idx=c.padding_idx,
            **ff)
        self.decoder = FFTransformer(
            n_layer=c.decoder_layer, n_head=c.decoder_head,
            d_model=c.decoder_hidden, d_head=c.decoder_hidden // c.decoder_head,
            dropout=c.decoder_dropout, dropatt=c.decoder_dropout,
            embed_input=False, **ff)
        vp = dict(filter_size=c.variance_filter_size,
                  kernel_size=c.variance_kernel_size,
                  dropout=c.variance_dropout, dtype=c.dtype)
        self.duration_predictor = TemporalPredictor(**vp)
        self.pitch_predictor = TemporalPredictor(**vp)
        self.energy_predictor = TemporalPredictor(**vp)
        self.pitch_embedding = nn.Embed(c.n_bins, c.encoder_hidden)
        self.energy_embedding = nn.Embed(c.n_bins, c.encoder_hidden)
        self.mel_linear = nn.Dense(c.n_mel_channels, dtype=c.dtype)
        if c.postnet:
            self.postnet_net = _Postnet(c)

    def _bucketize(self, x, lo: float, hi: float):
        c = self.config
        edges = jnp.linspace(lo, hi, c.n_bins - 1)
        return jnp.searchsorted(edges, x).astype(jnp.int32)

    def __call__(self, text, input_lens, *, mel_max_len: int,
                 dur_tgt=None, pitch_tgt=None, energy_tgt=None,
                 p_control: float = 1.0, e_control: float = 1.0,
                 d_control: float = 1.0, deterministic: bool = True):
        """Teacher-forced when *_tgt given (training); predictions otherwise.

        dur_tgt: [B, T_text] frame counts; pitch/energy_tgt: [B, T_text]
        phoneme-level normalized values.
        """
        c = self.config
        enc_out, enc_mask = self.encoder(text, deterministic=deterministic)

        log_dur_pred = self.duration_predictor(
            enc_out, enc_mask, deterministic=deterministic)[..., 0]
        pitch_pred = self.pitch_predictor(
            enc_out, enc_mask, deterministic=deterministic)[..., 0]
        energy_pred = self.energy_predictor(
            enc_out, enc_mask, deterministic=deterministic)[..., 0]

        pitch = pitch_tgt if pitch_tgt is not None else pitch_pred * p_control
        enc_out = enc_out + self.pitch_embedding(
            self._bucketize(pitch, c.pitch_min, c.pitch_max))
        energy = energy_tgt if energy_tgt is not None else energy_pred * e_control
        enc_out = enc_out + self.energy_embedding(
            self._bucketize(energy, c.energy_min, c.energy_max))

        if dur_tgt is not None:
            durations = dur_tgt.astype(jnp.float32)
        else:
            durations = jnp.clip(
                jnp.round(jnp.exp(log_dur_pred) - 1.0), 0.0, None) * d_control
            durations = durations * enc_mask.astype(durations.dtype)
        expanded, dec_lens = regulate_len(durations, enc_out,
                                          mel_max_len=mel_max_len)

        dec_out, dec_mask = self.decoder(expanded, seq_lens=dec_lens,
                                         deterministic=deterministic)
        mel_out = self.mel_linear(dec_out)
        mel_postnet = None
        if c.postnet:
            mel_postnet = mel_out + self.postnet_net(
                mel_out, deterministic=deterministic)
        return FastSpeech2Output(mel_out, mel_postnet, log_dur_pred,
                                 pitch_pred, energy_pred, dec_lens, dec_mask)


def fastspeech2_loss(out: FastSpeech2Output, mel_tgt, dur_tgt, pitch_tgt,
                     energy_tgt, input_lens, output_lens):
    """Masked mel L1 (+postnet) + MSE on log-duration/pitch/energy
    (reference scaffold's described objective; ming024-style)."""
    src_mask = mask_from_lens(input_lens, dur_tgt.shape[1]).astype(jnp.float32)
    mel_mask = mask_from_lens(output_lens, mel_tgt.shape[1])[..., None]
    mel_mask = mel_mask.astype(jnp.float32)

    # mask may broadcast over the mel-channel axis; count broadcast elements
    # so mel terms are per-element means, commensurate with the scalar terms.
    def masked_l1(pred, tgt, m):
        err = jnp.abs(pred - tgt) * m
        n = jnp.sum(jnp.broadcast_to(m, err.shape))
        return jnp.sum(err) / jnp.maximum(n, 1.0)

    def masked_mse(pred, tgt, m):
        err = jnp.square(pred - tgt) * m
        n = jnp.sum(jnp.broadcast_to(m, err.shape))
        return jnp.sum(err) / jnp.maximum(n, 1.0)

    mel_loss = masked_l1(out.mel_out, mel_tgt, mel_mask)
    postnet_loss = (masked_l1(out.mel_postnet, mel_tgt, mel_mask)
                    if out.mel_postnet is not None else jnp.asarray(0.0))
    log_dur_tgt = jnp.log(dur_tgt.astype(jnp.float32) + 1.0)
    dur_loss = masked_mse(out.log_dur_pred, log_dur_tgt, src_mask)
    pitch_loss = masked_mse(out.pitch_pred, pitch_tgt, src_mask)
    energy_loss = masked_mse(out.energy_pred, energy_tgt, src_mask)
    total = mel_loss + postnet_loss + dur_loss + pitch_loss + energy_loss
    return total, {"mel_loss": mel_loss, "postnet_loss": postnet_loss,
                   "duration_loss": dur_loss, "pitch_loss": pitch_loss,
                   "energy_loss": energy_loss}
