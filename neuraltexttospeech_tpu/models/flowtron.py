"""Flowtron — autoregressive normalizing-flow text→mel, TPU-native.

The reference ``Flowtron_TF/flowtron.py`` stubs the flow itself
(``Flowtron/AR_Step/AR_Back_Step/Attention`` bodies are ``pass``,
``flowtron.py:279-316``); its real content is the Gaussian-mixture head
(:95-158), the Mel/Text encoders (:161-276) and the data pipeline. This
module implements the complete capability (config values =
``Flowtron_TF/config.json`` model_config: 2 flows, 1024 hidden, 640
attention channels, 512 text dim, gate layer).

TPU-first structure:

- **training (density) pass is parallel**: in an affine AR flow the
  transform at frame t conditions on *ground-truth* frames < t, so the
  attention LSTM runs once over the (shifted) sequence via ``nn.RNN``,
  attention for every frame is one batched matmul, and the decoder LSTM is a
  second ``nn.RNN`` pass — no per-frame Python loop;
- **inference is a single ``nn.scan``** per flow step (frame t needs the
  generated frame t−1), with even/odd steps running on a length-aware
  time-reversed view (``flip_by_lens`` keeps padding in place, unlike a raw
  flip of the padded buffer);
- loss = Gaussian NLL of z minus the accumulated log-determinant, masked by
  mel lengths, plus gate BCE — the Flowtron objective.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.masking import mask_from_lens

__all__ = ["FlowtronConfig", "Flowtron", "FlowtronOutput", "flowtron_loss",
           "GaussianMixture", "flip_by_lens"]


@dataclasses.dataclass(frozen=True)
class FlowtronConfig:
    """Defaults = ``Flowtron_TF/config.json`` model_config."""

    n_speakers: int = 1
    n_speaker_dim: int = 128
    n_text: int = 185
    n_text_dim: int = 512
    n_flows: int = 2
    n_mel_channels: int = 80
    n_attn_channels: int = 640
    n_hidden: int = 1024
    n_lstm_layers: int = 2       # decoder LSTM stack depth per flow step
    mel_encoder_n_hidden: int = 512
    n_components: int = 0
    mean_scale: float = 0.0
    fixed_gaussian: bool = True
    dummy_speaker_embedding: bool = False
    use_gate_layer: bool = True
    sigma: float = 1.0
    dtype: Optional[jnp.dtype] = None
    # Unroll factor for the AR-flow LSTM scans (density + generation). The
    # per-frame scan body is tiny (a [B, 4·n_hidden] cell), so iteration
    # bookkeeping dominates; unrolling amortizes it (same trick as
    # Tacotron2Config.scan_unroll). Batch width is the bigger lever: the
    # step is scan-overhead-bound, so 8→32 batch costs only 1.3× step time
    # (3.04× throughput). A/B table in PERF.md round 4: best = batch 32,
    # unroll 4 (80.6k mel-frames/s); unroll 8 is always worse (spills).
    scan_unroll: int = 4


class FlowtronOutput(NamedTuple):
    z: jax.Array                 # [B, T_mel, n_mel] latent
    log_s_sum: jax.Array         # scalar-per-flow logdet terms, summed [B, T_mel, n_mel]
    gate_out: Optional[jax.Array]  # [B, T_mel] logits
    attns: Tuple[jax.Array, ...]   # per-flow [B, T_mel, T_text]
    mean: Optional[jax.Array]
    log_var: Optional[jax.Array]
    prob: Optional[jax.Array]


def flip_by_lens(x, lens):
    """Reverse each sequence within its valid length, leaving padding fixed.

    x: [B, T, ...]; lens: [B].
    """
    T = x.shape[1]
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lens[:, None], lens[:, None] - 1 - t, t)
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


class MaskedInstanceNorm(nn.Module):
    """Affine instance norm: per-channel statistics over the *valid*
    timesteps of each sequence (upstream torch ``InstanceNorm1d(...,
    affine=True)``, eps 1e-5; the reference's tfa ``InstanceNormalization``,
    ``flowtron.py:161-276``, normalizes over the padded buffer — masking is
    the intended semantics made batch-shape-safe). x: [B, T, C]."""

    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None):
        if mask is None:
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
        else:
            m = mask[..., None].astype(x.dtype)
            n = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
            mean = jnp.sum(x * m, axis=1, keepdims=True) / n
            var = jnp.sum(jnp.square(x - mean) * m, axis=1,
                          keepdims=True) / n
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class TextEmbeddingEncoder(nn.Module):
    """Text encoder: embedding → 3×[conv5 + InstanceNorm + ReLU] → BiLSTM
    (reference ``flowtron.py:161-276`` Encoder; upstream-faithful affine
    instance norm, masked over valid timesteps)."""

    config: FlowtronConfig

    @nn.compact
    def __call__(self, text, text_lens, *, deterministic: bool = True):
        c = self.config
        mask = mask_from_lens(text_lens, text.shape[1])
        x = nn.Embed(c.n_text, c.n_text_dim, dtype=c.dtype)(text)
        for _ in range(3):
            x = nn.Conv(c.n_text_dim, (5,), padding="SAME", dtype=c.dtype)(x)
            x = MaskedInstanceNorm(dtype=c.dtype)(x, mask)
            x = nn.relu(x)
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
        half = c.n_text_dim // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(half))
        bwd = nn.RNN(nn.OptimizedLSTMCell(half), reverse=True,
                     keep_order=True)
        out = jnp.concatenate(
            [fwd(x, seq_lengths=text_lens), bwd(x, seq_lengths=text_lens)],
            axis=-1)
        return out * mask_from_lens(text_lens, text.shape[1])[..., None]


class MelEncoder(nn.Module):
    """Utterance-level mel embedding (reference ``flowtron.py`` MelEncoder):
    convs (with upstream-faithful affine InstanceNorm) → BiLSTM →
    mean-pool → dense."""

    config: FlowtronConfig

    @nn.compact
    def __call__(self, mel, mel_lens, *, deterministic: bool = True):
        c = self.config
        h = c.mel_encoder_n_hidden
        mask = mask_from_lens(mel_lens, mel.shape[1])
        x = mel
        for _ in range(2):
            x = nn.Conv(h, (3,), padding="SAME", dtype=c.dtype)(x)
            x = MaskedInstanceNorm(dtype=c.dtype)(x, mask)
            x = nn.relu(x)
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
        fwd = nn.RNN(nn.OptimizedLSTMCell(h // 2))
        bwd = nn.RNN(nn.OptimizedLSTMCell(h // 2), reverse=True,
                     keep_order=True)
        x = jnp.concatenate(
            [fwd(x, seq_lengths=mel_lens), bwd(x, seq_lengths=mel_lens)],
            axis=-1)
        m = mask_from_lens(mel_lens, mel.shape[1])[..., None].astype(x.dtype)
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        return nn.Dense(h, dtype=c.dtype)(pooled)


class GaussianMixture(nn.Module):
    """Mixture prior head (reference ``flowtron.py:95-158``)."""

    config: FlowtronConfig

    @nn.compact
    def __call__(self, mel_embedding):
        c = self.config
        prob = jax.nn.softmax(
            nn.Dense(c.n_components, dtype=c.dtype)(mel_embedding), axis=-1)
        if not c.fixed_gaussian:
            B = mel_embedding.shape[0]
            mean = nn.Dense(c.n_mel_channels * c.n_components,
                            dtype=c.dtype)(mel_embedding).reshape(
                B, c.n_mel_channels, c.n_components)
            log_var = nn.Dense(c.n_mel_channels * c.n_components,
                               dtype=c.dtype)(mel_embedding).reshape(
                B, c.n_mel_channels, c.n_components)
        else:
            # fixed unit-variance components on scaled coordinate axes
            mean = (jnp.eye(c.n_mel_channels)[:, : c.n_components]
                    * c.mean_scale)[None]
            log_var = jnp.zeros((1, c.n_mel_channels, c.n_components))
        return mean, log_var, prob


class FlowtronAttention(nn.Module):
    """Content attention (reference stub ``flowtron.py:279+``; NVIDIA
    semantics: v·tanh(W_q h + W_k text))."""

    config: FlowtronConfig

    def setup(self):
        c = self.config
        self.query_layer = nn.Dense(c.n_attn_channels, use_bias=False,
                                    dtype=c.dtype)
        self.key_layer = nn.Dense(c.n_attn_channels, use_bias=False,
                                  dtype=c.dtype)
        self.value_layer = nn.Dense(c.n_attn_channels, use_bias=False,
                                    dtype=c.dtype)
        self.v = nn.Dense(1, use_bias=False, dtype=c.dtype)

    def project_text(self, text):
        return self.key_layer(text), self.value_layer(text)

    def __call__(self, queries, keys, values, key_mask):
        """queries [B, T_mel, H]; keys/values [B, T_text, A]."""
        q = self.query_layer(queries)
        energies = self.v(jnp.tanh(q[:, :, None, :] + keys[:, None, :, :]))
        energies = energies[..., 0]  # [B, T_mel, T_text]
        energies = jnp.where(key_mask[:, None, :], energies, -1e9)
        weights = jax.nn.softmax(energies, axis=-1)
        context = jnp.einsum("bmt,bta->bma", weights, values)
        return context, weights


class ARStep(nn.Module):
    """One affine AR flow step (implements the stubs
    ``flowtron.py:279-316``)."""

    config: FlowtronConfig
    last_step: bool = False      # gate prediction on the final flow

    def setup(self):
        c = self.config
        # single cell instances shared by the parallel (density) and scanned
        # (generation) passes — both paths read the same parameters.
        # decoder is an n_lstm_layers stack (reference config n_lstm_layers=2).
        # The LSTM cells stay f32 even under --amp (dense1/dense2/affine_out
        # do run bf16): dtype=bf16 on the cells puts an f32→bf16 convert of
        # the gate kernels inside the scan body, and the density-pass A/B
        # showed no win (PERF.md round 4) — per-step shapes are too small
        # for the matmul savings to beat the convert traffic.
        self.attention_cell = nn.OptimizedLSTMCell(c.n_hidden)
        self.attention_layer = FlowtronAttention(c)
        self.decoder_cells = [nn.OptimizedLSTMCell(c.n_hidden)
                              for _ in range(c.n_lstm_layers)]
        self.dense1 = nn.Dense(c.n_hidden, dtype=c.dtype)
        self.dense2 = nn.Dense(c.n_hidden, dtype=c.dtype)
        # affine (log_s, b) head, zero-init so each flow starts as identity
        self.affine_out = nn.Dense(2 * c.n_mel_channels,
                                   kernel_init=nn.initializers.zeros,
                                   dtype=c.dtype)
        if self.last_step and c.use_gate_layer:
            self.gate_layer = nn.Dense(1, dtype=c.dtype)

    def _run_rnn(self, cell_attr: str, xs, idx: int = -1):
        """Full-sequence pass over a shared LSTM cell via nn.scan.

        cell_attr names the cell submodule (with optional list index) so the
        lifted scan targets the module and parameters stay shared with the
        scanned generation pass.
        """
        B, _, _ = xs.shape
        carry = ((jnp.zeros((B, self.config.n_hidden)),
                  jnp.zeros((B, self.config.n_hidden))))

        def body(mod, carry, x):
            cell = getattr(mod, cell_attr)
            if idx >= 0:
                cell = cell[idx]
            new_carry, y = cell(carry, x)
            # bf16 cells emit bf16 state; the scan carry keeps f32
            new_carry = jax.tree.map(
                lambda n, o: n.astype(o.dtype), new_carry, carry)
            return new_carry, y

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1,
                       unroll=self.config.scan_unroll)
        _, ys = scan(self, carry, xs)
        return ys

    def _project(self, attn_hidden, context):
        # One scan per decoder layer, NOT one fused 2-cell scan: fusing the
        # stack into a single scan body measured 165–183 ms/step vs 116 ms
        # on the bs8 train step (round-4 A/B in PERF.md) — with separate
        # loops, layer k+1's scan consumes layer k's already-materialized
        # sequence and XLA pipelines each small body better than one fat one.
        h = jnp.concatenate([attn_hidden, context], axis=-1)
        for i in range(len(self.decoder_cells)):
            h = self._run_rnn("decoder_cells", h, idx=i)
        d = jnp.tanh(self.dense1(h))
        d = jnp.tanh(self.dense2(d))
        return d

    def __call__(self, mel, text, text_lens, mel_lens):
        """Density pass: mel [B, T, C] → (z, log_s, gate, attn). Parallel —
        attention LSTM over the shifted ground truth, batched attention,
        decoder LSTM."""
        c = self.config
        key_mask = mask_from_lens(text_lens, text.shape[1])
        keys, values = self.attention_layer.project_text(text)

        shifted = jnp.concatenate(
            [jnp.zeros_like(mel[:, :1]), mel[:, :-1]], axis=1)
        attn_hidden = self._run_rnn("attention_cell", shifted)
        context, attn_weights = self.attention_layer(
            attn_hidden, keys, values, key_mask)
        d = self._project(attn_hidden, context)

        out = self.affine_out(d)
        log_s, b = out[..., : c.n_mel_channels], out[..., c.n_mel_channels:]
        # WaveGlow/Flowtron convention: z = exp(log_s)·mel + b, so the
        # change-of-variables logdet is +Σ log_s and the density loss
        # ½‖z‖² − Σ log_s is bounded below (inflating log_s blows up z).
        z = mel * jnp.exp(log_s) + b

        gate = None
        if self.last_step and c.use_gate_layer:
            gate = self.gate_layer(
                jnp.concatenate([d, context], axis=-1))[..., 0]
        return z, log_s, gate, attn_weights

    def infer(self, z, text, text_lens, gate_threshold: float = 0.5):
        """Generation pass: scanned inverse transform
        mel_t = (z_t − b_t)·exp(−log_s_t) with AR conditioning on mel_{<t}."""
        c = self.config
        key_mask = mask_from_lens(text_lens, text.shape[1])
        keys, values = self.attention_layer.project_text(text)
        B = z.shape[0]

        def cell_init(_feat):
            return (jnp.zeros((B, c.n_hidden)), jnp.zeros((B, c.n_hidden)))

        def step(mod, carry, z_t):
            attn_state, dec_states, prev_mel = carry
            attn_state, attn_hidden = mod.attention_cell(attn_state, prev_mel)
            context, attn_w = mod.attention_layer(
                attn_hidden[:, None], keys, values, key_mask)
            context = context[:, 0]
            h = jnp.concatenate([attn_hidden, context], axis=-1)
            new_dec_states = []
            for cell, st in zip(mod.decoder_cells, dec_states):
                st, h = cell(st, h)
                new_dec_states.append(st)
            dec_states = tuple(new_dec_states)
            d = jnp.tanh(mod.dense1(h))
            d = jnp.tanh(mod.dense2(d))
            out = mod.affine_out(d)
            log_s = out[:, : c.n_mel_channels]
            b = out[:, c.n_mel_channels:]
            mel_t = (z_t - b) * jnp.exp(-log_s)
            gate = None
            if self.last_step and c.use_gate_layer:
                gate = mod.gate_layer(
                    jnp.concatenate([d, context], axis=-1))[:, 0]
            else:
                gate = jnp.zeros((B,))
            # bf16 cells emit bf16 state/frames; the scan carry keeps f32
            new_carry = jax.tree.map(
                lambda n, o: n.astype(o.dtype),
                (attn_state, dec_states, mel_t), carry)
            return new_carry, (mel_t, gate, attn_w[:, 0])

        carry0 = (cell_init(c.n_mel_channels),
                  tuple(cell_init(c.n_hidden)
                        for _ in range(c.n_lstm_layers)),
                  jnp.zeros((B, c.n_mel_channels)))
        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1,
                       unroll=self.config.scan_unroll)
        _, (mel, gate, attn) = scan(self, carry0, z)
        return mel, gate, attn


class Flowtron(nn.Module):
    """K alternating-direction AR flows (reference config n_flows=2)."""

    config: FlowtronConfig = FlowtronConfig()

    def setup(self):
        c = self.config
        self.speaker_embedding = nn.Embed(c.n_speakers, c.n_speaker_dim)
        self.encoder = TextEmbeddingEncoder(c)
        self.flows = [
            ARStep(c, last_step=(k == c.n_flows - 1))
            for k in range(c.n_flows)
        ]
        if c.n_components > 0:
            self.mel_encoder = MelEncoder(c)
            self.gaussian_mixture = GaussianMixture(c)

    def _condition(self, text, text_lens, speaker, deterministic):
        c = self.config
        enc = self.encoder(text, text_lens, deterministic=deterministic)
        spk = self.speaker_embedding(
            jnp.zeros_like(speaker) if c.dummy_speaker_embedding else speaker)
        spk_b = jnp.broadcast_to(spk[:, None, :],
                                 (*enc.shape[:2], c.n_speaker_dim))
        return jnp.concatenate([enc, spk_b], axis=-1)

    def __call__(self, mel, speaker, text, text_lens, mel_lens,
                 *, deterministic: bool = True):
        """Density pass over all flows (training). Returns FlowtronOutput."""
        c = self.config
        cond = self._condition(text, text_lens, speaker, deterministic)

        z = mel
        log_s_total = jnp.zeros_like(mel)
        gate_out = None
        attns = []
        for k, flow in enumerate(self.flows):
            reverse_time = k % 2 == 1
            if reverse_time:
                z = flip_by_lens(z, mel_lens)
            z, log_s, gate, attn = flow(z, cond, text_lens, mel_lens)
            log_s_total = log_s_total + (
                flip_by_lens(log_s, mel_lens) if reverse_time else log_s)
            if reverse_time:
                z = flip_by_lens(z, mel_lens)
                attn = flip_by_lens(attn, mel_lens)
            if gate is not None:
                gate_out = flip_by_lens(
                    gate[..., None], mel_lens)[..., 0] if reverse_time else gate
            attns.append(attn)

        mean = log_var = prob = None
        if c.n_components > 0:
            memb = self.mel_encoder(mel, mel_lens,
                                    deterministic=deterministic)
            mean, log_var, prob = self.gaussian_mixture(memb)
        return FlowtronOutput(z, log_s_total, gate_out, tuple(attns),
                              mean, log_var, prob)

    def infer(self, z, speaker, text, text_lens):
        """Sampling pass: run flows in reverse order/direction.

        z: [B, T_mel, n_mel] prior noise (σ-scaled by the caller).
        Returns (mel, gate_logits, attns).
        """
        mel_lens = jnp.full((z.shape[0],), z.shape[1], jnp.int32)
        cond = self._condition(text, text_lens, speaker, True)
        mel = z
        gate = None
        attns = []
        for k in reversed(range(len(self.flows))):
            reverse_time = k % 2 == 1
            if reverse_time:
                mel = flip_by_lens(mel, mel_lens)
            mel, g, attn = self.flows[k].infer(mel, cond, text_lens)
            if reverse_time:
                mel = flip_by_lens(mel, mel_lens)
                attn = flip_by_lens(attn, mel_lens)
            if k == len(self.flows) - 1:
                # gate logits come out of a reverse_time flow in reversed
                # orientation — flip back to forward time exactly as the
                # training path does for gate_out (__call__ above), so the
                # inference-CLI trim point lands on the true utterance end.
                gate = (flip_by_lens(g[..., None], mel_lens)[..., 0]
                        if reverse_time else g)
            attns.append(attn)
        return mel, gate, tuple(attns)


def flowtron_loss(output: FlowtronOutput, mel_lens, gate_target=None,
                  sigma: float = 1.0):
    """NLL = ½‖z/σ‖² − Σ log s over valid frames (+ gate BCE)
    (Flowtron objective; reference criterion in ``Flowtron_TF/train.py``)."""
    mask = mask_from_lens(mel_lens, output.z.shape[1])[..., None]
    mask = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask), 1.0) * output.z.shape[-1]
    nll = jnp.sum(jnp.square(output.z) * mask) / (2 * sigma * sigma)
    logdet = jnp.sum(output.log_s_sum * mask)
    loss = (nll - logdet) / n
    meta = {"nll": nll / n, "logdet": logdet / n}
    if output.gate_out is not None and gate_target is not None:
        g = output.gate_out
        gate_loss = jnp.mean(
            (jnp.maximum(g, 0) - g * gate_target
             + jnp.log1p(jnp.exp(-jnp.abs(g)))) * mask[..., 0])
        loss = loss + gate_loss
        meta["gate_loss"] = gate_loss
    meta["loss"] = loss
    return loss, meta
