"""FastPitch losses — masked MSEs + CTC forward-sum alignment + binarization KL.

Re-design of ``FastPitch_TF/loss_function.py:11-127`` and
``attn_loss_function.py:8-90`` for JAX. The CTC forward-sum uses
``optax.ctc_loss`` (a pure-XLA dynamic program) instead of ``tf.nn.ctc_loss``;
masked reductions are sequence-length masks computed on device (the reference
approximated the mel mask with ``mel_out != 0``, ``loss_function.py:60-63`` —
we mask by the true output lengths).

All losses are scalars; ``meta`` carries the per-term breakdown like the
reference's dict (``loss_function.py:113-122``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..utils.masking import mask_from_lens

__all__ = ["FastPitchLossConfig", "fastpitch_loss", "attention_ctc_loss",
           "attention_binarization_loss"]


@dataclasses.dataclass(frozen=True)
class FastPitchLossConfig:
    dur_predictor_loss_scale: float = 0.1
    pitch_predictor_loss_scale: float = 0.1
    energy_predictor_loss_scale: float = 0.1
    attn_loss_scale: float = 1.0
    attn_kl_scale: float = 1.0
    blank_logprob: float = -1.0


def attention_ctc_loss(attn_logprob, in_lens, out_lens, blank_logprob: float = -1.0):
    """CTC forward-sum over the aligner's log-probability map
    (reference ``attn_loss_function.py:8-73``).

    attn_logprob: [B, T_mel, T_text]; classes = text positions. A blank class
    is prepended at index 0 with constant ``blank_logprob``; classes beyond
    each sample's text length are masked out; targets are the strictly
    increasing sequence 1..text_len.
    """
    B, T_mel, T_text = attn_logprob.shape
    logits = jnp.pad(
        attn_logprob, ((0, 0), (0, 0), (1, 0)), constant_values=blank_logprob
    )  # [B, T_mel, T_text+1]

    key_inds = jnp.arange(T_text + 1)
    class_mask = key_inds[None, None, :] > in_lens[:, None, None]
    logits = jnp.where(class_mask, -1e9, logits)
    # log_softmax over classes; optax.ctc_loss re-applies log_softmax, which
    # is idempotent, so normalizing here is safe and matches the reference.
    logits = jax.nn.log_softmax(logits, axis=-1)

    logit_paddings = (~mask_from_lens(out_lens, T_mel)).astype(jnp.float32)
    labels = jnp.broadcast_to(jnp.arange(1, T_text + 1)[None, :], (B, T_text))
    label_paddings = (~mask_from_lens(in_lens, T_text)).astype(jnp.float32)

    per_example = optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=0
    )
    return jnp.mean(per_example / jnp.maximum(out_lens.astype(jnp.float32), 1.0))


def attention_binarization_loss(hard_attention, soft_attention, eps: float = 1e-12):
    """KL between binarized and soft attention
    (reference ``attn_loss_function.py:76-90``)."""
    log_soft = jnp.log(jnp.clip(soft_attention, eps, None))
    num = jnp.sum(jnp.where(hard_attention == 1.0, log_soft, 0.0))
    return -num / jnp.maximum(jnp.sum(hard_attention), 1.0)


def _masked_mse(pred, target, mask):
    """Per-element mean squared error over masked positions.

    The mask may broadcast over trailing feature axes (e.g. [B,T,1] against
    an [B,T,C] error); normalization counts the broadcast elements so a mel
    MSE is a per-element mean like the reference's
    (``loss_function.py:60-66``), not n_channels× larger.
    """
    sq = jnp.square(pred - target) * mask
    n = jnp.sum(jnp.broadcast_to(mask, sq.shape))
    return jnp.sum(sq) / jnp.maximum(n, 1.0)


def fastpitch_loss(
    model_out,
    mel_target,
    input_lens,
    output_lens,
    config: FastPitchLossConfig = FastPitchLossConfig(),
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss + per-term meta (reference ``loss_function.py:23-127``)."""
    o = model_out
    dur_target = o.attn_hard_dur

    T_text = dur_target.shape[1]
    dur_mask = mask_from_lens(input_lens, T_text).astype(jnp.float32)

    log_dur_target = jnp.log(dur_target.astype(jnp.float32) + 1.0)
    dur_pred_loss = _masked_mse(o.log_dur_pred, log_dur_target, dur_mask)

    mel_mask = mask_from_lens(output_lens, mel_target.shape[1])[..., None]
    mel_mask = mel_mask.astype(jnp.float32)
    mel_loss = _masked_mse(o.mel_out, mel_target, mel_mask)

    pitch_loss = _masked_mse(o.pitch_pred, o.pitch_tgt, dur_mask[:, None, :])

    if o.energy_pred is not None:
        energy_loss = _masked_mse(o.energy_pred, o.energy_tgt, dur_mask)
    else:
        energy_loss = jnp.asarray(0.0)

    attn_loss = attention_ctc_loss(
        o.attn_logprob, input_lens, output_lens, config.blank_logprob
    )
    kl_loss = attention_binarization_loss(o.attn_hard, o.attn_soft)

    loss = (
        mel_loss
        + dur_pred_loss * config.dur_predictor_loss_scale
        + pitch_loss * config.pitch_predictor_loss_scale
        + energy_loss * config.energy_predictor_loss_scale
        + attn_loss * config.attn_loss_scale
        + kl_loss * config.attn_kl_scale
    )
    meta = {
        "loss": loss,
        "mel_loss": mel_loss,
        "duration_predictor_loss": dur_pred_loss,
        "pitch_loss": pitch_loss,
        "energy_loss": energy_loss,
        "attn_loss": attn_loss,
        "kl_loss": kl_loss,
        "dur_error": jnp.sum(jnp.abs(o.dur_pred - dur_target) * dur_mask)
        / jnp.maximum(jnp.sum(dur_mask), 1.0),
    }
    return loss, meta
