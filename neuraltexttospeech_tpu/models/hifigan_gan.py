"""HiFi-GAN adversarial training step — the reference's 3-optimizer harness
(``HiFiGAN_TF/gan.py:32-211``) as one jitted, data-parallel function.

Structure per step (LSGAN, matching ``gan.py``):
  discriminator lane: y_hat = stop_grad(G(mel)); MPD/MSD real-vs-fake loss →
    grads for MPD and MSD params.
  generator lane: y_hat = G(mel); adversarial + feature-matching (×2) +
    45·L1(mel(y_hat), mel_target) → grads for G.
XLA common-subexpression-eliminates the duplicated generator forward, so the
cost matches the reference's two-tape single-forward scheme. The in-step
re-mel runs the **batched** device STFT with HiFi-GAN's reflect padding
(frames = samples/hop), replacing the per-sample host loop at ``gan.py:48-52``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..audio.stft import STFTConfig, mel_spectrogram
from .hifigan import (
    Generator, HiFiGANConfig, MultiPeriodDiscriminator,
    MultiScaleDiscriminator, discriminator_loss, feature_loss, generator_loss,
)

__all__ = ["HiFiGANTrainState", "init_hifigan", "hifigan_train_step",
           "hifigan_train_step_jitted", "resolve_msd_group_impl",
           "mel_for_loss"]


def loss_stft_config(c: HiFiGANConfig) -> STFTConfig:
    """Mel settings for the reconstruction loss (``fmax_for_loss``,
    reference ``gan.py:47-52`` / ``config_v1.json: fmax_for_loss: null``)."""
    fmax = c.fmax_for_loss if c.fmax_for_loss is not None else c.sampling_rate / 2.0
    return STFTConfig(
        filter_length=c.n_fft, frame_length=c.win_size, frame_step=c.hop_size,
        n_mel_channels=c.num_mels, sampling_rate=c.sampling_rate,
        mel_fmin=c.fmin, mel_fmax=fmax,
    )


def input_stft_config(c: HiFiGANConfig) -> STFTConfig:
    """Mel settings for the GENERATOR INPUT (fmin..fmax, reference
    ``config_v1.json``) — what ``VocoderDataset._mels`` computes host-side;
    the audio-only batch path recomputes it inside the jitted step."""
    return STFTConfig(
        filter_length=c.n_fft, frame_length=c.win_size, frame_step=c.hop_size,
        n_mel_channels=c.num_mels, sampling_rate=c.sampling_rate,
        mel_fmin=c.fmin, mel_fmax=c.fmax,
    )


def mel_for_loss(audio: jax.Array, cfg: STFTConfig) -> jax.Array:
    """[B, S] audio → [B, S/hop, n_mel] log-mel with HiFi-GAN's centered
    reflect padding (pad (n_fft−hop)/2 each side so frame count = S/hop).

    Auto-selects the fused Pallas kernel on TPU — it carries an analytic
    ``custom_vjp`` (``ops/mel_kernel.py``), so the 45×L1 mel loss inside the
    generator's gradient differentiates through the high-precision fused
    pipeline (≤1e-3 vs the tf.signal oracle; XLA rFFT on TPU is ~1.4e-3).
    """
    pad = (cfg.filter_length - cfg.frame_step) // 2
    audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    return mel_spectrogram(audio, cfg)


class HiFiGANTrainState(struct.PyTreeNode):
    step: jax.Array
    gen_params: Any
    mpd_params: Any
    msd_params: Any
    msd_stats: Any                       # spectral-norm power-iteration state
    gen_opt: Any
    mpd_opt: Any
    msd_opt: Any
    tx_g: optax.GradientTransformation = struct.field(pytree_node=False)
    tx_d: optax.GradientTransformation = struct.field(pytree_node=False)


def make_gan_optimizers(c: HiFiGANConfig, steps_per_epoch: int = 1000):
    """AdamW-style Adam pair with per-epoch exponential decay
    (reference ``train.py``: Adam(2e-4, 0.8, 0.99), ExponentialDecay 0.999)."""
    sched = optax.exponential_decay(c.learning_rate, steps_per_epoch, c.lr_decay)
    make = lambda: optax.adam(sched, b1=c.adam_b1, b2=c.adam_b2)
    return make(), make()


def init_hifigan(
    config: HiFiGANConfig,
    rng: jax.Array,
    *,
    steps_per_epoch: int = 1000,
    segment_frames: Optional[int] = None,
) -> HiFiGANTrainState:
    if segment_frames is None:
        segment_frames = config.segment_size // config.hop_size
    gen = Generator(config)
    mpd = MultiPeriodDiscriminator(dtype=config.dtype)
    # group_impl does not affect the param tree (same names/shapes either
    # way, asserted in tests) — init with the always-safe stock lowering.
    msd = MultiScaleDiscriminator(dtype=config.dtype, group_impl="stock")

    r1, r2, r3 = jax.random.split(rng, 3)
    mel = jnp.zeros((1, segment_frames, config.num_mels))
    audio = jnp.zeros((1, segment_frames * config.total_upsample, 1))
    # jit the inits: eager init is pathologically slow on remote backends
    gen_vars = jax.jit(lambda k: gen.init(k, mel))(r1)
    mpd_vars = jax.jit(lambda k: mpd.init(k, audio, audio))(r2)
    msd_vars = jax.jit(lambda k: msd.init(k, audio, audio))(r3)

    tx_g, tx_d = make_gan_optimizers(config, steps_per_epoch)
    return HiFiGANTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_vars["params"],
        mpd_params=mpd_vars["params"],
        msd_params=msd_vars["params"],
        msd_stats=msd_vars.get("batch_stats", {}),
        gen_opt=tx_g.init(gen_vars["params"]),
        mpd_opt=tx_d.init(mpd_vars["params"]),
        msd_opt=tx_d.init(msd_vars["params"]),
        tx_g=tx_g, tx_d=tx_d,
    )


def _batch_is_sharded(batch) -> bool:
    """True if any batch leaf lives non-replicated on >1 device (the regime
    where XLA SPMD must partition the convs). Tracers (unknown placement)
    count as sharded whenever the process has multiple devices."""
    for leaf in jax.tree.leaves(batch):
        if isinstance(leaf, jax.core.Tracer):
            if jax.device_count() > 1:
                return True
            continue
        sharding = getattr(leaf, "sharding", None)
        if (sharding is not None and len(sharding.device_set) > 1
                and not sharding.is_fully_replicated):
            return True
    return False


def resolve_msd_group_impl(config: HiFiGANConfig, batch) -> str:
    """Pick the MSD grouped-conv lowering for THIS call's batch placement.

    ``fast_grouped_convs=None`` (default) selects the group-OUTERMOST
    ``"gdot"`` lowering everywhere: space-to-depth folded convs as
    group-batched dot_generals whose inter-layer relayouts are free
    reshapes — SPMD-safe (batch is a free dot dim) and the fastest
    measured impl. Round-4 A/B on the full bf16 GAN step (v5e, 16×8192):
    gdot 49.9 ms / folded 55.6 / bgc 83.2 / stock 83.1 (the round-2 bgc
    win evaporated on current XLA: stock == bgc on the full step; the
    group-major folded impl's remaining gap was inter-layer relayout
    transposes — PERF.md round-4 GAN roofline).

    Explicit strings pick one impl: ``"gdot"``, ``"folded"``, ``"stock"``,
    ``"bgc"``. Bools are config back-compat: ``True`` = the legacy
    ``"bgc"`` batch-group re-lowering, which crashes XLA's SPMD conv
    partitioner when the batch dim is sharded (``convolution_handler.cc``
    CHECK failure, the round-3 ``dryrun_multichip`` abort) — so bgc raises
    on a sharded batch instead of letting XLA abort the process;
    ``False`` = ``"stock"``.
    """
    fast = config.fast_grouped_convs
    if fast is False:
        fast = "stock"
    elif fast is True:
        fast = "bgc"
    elif fast is None:
        fast = "gdot"
    if fast not in ("gdot", "gdot_pallas", "folded", "stock", "bgc"):
        raise ValueError(
            f"fast_grouped_convs must be None, a bool, or one of "
            f"'gdot'/'gdot_pallas'/'folded'/'stock'/'bgc', got "
            f"{config.fast_grouped_convs!r}")
    if fast == "bgc" and _batch_is_sharded(batch):
        raise ValueError(
            "HiFiGANConfig.fast_grouped_convs='bgc' (True) is incompatible "
            "with a batch sharded across devices: XLA's SPMD partitioner "
            "cannot split batch-grouped convolutions. Use "
            "fast_grouped_convs=None (auto) or 'stock' for distributed "
            "training.")
    return fast


def hifigan_train_step(
    config: HiFiGANConfig,
    state: HiFiGANTrainState,
    batch: Dict[str, jax.Array],
):
    """One GAN step. batch: mel [B, F, n_mel], audio [B, F·hop·…, 1],
    mel_loss [B, F, n_mel] (target mel at fmax_for_loss).

    Resolves the MSD grouped-conv lowering via ``resolve_msd_group_impl``
    (default: the SPMD-safe ``gdot`` group-outermost folded dot_general,
    1.66× the stock step — PERF.md round 4; the batch sharding only
    matters for the legacy ``bgc`` opt-in, which refuses sharded batches)
    and dispatches to the jitted step."""
    return hifigan_train_step_jitted(
        config, resolve_msd_group_impl(config, batch), state, batch)


@functools.partial(jax.jit, static_argnames=("config", "msd_group_impl"),
                   donate_argnums=(2,))
def hifigan_train_step_jitted(
    config: HiFiGANConfig,
    msd_group_impl: str,
    state: HiFiGANTrainState,
    batch: Dict[str, jax.Array],
):
    gen = Generator(config)
    mpd = MultiPeriodDiscriminator(dtype=config.dtype)
    msd = MultiScaleDiscriminator(dtype=config.dtype,
                                  group_impl=msd_group_impl)
    loss_cfg = loss_stft_config(config)

    y = batch["audio"]
    if "mel" in batch:
        mel, mel_target = batch["mel"], batch["mel_loss"]
    else:
        # Audio-only batch: both mels are deterministic functions of the
        # crop, so compute them on device (fused Pallas mel on TPU)
        # instead of paying two host-side device round trips + the mel
        # bytes per batch in collation (PERF.md round-5 host-fed table).
        mel = mel_for_loss(y[..., 0], input_stft_config(config))
        mel_target = mel_for_loss(y[..., 0], loss_cfg)

    # ---- discriminator lane (reference gan.py:55-71,96-107)
    def d_loss_fn(dparams):
        y_hat = jax.lax.stop_gradient(gen.apply({"params": state.gen_params}, mel))
        df_r, df_g, _, _ = mpd.apply({"params": dparams["mpd"]}, y, y_hat)
        loss_mpd, _, _ = discriminator_loss(df_r, df_g)
        (ds_r, ds_g, _, _), new_stats = msd.apply(
            {"params": dparams["msd"], "batch_stats": state.msd_stats},
            y, y_hat, update_stats=True, mutable=["batch_stats"],
        )
        loss_msd, _, _ = discriminator_loss(ds_r, ds_g)
        return loss_mpd + loss_msd, (loss_mpd, loss_msd, new_stats["batch_stats"])

    (d_loss, (loss_mpd, loss_msd, new_msd_stats)), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True
    )({"mpd": state.mpd_params, "msd": state.msd_params})

    # ---- generator lane (reference gan.py:74-120)
    def g_loss_fn(gparams):
        y_hat = gen.apply({"params": gparams}, mel)
        y_hat_mel = mel_for_loss(y_hat[..., 0], loss_cfg)
        loss_mel = jnp.mean(jnp.abs(y_hat_mel - mel_target)) * 45.0

        _, df_g, fmap_f_r, fmap_f_g = mpd.apply(
            {"params": state.mpd_params}, y, y_hat)
        _, ds_g, fmap_s_r, fmap_s_g = msd.apply(
            {"params": state.msd_params, "batch_stats": state.msd_stats},
            y, y_hat, update_stats=False)
        loss_fm_f = feature_loss(fmap_f_r, fmap_f_g)
        loss_fm_s = feature_loss(fmap_s_r, fmap_s_g)
        loss_gen_f, _ = generator_loss(df_g)
        loss_gen_s, _ = generator_loss(ds_g)
        total = loss_gen_f + loss_gen_s + loss_fm_f + loss_fm_s + loss_mel
        return total, {"gen_loss": total, "mel_l1_x45": loss_mel,
                       "fm_loss": loss_fm_f + loss_fm_s,
                       "adv_loss": loss_gen_f + loss_gen_s}

    (g_loss, g_meta), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        state.gen_params)

    # ---- apply the three optimizers (reference gan.py:110-120)
    g_up, gen_opt = state.tx_g.update(g_grads, state.gen_opt, state.gen_params)
    mpd_up, mpd_opt = state.tx_d.update(
        d_grads["mpd"], state.mpd_opt, state.mpd_params)
    msd_up, msd_opt = state.tx_d.update(
        d_grads["msd"], state.msd_opt, state.msd_params)

    new_state = state.replace(
        step=state.step + 1,
        gen_params=optax.apply_updates(state.gen_params, g_up),
        mpd_params=optax.apply_updates(state.mpd_params, mpd_up),
        msd_params=optax.apply_updates(state.msd_params, msd_up),
        msd_stats=new_msd_stats,
        gen_opt=gen_opt, mpd_opt=mpd_opt, msd_opt=msd_opt,
    )
    metrics = dict(g_meta)
    metrics.update({"disc_loss": d_loss, "disc_mpd": loss_mpd,
                    "disc_msd": loss_msd})
    return new_state, metrics
