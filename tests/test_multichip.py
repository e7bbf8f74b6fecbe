"""Every model family's real train step on a multi-device mesh (VERDICT r4 #1).

Round 3's lesson: a default can be numerically correct on one device and
crash (or silently diverge) only under the SPMD partitioner — the bgc
grouped-conv regression sailed through a suite whose multi-device coverage
touched 3 of 8 families. These tests close that hole: for EVERY family, the
loss+grads (or, for the optimizer-fused steps, the full update) of the
dp=4-sharded step must equal the single-device step up to reduction order.
Sharding must never change semantics, only placement.

Reference match: ``DiffWave_TF/train.py:336-613`` (MirroredStrategy — the
reference's only working distribution) scaled to the whole zoo per SURVEY
§2.4; the equivalence methodology is ``tests/test_tp.py:73`` generalized.

Each case uses the family's *production* loss path (the same functions the
train CLIs pass to ``Trainer``/its dedicated step), tiny configs, on the
8-virtual-device CPU mesh from conftest.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraltexttospeech_tpu.parallel.mesh import (
    make_mesh, replicated, shard_batch,
)

pytestmark = pytest.mark.slow

B = 4  # divisible by the dp=4 mesh


# --------------------------------------------------------------------------
# Case builders: each returns (loss_fn, params, batch) with
# loss_fn(params, batch) -> scalar loss, using the family's production loss.
# --------------------------------------------------------------------------


def _case_fastpitch():
    from neuraltexttospeech_tpu.models.fastpitch import (
        FastPitch, FastPitchConfig,
    )
    from neuraltexttospeech_tpu.models.fastpitch_loss import fastpitch_loss

    cfg = FastPitchConfig(
        n_symbols=40, symbols_embedding_dim=32, in_fft_n_layers=1,
        in_fft_n_heads=2, in_fft_d_head=8, in_fft_conv1d_filter_size=64,
        out_fft_n_layers=1, out_fft_n_heads=2, out_fft_d_head=8,
        out_fft_conv1d_filter_size=64, dur_predictor_filter_size=16,
        pitch_predictor_filter_size=16, energy_predictor_filter_size=16)
    model = FastPitch(cfg)
    rng = np.random.default_rng(0)
    Tt, Tm = 8, 16
    batch = {
        "text": jnp.asarray(rng.integers(1, 40, (B, Tt)), jnp.int32),
        "input_lens": jnp.asarray([Tt] * B, jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, Tm, 80)), jnp.float32),
        "mel_lens": jnp.asarray([Tm] * B, jnp.int32),
        "pitch": jnp.asarray(rng.standard_normal((B, 1, Tm)), jnp.float32),
        "energy": jnp.abs(jnp.asarray(rng.standard_normal((B, Tm)),
                                      jnp.float32)),
        "prior": jnp.asarray(np.abs(rng.standard_normal((B, Tm, Tt))) + 0.1,
                             jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["text"],
                        batch["input_lens"], batch["mel"], batch["mel_lens"],
                        batch["pitch"], batch["energy"], None, batch["prior"])

    def loss_fn(params, batch):
        out = model.apply(params, batch["text"], batch["input_lens"],
                          batch["mel"], batch["mel_lens"], batch["pitch"],
                          batch["energy"], None, batch["prior"],
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        return fastpitch_loss(out, batch["mel"], batch["input_lens"],
                              batch["mel_lens"])[0]

    return loss_fn, params, batch


def _case_fastspeech2():
    from neuraltexttospeech_tpu.models.fastspeech2 import (
        FastSpeech2, FastSpeech2Config, fastspeech2_loss,
    )

    cfg = FastSpeech2Config(
        n_symbols=40, encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=64, variance_filter_size=16,
        n_bins=16, postnet_dim=24, postnet_layers=2)
    model = FastSpeech2(cfg)
    rng = np.random.default_rng(1)
    Tt, Tm = 8, 24
    dur = np.full((B, Tt), 3, np.float32)
    batch = {
        "text": jnp.asarray(rng.integers(1, 40, (B, Tt)), jnp.int32),
        "input_lens": jnp.asarray([Tt] * B, jnp.int32),
        "dur": jnp.asarray(dur),
        "pitch": jnp.asarray(rng.standard_normal((B, Tt)), jnp.float32),
        "energy": jnp.asarray(rng.standard_normal((B, Tt)), jnp.float32),
        "mel": jnp.asarray(rng.standard_normal((B, Tm, 80)), jnp.float32),
        "mel_lens": jnp.asarray([Tm] * B, jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["text"], batch["input_lens"], mel_max_len=Tm,
        dur_tgt=batch["dur"], pitch_tgt=batch["pitch"],
        energy_tgt=batch["energy"])

    def loss_fn(params, batch):
        out = model.apply(params, batch["text"], batch["input_lens"],
                          mel_max_len=batch["mel"].shape[1],
                          dur_tgt=batch["dur"], pitch_tgt=batch["pitch"],
                          energy_tgt=batch["energy"], deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        return fastspeech2_loss(out, batch["mel"], batch["dur"],
                                batch["pitch"], batch["energy"],
                                batch["input_lens"], batch["mel_lens"])[0]

    return loss_fn, params, batch


def _case_tacotron2():
    """Grads through the nn.scan teacher-forced decoder + BatchNorm stats
    (the scan-under-SPMD lane VERDICT r4 #1 names explicitly)."""
    from neuraltexttospeech_tpu.models.tacotron2 import (
        Tacotron2, Tacotron2Config, tacotron2_loss,
    )
    from neuraltexttospeech_tpu.models.tacotron2_train import gate_targets

    cfg = Tacotron2Config(
        n_symbols=40, symbols_embedding_dim=32, encoder_embedding_dim=32,
        decoder_rnn_dim=48, attention_rnn_dim=48, attention_dim=16,
        attention_location_n_filters=4, attention_location_kernel_size=7,
        prenet_dim=16, postnet_embedding_dim=24, postnet_n_convolutions=3,
        max_decoder_steps=40)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(2)
    Tt, Tm = 9, 20
    batch = {
        "text": jnp.asarray(rng.integers(1, 40, (B, Tt)), jnp.int32),
        "input_lens": jnp.asarray([Tt, 6, Tt, 7], jnp.int32),
        "mel": jnp.asarray(
            rng.standard_normal((B, Tm, cfg.n_mel_channels)) * 0.5,
            jnp.float32),
        "mel_lens": jnp.asarray([Tm, 14, Tm, 16], jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["text"], batch["input_lens"], batch["mel"], batch["mel_lens"])
    batch_stats = variables["batch_stats"]

    def loss_fn(params, batch):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["text"], batch["input_lens"], batch["mel"],
            batch["mel_lens"], train=True,
            rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"])
        gate_tgt = gate_targets(batch["mel_lens"], batch["mel"].shape[1])
        return tacotron2_loss(out, batch["mel"], gate_tgt)[0]

    return loss_fn, variables["params"], batch


def _case_gradtts():
    """MAS (scan DP) + UNet + random diffusion-time sampling under SPMD."""
    from neuraltexttospeech_tpu.models.gradtts import GradTTS, GradTTSConfig

    cfg = GradTTSConfig(
        n_symbols=40, n_enc_channels=32, filter_channels=64,
        filter_channels_dp=32, n_enc_layers=2, dec_dim=8, out_size=16)
    model = GradTTS(cfg)
    rng = np.random.default_rng(3)
    Tt, Tm = 11, 32
    batch = {
        "text": jnp.asarray(rng.integers(1, 40, (B, Tt)), jnp.int32),
        "input_lens": jnp.asarray([Tt, 7, Tt, 9], jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, Tm, 80)), jnp.float32),
        "mel_lens": jnp.asarray([Tm, 24, Tm, 28], jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["text"], batch["input_lens"], batch["mel"], batch["mel_lens"],
        jax.random.PRNGKey(2), out_size=cfg.out_size,
        method=GradTTS.compute_loss)

    def loss_fn(params, batch):
        dur, prior, diff = model.apply(
            params, batch["text"], batch["input_lens"], batch["mel"],
            batch["mel_lens"], jax.random.PRNGKey(4), out_size=cfg.out_size,
            method=GradTTS.compute_loss,
            rngs={"dropout": jax.random.PRNGKey(5)})
        return dur + prior + diff

    return loss_fn, params, batch


def _case_flowtron():
    """AR flows: per-frame LSTM scans with length-aware flips under SPMD."""
    from neuraltexttospeech_tpu.models.flowtron import (
        Flowtron, FlowtronConfig, flowtron_loss,
    )

    cfg = FlowtronConfig(
        n_text=40, n_text_dim=32, n_flows=2, n_mel_channels=8,
        n_attn_channels=16, n_hidden=24, mel_encoder_n_hidden=16,
        n_speaker_dim=8)
    model = Flowtron(cfg)
    rng = np.random.default_rng(4)
    Tt, Tm = 7, 12
    batch = {
        "text": jnp.asarray(rng.integers(1, 40, (B, Tt)), jnp.int32),
        "input_lens": jnp.asarray([Tt, 5, Tt, 6], jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, Tm, 8)), jnp.float32),
        "mel_lens": jnp.asarray([Tm, 9, Tm, 10], jnp.int32),
        "speaker": jnp.zeros((B,), jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["mel"], batch["speaker"], batch["text"], batch["input_lens"],
        batch["mel_lens"])

    def loss_fn(params, batch):
        out = model.apply(params, batch["mel"], batch["speaker"],
                          batch["text"], batch["input_lens"],
                          batch["mel_lens"], deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        Tm_ = batch["mel"].shape[1]
        gate_tgt = (jnp.arange(Tm_)[None, :]
                    >= (batch["mel_lens"][:, None] - 1)).astype(jnp.float32)
        return flowtron_loss(out, batch["mel_lens"], gate_tgt)[0]

    return loss_fn, params, batch


def _case_talknet():
    """Spectrogram head: QuartzNet backbone (BatchNorm cross-batch stats
    become collectives under dp sharding)."""
    from neuraltexttospeech_tpu.models.talknet import (
        QuartzNetConfig, SpectrogramModel, TalkNet2Config,
    )
    from neuraltexttospeech_tpu.utils.masking import mask_from_lens

    cfg = TalkNet2Config(
        n_symbols=40, emb_dim=32, n_mel_channels=8,
        backbone=QuartzNetConfig(
            block_repeat=1, module_repeat=1,
            block_params=((16, 5), (16, 5), (24, 5), (24, 5), (24, 5)),
            initial_filters=16, initial_kernel=5, penultimate_filters=24,
            penultimate_kernel=7, final_filters=32))
    model = SpectrogramModel(cfg)
    rng = np.random.default_rng(5)
    Tt, Tm = 6, 18
    dur = np.full((B, Tt), 3, np.int32)
    batch = {
        "text": jnp.asarray(rng.integers(1, 40, (B, Tt)), jnp.int32),
        "dur": jnp.asarray(dur),
        "f0": jnp.asarray(rng.standard_normal((B, Tm)), jnp.float32),
        "mel": jnp.asarray(rng.standard_normal((B, Tm, 8)), jnp.float32),
        "mel_lens": jnp.asarray([Tm, 12, Tm, 15], jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["text"], batch["dur"], batch["f0"], Tm, train=True)
    batch_stats = variables["batch_stats"]

    def loss_fn(params, batch):
        mel, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["text"], batch["dur"], batch["f0"],
            batch["mel"].shape[1], train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        m = mask_from_lens(batch["mel_lens"],
                           batch["mel"].shape[1])[..., None].astype(
            jnp.float32)
        return jnp.sum(jnp.abs(mel - batch["mel"]) * m) / jnp.maximum(
            jnp.sum(m), 1.0)

    return loss_fn, variables["params"], batch


def _case_diffwave():
    from neuraltexttospeech_tpu.models.diffwave import (
        DiffWave, DiffWaveConfig, diffwave_loss,
    )

    cfg = DiffWaveConfig(residual_layers=4, residual_channels=16,
                         dilation_cycle_length=4, crop_mel_frames=4,
                         n_mels=8, hop_length=16)
    model = DiffWave(cfg)
    rng = np.random.default_rng(6)
    T = cfg.crop_mel_frames * cfg.hop_length
    batch = {
        "audio": jnp.asarray(rng.standard_normal((B, T)), jnp.float32),
        "mel": jnp.asarray(
            rng.standard_normal((B, cfg.crop_mel_frames, cfg.n_mels)),
            jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["audio"],
                        jnp.zeros((B,), jnp.int32), batch["mel"])

    def loss_fn(params, batch):
        return diffwave_loss(model, params, batch, jax.random.PRNGKey(3))[0]

    return loss_fn, params, batch


FAMILIES = {
    "fastpitch": _case_fastpitch,
    "fastspeech2": _case_fastspeech2,
    "tacotron2": _case_tacotron2,
    "gradtts": _case_gradtts,
    "flowtron": _case_flowtron,
    "talknet": _case_talknet,
    "diffwave": _case_diffwave,
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_dp4_loss_and_grads_match_single_device(family):
    assert jax.device_count() == 8
    loss_fn, params, batch = FAMILIES[family]()
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    dev = jax.devices()[0]
    loss_ref, grads_ref = grad_fn(jax.device_put(params, dev),
                                  jax.device_put(batch, dev))

    mesh = make_mesh(n_data=4)
    sharded = shard_batch(batch, mesh)
    # the batch really is distributed over 4 devices
    leaf = next(iter(jax.tree.leaves(sharded)))
    assert len({s.device for s in leaf.addressable_shards}) == 4
    loss_dp, grads_dp = grad_fn(jax.device_put(params, replicated(mesh)),
                                sharded)

    np.testing.assert_allclose(float(loss_dp), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    for (kp, g_dp), g_ref in zip(
            jax.tree_util.tree_leaves_with_path(grads_dp),
            jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(
            np.asarray(g_dp), np.asarray(g_ref), rtol=2e-4, atol=2e-4,
            err_msg=f"{family}: grad mismatch at {jax.tree_util.keystr(kp)}")


def test_hifigan_dp4_full_gan_step_matches_single_device():
    """The 3-optimizer GAN step (gen + MPD + MSD, gdot default lowering):
    metrics AND updated params of the dp=4 step equal the single-device
    step — extends the matrix test (finite-only) to true equivalence."""
    from neuraltexttospeech_tpu.models.hifigan import HiFiGANConfig
    from neuraltexttospeech_tpu.models.hifigan_gan import (
        hifigan_train_step, init_hifigan, loss_stft_config, mel_for_loss,
    )

    assert jax.device_count() == 8
    cfg = HiFiGANConfig(
        resblock="2", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), n_fft=64, hop_size=16,
        win_size=64, segment_size=256, num_mels=8)
    rng = np.random.default_rng(7)
    F = cfg.segment_size // cfg.hop_size
    batch = {
        "mel": jnp.asarray(rng.standard_normal((B, F, cfg.num_mels)),
                           jnp.float32),
        "audio": jnp.asarray(
            rng.standard_normal((B, cfg.segment_size, 1)) * 0.1,
            jnp.float32),
    }
    batch["mel_loss"] = mel_for_loss(batch["audio"][..., 0],
                                     loss_stft_config(cfg))

    dev = jax.devices()[0]
    state = jax.device_put(init_hifigan(cfg, jax.random.PRNGKey(0)), dev)
    state_ref, metrics_ref = hifigan_train_step(
        cfg, state, jax.device_put(batch, dev))

    mesh = make_mesh(n_data=4)
    state = jax.device_put(init_hifigan(cfg, jax.random.PRNGKey(0)),
                           replicated(mesh))
    state_dp, metrics_dp = hifigan_train_step(cfg, state,
                                              shard_batch(batch, mesh))

    for k in metrics_ref:
        np.testing.assert_allclose(float(metrics_dp[k]),
                                   float(metrics_ref[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)
    for which in ("gen_params", "mpd_params", "msd_params"):
        for (kp, p_dp), p_ref in zip(
                jax.tree_util.tree_leaves_with_path(
                    getattr(state_dp, which)),
                jax.tree.leaves(getattr(state_ref, which))):
            np.testing.assert_allclose(
                np.asarray(p_dp), np.asarray(p_ref), rtol=2e-4, atol=2e-4,
                err_msg=f"{which}{jax.tree_util.keystr(kp)}")
