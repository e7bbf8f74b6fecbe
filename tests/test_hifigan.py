"""HiFi-GAN: generator upsampling factor, discriminator outputs, GAN step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraltexttospeech_tpu.models.hifigan import (
    Generator, HiFiGANConfig, MultiPeriodDiscriminator, MultiScaleDiscriminator,
)
from neuraltexttospeech_tpu.models.hifigan_gan import (
    hifigan_train_step, init_hifigan, loss_stft_config, mel_for_loss,
    resolve_msd_group_impl,
)

TINY = HiFiGANConfig(
    resblock="2", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    upsample_initial_channel=32, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),), n_fft=64, hop_size=16, win_size=64,
    segment_size=256, num_mels=8,
)


def test_generator_upsamples_by_product_of_rates():
    gen = Generator(TINY)
    mel = jnp.zeros((2, 10, 8))
    params = gen.init(jax.random.PRNGKey(0), mel)
    y = gen.apply(params, mel)
    assert y.shape == (2, 10 * 16, 1)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh output


def test_v1_v3_configs():
    assert HiFiGANConfig.v1().total_upsample == 256
    v3 = HiFiGANConfig.v3()
    assert v3.total_upsample == 256 and v3.resblock == "2"
    assert v3.upsample_initial_channel == 256


def test_discriminators_output_counts():
    audio = jnp.zeros((1, 256, 1))
    mpd = MultiPeriodDiscriminator()
    scores_r, scores_g, fr, fg = mpd.apply(
        mpd.init(jax.random.PRNGKey(0), audio, audio), audio, audio)
    assert len(scores_r) == 5 and len(fr) == 5 and len(fr[0]) == 6
    msd = MultiScaleDiscriminator()
    v = msd.init(jax.random.PRNGKey(1), audio, audio)
    scores_r, scores_g, fr, fg = msd.apply(v, audio, audio)
    assert len(scores_r) == 3 and len(fr[0]) == 8


def test_mel_for_loss_frame_alignment():
    cfg = loss_stft_config(TINY)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal((2, 256)),
                        jnp.float32)
    mel = mel_for_loss(audio, cfg)
    assert mel.shape == (2, 256 // 16, 8)


@pytest.mark.slow
def test_gan_step_data_parallel_on_mesh():
    """The jitted GAN step runs with the batch sharded over a 2-device
    mesh (XLA inserts the collectives). 2 of the 8 virtual devices: this
    container has one physical core, and 8 serialized replicas of the GAN
    program overrun XLA's 40 s CPU-collective rendezvous timeout."""
    from neuraltexttospeech_tpu.parallel.mesh import (
        make_mesh, replicated, shard_batch,
    )

    assert jax.device_count() == 8
    mesh = make_mesh(n_data=2)
    state = init_hifigan(TINY, jax.random.PRNGKey(0))
    state = jax.device_put(state, replicated(mesh))
    rng = np.random.default_rng(3)
    F, B = 16, 8
    batch = {
        "mel": jnp.asarray(rng.standard_normal((B, F, 8)), jnp.float32),
        "audio": jnp.asarray(rng.standard_normal((B, F * 16, 1)) * 0.1,
                             jnp.float32),
    }
    batch["mel_loss"] = mel_for_loss(batch["audio"][..., 0],
                                     loss_stft_config(TINY))
    batch = shard_batch(batch, mesh)
    state, metrics = hifigan_train_step(TINY, state, batch)
    for v in metrics.values():
        assert np.isfinite(float(v))
    assert int(state.step) == 1


@pytest.mark.slow
def test_gan_step_improves_losses():
    state = init_hifigan(TINY, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    F = 16
    batch = {
        "mel": jnp.asarray(rng.standard_normal((2, F, 8)), jnp.float32),
        "audio": jnp.asarray(rng.standard_normal((2, F * 16, 1)) * 0.1,
                             jnp.float32),
    }
    batch["mel_loss"] = mel_for_loss(batch["audio"][..., 0],
                                     loss_stft_config(TINY))
    first = None
    for i in range(4):
        state, metrics = hifigan_train_step(TINY, state, batch)
        for v in metrics.values():
            assert np.isfinite(float(v))
        if first is None:
            first = metrics
    assert float(metrics["mel_l1_x45"]) < float(first["mel_l1_x45"])
    assert float(metrics["disc_loss"]) < float(first["disc_loss"])
    assert int(state.step) == 4


def _gan_batch(rng, B, frames, n_mels=8, hop=16):
    batch = {
        "mel": jnp.asarray(rng.standard_normal((B, frames, n_mels)),
                           jnp.float32),
        "audio": jnp.asarray(rng.standard_normal((B, frames * hop, 1)) * 0.1,
                             jnp.float32),
    }
    batch["mel_loss"] = mel_for_loss(batch["audio"][..., 0],
                                     loss_stft_config(TINY))
    return batch


def test_resolve_msd_group_impl():
    """Auto = the SPMD-safe gouter lowering everywhere (round-4 A/B winner:
    gdot 49.9 ms / folded 55.6 / bgc+stock 83); True = legacy bgc, loud
    error under sharding (the round-3 MULTICHIP regression: XLA SPMD
    aborts on batch-grouped convs); False = stock."""
    import dataclasses

    from neuraltexttospeech_tpu.parallel.mesh import make_mesh, shard_batch

    rng = np.random.default_rng(0)
    batch = _gan_batch(rng, 8, 8)
    assert resolve_msd_group_impl(TINY, batch) == "gdot"
    assert resolve_msd_group_impl(
        dataclasses.replace(TINY, fast_grouped_convs=False), batch) == "stock"
    assert resolve_msd_group_impl(
        dataclasses.replace(TINY, fast_grouped_convs=True), batch) == "bgc"

    mesh = make_mesh(n_data=2)
    sharded = shard_batch(batch, mesh)
    assert resolve_msd_group_impl(TINY, sharded) == "gdot"
    assert resolve_msd_group_impl(
        dataclasses.replace(TINY, fast_grouped_convs=False), sharded
    ) == "stock"
    with pytest.raises(ValueError, match="SPMD"):
        resolve_msd_group_impl(
            dataclasses.replace(TINY, fast_grouped_convs=True), sharded)


@pytest.mark.slow
@pytest.mark.parametrize("folded", [True, False])
@pytest.mark.parametrize("fastg", [None, False, "folded"])
@pytest.mark.parametrize("mesh_shape", [(2, 1), (4, 2)])
def test_gan_step_fast_path_sharding_matrix(folded, fastg, mesh_shape):
    """VERDICT r3 #9: every TPU fast-path default × every mesh shape must
    compile and run the FULL GAN step (generator + MPD + full-spec MSD —
    DiscriminatorS channel/group specs are fixed, so the 41-tap grouped
    stacks run at full size here). The (4, 2) case is the exact dp=4×tp=2
    dryrun mesh whose SPMD crash sailed through round 3's n_data=2-only
    test."""
    import dataclasses

    from neuraltexttospeech_tpu.parallel.mesh import (
        make_mesh, replicated, shard_batch,
    )

    assert jax.device_count() == 8
    n_data, n_model = mesh_shape
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    cfg = dataclasses.replace(TINY, folded_convs=folded,
                              fast_grouped_convs=fastg)
    state = init_hifigan(cfg, jax.random.PRNGKey(0))
    state = jax.device_put(state, replicated(mesh))
    batch = shard_batch(_gan_batch(np.random.default_rng(3), 8, 8), mesh)
    state, metrics = hifigan_train_step(cfg, state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 1


def test_gan_step_fast_grouped_convs_equivalent():
    """No MSD grouped-conv lowering may change the GAN step: folded
    (auto), gdot (group-outermost dot_general), and bgc (True) give the
    same param tree, losses, and updated params as stock (False)
    (f32, CPU)."""
    import dataclasses

    rng = np.random.default_rng(7)
    B, frames = 2, 16
    batch = {
        "mel": jnp.asarray(rng.standard_normal((B, frames, 8)), jnp.float32),
        "audio": jnp.asarray(
            rng.standard_normal((B, frames * 16, 1)) * 0.1, jnp.float32),
        "mel_loss": jnp.asarray(
            rng.standard_normal((B, frames, 8)), jnp.float32),
    }
    outs = {}
    for fast in (False, None, True, "gdot", "gdot_pallas"):
        cfg = dataclasses.replace(TINY, fast_grouped_convs=fast)
        state = init_hifigan(cfg, jax.random.PRNGKey(0))
        new_state, metrics = hifigan_train_step(cfg, state, batch)
        outs[fast] = (new_state, metrics)
    for fast in (None, True, "gdot", "gdot_pallas"):
        assert (jax.tree.structure(outs[False][0].msd_params)
                == jax.tree.structure(outs[fast][0].msd_params))
        for k in outs[False][1]:
            np.testing.assert_allclose(
                float(outs[fast][1][k]), float(outs[False][1][k]),
                rtol=2e-4, atol=2e-5, err_msg=f"{fast}:{k}")
        for a, b in zip(jax.tree.leaves(outs[False][0].msd_params),
                        jax.tree.leaves(outs[fast][0].msd_params)):
            np.testing.assert_allclose(np.array(b), np.array(a),
                                       rtol=3e-3, atol=3e-5)


def test_gan_step_audio_only_batch_matches_host_mels():
    """An audio-only batch (mels computed inside the jitted step) must give
    the same GAN step as the host-collated mel batch — the default CLI
    path since round 5 (PERF.md host-fed table)."""
    from neuraltexttospeech_tpu.models.hifigan_gan import input_stft_config

    rng = np.random.default_rng(9)
    B = 2
    audio = jnp.asarray(
        rng.standard_normal((B, TINY.segment_size, 1)) * 0.1, jnp.float32)
    host_batch = {
        "audio": audio,
        "mel": mel_for_loss(audio[..., 0], input_stft_config(TINY)),
        "mel_loss": mel_for_loss(audio[..., 0], loss_stft_config(TINY)),
    }
    out = {}
    for name, batch in (("host", host_batch), ("audio_only",
                                               {"audio": audio})):
        state = init_hifigan(TINY, jax.random.PRNGKey(0))
        new_state, metrics = hifigan_train_step(TINY, state, batch)
        out[name] = (new_state, metrics)
    for k in out["host"][1]:
        np.testing.assert_allclose(float(out["audio_only"][1][k]),
                                   float(out["host"][1][k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
    for p_a, p_h in zip(jax.tree.leaves(out["audio_only"][0].gen_params),
                        jax.tree.leaves(out["host"][0].gen_params)):
        np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_h),
                                   rtol=1e-5, atol=1e-6)
