"""Folded (space-to-depth) convs must equal the stock flax layers exactly —
same param tree, same values, same gradients (``nn/fastconv.py``; motivation:
the C=32 HiFi-GAN tail, reference ``HiFiGAN_TF/model.py:115-173``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from neuraltexttospeech_tpu.nn import fastconv


@pytest.mark.parametrize("k,d", [(1, 1), (3, 1), (7, 1), (11, 1),
                                 (3, 3), (3, 5), (7, 3), (7, 5),
                                 (11, 3), (11, 5),
                                 # d % p == 0 -> the dilated folded path
                                 # (DiffWave's power-of-two dilations)
                                 (3, 2), (3, 4), (3, 8)])
@pytest.mark.parametrize("p", [2, 4])
def test_folded_conv_matches_nn_conv(k, d, p):
    ci, co, B, L = 6, 5, 2, 24
    ref = nn.Conv(co, (k,), kernel_dilation=(d,), padding="SAME")
    fc = fastconv.Conv(co, (k,), kernel_dilation=(d,), padding="SAME",
                       fold=p)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, ci))
    params = ref.init(key, x)
    # identical param tree by construction
    want = ref.apply(params, x)
    got = fastconv.unfold(fc.apply(params, fastconv.fold(x, p)), p)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,u", [(4, 2), (16, 8), (8, 4)])
@pytest.mark.parametrize("pi", [1, 2])
def test_folded_convtranspose_matches_flax(k, u, pi):
    ci, co, B, L = 6, 5, 2, 8 * pi
    ref = nn.ConvTranspose(co, (k,), strides=(u,), padding="SAME",
                           transpose_kernel=True)
    fc = fastconv.ConvTranspose(co, (k,), strides=(u,), padding="SAME",
                                transpose_kernel=True, fold=pi)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, L, ci))
    params = ref.init(key, x)
    want = ref.apply(params, x)
    got = fastconv.unfold(fc.apply(params, fastconv.fold(x, pi)), u * pi)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)


def test_folded_conv_gradients_match():
    k, d, p, ci, co, B, L = 7, 3, 4, 4, 4, 1, 32
    ref = nn.Conv(co, (k,), kernel_dilation=(d,), padding="SAME")
    fc = fastconv.Conv(co, (k,), kernel_dilation=(d,), padding="SAME",
                       fold=p)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (B, L, ci))
    params = ref.init(key, x)

    def loss_ref(prm, xx):
        return jnp.sum(jnp.sin(ref.apply(prm, xx)))

    def loss_fold(prm, xx):
        return jnp.sum(jnp.sin(fastconv.unfold(
            fc.apply(prm, fastconv.fold(xx, p)), p)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_fold = jax.grad(loss_fold, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fold)):
        np.testing.assert_allclose(np.array(b), np.array(a),
                                   atol=1e-5, rtol=1e-5)


def test_weightnorm_wrapping_unchanged():
    """nn.WeightNorm over the folded Conv must produce the same params AND
    outputs as over nn.Conv (the HiFi-GAN generator wraps every conv)."""
    k, p, ci, co, B, L = 3, 2, 4, 4, 2, 16
    ref = nn.WeightNorm(nn.Conv(co, (k,), padding="SAME"))
    fc = nn.WeightNorm(fastconv.Conv(co, (k,), padding="SAME", fold=p))
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (B, L, ci))
    params = ref.init(key, x)
    params_f = fc.init(key, fastconv.fold(x, p))
    assert (jax.tree.structure(params) == jax.tree.structure(params_f))
    want = ref.apply(params, x)
    got = fastconv.unfold(fc.apply(params, fastconv.fold(x, p)), p)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)


def test_diffwave_folded_matches_stock():
    """DiffWave folded residual stack (power-of-two dilations through the
    dilated d%p==0 fold path + per-position gate/skip splits) must equal the
    stock network on the same params."""
    import dataclasses
    from neuraltexttospeech_tpu.models.diffwave import DiffWave, DiffWaveConfig

    cfg = DiffWaveConfig(residual_layers=6, residual_channels=8,
                         dilation_cycle_length=3, n_mels=8, hop_length=16,
                         crop_mel_frames=4)
    key = jax.random.PRNGKey(0)
    B, F = 2, cfg.crop_mel_frames
    audio = jax.random.normal(key, (B, F * cfg.hop_length))
    mel = jax.random.normal(jax.random.PRNGKey(1), (B, F, cfg.n_mels))
    t = jnp.array([3, 7])
    m_s = DiffWave(dataclasses.replace(cfg, folded_convs=False))
    m_f = DiffWave(dataclasses.replace(cfg, folded_convs=True))
    params = m_s.init(key, audio, t, mel)
    params_f = m_f.init(key, audio, t, mel)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    want = m_s.apply(params, audio, t, mel)
    got = m_f.apply(params, audio, t, mel)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)
    # fractional (fast-sampling) steps exercise the same folded graph
    got_frac = m_f.apply(params, audio, jnp.array([1.5, 2.25]), mel)
    want_frac = m_s.apply(params, audio, jnp.array([1.5, 2.25]), mel)
    np.testing.assert_allclose(np.array(got_frac), np.array(want_frac),
                               atol=1e-5, rtol=1e-5)


def test_generator_folded_matches_stock():
    """Full HiFi-GAN generator: folded_convs=True must equal the stock path
    on the same params (the tail runs C=64 @ fold 2, C=32 @ fold 4)."""
    import dataclasses
    from neuraltexttospeech_tpu.models.hifigan import Generator, HiFiGANConfig

    cfg = HiFiGANConfig(upsample_initial_channel=64,
                        upsample_rates=(4, 2, 2),
                        upsample_kernel_sizes=(8, 4, 4),
                        resblock_kernel_sizes=(3, 7),
                        resblock_dilation_sizes=((1, 3), (1, 5)))
    key = jax.random.PRNGKey(0)
    mel = jax.random.normal(key, (2, 16, cfg.num_mels))
    gen_f = Generator(dataclasses.replace(cfg, folded_convs=True))
    gen_s = Generator(dataclasses.replace(cfg, folded_convs=False))
    params = gen_s.init(key, mel)
    params_f = gen_f.init(key, mel)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    want = gen_s.apply(params, mel)
    got = gen_f.apply(params, mel)
    assert want.shape == got.shape
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cin,cout,k,s,g", [
    (8, 8, 41, 2, 4),    # MSD layer-2 shape class (per-group ci=co)
    (8, 16, 5, 2, 4),    # ci != co per group
    (16, 32, 41, 4, 16), # MSD deep layers' group count
    (8, 8, 15, 1, 2),    # stride 1
])
def test_bgc_grouped_conv_matches_nn_conv(cin, cout, k, s, g):
    """The batch_group_count lowering of a grouped conv must equal stock
    nn.Conv — same param tree, values, and gradients (``fastconv.Conv
    group_impl="bgc"``; motivation: the HiFi-GAN MSD's 41-tap grouped
    stacks, reference ``HiFiGAN_TF/model.py:279-351``)."""
    B, L = 2, 48
    ref = nn.Conv(cout, (k,), strides=(s,), feature_group_count=g,
                  padding="SAME")
    fc = fastconv.Conv(cout, (k,), strides=(s,), feature_group_count=g,
                       padding="SAME", group_impl="bgc")
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (B, L, cin))
    params = ref.init(key, x)
    params_b = fc.init(key, x)
    assert jax.tree.structure(params) == jax.tree.structure(params_b)
    want = ref.apply(params, x)
    got = fc.apply(params, x)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)

    def loss(prm, xx, mod):
        return jnp.sum(jnp.sin(mod.apply(prm, xx)))

    g_ref = jax.grad(loss, argnums=(0, 1))(params, x, ref)
    g_bgc = jax.grad(loss, argnums=(0, 1))(params, x, fc)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_bgc)):
        np.testing.assert_allclose(np.array(b), np.array(a),
                                   atol=1e-5, rtol=1e-5)
