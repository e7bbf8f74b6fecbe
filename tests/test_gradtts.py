"""Grad-TTS: losses/grads, segment cut, generate_path, scanned sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraltexttospeech_tpu.models.gradtts import (
    GradTTS, GradTTSConfig, fix_len_compatibility, generate_path,
)

TINY = GradTTSConfig(
    n_symbols=40, n_enc_channels=32, filter_channels=64,
    filter_channels_dp=32, n_enc_layers=2, dec_dim=8, out_size=16)
B, TT, TM = 2, 11, 32


def _data(rng):
    x = jnp.asarray(rng.integers(1, 40, (B, TT)), jnp.int32)
    xl = jnp.asarray([TT, 7], jnp.int32)
    y = jnp.asarray(rng.standard_normal((B, TM, 80)), jnp.float32)
    yl = jnp.asarray([TM, 24], jnp.int32)
    return x, xl, y, yl


@pytest.fixture(scope="module")
def model_params():
    model = GradTTS(TINY)
    x, xl, y, yl = _data(np.random.default_rng(0))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, xl, y, yl, jax.random.PRNGKey(2), out_size=TINY.out_size,
        method=GradTTS.compute_loss)
    return model, params


def test_losses_finite_with_grads(model_params):
    model, params = model_params
    x, xl, y, yl = _data(np.random.default_rng(1))

    def lf(p):
        d, pr, df = model.apply(
            p, x, xl, y, yl, jax.random.PRNGKey(3), out_size=TINY.out_size,
            method=GradTTS.compute_loss,
            rngs={"dropout": jax.random.PRNGKey(4)})
        return d + pr + df, (d, pr, df)

    (total, (d, pr, df)), grads = jax.value_and_grad(lf, has_aux=True)(params)
    for v in (total, d, pr, df):
        assert np.isfinite(float(v))
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


def test_synthesis_shapes(model_params):
    model, params = model_params
    x, xl, *_ = _data(np.random.default_rng(2))
    enc, dec, attn, ylen = model.apply(params, x, xl, 4, max_mel_len=48,
                                       rng=jax.random.PRNGKey(5))
    assert enc.shape == (B, 48, 80) and dec.shape == (B, 48, 80)
    assert attn.shape == (B, TT, 48)
    assert (np.asarray(ylen) >= 1).all()
    assert bool(jnp.isfinite(dec).all())
    # alignment path is monotone one-hot over text per active frame
    a0 = np.asarray(attn[0, :, : int(ylen[0])])
    assert np.allclose(a0.sum(axis=0), 1.0)


def test_stochastic_sampler(model_params):
    """stoc=True adds the SDE noise term (reference diffusion.py:344-350)."""
    model, params = model_params
    x, xl, *_ = _data(np.random.default_rng(4))
    enc, dec, attn, ylen = model.apply(
        params, x, xl, 3, stoc=True, max_mel_len=32,
        rng=jax.random.PRNGKey(8))
    assert dec.shape == (B, 32, 80)
    assert bool(jnp.isfinite(dec).all())
    # stochastic and deterministic solvers diverge
    _, dec_det, _, _ = model.apply(
        params, x, xl, 3, stoc=False, max_mel_len=32,
        rng=jax.random.PRNGKey(8))
    assert float(jnp.abs(dec - dec_det).max()) > 1e-4


def test_generate_path_matches_durations():
    durs = jnp.asarray([[2, 3, 1]], jnp.float32)
    mask = jnp.ones((1, 3, 6))
    path = np.asarray(generate_path(durs, mask))
    np.testing.assert_array_equal(
        path[0], [[1, 1, 0, 0, 0, 0], [0, 0, 1, 1, 1, 0], [0, 0, 0, 0, 0, 1]])


def test_fix_len_compatibility():
    assert fix_len_compatibility(172) == 172
    assert fix_len_compatibility(170) == 172
    assert fix_len_compatibility(1) == 4


def test_out_size_cut_reduces_decoder_input(model_params):
    """Loss runs identically when mel longer than out_size (segment cut)."""
    model, params = model_params
    x, xl, y, yl = _data(np.random.default_rng(3))
    d, pr, df = model.apply(
        params, x, xl, y, yl, jax.random.PRNGKey(6), out_size=16,
        method=GradTTS.compute_loss, rngs={"dropout": jax.random.PRNGKey(7)})
    assert np.isfinite(float(d + pr + df))


def test_multi_speaker_paths():
    """n_spks>1: speaker embedding conditions both the encoder and the UNet
    (reference ``tts.py:50-56``, ``diffusion.py:188-193,244-248``)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, n_spks=4, spk_emb_dim=8)
    model = GradTTS(cfg)
    rng = np.random.default_rng(3)
    x, xl, y, yl = _data(rng)
    spk = jnp.asarray([1, 3], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, xl, y, yl, jax.random.PRNGKey(2), spk=spk,
        out_size=cfg.out_size, method=GradTTS.compute_loss)
    d, pr, df = model.apply(
        params, x, xl, y, yl, jax.random.PRNGKey(3), spk=spk,
        out_size=cfg.out_size, method=GradTTS.compute_loss,
        rngs={"dropout": jax.random.PRNGKey(4)})
    for v in (d, pr, df):
        assert np.isfinite(float(v))
    # different speakers synthesize different output for the same text
    enc1, dec1, _, _ = model.apply(params, x, xl, 2, spk=spk,
                                   max_mel_len=48, rng=jax.random.PRNGKey(5))
    enc2, dec2, _, _ = model.apply(params, x, xl, 2,
                                   spk=jnp.asarray([2, 0], jnp.int32),
                                   max_mel_len=48, rng=jax.random.PRNGKey(5))
    assert bool(jnp.isfinite(dec1).all()) and bool(jnp.isfinite(dec2).all())
    assert not np.allclose(np.asarray(enc1), np.asarray(enc2))
