"""Flowtron: invertibility (density ↔ generation round trip), masked NLL,
length-aware flip, gaussian mixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuraltexttospeech_tpu.models.flowtron import (
    Flowtron, FlowtronConfig, flip_by_lens, flowtron_loss,
)

TINY = FlowtronConfig(
    n_text=40, n_text_dim=32, n_flows=2, n_mel_channels=8,
    n_attn_channels=16, n_hidden=24, mel_encoder_n_hidden=16,
    n_speaker_dim=8)
B, TT, TM = 2, 7, 12


def _data(rng):
    text = jnp.asarray(rng.integers(1, 40, (B, TT)), jnp.int32)
    tlens = jnp.asarray([TT, 5], jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, TM, 8)), jnp.float32)
    mlens = jnp.asarray([TM, 9], jnp.int32)
    spk = jnp.zeros((B,), jnp.int32)
    return text, tlens, mel, mlens, spk


@pytest.fixture(scope="module")
def model_params():
    model = Flowtron(TINY)
    text, tlens, mel, mlens, spk = _data(np.random.default_rng(0))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        mel, spk, text, tlens, mlens)
    return model, params


def test_flip_by_lens():
    x = jnp.asarray([[1, 2, 3, 0, 0]], jnp.float32)[..., None]
    out = flip_by_lens(x, jnp.asarray([3]))
    np.testing.assert_array_equal(np.asarray(out[..., 0]), [[3, 2, 1, 0, 0]])


def test_density_and_loss(model_params):
    model, params = model_params
    text, tlens, mel, mlens, spk = _data(np.random.default_rng(1))
    out = model.apply(params, mel, spk, text, tlens, mlens)
    assert out.z.shape == mel.shape
    assert out.gate_out.shape == (B, TM)
    assert len(out.attns) == 2
    gate_tgt = (jnp.arange(TM)[None, :] >= (mlens[:, None] - 1)).astype(
        jnp.float32)
    loss, meta = flowtron_loss(out, mlens, gate_tgt)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: flowtron_loss(
        model.apply(p, mel, spk, text, tlens, mlens), mlens, gate_tgt)[0])(
        params)
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


def test_flow_roundtrip_inverts(model_params):
    """infer(density(mel)) == mel — the flow must be exactly invertible."""
    model, params = model_params
    text, tlens, mel, mlens, spk = _data(np.random.default_rng(2))
    # full-length mels so flips are whole-sequence (roundtrip well-defined)
    mlens = jnp.full((B,), TM, jnp.int32)
    out = model.apply(params, mel, spk, text, tlens, mlens)
    mel_rec, gate, attns = model.apply(params, out.z, spk, text, tlens,
                                       method=Flowtron.infer)
    np.testing.assert_allclose(np.asarray(mel_rec), np.asarray(mel),
                               atol=2e-4)


def test_infer_from_noise(model_params):
    model, params = model_params
    text, tlens, *_ = _data(np.random.default_rng(3))
    z = jax.random.normal(jax.random.PRNGKey(9), (B, TM, 8)) * 0.5
    mel, gate, attns = model.apply(params, z, jnp.zeros((B,), jnp.int32),
                                   text, tlens, method=Flowtron.infer)
    assert mel.shape == (B, TM, 8)
    assert bool(jnp.isfinite(mel).all())


def test_loss_bounded_for_inflated_log_s(model_params):
    """Inflating log_s must INCREASE the loss (ADVICE r1: with the sign/
    convention mismatch the objective was unbounded below — pushing log_s up
    shrank the NLL while −logdet → −inf)."""
    model, params = model_params
    text, tlens, mel, mlens, spk = _data(np.random.default_rng(4))

    def with_log_s_bias(p, delta):
        p = jax.tree.map(lambda x: x, p)  # deep copy
        flat = jax.tree_util.tree_flatten_with_path(p)[0]
        out = dict()
        for path, leaf in flat:
            keys = tuple(getattr(k, "key", getattr(k, "idx", None))
                         for k in path)
            if "affine_out" in keys and keys[-1] == "bias":
                n_mel = leaf.shape[-1] // 2
                leaf = leaf.at[:n_mel].add(delta)
            out[keys] = leaf
        # rebuild
        def rebuild(tree, prefix=()):
            if isinstance(tree, dict):
                return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
            return out[prefix]
        return rebuild(p)

    def loss_at(p):
        o = model.apply(p, mel, spk, text, tlens, mlens)
        return float(flowtron_loss(o, mlens)[0])

    base = loss_at(params)
    inflated = loss_at(with_log_s_bias(params, 2.0))
    more_inflated = loss_at(with_log_s_bias(params, 4.0))
    assert inflated > base
    assert more_inflated > inflated


def test_infer_gate_forward_time(model_params):
    """Round-trip: gate logits from infer must match the training-path
    gate_out orientation (forward time) — ADVICE r1 found the reverse_time
    flow's gate returned time-reversed."""
    model, params = model_params
    text, tlens, mel, mlens, spk = _data(np.random.default_rng(5))
    mlens = jnp.full((B,), TM, jnp.int32)
    out = model.apply(params, mel, spk, text, tlens, mlens)
    mel_rec, gate, _ = model.apply(params, out.z, spk, text, tlens,
                                   method=Flowtron.infer)
    np.testing.assert_allclose(np.asarray(mel_rec), np.asarray(mel),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(gate), np.asarray(out.gate_out),
                               atol=2e-4)


def test_gaussian_mixture_head():
    from neuraltexttospeech_tpu.models.flowtron import (
        GaussianMixture, MelEncoder,
    )

    cfg = FlowtronConfig(n_components=4, n_mel_channels=8, mean_scale=2.0,
                         mel_encoder_n_hidden=16)
    gm = GaussianMixture(cfg)
    emb = jnp.ones((2, 16))
    params = gm.init(jax.random.PRNGKey(0), emb)
    mean, log_var, prob = gm.apply(params, emb)
    assert mean.shape == (1, 8, 4) and prob.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, atol=1e-5)
