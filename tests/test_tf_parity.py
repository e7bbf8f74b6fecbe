"""Numerical parity vs TF2 oracles — the repo's golden methodology
(SURVEY §4.1) upgraded from eyeballed shapes to asserted values.

Each test builds the reference-equivalent tf.keras module inline, copies its
weights into our flax module, and asserts the forward outputs agree within
the 1e-3 budget (float32, CPU). Covers the DiffWave blocks (the reference's
most complete model) and the shared conv/dense layouts every family uses.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BUDGET = 1e-3


def test_dense_and_conv1d_weight_layouts():
    """TF Dense/Conv1D kernels drop into flax modules unchanged."""
    from flax import linen as nn

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 5)).astype(np.float32)

    tfl = tf.keras.layers.Dense(7)
    y_tf = tfl(tf.constant(x)).numpy()
    mod = nn.Dense(7)
    p = {"params": {"kernel": jnp.asarray(tfl.kernel.numpy()),
                    "bias": jnp.asarray(tfl.bias.numpy())}}
    np.testing.assert_allclose(np.asarray(mod.apply(p, x)), y_tf, atol=1e-6)

    tfc = tf.keras.layers.Conv1D(6, 3, padding="same", dilation_rate=2)
    y_tf = tfc(tf.constant(x)).numpy()
    conv = nn.Conv(6, (3,), padding="SAME", kernel_dilation=(2,))
    p = {"params": {"kernel": jnp.asarray(tfc.kernel.numpy()),
                    "bias": jnp.asarray(tfc.bias.numpy())}}
    np.testing.assert_allclose(np.asarray(conv.apply(p, x)), y_tf, atol=1e-5)


def _tf_diffusion_embedding(max_steps=50):
    """Reference-equivalent embedding (``DiffWave_TF/model.py:62-111``).

    The sin/cos table is shared with our module: its arguments reach ~5e5
    rad where single-ULP float32 pow differences between backends shift the
    phase visibly, so per-backend trig of the constant can't be bit-matched.
    What this oracle checks is the gather/lerp/dense computation.
    """
    from neuraltexttospeech_tpu.models.diffwave import DiffusionEmbedding

    table = tf.constant(np.asarray(DiffusionEmbedding(max_steps)._table()))
    d1 = tf.keras.layers.Dense(512)
    d2 = tf.keras.layers.Dense(512)

    def silu(v):
        return v * tf.math.sigmoid(v)

    def forward(t):
        if t.dtype in (tf.int32, tf.int64):
            h = tf.gather(table, t)
        else:
            low = tf.cast(tf.math.floor(t), tf.int32)
            high = tf.cast(tf.math.ceil(t), tf.int32)
            frac = t - tf.cast(low, tf.float32)
            h = (tf.gather(table, low) * (1 - frac[:, None])
                 + tf.gather(table, high) * frac[:, None])
        return silu(d2(silu(d1(h))))

    forward(tf.constant([0]))  # build
    return forward, d1, d2


def test_diffusion_embedding_parity():
    from neuraltexttospeech_tpu.models.diffwave import DiffusionEmbedding

    fwd, d1, d2 = _tf_diffusion_embedding()
    emb = DiffusionEmbedding(50)
    params = {"params": {
        "Dense_0": {"kernel": jnp.asarray(d1.kernel.numpy()),
                    "bias": jnp.asarray(d1.bias.numpy())},
        "Dense_1": {"kernel": jnp.asarray(d2.kernel.numpy()),
                    "bias": jnp.asarray(d2.bias.numpy())},
    }}
    t_int = np.asarray([0, 7, 49], np.int32)
    np.testing.assert_allclose(
        np.asarray(emb.apply(params, jnp.asarray(t_int))),
        fwd(tf.constant(t_int)).numpy(), atol=BUDGET)
    t_frac = np.asarray([3.25, 41.9], np.float32)
    np.testing.assert_allclose(
        np.asarray(emb.apply(params, jnp.asarray(t_frac))),
        fwd(tf.constant(t_frac)).numpy(), atol=BUDGET)


def test_spectrogram_upsampler_parity():
    from neuraltexttospeech_tpu.models.diffwave import SpectrogramUpsampler

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 4, 80)).astype(np.float32)

    c1 = tf.keras.layers.Conv2DTranspose(1, (32, 3), (16, 1), padding="same")
    c2 = tf.keras.layers.Conv2DTranspose(1, (32, 3), (16, 1), padding="same")
    x = tf.expand_dims(tf.constant(mel), -1)
    x = tf.nn.leaky_relu(c1(x), 0.4)
    x = tf.nn.leaky_relu(c2(x), 0.4)
    y_tf = tf.squeeze(x, -1).numpy()

    up = SpectrogramUpsampler()
    params = {"params": {
        "ConvTranspose_0": {"kernel": jnp.asarray(c1.kernel.numpy()),
                            "bias": jnp.asarray(c1.bias.numpy())},
        "ConvTranspose_1": {"kernel": jnp.asarray(c2.kernel.numpy()),
                            "bias": jnp.asarray(c2.bias.numpy())},
    }}
    y = np.asarray(up.apply(params, jnp.asarray(mel)))
    np.testing.assert_allclose(y, y_tf, atol=BUDGET)


def test_residual_block_parity():
    """Gated dilated residual block vs reference-equivalent TF
    (``DiffWave_TF/model.py:149-199``), dilation 2 (symmetric padding in
    both; the reference's dilation-1 blocks use causal padding — an
    upstream porting artifact we deliberately do not reproduce)."""
    from neuraltexttospeech_tpu.models.diffwave import ResidualBlock

    C = 8
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 32, C)).astype(np.float32)
    emb = rng.standard_normal((2, 512)).astype(np.float32)
    cond = rng.standard_normal((2, 32, 80)).astype(np.float32)

    dil = tf.keras.layers.Conv1D(2 * C, 3, padding="same", dilation_rate=2)
    proj = tf.keras.layers.Dense(C)
    cproj = tf.keras.layers.Conv1D(2 * C, 1)
    oproj = tf.keras.layers.Conv1D(2 * C, 1)

    y = tf.constant(x) + tf.expand_dims(proj(tf.constant(emb)), 1)
    y = dil(y) + cproj(tf.constant(cond))
    gate, filt = tf.split(y, 2, axis=-1)
    y = tf.math.sigmoid(gate) * tf.math.tanh(filt)
    y = oproj(y)
    residual, skip = tf.split(y, 2, axis=-1)
    out_tf = ((tf.constant(x) + residual) / np.sqrt(2.0)).numpy()
    skip_tf = skip.numpy()

    block = ResidualBlock(C, dilation=2)
    params = {"params": {
        "Dense_0": {"kernel": jnp.asarray(proj.kernel.numpy()),
                    "bias": jnp.asarray(proj.bias.numpy())},
        "Conv_0": {"kernel": jnp.asarray(dil.kernel.numpy()),
                   "bias": jnp.asarray(dil.bias.numpy())},
        "Conv_1": {"kernel": jnp.asarray(cproj.kernel.numpy()),
                   "bias": jnp.asarray(cproj.bias.numpy())},
        "Conv_2": {"kernel": jnp.asarray(oproj.kernel.numpy()),
                   "bias": jnp.asarray(oproj.bias.numpy())},
    }}
    out, skip_j = block.apply(params, jnp.asarray(x), jnp.asarray(emb),
                              jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(out), out_tf, atol=BUDGET)
    np.testing.assert_allclose(np.asarray(skip_j), skip_tf, atol=BUDGET)


def test_multihead_attn_parity():
    """FastPitch MultiHeadAttn vs a reference-equivalent tf.keras oracle
    (``FastPitch_TF/transformer.py:120-238``: fused QKV dense, scaled
    dot-product with key-side mask, bias-free output proj, post-LN)."""
    from neuraltexttospeech_tpu.nn.transformer import MultiHeadAttn

    H, D, C, B, T = 2, 8, 16, 2, 6
    rng = np.random.default_rng(4)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 0, 0, 0]], bool)

    qkv = tf.keras.layers.Dense(3 * H * D)
    o_net = tf.keras.layers.Dense(C, use_bias=False)
    ln = tf.keras.layers.LayerNormalization()

    def tf_forward(x_np):
        h = qkv(tf.constant(x_np))
        q, k, v = tf.split(h, 3, axis=-1)
        q = tf.reshape(q, [B, T, H, D])
        k = tf.reshape(k, [B, T, H, D])
        v = tf.reshape(v, [B, T, H, D])
        score = tf.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
        bias = tf.where(tf.constant(mask)[:, None, None, :], 0.0, -1e9)
        prob = tf.nn.softmax(score + bias, axis=-1)
        out = tf.einsum("bhqk,bkhd->bqhd", prob, v)
        out = tf.reshape(out, [B, T, H * D])
        return ln(tf.constant(x_np) + o_net(out)).numpy()

    y_tf = tf_forward(x)

    attn = MultiHeadAttn(n_head=H, d_model=C, d_head=D, dropout=0.0,
                         dropatt=0.0)
    params = {"params": {
        "Dense_0": {"kernel": jnp.asarray(qkv.kernel.numpy()),
                    "bias": jnp.asarray(qkv.bias.numpy())},
        "Dense_1": {"kernel": jnp.asarray(o_net.kernel.numpy())},
        "LayerNorm_0": {"scale": jnp.asarray(ln.gamma.numpy()),
                        "bias": jnp.asarray(ln.beta.numpy())},
    }}
    y = np.asarray(attn.apply(params, jnp.asarray(x),
                              attn_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(y, y_tf, atol=BUDGET)


def test_layernorm_matches_tf_epsilon():
    """Our FFT-stack LayerNorm mirrors the TF default epsilon (1e-3)."""
    from flax import linen as nn

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    tfl = tf.keras.layers.LayerNormalization()
    y_tf = tfl(tf.constant(x)).numpy()
    ln = nn.LayerNorm(epsilon=1e-3)
    p = {"params": {"scale": jnp.asarray(tfl.gamma.numpy()),
                    "bias": jnp.asarray(tfl.beta.numpy())}}
    np.testing.assert_allclose(np.asarray(ln.apply(p, x)), y_tf, atol=1e-5)
