"""FULL-MODEL numerical parity vs in-test TF2 oracle twins (weight transplant).

Round-1 parity stopped at block level (``test_tf_parity.py``); these tests
build reference-faithful tf.keras twins of the complete networks, transplant
the TF weights into our flax models, and assert the end-to-end forwards agree
within the 1e-3 budget — so a transposed-conv padding or mask-broadcast bug
*between* blocks cannot pass.

Oracles follow:
- DiffWave whole net:      ``/root/reference/DiffWave_TF/functional.py:64-150``
- HiFi-GAN v1 generator:   ``/root/reference/HiFiGAN_TF/model.py:115-173,393-455``
- FastPitch enc→reg→dec:   ``/root/reference/FastPitch_TF/model.py:259-363``
- Tacotron2 decode step:   ``/root/reference/Tacotron2_TF/model.py:473-527``

Documented deviations from reference *bugs* (capability, not bug, parity):
- DiffWave dilation-1 residual convs: the reference maps int padding 1 →
  "causal" (``DiffWave_TF/model.py:12-19``), an upstream porting artifact;
  the twin uses "same" like every other dilation (and like upstream torch).
- Tacotron2 ``decode`` feeds the *raw decoder input* to the decoder LSTM and
  stacks attention weights as [B, 2, T] channels-first into a channels-last
  conv (``Tacotron2_TF/model.py:496-527``); the twin follows the upstream
  NVIDIA semantics the reference was porting ([attn_hidden, context] input,
  [B, T, 2] stacking).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BUDGET = 1e-3


def _np(x):
    return np.asarray(x)


def _dense_p(layer):
    p = {"kernel": jnp.asarray(layer.kernel.numpy())}
    if layer.bias is not None:
        p["bias"] = jnp.asarray(layer.bias.numpy())
    return p


def _conv_p(layer):
    p = {"kernel": jnp.asarray(layer.kernel.numpy())}
    if layer.use_bias:
        p["bias"] = jnp.asarray(layer.bias.numpy())
    return p


def _wn_split(kernel):
    """Decompose a kernel into flax nn.WeightNorm (direction, scale) params
    that reproduce it exactly: v = w, g_j = ‖w[..., j]‖ (feature_axes=-1)."""
    w = np.asarray(kernel)
    scale = np.sqrt(np.sum(np.square(w.reshape(-1, w.shape[-1])), axis=0))
    return jnp.asarray(w), jnp.asarray(scale)


# --------------------------------------------------------------------------
# DiffWave — whole net
# --------------------------------------------------------------------------

def test_diffwave_full_net_parity():
    from neuraltexttospeech_tpu.models.diffwave import (
        DiffWave, DiffWaveConfig, DiffusionEmbedding,
    )

    cfg = DiffWaveConfig()  # full size: 30 layers, 64 ch, 80 mels
    B, F = 1, 2
    T = F * cfg.hop_length
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((B, T)).astype(np.float32)
    mel = rng.standard_normal((B, F, cfg.n_mels)).astype(np.float32)
    t_step = np.asarray([7], np.int32)

    L = tf.keras.layers
    table = tf.constant(_np(DiffusionEmbedding(cfg.num_steps)._table()))
    emb_d1, emb_d2 = L.Dense(512), L.Dense(512)
    in_proj = L.Conv1D(cfg.residual_channels, 1)
    up1 = L.Conv2DTranspose(1, (32, 3), (16, 1), padding="same")
    up2 = L.Conv2DTranspose(1, (32, 3), (16, 1), padding="same")
    blocks = []
    for i in range(cfg.residual_layers):
        d = 2 ** (i % cfg.dilation_cycle_length)
        blocks.append(dict(
            diff_proj=L.Dense(cfg.residual_channels),
            dilated=L.Conv1D(2 * cfg.residual_channels, 3, padding="same",
                             dilation_rate=d),
            cond=L.Conv1D(2 * cfg.residual_channels, 1),
            out=L.Conv1D(2 * cfg.residual_channels, 1),
        ))
    skip_proj = L.Conv1D(cfg.residual_channels, 1)
    out_proj = L.Conv1D(1, 1)

    def silu(v):
        return v * tf.math.sigmoid(v)

    def tf_forward(audio, t, mel):
        x = tf.nn.relu(in_proj(tf.constant(audio)[..., None]))
        emb = silu(emb_d2(silu(emb_d1(tf.gather(table, tf.constant(t))))))
        s = tf.constant(mel)[..., None]
        s = tf.nn.leaky_relu(up1(s), 0.4)
        s = tf.nn.leaky_relu(up2(s), 0.4)
        cond = tf.squeeze(s, -1)[:, : x.shape[1]]
        skip = None
        for blk in blocks:
            y = x + blk["diff_proj"](emb)[:, None, :]
            y = blk["dilated"](y) + blk["cond"](cond)
            gate, filt = tf.split(y, 2, axis=-1)
            y = tf.math.sigmoid(gate) * tf.math.tanh(filt)
            y = blk["out"](y)
            residual, sk = tf.split(y, 2, axis=-1)
            x = (x + residual) / np.sqrt(2.0)
            skip = sk if skip is None else skip + sk
        x = skip / np.sqrt(len(blocks))
        x = tf.nn.relu(skip_proj(x))
        return tf.squeeze(out_proj(x), -1).numpy()

    y_tf = tf_forward(audio, t_step, mel)

    params = {
        "Conv_0": _conv_p(in_proj),
        "DiffusionEmbedding_0": {"Dense_0": _dense_p(emb_d1),
                                 "Dense_1": _dense_p(emb_d2)},
        "SpectrogramUpsampler_0": {"ConvTranspose_0": _conv_p(up1),
                                   "ConvTranspose_1": _conv_p(up2)},
        "Conv_1": _conv_p(skip_proj),
        "Conv_2": _conv_p(out_proj),
    }
    for i, blk in enumerate(blocks):
        params[f"ResidualBlock_{i}"] = {
            "Dense_0": _dense_p(blk["diff_proj"]),
            "Conv_0": _conv_p(blk["dilated"]),
            "Conv_1": _conv_p(blk["cond"]),
            "Conv_2": _conv_p(blk["out"]),
        }

    model = DiffWave(cfg)
    y = _np(model.apply({"params": params}, jnp.asarray(audio),
                        jnp.asarray(t_step), jnp.asarray(mel)))
    assert y.shape == y_tf.shape
    np.testing.assert_allclose(y, y_tf, atol=BUDGET)


# --------------------------------------------------------------------------
# HiFi-GAN — full v1 generator
# --------------------------------------------------------------------------

def test_hifigan_generator_v1_parity():
    from neuraltexttospeech_tpu.models.hifigan import Generator, HiFiGANConfig

    cfg = HiFiGANConfig.v1()  # 512 init ch, ups (8,8,2,2), 12 resblocks
    B, F = 1, 8
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((B, F, cfg.num_mels)).astype(np.float32)

    L = tf.keras.layers
    conv_pre = L.Conv1D(cfg.upsample_initial_channel, 7, padding="same")
    ups, stages = [], []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        ups.append(L.Conv1DTranspose(ch, k, u, padding="same"))
        stage = []
        for kr, dils in zip(cfg.resblock_kernel_sizes,
                            cfg.resblock_dilation_sizes):
            # ResBlock1: per dilation [LReLU→dilated conv→LReLU→conv]+res
            stage.append([(L.Conv1D(ch, kr, padding="same", dilation_rate=d),
                           L.Conv1D(ch, kr, padding="same")) for d in dils])
        stages.append(stage)
    conv_post = L.Conv1D(1, 7, padding="same")

    def tf_forward(mel):
        x = conv_pre(tf.constant(mel))
        for i in range(len(ups)):
            x = tf.nn.leaky_relu(x, 0.1)
            x = ups[i](x)
            xs = None
            for block in stages[i]:
                xt_in = x
                for c1, c2 in block:
                    xt = c1(tf.nn.leaky_relu(xt_in, 0.1))
                    xt = c2(tf.nn.leaky_relu(xt, 0.1))
                    xt_in = xt + xt_in
                xs = xt_in if xs is None else xs + xt_in
            x = xs / len(stages[i])
        x = tf.nn.leaky_relu(x, 0.3)  # reference final LReLU = Keras default
        return tf.math.tanh(conv_post(x)).numpy()

    y_tf = tf_forward(mel)

    def wn_conv(layer):
        v, g = _wn_split(layer.kernel.numpy())
        return ({"kernel": v, "bias": jnp.asarray(layer.bias.numpy())}, g)

    params = {}
    cp, g = wn_conv(conv_pre)
    params["Conv_0"] = cp
    params["WeightNorm_0"] = {"Conv_0/kernel/scale": g}
    rb = 0
    for i, up in enumerate(ups):
        p, g = wn_conv(up)
        params[f"ConvTranspose_{i}"] = p
        params[f"WeightNorm_{1 + i}"] = {f"ConvTranspose_{i}/kernel/scale": g}
        for block in stages[i]:
            bp = {}
            ci = 0
            for c1, c2 in block:
                for c in (c1, c2):
                    p, g = wn_conv(c)
                    bp[f"Conv_{ci}"] = p
                    bp[f"WeightNorm_{ci}"] = {f"Conv_{ci}/kernel/scale": g}
                    ci += 1
            params[f"ResBlock1_{rb}"] = bp
            rb += 1
    p, g = wn_conv(conv_post)
    params["Conv_1"] = p
    params[f"WeightNorm_{1 + len(ups)}"] = {"Conv_1/kernel/scale": g}

    y = _np(Generator(cfg).apply({"params": params}, jnp.asarray(mel)))
    assert y.shape == y_tf.shape
    assert y.shape[1] == F * cfg.total_upsample
    np.testing.assert_allclose(y, y_tf, atol=BUDGET)


# --------------------------------------------------------------------------
# FastPitch — full encoder → predictors → regulate_len → decoder forward
# --------------------------------------------------------------------------

class _TFFFTLayer:
    """One post-LN FFT layer twin (``FastPitch_TF/transformer.py:241-273``)."""

    def __init__(self, n_head, d_model, d_head, d_inner, kernel_size):
        L = tf.keras.layers
        self.n_head, self.d_head = n_head, d_head
        self.qkv = L.Dense(3 * n_head * d_head)
        self.o_net = L.Dense(d_model, use_bias=False)
        self.ln_attn = L.LayerNormalization()
        self.ff1 = L.Conv1D(d_inner, kernel_size, padding="same")
        self.ff2 = L.Conv1D(d_model, kernel_size, padding="same")
        self.ln_ff = L.LayerNormalization()

    def __call__(self, x, mask):
        B, T = x.shape[0], x.shape[1]
        H, D = self.n_head, self.d_head
        h = self.qkv(x)
        q, k, v = tf.split(h, 3, axis=-1)
        q = tf.reshape(q, [B, T, H, D])
        k = tf.reshape(k, [B, T, H, D])
        v = tf.reshape(v, [B, T, H, D])
        score = tf.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
        bias = tf.where(mask[:, None, None, :], 0.0, -1e9)
        prob = tf.nn.softmax(score + bias, axis=-1)
        out = tf.reshape(tf.einsum("bhqk,bkhd->bqhd", prob, v), [B, T, H * D])
        x = self.ln_attn(x + self.o_net(out))
        m = tf.cast(mask, tf.float32)[..., None]
        x = x * m
        x = self.ln_ff(x + self.ff2(tf.nn.relu(self.ff1(x))))
        return x * m

    def flax_params(self):
        return {"MultiHeadAttn_0": {
                    "Dense_0": _dense_p(self.qkv),
                    "Dense_1": {"kernel": jnp.asarray(self.o_net.kernel.numpy())},
                    "LayerNorm_0": {"scale": jnp.asarray(self.ln_attn.gamma.numpy()),
                                    "bias": jnp.asarray(self.ln_attn.beta.numpy())}},
                "PositionwiseConvFF_0": {
                    "Conv_0": _conv_p(self.ff1),
                    "Conv_1": _conv_p(self.ff2),
                    "LayerNorm_0": {"scale": jnp.asarray(self.ln_ff.gamma.numpy()),
                                    "bias": jnp.asarray(self.ln_ff.beta.numpy())}}}


class _TFTemporalPredictor:
    """Twin of ``FastPitch_TF/model.py:101-121`` (dropout off)."""

    def __init__(self, filter_size, kernel_size, n_layers=2, n_predictions=1):
        L = tf.keras.layers
        self.convs = [(L.Conv1D(filter_size, kernel_size, padding="same"),
                       L.LayerNormalization()) for _ in range(n_layers)]
        self.fc = L.Dense(n_predictions)

    def __call__(self, x, mask):
        m = tf.cast(mask, tf.float32)[..., None]
        out = x * m
        for conv, ln in self.convs:
            out = ln(tf.nn.relu(conv(out)))
        return self.fc(out) * m

    def flax_params(self):
        p = {"Dense_0": _dense_p(self.fc)}
        for i, (conv, ln) in enumerate(self.convs):
            p[f"ConvReLUNorm_{i}"] = {
                "Conv_0": _conv_p(conv),
                "LayerNorm_0": {"scale": jnp.asarray(ln.gamma.numpy()),
                                "bias": jnp.asarray(ln.beta.numpy())}}
        return p


def _np_regulate_len(durations, enc_out, mel_max_len):
    """NumPy twin of ``FastPitch_TF/model.py:22-52`` (pace=1)."""
    reps = np.floor(durations + 0.5).astype(np.int64)
    dec_lens = np.minimum(reps.sum(axis=1), mel_max_len)
    out = np.zeros((enc_out.shape[0], mel_max_len, enc_out.shape[2]),
                   np.float32)
    for b in range(enc_out.shape[0]):
        pos = 0
        for t in range(enc_out.shape[1]):
            for _ in range(reps[b, t]):
                if pos < mel_max_len:
                    out[b, pos] = enc_out[b, t]
                pos += 1
    return out, dec_lens


def test_fastpitch_full_forward_parity():
    from neuraltexttospeech_tpu.models.fastpitch import (
        FastPitch, FastPitchConfig,
    )
    from neuraltexttospeech_tpu.nn.transformer import positional_embedding

    cfg = FastPitchConfig(in_fft_n_layers=2, out_fft_n_layers=2)
    B, Tt, MEL_MAX = 2, 16, 256
    rng = np.random.default_rng(2)
    text = rng.integers(1, cfg.n_symbols, (B, Tt))
    text[1, 11:] = 0  # padded sample exercises every mask
    input_lens = np.asarray([Tt, 11], np.int32)

    L = tf.keras.layers
    embed = L.Embedding(cfg.n_symbols, cfg.symbols_embedding_dim)
    enc_layers = [_TFFFTLayer(cfg.in_fft_n_heads, cfg.symbols_embedding_dim,
                              cfg.in_fft_d_head, cfg.in_fft_conv1d_filter_size,
                              cfg.in_fft_conv1d_kernel_size)
                  for _ in range(cfg.in_fft_n_layers)]
    dec_layers = [_TFFFTLayer(cfg.out_fft_n_heads, cfg.symbols_embedding_dim,
                              cfg.out_fft_d_head, cfg.out_fft_conv1d_filter_size,
                              cfg.out_fft_conv1d_kernel_size)
                  for _ in range(cfg.out_fft_n_layers)]
    dur_tp = _TFTemporalPredictor(cfg.dur_predictor_filter_size,
                                  cfg.dur_predictor_kernel_size)
    pitch_tp = _TFTemporalPredictor(cfg.pitch_predictor_filter_size,
                                    cfg.pitch_predictor_kernel_size)
    energy_tp = _TFTemporalPredictor(cfg.energy_predictor_filter_size,
                                     cfg.energy_predictor_kernel_size)
    pitch_emb = L.Conv1D(cfg.symbols_embedding_dim,
                         cfg.pitch_embedding_kernel_size, padding="same")
    energy_emb = L.Conv1D(cfg.symbols_embedding_dim,
                          cfg.energy_embedding_kernel_size, padding="same")
    proj = L.Dense(cfg.n_mel_channels)

    # ---- TF twin forward (reference model.py:259-363, inference regime) ----
    mask = tf.constant(text != 0)
    m = tf.cast(mask, tf.float32)[..., None]
    pos = tf.constant(_np(positional_embedding(Tt, cfg.symbols_embedding_dim)))
    x = embed(tf.constant(text)) + pos[None] * m
    for layer in enc_layers:
        x = layer(x, mask)
    enc_out = x

    log_dur = dur_tp(enc_out, mask)[..., 0]
    dur_pred_tf = tf.clip_by_value(tf.exp(log_dur) - 1.0, 0.0, 75.0).numpy()
    pitch_pred = pitch_tp(enc_out, mask)  # [B, T, 1]
    x = enc_out + pitch_emb(pitch_pred)
    energy_pred = energy_tp(x, mask)[..., 0]
    x = x + energy_emb(energy_pred[..., None])

    reg, dec_lens_tf = _np_regulate_len(dur_pred_tf, x.numpy(), MEL_MAX)
    dmask = tf.constant(np.arange(MEL_MAX)[None] < dec_lens_tf[:, None])
    dm = tf.cast(dmask, tf.float32)[..., None]
    dpos = tf.constant(_np(positional_embedding(MEL_MAX,
                                                cfg.symbols_embedding_dim)))
    y = tf.constant(reg) + dpos[None] * dm
    for layer in dec_layers:
        y = layer(y, dmask)
    mel_tf = proj(y).numpy()

    # ---- transplant & run our model -------------------------------------
    model = FastPitch(cfg)
    dummy_mel = jnp.zeros((B, 32, cfg.n_mel_channels))
    dummy_pitch = jnp.zeros((B, 1, 32))
    dummy_energy = jnp.zeros((B, 32))
    dummy_prior = jnp.ones((B, 32, Tt))
    params = jax.jit(lambda k: model.init(
        k, jnp.asarray(text), jnp.asarray(input_lens), dummy_mel,
        jnp.asarray([32, 32]), dummy_pitch, dummy_energy, None, dummy_prior))(
        jax.random.PRNGKey(0))["params"]

    def fft_params(layers, with_embed=None):
        p = {f"blocks_{i}": l.flax_params() for i, l in enumerate(layers)}
        if with_embed is not None:
            p["word_emb"] = {
                "embedding": jnp.asarray(with_embed.embeddings.numpy())}
        return p

    params = dict(params)
    params["encoder"] = fft_params(enc_layers, with_embed=embed)
    params["decoder"] = fft_params(dec_layers)
    params["duration_predictor"] = dur_tp.flax_params()
    params["pitch_predictor"] = pitch_tp.flax_params()
    params["energy_predictor"] = energy_tp.flax_params()
    params["pitch_emb"] = _conv_p(pitch_emb)
    params["energy_emb"] = _conv_p(energy_emb)
    params["proj"] = _dense_p(proj)

    mel, dec_lens, dur_pred, _ = model.apply(
        {"params": params}, jnp.asarray(text), jnp.asarray(input_lens),
        max_mel_len=MEL_MAX, method=FastPitch.infer)

    np.testing.assert_allclose(_np(dur_pred), dur_pred_tf, atol=BUDGET)
    np.testing.assert_array_equal(_np(dec_lens), dec_lens_tf)
    # compare only valid frames (padding is masked, not zeroed, in ours)
    for b in range(B):
        n = int(dec_lens_tf[b])
        np.testing.assert_allclose(_np(mel)[b, :n], mel_tf[b, :n],
                                   atol=BUDGET)


# --------------------------------------------------------------------------
# Tacotron 2 — teacher-forced decoder step
# --------------------------------------------------------------------------

def _keras_lstm_to_flax(cell):
    """Split a Keras LSTMCell's fused (kernel, recurrent, bias) into flax
    nn.LSTMCell per-gate Dense params (gate order i, f, g(c), o in both)."""
    k = cell.kernel.numpy()
    rk = cell.recurrent_kernel.numpy()
    b = cell.bias.numpy()
    u = rk.shape[0]
    names = ["i", "f", "g", "o"]
    p = {}
    for j, n in enumerate(names):
        p[f"i{n}"] = {"kernel": jnp.asarray(k[:, j * u:(j + 1) * u])}
        p[f"h{n}"] = {"kernel": jnp.asarray(rk[:, j * u:(j + 1) * u]),
                      "bias": jnp.asarray(b[j * u:(j + 1) * u])}
    return p


def test_tacotron2_decoder_step_parity():
    from neuraltexttospeech_tpu.models.tacotron2 import (
        DecoderCell, Tacotron2Config,
    )

    cfg = Tacotron2Config()  # full size: 1024 rnns, 128 attn, 512 enc
    B, Tt = 2, 9
    rng = np.random.default_rng(3)
    enc_dim = cfg.encoder_embedding_dim
    memory = rng.standard_normal((B, Tt, enc_dim)).astype(np.float32)
    mask = np.array([[True] * Tt, [True] * 6 + [False] * 3])
    x = rng.standard_normal((B, cfg.prenet_dim)).astype(np.float32)
    # random running state (c, h per RNN; nonzero weights/context)
    attn_c = rng.standard_normal((B, cfg.attention_rnn_dim)).astype(np.float32)
    attn_h = rng.standard_normal((B, cfg.attention_rnn_dim)).astype(np.float32)
    dec_c = rng.standard_normal((B, cfg.decoder_rnn_dim)).astype(np.float32)
    dec_h = rng.standard_normal((B, cfg.decoder_rnn_dim)).astype(np.float32)
    w_prev = np.abs(rng.standard_normal((B, Tt))).astype(np.float32)
    w_prev /= w_prev.sum(-1, keepdims=True)
    w_cum = np.abs(rng.standard_normal((B, Tt))).astype(np.float32)
    context = rng.standard_normal((B, enc_dim)).astype(np.float32)

    L = tf.keras.layers
    attn_rnn = L.LSTMCell(cfg.attention_rnn_dim)
    dec_rnn = L.LSTMCell(cfg.decoder_rnn_dim)
    query_l = L.Dense(cfg.attention_dim, use_bias=False)
    memory_l = L.Dense(cfg.attention_dim, use_bias=False)
    v_l = L.Dense(1, use_bias=False)
    loc_conv = L.Conv1D(cfg.attention_location_n_filters,
                        cfg.attention_location_kernel_size,
                        padding="same", use_bias=False)
    loc_dense = L.Dense(cfg.attention_dim, use_bias=False)
    lin_proj = L.Dense(cfg.n_mel_channels)
    gate_l = L.Dense(1)

    # ---- TF twin step (NVIDIA decode semantics; see module docstring) ----
    tmask = tf.constant(mask)
    cell_in = tf.concat([tf.constant(x), tf.constant(context)], -1)
    ah, (ah2, ac2) = attn_rnn(cell_in, states=[tf.constant(attn_h),
                                               tf.constant(attn_c)])
    pmem = memory_l(tf.constant(memory))
    wcat = tf.stack([tf.constant(w_prev), tf.constant(w_cum)], axis=-1)
    energies = v_l(tf.math.tanh(
        query_l(ah)[:, None] + loc_dense(loc_conv(wcat)) + pmem))[..., 0]
    energies = tf.where(tmask, energies, -1e9)
    weights = tf.nn.softmax(energies, axis=-1)
    ctx = tf.einsum("bt,btc->bc", weights, tf.constant(memory))
    dec_in = tf.concat([ah, ctx], -1)
    dh, (dh2, dc2) = dec_rnn(dec_in, states=[tf.constant(dec_h),
                                             tf.constant(dec_c)])
    proj_in = tf.concat([dh, ctx], -1)
    frame_tf = lin_proj(proj_in).numpy()
    gate_tf = gate_l(proj_in).numpy()[..., 0]

    # ---- transplant & run our DecoderCell --------------------------------
    cell = DecoderCell(cfg)
    carry0 = ((jnp.asarray(attn_c), jnp.asarray(attn_h)),
              (jnp.asarray(dec_c), jnp.asarray(dec_h)),
              jnp.asarray(w_prev), jnp.asarray(w_cum), jnp.asarray(context))
    init = jax.jit(lambda k: cell.init(
        {"params": k, "dropout": k}, carry0, jnp.asarray(x),
        jnp.asarray(memory), jnp.zeros((B, Tt, cfg.attention_dim)),
        jnp.asarray(mask)))(jax.random.PRNGKey(0))
    params = dict(init["params"])
    params["attention_rnn"] = _keras_lstm_to_flax(attn_rnn)
    params["decoder_rnn"] = _keras_lstm_to_flax(dec_rnn)
    params["attention_layer"] = {
        "query_layer": {"kernel": jnp.asarray(query_l.kernel.numpy())},
        "memory_layer": {"kernel": jnp.asarray(memory_l.kernel.numpy())},
        "v": {"kernel": jnp.asarray(v_l.kernel.numpy())},
        "location_layer": {
            "Conv_0": {"kernel": jnp.asarray(loc_conv.kernel.numpy())},
            "Dense_0": {"kernel": jnp.asarray(loc_dense.kernel.numpy())}},
    }
    params["linear_projection"] = _dense_p(lin_proj)
    params["gate_layer"] = _dense_p(gate_l)

    pmem_j = cell.apply({"params": params}, jnp.asarray(memory),
                        method=DecoderCell.process_memory)
    np.testing.assert_allclose(_np(pmem_j), pmem.numpy(), atol=BUDGET)

    new_carry, (frame, gate, weights_j) = cell.apply(
        {"params": params}, carry0, jnp.asarray(x), jnp.asarray(memory),
        pmem_j, jnp.asarray(mask), deterministic=True)

    np.testing.assert_allclose(_np(weights_j), weights.numpy(), atol=BUDGET)
    np.testing.assert_allclose(_np(frame), frame_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(gate), gate_tf, atol=BUDGET)
    # carry parity: attention/decoder LSTM states, cum weights, context
    np.testing.assert_allclose(_np(new_carry[0][0]), ac2.numpy(), atol=BUDGET)
    np.testing.assert_allclose(_np(new_carry[0][1]), ah2.numpy(), atol=BUDGET)
    np.testing.assert_allclose(_np(new_carry[1][0]), dc2.numpy(), atol=BUDGET)
    np.testing.assert_allclose(_np(new_carry[1][1]), dh2.numpy(), atol=BUDGET)
    np.testing.assert_allclose(_np(new_carry[3]),
                               (w_cum + weights.numpy()), atol=BUDGET)
    np.testing.assert_allclose(_np(new_carry[4]), ctx.numpy(), atol=BUDGET)
