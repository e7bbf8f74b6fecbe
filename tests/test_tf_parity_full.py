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

pytestmark = pytest.mark.slow

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


# --------------------------------------------------------------------------
# Grad-TTS — full TextEncoder (mu_x + log-durations)
# --------------------------------------------------------------------------

def _rel_embeddings(emb, length, window):
    """Window table [2W+1, d] → per-distance table [2L-1, d], zero beyond
    the window (``Grad-TTS_TF/model/text_encoder.py:275-295``)."""
    pad = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    padded = tf.pad(emb, [[pad, pad], [0, 0]])
    return padded[start : start + 2 * length - 1]


def _rel_to_abs(x):
    """[B,H,L,2L-1] relative logits → [B,H,L,L] absolute
    (``text_encoder.py:298-312`` pad/reshape shift)."""
    b, h, l, _ = x.shape
    x = tf.pad(x, [[0, 0], [0, 0], [0, 0], [0, 1]])
    flat = tf.reshape(x, [b, h, l * 2 * l])
    flat = tf.pad(flat, [[0, 0], [0, 0], [0, l - 1]])
    return tf.reshape(flat, [b, h, l + 1, 2 * l - 1])[:, :, :l, l - 1:]


def _abs_to_rel(x):
    """[B,H,L,L] absolute weights → [B,H,L,2L-1] relative
    (``text_encoder.py:315-331``)."""
    b, h, l, _ = x.shape
    x = tf.pad(x, [[0, 0], [0, 0], [0, 0], [0, l - 1]])
    flat = tf.reshape(x, [b, h, l * l + l * (l - 1)])
    flat = tf.pad(flat, [[0, 0], [0, 0], [l, 0]])
    return tf.reshape(flat, [b, h, l, 2 * l])[:, :, :, 1:]


class _TFGradTTSEncLayer:
    """One Grad-TTS encoder layer twin: windowed rel-pos MHA + conv FFN,
    post-LN (``text_encoder.py:145-419``; the twin follows the upstream
    glow-tts semantics the reference was porting — relu applied in the
    prenet, key-mask -1e4 fill — where the reference's port has typos)."""

    def __init__(self, channels, filter_channels, n_heads, window, kernel):
        L = tf.keras.layers
        self.h, self.w = n_heads, window
        self.k_ch = channels // n_heads
        self.q = L.Dense(channels)
        self.k = L.Dense(channels)
        self.v = L.Dense(channels)
        self.o = L.Dense(channels)
        rel_init = tf.random.normal([2 * window + 1, self.k_ch],
                                    stddev=self.k_ch ** -0.5)
        self.emb_rel_k = tf.Variable(rel_init)
        self.emb_rel_v = tf.Variable(tf.random.normal(
            [2 * window + 1, self.k_ch], stddev=self.k_ch ** -0.5))
        self.ln1 = L.LayerNormalization(epsilon=1e-4)
        self.ff1 = L.Conv1D(filter_channels, kernel, padding="same")
        self.ff2 = L.Conv1D(channels, kernel, padding="same")
        self.ln2 = L.LayerNormalization(epsilon=1e-4)

    def __call__(self, x, mask):
        B, T = x.shape[0], x.shape[1]
        H, D = self.h, self.k_ch
        q = tf.transpose(tf.reshape(self.q(x), [B, T, H, D]), [0, 2, 1, 3])
        k = tf.transpose(tf.reshape(self.k(x), [B, T, H, D]), [0, 2, 1, 3])
        v = tf.transpose(tf.reshape(self.v(x), [B, T, H, D]), [0, 2, 1, 3])
        scores = tf.matmul(q, k, transpose_b=True) / np.sqrt(D)
        rel_k = _rel_embeddings(self.emb_rel_k, T, self.w)      # [2T-1, D]
        rel_logits = tf.einsum("bhld,md->bhlm", q, rel_k)       # [B,H,T,2T-1]
        scores = scores + _rel_to_abs(rel_logits) / np.sqrt(D)
        bias = tf.where(mask[:, None, None, :], 0.0, -1e4)
        p = tf.nn.softmax(scores + bias, axis=-1)
        out = tf.matmul(p, v)                                   # [B,H,T,D]
        rel_v = _rel_embeddings(self.emb_rel_v, T, self.w)
        out = out + tf.einsum("bhlm,md->bhld", _abs_to_rel(p), rel_v)
        out = tf.reshape(tf.transpose(out, [0, 2, 1, 3]), [B, T, H * D])
        x = self.ln1(x + self.o(out))
        m = tf.cast(mask, tf.float32)[..., None]
        y = self.ff2(tf.nn.relu(self.ff1(x * m)) * m) * m
        return self.ln2(x + y)

    def flax_params(self):
        def d1(layer):  # Dense kernel [in,out] → 1x1 Conv kernel [1,in,out]
            return {"kernel": jnp.asarray(layer.kernel.numpy())[None],
                    "bias": jnp.asarray(layer.bias.numpy())}
        return ({"Conv_0": d1(self.q), "Conv_1": d1(self.k),
                 "Conv_2": d1(self.v), "Conv_3": d1(self.o),
                 "emb_rel_k": jnp.asarray(self.emb_rel_k.numpy()),
                 "emb_rel_v": jnp.asarray(self.emb_rel_v.numpy())},
                {"scale": jnp.asarray(self.ln1.gamma.numpy()),
                 "bias": jnp.asarray(self.ln1.beta.numpy())},
                {"Conv_0": _conv_p(self.ff1), "Conv_1": _conv_p(self.ff2)},
                {"scale": jnp.asarray(self.ln2.gamma.numpy()),
                 "bias": jnp.asarray(self.ln2.beta.numpy())})


class _TFGradTTSEncoder:
    """Full TextEncoder twin: embedding prenet + rel-pos encoder stack +
    mu projection + duration predictor (``text_encoder.py``). Factored so
    the end-to-end ``call`` parity test can reuse it."""

    def __init__(self, cfg):
        L = tf.keras.layers
        C = cfg.n_enc_channels
        self.C = C
        self.emb_table = tf.Variable(tf.random.normal([cfg.n_symbols, C],
                                                      stddev=C ** -0.5))
        self.pre_convs = [L.Conv1D(C, 5, padding="same") for _ in range(3)]
        self.pre_lns = [L.LayerNormalization(epsilon=1e-4) for _ in range(3)]
        self.pre_proj = L.Conv1D(C, 1)
        self.enc_layers = [
            _TFGradTTSEncLayer(C, cfg.filter_channels, cfg.n_heads,
                               cfg.window_size, cfg.enc_kernel)
            for _ in range(cfg.n_enc_layers)
        ]
        self.proj_m = L.Conv1D(cfg.n_feats, 1)
        self.dp_convs = [L.Conv1D(cfg.filter_channels_dp, 3, padding="same")
                         for _ in range(2)]
        self.dp_lns = [L.LayerNormalization(epsilon=1e-4) for _ in range(2)]
        self.dp_proj = L.Conv1D(1, 1)

    def __call__(self, text, key_mask):
        """text [B, T] ids, key_mask [B, T] bool → (mu [B,T,F], logw [B,T])
        as numpy."""
        m = tf.cast(tf.constant(key_mask), tf.float32)[..., None]
        x = tf.gather(self.emb_table, tf.constant(text)) * np.sqrt(self.C)
        org = x
        for conv, ln in zip(self.pre_convs, self.pre_lns):
            x = tf.nn.relu(ln(conv(x * m)))
        x = (org + self.pre_proj(x)) * m
        for layer in self.enc_layers:
            x = layer(x, tf.constant(key_mask))
        x = x * m
        mu_tf = (self.proj_m(x) * m).numpy()
        d = x
        for conv, ln in zip(self.dp_convs, self.dp_lns):
            d = ln(tf.nn.relu(conv(d * m)))
        logw_tf = (self.dp_proj(d * m) * m).numpy()[..., 0]
        return mu_tf, logw_tf

    def flax_params(self):
        params = {
            "Embed_0": {"embedding": jnp.asarray(self.emb_table.numpy())},
            "ConvReluNormPrenet_0": {
                **{f"Conv_{i}": _conv_p(c)
                   for i, c in enumerate(self.pre_convs)},
                "Conv_3": _conv_p(self.pre_proj),
                **{f"LayerNorm_{i}": {
                    "scale": jnp.asarray(ln.gamma.numpy()),
                    "bias": jnp.asarray(ln.beta.numpy())}
                   for i, ln in enumerate(self.pre_lns)},
            },
            "Conv_0": _conv_p(self.proj_m),
            "DurationPredictor_0": {
                "Conv_0": _conv_p(self.dp_convs[0]),
                "Conv_1": _conv_p(self.dp_convs[1]),
                "Conv_2": _conv_p(self.dp_proj),
                **{f"LayerNorm_{i}": {
                    "scale": jnp.asarray(ln.gamma.numpy()),
                    "bias": jnp.asarray(ln.beta.numpy())}
                   for i, ln in enumerate(self.dp_lns)},
            },
        }
        for i, layer in enumerate(self.enc_layers):
            attn_p, ln1_p, ffn_p, ln2_p = layer.flax_params()
            params[f"RelPositionMultiHeadAttention_{i}"] = attn_p
            params[f"LayerNorm_{2 * i}"] = ln1_p
            params[f"EncFFN_{i}"] = ffn_p
            params[f"LayerNorm_{2 * i + 1}"] = ln2_p
        return params


def test_gradtts_text_encoder_full_parity():
    import dataclasses

    from neuraltexttospeech_tpu.models.gradtts import (
        GradTTSConfig, TextEncoder,
    )

    cfg = dataclasses.replace(GradTTSConfig(), n_enc_layers=3)
    B, T = 2, 13          # T > 2*window+1 exercises the zero-padded region
    rng = np.random.default_rng(5)
    text = rng.integers(1, cfg.n_symbols, (B, T)).astype(np.int32)
    lens = np.asarray([T, 9], np.int32)
    key_mask = np.arange(T)[None, :] < lens[:, None]

    enc = _TFGradTTSEncoder(cfg)
    mu_tf, logw_tf = enc(text, key_mask)

    model = TextEncoder(cfg)
    mu_j, logw_j, mask_j = model.apply(
        {"params": enc.flax_params()}, jnp.asarray(text), jnp.asarray(lens))

    valid = key_mask[..., None]
    np.testing.assert_allclose(_np(mu_j) * valid, mu_tf * valid, atol=BUDGET)
    np.testing.assert_allclose(_np(logw_j) * key_mask, logw_tf * key_mask,
                               atol=BUDGET)


# --------------------------------------------------------------------------
# Grad-TTS — full diffusion UNet score estimator
# --------------------------------------------------------------------------

class _TFUNetBlock:
    """Conv3×3 → GroupNorm → Mish, masked (``diffusion.py:57-69``)."""

    def __init__(self, dim_out, groups=8):
        L = tf.keras.layers
        self.conv = L.Conv2D(dim_out, 3, padding="same")
        # upstream torch GroupNorm eps (the reference's tfa default 1e-3 is
        # a silent porting divergence)
        self.gn = L.GroupNormalization(groups=groups, epsilon=1e-5)

    def __call__(self, x, mask):
        y = self.gn(self.conv(x * mask))
        return (y * tf.math.tanh(tf.math.softplus(y))) * mask

    def flax_params(self):
        return {"Conv_0": _conv_p(self.conv),
                "GroupNorm_0": {"scale": jnp.asarray(self.gn.gamma.numpy()),
                                "bias": jnp.asarray(self.gn.beta.numpy())}}


class _TFUNetResnet:
    """(``diffusion.py:72-99``)."""

    def __init__(self, dim_in, dim_out, groups=8):
        L = tf.keras.layers
        self.block1 = _TFUNetBlock(dim_out, groups)
        self.block2 = _TFUNetBlock(dim_out, groups)
        self.mlp = L.Dense(dim_out)
        self.res = L.Conv2D(dim_out, 1) if dim_in != dim_out else None

    def __call__(self, x, mask, temb):
        h = self.block1(x, mask)
        t = self.mlp(temb * tf.math.tanh(tf.math.softplus(temb)))
        h = h + t[:, None, None, :]
        h = self.block2(h, mask)
        res = self.res(x * mask) if self.res is not None else x * mask
        return h + res

    def flax_params(self):
        p = {"UNetBlock_0": self.block1.flax_params(),
             "UNetBlock_1": self.block2.flax_params(),
             "Dense_0": _dense_p(self.mlp)}
        if self.res is not None:
            p["Conv_0"] = _conv_p(self.res)
        return p


class _TFLinearAttn:
    """Upstream linear attention (kv context), ReZero residual
    (``diffusion.py:102-158``; the reference's reshape-based head split is a
    garbled port — the twin follows the upstream einops semantics)."""

    def __init__(self, dim, heads=4, dim_head=32):
        L = tf.keras.layers
        self.h, self.d = heads, dim_head
        self.qkv = L.Conv2D(heads * dim_head * 3, 1, use_bias=False)
        self.out = L.Conv2D(dim, 1)
        self.g = tf.Variable(tf.zeros([1]))

    def __call__(self, x):
        B, H, W, _ = x.shape
        qkv = tf.reshape(self.qkv(x), [B, H * W, 3 * self.h, self.d])
        q, k, v = tf.split(qkv, 3, axis=2)            # [B, N, h, d]
        k = tf.nn.softmax(k, axis=1)                  # over spatial
        context = tf.einsum("bnhd,bnhe->bhde", k, v)
        out = tf.einsum("bhde,bnhd->bnhe", context, q)
        out = tf.reshape(out, [B, H, W, self.h * self.d])
        return x + self.g * self.out(out)

    def flax_params(self):
        return {"g": jnp.asarray(self.g.numpy()),
                "LinearAttention2D_0": {
                    "Conv_0": {"kernel": jnp.asarray(self.qkv.kernel.numpy())},
                    "Conv_1": _conv_p(self.out)}}


class _TFGradTTSUNet:
    """Full UNet score-estimator twin (``diffusion.py:177-291``,
    channels-last). Factored so the end-to-end ``call`` parity test can use
    it as the reverse-SDE estimator."""

    def __init__(self, cfg):
        L = tf.keras.layers
        self.cfg = cfg
        dim = cfg.dec_dim
        dims = [dim * m for m in cfg.dim_mults]
        self.dim, self.dims = dim, dims
        self.mlp1, self.mlp2 = L.Dense(dim * 4), L.Dense(dim)
        self.downs, self.ups = [], []
        d_in = 2
        for i, d in enumerate(dims):
            self.downs.append((
                _TFUNetResnet(d_in, d, cfg.groups),
                _TFUNetResnet(d, d, cfg.groups),
                _TFLinearAttn(d),
                L.Conv2D(d, 3, 2, "same") if i < len(dims) - 1 else None))
            d_in = d
        self.mid1 = _TFUNetResnet(dims[-1], dims[-1], cfg.groups)
        self.mid_attn = _TFLinearAttn(dims[-1])
        self.mid2 = _TFUNetResnet(dims[-1], dims[-1], cfg.groups)
        up_in = dims[-1]
        for d in reversed(dims[:-1]):
            self.ups.append((
                _TFUNetResnet(up_in + d, d, cfg.groups),
                _TFUNetResnet(d, d, cfg.groups),
                _TFLinearAttn(d),
                L.Conv2DTranspose(d, 4, 2, "same")))
            up_in = d
        self.final_block = _TFUNetBlock(dim, cfg.groups)
        self.final_conv = L.Conv2D(1, 1)

    def __call__(self, x, mu, t_diff, key_mask):
        """x, mu [B, F, T]; t_diff [B]; key_mask [B, T] → score [B, F, T]
        as numpy."""
        half = self.dim // 2
        freqs = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
        te = self.cfg.pe_scale * np.asarray(t_diff)[:, None] * freqs[None, :]
        temb = tf.constant(np.concatenate([np.sin(te), np.cos(te)], -1),
                           tf.float32)
        temb = self.mlp1(temb)
        temb = self.mlp2(temb * tf.math.tanh(tf.math.softplus(temb)))

        h = tf.constant(np.stack([np.asarray(mu), np.asarray(x)], axis=-1),
                        tf.float32)                  # [B, F, T, 2]
        m0 = tf.constant(key_mask[:, None, :, None].astype(np.float32))
        hiddens, masks = [], [m0]
        for res1, res2, attn, down in self.downs:
            mk = masks[-1]
            h = res1(h, mk, temb)
            h = res2(h, mk, temb)
            h = attn(h)
            hiddens.append(h)
            if down is not None:
                h = down(h * mk)
                masks.append(mk[:, :, ::2, :])
        h = self.mid1(h, masks[-1], temb)
        h = self.mid_attn(h)
        h = self.mid2(h, masks[-1], temb)
        for i, (res1, res2, attn, up) in enumerate(self.ups):
            mk = masks[-(i + 1)]
            h = tf.concat([h, hiddens[-(i + 1)]], axis=-1)
            h = res1(h, mk, temb)
            h = res2(h, mk, temb)
            h = attn(h)
            h = up(h * mk)
        h = self.final_block(h, m0)
        return tf.squeeze(self.final_conv(h * m0) * m0, -1).numpy()

    def flax_params(self):
        params = {"Dense_0": _dense_p(self.mlp1),
                  "Dense_1": _dense_p(self.mlp2),
                  "UNetBlock_0": self.final_block.flax_params(),
                  "Conv_2": _conv_p(self.final_conv)}
        rb = iter(range(100))
        att = iter(range(100))
        down_conv = iter(range(2))
        for res1, res2, attn, down in self.downs:
            params[f"UNetResnetBlock_{next(rb)}"] = res1.flax_params()
            params[f"UNetResnetBlock_{next(rb)}"] = res2.flax_params()
            params[f"ReZeroAttention_{next(att)}"] = attn.flax_params()
            if down is not None:
                params[f"Conv_{next(down_conv)}"] = _conv_p(down)
        params[f"UNetResnetBlock_{next(rb)}"] = self.mid1.flax_params()
        params[f"ReZeroAttention_{next(att)}"] = self.mid_attn.flax_params()
        params[f"UNetResnetBlock_{next(rb)}"] = self.mid2.flax_params()
        for i, (res1, res2, attn, up) in enumerate(self.ups):
            params[f"UNetResnetBlock_{next(rb)}"] = res1.flax_params()
            params[f"UNetResnetBlock_{next(rb)}"] = res2.flax_params()
            params[f"ReZeroAttention_{next(att)}"] = attn.flax_params()
            # keras Conv2DTranspose kernel is [k, k, out, in]; flax with
            # transpose_kernel=True expects the same layout
            params[f"ConvTranspose_{i}"] = {
                "kernel": jnp.asarray(up.kernel.numpy()),
                "bias": jnp.asarray(up.bias.numpy())}
        return params


def test_gradtts_unet_estimator_full_parity():
    import dataclasses

    from neuraltexttospeech_tpu.models.gradtts import (
        GradLogPEstimator2D, GradTTSConfig,
    )

    cfg = dataclasses.replace(GradTTSConfig(), dec_dim=16, n_feats=16)
    B, F, T = 2, cfg.n_feats, 12
    rng = np.random.default_rng(6)
    x = rng.standard_normal((B, F, T)).astype(np.float32)
    mu = rng.standard_normal((B, F, T)).astype(np.float32)
    t_diff = np.asarray([0.3, 0.8], np.float32)
    lens = np.asarray([T, 8], np.int32)
    key_mask = np.arange(T)[None, :] < lens[:, None]

    unet = _TFGradTTSUNet(cfg)
    y_tf = unet(x, mu, t_diff, key_mask)

    model = GradLogPEstimator2D(cfg)
    y = _np(model.apply({"params": unet.flax_params()}, jnp.asarray(x),
                        jnp.asarray(key_mask), jnp.asarray(mu),
                        jnp.asarray(t_diff)))
    assert y.shape == y_tf.shape
    np.testing.assert_allclose(y, y_tf, atol=BUDGET)


def test_gradtts_end_to_end_call_parity():
    """Full ``GradTTS.__call__`` vs the reference composition
    (``Grad-TTS_TF/model/tts.py:62-157``): TextEncoder → exp/ceil duration →
    generate_path → mu_y → fixed-noise 2-step Euler reverse diffusion
    through the UNet — the encoder and UNet twins composed end-to-end.

    The terminal latent's noise is injected (not sampled) on both sides so
    the trajectories are deterministic; the reference's ``tf.random.uniform``
    latent is a porting bug (upstream Grad-TTS samples a standard normal),
    so the oracle uses the same fixed tensor."""
    import dataclasses

    from neuraltexttospeech_tpu.models.gradtts import (
        GradTTS, GradTTSConfig, fix_len_compatibility,
    )

    cfg = dataclasses.replace(GradTTSConfig(), n_symbols=40, n_enc_layers=2,
                              dec_dim=16, n_feats=16)
    B, T = 2, 9
    N_STEPS = 2
    rng = np.random.default_rng(11)
    text = rng.integers(1, cfg.n_symbols, (B, T)).astype(np.int32)
    lens = np.asarray([T, 6], np.int32)
    x_mask = (np.arange(T)[None, :] < lens[:, None])

    enc = _TFGradTTSEncoder(cfg)
    unet = _TFGradTTSUNet(cfg)

    # ---- TF/host oracle composition (tts.py:102-157) --------------------
    mu_x, logw = enc(text, x_mask)                   # [B,T,F], [B,T]
    w = np.exp(logw) * x_mask
    w_ceil = np.ceil(w)
    y_lengths = np.maximum(w_ceil.sum(1), 1.0).astype(np.int32)
    y_max = fix_len_compatibility(int(y_lengths.max()))
    y_mask = np.arange(y_max)[None, :] < y_lengths[:, None]  # [B, T_mel]

    # generate_path (model/utils.py:28-44): cumsum + sequence-mask diff
    cum = np.cumsum(w_ceil, axis=1)                  # [B, T]
    steps = np.arange(y_max)[None, None, :]
    path = (steps < cum[:, :, None]).astype(np.float32)
    path[:, 1:] -= path[:, :-1].copy()
    attn_mask = (x_mask[:, :, None] & y_mask[:, None, :])
    attn_tf = path * attn_mask                       # [B, T, T_mel]

    mu_y = np.einsum("bxy,bxc->byc", attn_tf, mu_x)  # [B, T_mel, F]
    mu_y_t = np.swapaxes(mu_y, 1, 2)                 # [B, F, T_mel]

    noise = rng.standard_normal(mu_y_t.shape).astype(np.float32)
    m3 = y_mask[:, None, :].astype(np.float32)       # [B, 1, T_mel]
    xt = (mu_y_t + noise) * m3
    h_step = 1.0 / N_STEPS
    for i in range(N_STEPS):
        t = (1.0 - (i + 0.5) * h_step) * np.ones((B,), np.float32)
        noise_t = cfg.beta_min + (cfg.beta_max - cfg.beta_min) * t
        score = unet(xt, mu_y_t, t, y_mask)
        dxt = 0.5 * (mu_y_t - xt - score) * noise_t[:, None, None] * h_step
        xt = (xt - dxt) * m3
    dec_tf = np.swapaxes(xt, 1, 2)                   # [B, T_mel, F]

    # ---- JAX side: one apply through GradTTS.__call__ -------------------
    model = GradTTS(cfg)
    params = {"encoder": enc.flax_params(),
              "decoder": {"estimator": unet.flax_params()}}
    enc_j, dec_j, attn_j, ylen_j = model.apply(
        {"params": params}, jnp.asarray(text), jnp.asarray(lens),
        n_timesteps=N_STEPS, max_mel_len=y_max, noise=jnp.asarray(noise))

    np.testing.assert_array_equal(_np(ylen_j), y_lengths)
    np.testing.assert_allclose(_np(attn_j), attn_tf, atol=BUDGET)
    valid = y_mask[:, :, None]
    np.testing.assert_allclose(_np(enc_j) * valid, mu_y * valid, atol=BUDGET)
    np.testing.assert_allclose(_np(dec_j) * valid, dec_tf * valid,
                               atol=BUDGET)


# --------------------------------------------------------------------------
# TalkNet — full QuartzNet backbone (the reference's only complete model part)
# --------------------------------------------------------------------------

def test_quartznet_backbone_full_parity():
    """Twin of ``TalkNet_TF/quartznet.py:126-215`` in eval mode: explicit
    zero-pad + valid separable convs, BatchNorm moving stats, residual
    blocks, dilated penultimate conv, log-softmax head. The initial
    SeparableConv1D's (default-on) bias is folded into the following BN's
    moving mean at transplant; BN epsilon pinned to 1e-5 on both sides
    (keras' 1e-3 default is a hyperparameter, not architecture)."""
    import dataclasses

    from neuraltexttospeech_tpu.models.talknet import QuartzNet, QuartzNetConfig

    cfg = QuartzNetConfig(
        block_repeat=1, module_repeat=2, block_params=((32, 7), (48, 9)),
        initial_filters=32, initial_kernel=7, penultimate_filters=48,
        penultimate_kernel=11, final_filters=64)
    B, T, C_IN, C_OUT = 2, 32, 8, 29
    rng = np.random.default_rng(8)
    x = rng.standard_normal((B, T, C_IN)).astype(np.float32)

    L = tf.keras.layers

    def bn():
        return L.BatchNormalization(epsilon=1e-5)

    def sep(filters, k, strides=1, dilation=1, use_bias=False):
        return L.SeparableConv1D(filters, k, strides=strides,
                                 dilation_rate=dilation, padding="valid",
                                 use_bias=use_bias)

    sep1, bn1 = sep(32, 7, strides=2, use_bias=True), bn()
    blocks = []
    for filters, k in cfg.block_params:
        mods = [(sep(filters, k), bn()) for _ in range(cfg.module_repeat)]
        blocks.append((mods, L.Conv1D(filters, 1, use_bias=False), bn()))
    sep2, bn2 = sep(48, 11, dilation=2), bn()
    conv3, bn3 = L.Conv1D(64, 1, use_bias=False), bn()
    conv4 = L.Conv1D(C_OUT, 1)

    def tf_forward(x):
        h = tf.constant(x)
        h = tf.nn.relu(bn1(sep1(tf.pad(h, [[0, 0], [3, 3], [0, 0]])),
                           training=False))
        for mods, res_conv, res_bn in blocks:
            pad = (mods[0][0].kernel_size[0]) // 2
            r = res_bn(res_conv(h), training=False)
            for i, (m, b) in enumerate(mods):
                h = b(m(tf.pad(h, [[0, 0], [pad, pad], [0, 0]])),
                      training=False)
                if i < len(mods) - 1:
                    h = tf.nn.relu(h)
            h = tf.nn.relu(h + r)
        h = tf.nn.relu(bn2(sep2(tf.pad(h, [[0, 0], [10, 10], [0, 0]])),
                           training=False))
        h = tf.nn.relu(bn3(conv3(h), training=False))
        return tf.nn.log_softmax(conv4(h)).numpy()

    tf_forward(x)  # build
    # randomize every weight (incl. moving stats) for a non-trivial oracle
    trng = np.random.default_rng(9)
    for layer in ([sep1, bn1, sep2, bn2, conv3, bn3, conv4]
                  + [w for mods, rc, rb in blocks
                     for w in [rc, rb] + [l for pair in mods for l in pair]]):
        for w in layer.weights:
            v = trng.standard_normal(w.shape).astype(np.float32) * 0.3
            if "variance" in w.name:
                v = np.abs(v) + 0.5
            w.assign(v)
    y_tf = tf_forward(x)

    def sep_p(layer):
        dw = np.transpose(layer.depthwise_kernel.numpy(), (0, 2, 1))
        pw = layer.pointwise_kernel.numpy()
        return ({"kernel": jnp.asarray(dw)}, {"kernel": jnp.asarray(pw)})

    def bn_p(layer, fold_bias=None):
        mean = layer.moving_mean.numpy()
        if fold_bias is not None:
            mean = mean - fold_bias
        return ({"BatchNorm_0": {
                    "scale": jnp.asarray(layer.gamma.numpy()),
                    "bias": jnp.asarray(layer.beta.numpy())}},
                {"BatchNorm_0": {
                    "mean": jnp.asarray(mean),
                    "var": jnp.asarray(layer.moving_variance.numpy())}})

    params, stats = {}, {}
    params["Conv_0"], params["Conv_1"] = sep_p(sep1)
    params["_BN_0"], stats["_BN_0"] = bn_p(bn1, fold_bias=sep1.bias.numpy())
    for bi, (mods, res_conv, res_bn) in enumerate(blocks):
        bp, bs = {}, {}
        bp["Conv_0"] = {"kernel": jnp.asarray(res_conv.kernel.numpy())}
        bp["_BN_0"], bs["_BN_0"] = bn_p(res_bn)
        for i, (m, b) in enumerate(mods):
            bp[f"Conv_{2 * i + 1}"], bp[f"Conv_{2 * i + 2}"] = sep_p(m)
            bp[f"_BN_{i + 1}"], bs[f"_BN_{i + 1}"] = bn_p(b)
        params[f"QuartzNetBlock_{bi}"] = bp
        stats[f"QuartzNetBlock_{bi}"] = bs
    params["Conv_2"], params["Conv_3"] = sep_p(sep2)
    params["_BN_1"], stats["_BN_1"] = bn_p(bn2)
    params["Conv_4"] = {"kernel": jnp.asarray(conv3.kernel.numpy())}
    params["_BN_2"], stats["_BN_2"] = bn_p(bn3)
    params["Conv_5"] = {"kernel": jnp.asarray(conv4.kernel.numpy()),
                        "bias": jnp.asarray(conv4.bias.numpy())}

    model = QuartzNet(C_OUT, cfg)
    y = _np(model.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x)))
    assert y.shape == y_tf.shape == (B, T // 2, C_OUT)
    np.testing.assert_allclose(y, y_tf, atol=BUDGET)


# --------------------------------------------------------------------------
# HiFi-GAN — discriminators (the GAN loss lane: scores AND feature maps)
# --------------------------------------------------------------------------

def test_hifigan_discriminator_p_parity():
    """Full DiscriminatorP twin (``HiFiGAN_TF/model.py:176-246``): reflect
    pad to a period multiple, fold time into 2-D, five weight-normed
    (5,1)-kernel strided convs + post conv. fmaps checked too (the
    feature-matching loss consumes them)."""
    from neuraltexttospeech_tpu.models.hifigan import DiscriminatorP

    period, B, T = 3, 2, 100          # 100 % 3 != 0 exercises the pad
    rng = np.random.default_rng(10)
    x = rng.standard_normal((B, T, 1)).astype(np.float32)

    L = tf.keras.layers
    convs = [L.Conv2D(ch, (5, 1), (st, 1), padding="same")
             for ch, st in ((32, 3), (128, 3), (512, 3), (1024, 3),
                            (1024, 1))]
    post = L.Conv2D(1, (3, 1), 1, padding="same")

    h = tf.constant(x)
    n_pad = period - T % period
    h = tf.pad(h, [[0, 0], [0, n_pad], [0, 0]], "REFLECT")
    h = tf.reshape(h, [B, (T + n_pad) // period, period, 1])
    fmaps_tf = []
    for c in convs:
        h = tf.nn.leaky_relu(c(h), 0.1)
        fmaps_tf.append(h.numpy())
    score_tf = tf.reshape(post(h), [B, -1]).numpy()

    params = {}
    for i, c in enumerate(convs + [post]):
        v, g = _wn_split(c.kernel.numpy())
        params[f"Conv_{i}"] = {"kernel": v,
                               "bias": jnp.asarray(c.bias.numpy())}
        params[f"WeightNorm_{i}"] = {f"Conv_{i}/kernel/scale": g}

    score, fmaps = DiscriminatorP(period).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_np(score), score_tf, atol=BUDGET)
    for got, want in zip(fmaps[:-1], fmaps_tf):
        np.testing.assert_allclose(_np(got), want, atol=BUDGET)


def test_hifigan_discriminator_s_parity():
    """Full weight-normed DiscriminatorS twin (``model.py:279-351``):
    grouped strided 1-D conv stack. The reference's first conv uses
    ``padding="valid"`` — a porting divergence from upstream torch's
    padding=7; the twin follows upstream SAME."""
    from neuraltexttospeech_tpu.models.hifigan import DiscriminatorS

    B, T = 1, 256
    rng = np.random.default_rng(11)
    x = rng.standard_normal((B, T, 1)).astype(np.float32)

    L = tf.keras.layers
    specs = [(128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
             (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
             (1024, 5, 1, 1)]
    convs = [L.Conv1D(ch, k, strides=s, groups=g, padding="same")
             for ch, k, s, g in specs]
    post = L.Conv1D(1, 3, padding="same")

    h = tf.constant(x)
    fmaps_tf = []
    for c in convs:
        h = tf.nn.leaky_relu(c(h), 0.1)
        fmaps_tf.append(h.numpy())
    score_tf = tf.reshape(post(h), [B, -1]).numpy()

    params = {}
    for i, c in enumerate(convs + [post]):
        v, g = _wn_split(c.kernel.numpy())
        params[f"Conv_{i}"] = {"kernel": v,
                               "bias": jnp.asarray(c.bias.numpy())}
        params[f"WeightNorm_{i}"] = {f"Conv_{i}/kernel/scale": g}

    score, fmaps = DiscriminatorS().apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_np(score), score_tf, atol=BUDGET)
    for got, want in zip(fmaps[:-1], fmaps_tf):
        np.testing.assert_allclose(_np(got), want, atol=BUDGET)


# --------------------------------------------------------------------------
# FastPitch — TRAINING-regime forward (ConvAttention + MAS + average_pitch)
# --------------------------------------------------------------------------

class _TFConvAttention:
    """Twin of ``FastPitch_TF/attention.py:56-156`` ("3xconv" variant).

    key_proj: ConvNorm(2·C_text, k3) → ReLU → ConvNorm(attn, k1);
    query_proj: ConvNorm(2·n_mel, k3) → ReLU → ConvNorm(n_mel, k1) → ReLU →
    ConvNorm(attn, k1). Gaussian log-likelihood −0.0005·‖q−k‖², log_softmax
    over text, + log(prior+1e-8), mask, softmax (attention.py:131-156)."""

    def __init__(self, n_mel, n_text_channels, n_attn):
        L = tf.keras.layers
        self.k1 = L.Conv1D(n_text_channels * 2, 3, padding="same")
        self.k2 = L.Conv1D(n_attn, 1)
        self.q1 = L.Conv1D(n_mel * 2, 3, padding="same")
        self.q2 = L.Conv1D(n_mel, 1)
        self.q3 = L.Conv1D(n_attn, 1)

    def __call__(self, queries, keys, key_mask, attn_prior):
        keys_enc = self.k2(tf.nn.relu(self.k1(keys)))         # [B, Tt, A]
        q = tf.nn.relu(self.q2(tf.nn.relu(self.q1(queries))))
        queries_enc = self.q3(q)                              # [B, Tm, A]
        # reference attention.py:131-137 — broadcasted 4-D subtraction
        attn = (queries_enc[:, :, None, :] - keys_enc[:, None, :]) ** 2
        attn = -0.0005 * tf.math.reduce_sum(attn, axis=-1)    # [B, Tm, Tt]
        attn = tf.nn.log_softmax(attn, axis=-1) + tf.math.log(
            tf.constant(attn_prior) + 1e-8)
        attn_logprob = tf.identity(attn)
        attn = tf.where(tf.constant(key_mask)[:, None, :], attn, -1e9)
        return tf.nn.softmax(attn, axis=-1), attn_logprob

    def flax_params(self):
        return {f"Conv_{i}": _conv_p(l) for i, l in enumerate(
            [self.k1, self.k2, self.q1, self.q2, self.q3])}


def _mas_width1_ref(log_attn):
    """Faithful port of the reference's Viterbi MAS
    (``FastPitch_TF/alignment.py:33-59``): width-1 monotonic path."""
    log_p = log_attn.copy()
    log_p[0, 1:] = -np.inf
    for i in range(1, log_p.shape[0]):
        prev1 = -np.inf
        for j in range(log_p.shape[1]):
            prev2 = log_p[i - 1, j]
            log_p[i, j] += max(prev1, prev2)
            prev1 = prev2
    opt = np.zeros_like(log_p)
    j = log_p.shape[1] - 1
    for i in range(log_p.shape[0] - 1, 0, -1):
        opt[i, j] = 1.0
        if log_p[i - 1, j - 1] >= log_p[i - 1, j]:
            j -= 1
            if j == 0:
                opt[1:i, j] = 1.0
                break
    opt[0, j] = 1.0
    return opt


def _tf_average_pitch(pitch, durs):
    """Twin of ``FastPitch_TF/model.py:55-98`` — cumsum+gather span means,
    zero frames excluded. pitch [B, F, Tm], durs [B, Tt] → [B, F, Tt]."""
    durs = tf.cast(durs, tf.int64)
    dce = tf.math.cumsum(durs, axis=1)
    dcs = tf.pad(dce[:, :-1], [[0, 0], [1, 0]])
    nz = tf.pad(tf.math.cumsum(tf.cast(pitch != 0.0, tf.float32), axis=2),
                [[0, 0], [0, 0], [1, 0]])
    pc = tf.pad(tf.math.cumsum(pitch, axis=2), [[0, 0], [0, 0], [1, 0]])
    F = pitch.shape[1]
    dce_b = tf.broadcast_to(dce[:, None, :], (durs.shape[0], F, durs.shape[1]))
    dcs_b = tf.broadcast_to(dcs[:, None, :], (durs.shape[0], F, durs.shape[1]))
    sums = (tf.gather(pc, dce_b, batch_dims=2)
            - tf.gather(pc, dcs_b, batch_dims=2))
    nelems = (tf.gather(nz, dce_b, batch_dims=2)
              - tf.gather(nz, dcs_b, batch_dims=2))
    return tf.where(nelems == 0.0, tf.zeros_like(sums),
                    sums / tf.maximum(nelems, 1.0))


def test_fastpitch_training_forward_parity():
    """The TRAINING regime the inference-path twin above never touches:
    ConvAttention soft attention + log prior, MAS binarize → duration
    targets, duration-averaged pitch/energy targets, GT-conditioned
    embeddings, regulate_len on MAS durations, decoder
    (reference ``model.py:259-363`` training branch)."""
    from neuraltexttospeech_tpu.models.fastpitch import (
        FastPitch, FastPitchConfig,
    )
    from neuraltexttospeech_tpu.nn.transformer import positional_embedding

    cfg = FastPitchConfig(in_fft_n_layers=1, out_fft_n_layers=1)
    B, Tt, Tm = 2, 12, 48
    rng = np.random.default_rng(5)
    text = rng.integers(1, cfg.n_symbols, (B, Tt))
    text[1, 9:] = 0
    input_lens = np.asarray([Tt, 9], np.int32)
    mel_lens = np.asarray([Tm, 37], np.int32)
    mel_tgt = rng.standard_normal((B, Tm, cfg.n_mel_channels)).astype(np.float32)
    pitch_dense = rng.standard_normal((B, 1, Tm)).astype(np.float32)
    pitch_dense[0, 0, 5:9] = 0.0          # unvoiced frames hit the nz mask
    energy_dense = np.abs(rng.standard_normal((B, Tm))).astype(np.float32)
    prior = (np.abs(rng.standard_normal((B, Tm, Tt))) + 0.1).astype(np.float32)

    L = tf.keras.layers
    embed = L.Embedding(cfg.n_symbols, cfg.symbols_embedding_dim)
    enc_layers = [_TFFFTLayer(cfg.in_fft_n_heads, cfg.symbols_embedding_dim,
                              cfg.in_fft_d_head, cfg.in_fft_conv1d_filter_size,
                              cfg.in_fft_conv1d_kernel_size)]
    dec_layers = [_TFFFTLayer(cfg.out_fft_n_heads, cfg.symbols_embedding_dim,
                              cfg.out_fft_d_head, cfg.out_fft_conv1d_filter_size,
                              cfg.out_fft_conv1d_kernel_size)]
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
    attention = _TFConvAttention(cfg.n_mel_channels,
                                 cfg.symbols_embedding_dim,
                                 cfg.n_attn_channels)

    # ---- TF twin training forward ----------------------------------------
    key_mask = np.arange(Tt)[None, :] < input_lens[:, None]
    mask = tf.constant(text != 0)
    m = tf.cast(mask, tf.float32)[..., None]
    pos = tf.constant(_np(positional_embedding(Tt, cfg.symbols_embedding_dim)))
    x = embed(tf.constant(text)) + pos[None] * m
    for layer in enc_layers:
        x = layer(x, mask)
    enc_out = x

    log_dur_tf = dur_tp(enc_out, mask)[..., 0].numpy()
    pitch_pred_tf = tf.transpose(pitch_tp(enc_out, mask), [0, 2, 1]).numpy()

    text_emb = embed(tf.constant(text))       # raw symbols (model.py:306)
    attn_soft_tf, attn_logprob_tf = attention(
        tf.constant(mel_tgt), text_emb, key_mask, prior)

    # binarize_attention (model.py:227-246): per-sample MAS on log(soft)
    attn_hard_tf = np.zeros((B, Tm, Tt), np.float32)
    with np.errstate(divide="ignore"):   # masked positions: log(0) = -inf
        log_soft = np.log(attn_soft_tf.numpy())
    for b in range(B):
        attn_hard_tf[b, :mel_lens[b], :input_lens[b]] = _mas_width1_ref(
            log_soft[b, :mel_lens[b], :input_lens[b]])
    dur_tgt_tf = attn_hard_tf.sum(axis=1)                       # [B, Tt]
    assert (dur_tgt_tf.sum(axis=1) == mel_lens).all()

    pitch_tgt_tf = _tf_average_pitch(tf.constant(pitch_dense),
                                     tf.constant(dur_tgt_tf)).numpy()
    x = enc_out + pitch_emb(tf.constant(
        np.transpose(pitch_tgt_tf, (0, 2, 1))))
    energy_pred_tf = energy_tp(x, mask)[..., 0].numpy()
    energy_tgt_tf = tf.math.log(1.0 + _tf_average_pitch(
        tf.constant(energy_dense[:, None, :]),
        tf.constant(dur_tgt_tf))).numpy()
    x = x + energy_emb(tf.constant(np.transpose(energy_tgt_tf, (0, 2, 1))))

    reg, dec_lens_tf = _np_regulate_len(dur_tgt_tf, x.numpy(), Tm)
    assert (dec_lens_tf == mel_lens).all()
    dmask = tf.constant(np.arange(Tm)[None] < dec_lens_tf[:, None])
    dm = tf.cast(dmask, tf.float32)[..., None]
    dpos = tf.constant(_np(positional_embedding(Tm, cfg.symbols_embedding_dim)))
    y = tf.constant(reg) + dpos[None] * dm
    for layer in dec_layers:
        y = layer(y, dmask)
    mel_tf = proj(y).numpy()

    # ---- transplant & run our TRAINING forward ---------------------------
    model = FastPitch(cfg)
    params = jax.jit(lambda k: model.init(
        k, jnp.asarray(text), jnp.asarray(input_lens), jnp.asarray(mel_tgt),
        jnp.asarray(mel_lens), jnp.asarray(pitch_dense),
        jnp.asarray(energy_dense), None, jnp.asarray(prior)))(
        jax.random.PRNGKey(0))["params"]
    params = dict(params)
    params["encoder"] = {"blocks_0": enc_layers[0].flax_params(),
                         "word_emb": {"embedding":
                                      jnp.asarray(embed.embeddings.numpy())}}
    params["decoder"] = {"blocks_0": dec_layers[0].flax_params()}
    params["duration_predictor"] = dur_tp.flax_params()
    params["pitch_predictor"] = pitch_tp.flax_params()
    params["energy_predictor"] = energy_tp.flax_params()
    params["pitch_emb"] = _conv_p(pitch_emb)
    params["energy_emb"] = _conv_p(energy_emb)
    params["proj"] = _dense_p(proj)
    params["attention"] = attention.flax_params()

    out = model.apply(
        {"params": params}, jnp.asarray(text), jnp.asarray(input_lens),
        jnp.asarray(mel_tgt), jnp.asarray(mel_lens), jnp.asarray(pitch_dense),
        jnp.asarray(energy_dense), None, jnp.asarray(prior))

    np.testing.assert_allclose(_np(out.attn_logprob), attn_logprob_tf.numpy(),
                               atol=BUDGET)
    np.testing.assert_allclose(_np(out.attn_soft), attn_soft_tf.numpy(),
                               atol=BUDGET)
    # MAS path + duration targets are exact integers
    np.testing.assert_array_equal(_np(out.attn_hard_dur), dur_tgt_tf)
    np.testing.assert_allclose(_np(out.pitch_tgt), pitch_tgt_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(out.energy_tgt), energy_tgt_tf[:, 0, :],
                               atol=BUDGET)
    np.testing.assert_allclose(_np(out.log_dur_pred), log_dur_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(out.pitch_pred), pitch_pred_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(out.energy_pred), energy_pred_tf,
                               atol=BUDGET)
    for b in range(B):
        n = int(mel_lens[b])
        np.testing.assert_allclose(_np(out.mel_out)[b, :n], mel_tf[b, :n],
                                   atol=BUDGET)


def test_attention_ctc_loss_matches_tf():
    """optax CTC forward-sum vs ``tf.nn.ctc_loss`` under the reference's
    conventions (``attn_loss_function.py:8-73``): blank prepended at class 0
    with constant −1 logprob, classes beyond key_len masked, targets
    1..key_len, time-major logits, per-example normalization by out_len.

    Normalization note: the reference feeds ``tf.nn.softmax`` output into
    ``tf.nn.ctc_loss`` (attn_loss_function.py:39), which log-softmaxes its
    input again — a double normalization its own commented-out original
    (and the upstream torch F.ctc_loss usage) did not have. Our
    ``attention_ctc_loss`` log-softmaxes once; because log_softmax is
    idempotent, feeding the same log-softmaxed logits to both oracles makes
    the comparison exact, and the shipped softmax variant is asserted to be
    a real deviation below."""
    from neuraltexttospeech_tpu.models.fastpitch_loss import attention_ctc_loss

    B, Tm, Tt = 3, 20, 7
    rng = np.random.default_rng(7)
    attn_logprob = np.log(
        rng.dirichlet(np.ones(Tt), size=(B, Tm)) + 1e-8).astype(np.float32)
    in_lens = np.asarray([7, 5, 6], np.int32)
    out_lens = np.asarray([20, 14, 17], np.int32)
    blank_logprob = -1.0

    # reference pipeline (attn_loss_function.py:22-48), log_softmax variant
    att = np.transpose(attn_logprob, (1, 0, 2))          # time-major
    att = np.pad(att, ((0, 0), (0, 0), (1, 0)),
                 constant_values=blank_logprob)
    key_inds = np.arange(Tt + 1)
    cmask = key_inds[None, None, :] > in_lens[None, :, None]
    att = np.where(cmask, -1e9, att).astype(np.float32)
    labels = np.tile(key_inds[1:][None], (B, 1)).astype(np.int32)

    logp = tf.nn.log_softmax(tf.constant(att), axis=-1)
    cost_tf = tf.nn.ctc_loss(
        tf.constant(labels), logp, tf.constant(in_lens),
        tf.constant(out_lens)).numpy()                   # [B]
    ref_scalar = float(np.mean(cost_tf / out_lens))

    ours = float(attention_ctc_loss(
        jnp.asarray(attn_logprob), jnp.asarray(in_lens),
        jnp.asarray(out_lens), blank_logprob))
    np.testing.assert_allclose(ours, ref_scalar, rtol=BUDGET)

    # the reference's shipped softmax-before-ctc variant really is a
    # different loss (documented deviation, not an oracle mismatch)
    cost_shipped = tf.nn.ctc_loss(
        tf.constant(labels), tf.nn.softmax(tf.constant(att), axis=-1),
        tf.constant(in_lens), tf.constant(out_lens)).numpy()
    assert abs(float(np.mean(cost_shipped / out_lens)) - ours) > 10 * BUDGET


# --------------------------------------------------------------------------
# Tacotron 2 — encoder + full T-step teacher-forced decode trajectory
# --------------------------------------------------------------------------

class _Tacotron2Twin:
    """Full-size TF twin (layers, forward helpers, weight transplant) shared
    by the teacher-forced and free-running Tacotron2 parity tests.

    Twin semantics: upstream NVIDIA (packed-sequence-masked encoder LSTM;
    the reference runs its keras LSTM unmasked, ``model.py:331``, so the
    twins use equal input lengths where both agree), BN epsilon 1e-5
    (torch default; keras silently uses 1e-3). Prenet dropout is disabled
    on both sides via the parity-only ``prenet_deterministic`` flag."""

    def __init__(self, cfg, rng):
        self.cfg, self.rng = cfg, rng
        L = tf.keras.layers
        self.table = rng.standard_normal(
            (cfg.n_symbols, cfg.symbols_embedding_dim)).astype(
            np.float32) * 0.1
        self.enc_convs, self.enc_bns = [], []
        for _ in range(cfg.encoder_n_convolutions):
            self.enc_convs.append(
                L.Conv1D(cfg.encoder_embedding_dim, cfg.encoder_kernel_size,
                         padding="same"))
            self.enc_bns.append(
                L.BatchNormalization(epsilon=1e-5, momentum=0.9))
        self.bilstm = L.Bidirectional(
            L.LSTM(cfg.encoder_embedding_dim // 2, return_sequences=True))
        self.pre_d1 = L.Dense(cfg.prenet_dim, use_bias=False)
        self.pre_d2 = L.Dense(cfg.prenet_dim, use_bias=False)
        self.attn_rnn = L.LSTMCell(cfg.attention_rnn_dim)
        self.dec_rnn = L.LSTMCell(cfg.decoder_rnn_dim)
        self.query_l = L.Dense(cfg.attention_dim, use_bias=False)
        self.memory_l = L.Dense(cfg.attention_dim, use_bias=False)
        self.v_l = L.Dense(1, use_bias=False)
        self.loc_conv = L.Conv1D(cfg.attention_location_n_filters,
                                 cfg.attention_location_kernel_size,
                                 padding="same", use_bias=False)
        self.loc_dense = L.Dense(cfg.attention_dim, use_bias=False)
        self.lin_proj = L.Dense(cfg.n_mel_channels)
        self.gate_l = L.Dense(1)
        self.post_convs, self.post_bns = [], []
        for i in range(cfg.postnet_n_convolutions):
            last = i == cfg.postnet_n_convolutions - 1
            feats = cfg.n_mel_channels if last else cfg.postnet_embedding_dim
            self.post_convs.append(
                L.Conv1D(feats, cfg.postnet_kernel_size, padding="same"))
            self.post_bns.append(
                L.BatchNormalization(epsilon=1e-5, momentum=0.9))

    def randomize_bn(self, bn, n):
        """Non-trivial inference statistics (fresh BN is an identity)."""
        rng = self.rng
        bn.build((None, None, n))
        bn.gamma.assign(rng.standard_normal(n).astype(np.float32) * 0.2 + 1.0)
        bn.beta.assign(rng.standard_normal(n).astype(np.float32) * 0.1)
        bn.moving_mean.assign(rng.standard_normal(n).astype(np.float32) * 0.1)
        bn.moving_variance.assign(
            np.abs(rng.standard_normal(n)).astype(np.float32) * 0.5 + 0.5)

    def encode(self, text):
        """embedding → 3×[conv5+BN+relu] → BiLSTM (randomizes the enc BNs
        as their shapes materialize — call exactly once, before
        ``transplant``)."""
        x = tf.gather(tf.constant(self.table), tf.constant(text))
        for conv, bn in zip(self.enc_convs, self.enc_bns):
            h = conv(x)
            self.randomize_bn(bn, h.shape[-1])
            x = tf.nn.relu(bn(h, training=False))
        return self.bilstm(x)

    def prenet(self, x):
        return tf.nn.relu(self.pre_d2(tf.nn.relu(self.pre_d1(x))))

    def init_decoder_state(self, B, Tt, memory):
        cfg = self.cfg
        return {
            "attn_h": tf.zeros((B, cfg.attention_rnn_dim)),
            "attn_c": tf.zeros((B, cfg.attention_rnn_dim)),
            "dec_h": tf.zeros((B, cfg.decoder_rnn_dim)),
            "dec_c": tf.zeros((B, cfg.decoder_rnn_dim)),
            "w": tf.zeros((B, Tt)),
            "w_cum": tf.zeros((B, Tt)),
            "ctx": tf.zeros((B, cfg.encoder_embedding_dim)),
            "memory": memory,
            "pmem": self.memory_l(memory),
        }

    def decode_step(self, prenet_out_t, s):
        """One decoder step on prenet output [B, prenet_dim]; mutates s.
        Returns (mel_frame, gate_logit, attention_weights)."""
        cell_in = tf.concat([prenet_out_t, s["ctx"]], -1)
        ah, (ah2, ac2) = self.attn_rnn(cell_in,
                                       states=[s["attn_h"], s["attn_c"]])
        s["attn_h"], s["attn_c"] = ah2, ac2
        wcat = tf.stack([s["w"], s["w_cum"]], axis=-1)
        energies = self.v_l(tf.math.tanh(
            self.query_l(ah)[:, None] + self.loc_dense(self.loc_conv(wcat))
            + s["pmem"]))[..., 0]
        s["w"] = tf.nn.softmax(energies, axis=-1)
        s["w_cum"] = s["w_cum"] + s["w"]
        s["ctx"] = tf.einsum("bt,btc->bc", s["w"], s["memory"])
        dh, (dh2, dc2) = self.dec_rnn(tf.concat([ah, s["ctx"]], -1),
                                      states=[s["dec_h"], s["dec_c"]])
        s["dec_h"], s["dec_c"] = dh2, dc2
        proj_in = tf.concat([dh, s["ctx"]], -1)
        return (self.lin_proj(proj_in), self.gate_l(proj_in)[..., 0], s["w"])

    def postnet(self, mel):
        """5×[conv+BN(+tanh)] residual (randomizes the postnet BNs — call
        exactly once, before ``transplant``). Returns mel + residual."""
        y = tf.constant(mel)
        for i, (conv, bn) in enumerate(zip(self.post_convs, self.post_bns)):
            h = conv(y)
            self.randomize_bn(bn, h.shape[-1])
            y = bn(h, training=False)
            if i != self.cfg.postnet_n_convolutions - 1:
                y = tf.math.tanh(y)
        return mel + y.numpy()

    def transplant(self, variables):
        """Copy every twin weight into the flax variable tree (encode() and
        postnet() must already have run so the BNs are built+randomized)."""
        cfg = self.cfg
        params = jax.tree.map(lambda x: x, dict(variables["params"]))
        stats = jax.tree.map(lambda x: x, dict(variables["batch_stats"]))

        def bn_p(bn):
            return {"scale": jnp.asarray(bn.gamma.numpy()),
                    "bias": jnp.asarray(bn.beta.numpy())}

        def bn_s(bn):
            return {"mean": jnp.asarray(bn.moving_mean.numpy()),
                    "var": jnp.asarray(bn.moving_variance.numpy())}

        params["embedding"] = {"embedding": jnp.asarray(self.table)}
        enc_p = dict(params["encoder"])
        for i in range(cfg.encoder_n_convolutions):
            enc_p[f"Conv_{i}"] = _conv_p(self.enc_convs[i])
            enc_p[f"BatchNorm_{i}"] = bn_p(self.enc_bns[i])
        enc_p["OptimizedLSTMCell_0"] = _keras_lstm_to_flax(
            self.bilstm.forward_layer.cell)
        enc_p["OptimizedLSTMCell_1"] = _keras_lstm_to_flax(
            self.bilstm.backward_layer.cell)
        params["encoder"] = enc_p
        stats["encoder"] = {f"BatchNorm_{i}": bn_s(self.enc_bns[i])
                            for i in range(cfg.encoder_n_convolutions)}

        cell_p = dict(params["cell"])
        cell_p["prenet"] = {
            "Dense_0": {"kernel": jnp.asarray(self.pre_d1.kernel.numpy())},
            "Dense_1": {"kernel": jnp.asarray(self.pre_d2.kernel.numpy())}}
        cell_p["attention_rnn"] = _keras_lstm_to_flax(self.attn_rnn)
        cell_p["decoder_rnn"] = _keras_lstm_to_flax(self.dec_rnn)
        cell_p["attention_layer"] = {
            "query_layer": {
                "kernel": jnp.asarray(self.query_l.kernel.numpy())},
            "memory_layer": {
                "kernel": jnp.asarray(self.memory_l.kernel.numpy())},
            "v": {"kernel": jnp.asarray(self.v_l.kernel.numpy())},
            "location_layer": {
                "Conv_0": {
                    "kernel": jnp.asarray(self.loc_conv.kernel.numpy())},
                "Dense_0": {
                    "kernel": jnp.asarray(self.loc_dense.kernel.numpy())}},
        }
        cell_p["linear_projection"] = _dense_p(self.lin_proj)
        cell_p["gate_layer"] = _dense_p(self.gate_l)
        params["cell"] = cell_p

        post_p = dict(params["postnet"])
        post_s = {}
        for i in range(cfg.postnet_n_convolutions):
            post_p[f"Conv_{i}"] = _conv_p(self.post_convs[i])
            post_p[f"BatchNorm_{i}"] = bn_p(self.post_bns[i])
            post_s[f"BatchNorm_{i}"] = bn_s(self.post_bns[i])
        params["postnet"] = post_p
        stats["postnet"] = post_s
        return {"params": params, "batch_stats": stats}


def test_tacotron2_full_sequence_parity():
    """Extends the one-step twin above to the FULL teacher-forced path:
    embedding → 3×[conv5+BN]+BiLSTM encoder (``Tacotron2_TF/model.py:
    283-332``) → 8 chained decoder steps through the model's own nn.scan →
    postnet — asserting the mel/gate/attention *trajectories*. Because step
    t's energies read the cumulative attention carry from steps 0..t−1, a
    broken cum-attn (or any LSTM-state) carry diverges from step 2 onward
    and fails this test, which the randomly-initialized one-step twin could
    not detect. (Twin semantics: ``_Tacotron2Twin`` docstring.)"""
    from neuraltexttospeech_tpu.models.tacotron2 import (
        Tacotron2, Tacotron2Config,
    )

    cfg = Tacotron2Config()     # full size
    B, Tt, Tm = 2, 9, 8
    rng = np.random.default_rng(11)
    text = rng.integers(1, cfg.n_symbols, (B, Tt)).astype(np.int32)
    input_lens = np.asarray([Tt, Tt], np.int32)
    mel_tgt = rng.standard_normal((B, Tm, cfg.n_mel_channels)).astype(
        np.float32)

    # ---- TF twin ----------------------------------------------------------
    twin = _Tacotron2Twin(cfg, rng)
    memory = twin.encode(text)

    go = np.zeros((B, 1, cfg.n_mel_channels), np.float32)
    dec_in = np.concatenate([go, mel_tgt[:, :-1]], axis=1)
    prenet_out = twin.prenet(tf.constant(dec_in))

    s = twin.init_decoder_state(B, Tt, memory)
    mels_tf, gates_tf, aligns_tf = [], [], []
    for t in range(Tm):
        mel_t, gate_t, w_t = twin.decode_step(prenet_out[:, t], s)
        mels_tf.append(mel_t)
        gates_tf.append(gate_t)
        aligns_tf.append(w_t)
    mel_tf = tf.stack(mels_tf, axis=1).numpy()          # [B, Tm, n_mel]
    gate_tf = tf.stack(gates_tf, axis=1).numpy()        # [B, Tm]
    align_tf = tf.stack(aligns_tf, axis=1).numpy()      # [B, Tm, Tt]
    mel_post_tf = twin.postnet(mel_tf)

    # ---- transplant & run the model's own teacher-forced scan -------------
    model = Tacotron2(cfg)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        jnp.asarray(text), jnp.asarray(input_lens), jnp.asarray(mel_tgt)))(
        jax.random.PRNGKey(0))

    out = model.apply(
        twin.transplant(variables), jnp.asarray(text),
        jnp.asarray(input_lens), jnp.asarray(mel_tgt),
        train=False, prenet_deterministic=True)

    np.testing.assert_allclose(_np(out.alignments), align_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(out.gate_out), gate_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(out.mel_out), mel_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(out.mel_out_postnet), mel_post_tf,
                               atol=BUDGET)


def test_tacotron2_free_running_inference_parity():
    """Free-running (inference-branch) twin: the reference feeds each
    step's own mel output back as the next decoder input and stops on
    ``sigmoid(gate) > gate_threshold`` (``Tacotron2_TF/model.py:587-603``,
    ``while True`` + per-utterance break). The batched flax ``infer``
    expresses that as a scan with a per-sequence ``finished`` mask (frames
    after a sequence's gate fires are zeroed, padded gates read 1e3);
    the TF twin mirrors exactly that masking so trajectories, emitted
    frames, gate logits, AND the decoded lengths must match ≤1e-3.

    The gate bias is transplanted to fire mid-decode (one sequence stops
    early, the other runs to ``max_decoder_steps``), so the stop logic —
    the last un-oracled branch of the AR family — is exercised, not just
    the happy path. The bias can be solved for AFTER the free-running loop
    because the gate value never feeds back into the decode trajectory: it
    only drives the finished/emit masking, which the twin therefore applies
    post-hoc in numpy. Prenet dropout (always-on at inference upstream) is
    disabled on both sides via the parity-only ``prenet_deterministic``."""
    from neuraltexttospeech_tpu.models.tacotron2 import (
        Tacotron2, Tacotron2Config,
    )

    cfg = Tacotron2Config()     # full size
    B, Tt, T = 2, 9, 8
    rng = np.random.default_rng(12)
    text = rng.integers(1, cfg.n_symbols, (B, Tt)).astype(np.int32)
    input_lens = np.asarray([Tt, Tt], np.int32)

    # ---- TF twin: free-running loop, raw trajectories ----------------------
    twin = _Tacotron2Twin(cfg, rng)
    memory = twin.encode(text)

    s = twin.init_decoder_state(B, Tt, memory)
    frame = tf.zeros((B, cfg.n_mel_channels))           # go frame
    mels_tf, gates_tf, aligns_tf = [], [], []
    for t in range(T):
        mel_t, gate_t, w_t = twin.decode_step(twin.prenet(frame), s)
        mels_tf.append(mel_t)
        gates_tf.append(gate_t)
        aligns_tf.append(w_t)
        frame = mel_t                   # reference: decoder_input = mel_output
    mel_tf = tf.stack(mels_tf, axis=1).numpy()          # [B, T, n_mel] raw
    gate_tf = tf.stack(gates_tf, axis=1).numpy()        # [B, T] bias-0 logits
    align_tf = tf.stack(aligns_tf, axis=1).numpy()      # [B, T, Tt]

    # Solve for a gate bias that splits the batch: random-init logits hover
    # near 0 ≈ sigmoid 0.5, which would stop everything at t=0 (or nothing)
    # and leave the stop branch untested either way. Firing at sigmoid>thr
    # ⟺ logit + bias > logit_thr; put the bias midway between the two
    # sequences' max mid-run logits so exactly one fires before the end.
    logit_thr = float(np.log(cfg.gate_threshold / (1 - cfg.gate_threshold)))
    early_max = gate_tf[:, : T - 2].max(axis=1)   # firing here ⇒ length < T
    full_max = gate_tf.max(axis=1)                # staying under ⇒ length = T
    hi = int(np.argmax(early_max))                # the sequence made to fire
    lo = 1 - hi                                   # the sequence kept running
    assert early_max[hi] > full_max[lo], "seed must separate the sequences"
    bias = logit_thr - float(early_max[hi] + full_max[lo]) / 2.0
    twin.gate_l.bias.assign(np.asarray([bias], np.float32))
    gate_tf = gate_tf + bias

    # finished/emit masking, post-hoc (mirrors Tacotron2.infer's scan)
    fired = gate_tf > logit_thr                          # [B, T]
    # finished BEFORE step t = any fire at steps < t
    finished = np.concatenate(
        [np.zeros((B, 1), bool), np.cumsum(fired, axis=1)[:, :-1] > 0], axis=1)
    run_mask = ~finished                                 # [B, T]
    lengths_tf = run_mask.sum(axis=1)
    mel_tf = mel_tf * run_mask[..., None]                # emit 0 when frozen
    mel_post_tf = twin.postnet(mel_tf)
    # mask like Tacotron2._mask_outputs (mask_padding defaults True)
    mel_post_tf *= run_mask[..., None]
    gate_tf = np.where(run_mask, gate_tf, 1e3)

    # the solved bias must actually split the batch: one early stop, one not
    assert 0 < lengths_tf.min() < T
    assert lengths_tf.max() == T

    # ---- transplant & run the model's own free-running scan ---------------
    model = Tacotron2(cfg)
    variables = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        jnp.asarray(text), jnp.asarray(input_lens),
        jnp.zeros((B, T, cfg.n_mel_channels))))(jax.random.PRNGKey(0))

    out = model.apply(
        twin.transplant(variables), jnp.asarray(text),
        jnp.asarray(input_lens), max_decoder_steps=T,
        prenet_deterministic=True, method=Tacotron2.infer)

    np.testing.assert_array_equal(_np(out.mel_lengths), lengths_tf)
    np.testing.assert_allclose(_np(out.alignments), align_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(out.gate_out), gate_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(out.mel_out), mel_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(out.mel_out_postnet), mel_post_tf,
                               atol=BUDGET)


# --------------------------------------------------------------------------
# Flowtron — the reference's complete parts (encoders + mixture head)
# --------------------------------------------------------------------------

def _tf_masked_instance_norm(x, key_mask, gamma, beta, eps=1e-5):
    """Affine instance norm over valid timesteps (upstream torch
    ``InstanceNorm1d(affine=True)``; the reference's tfa
    ``InstanceNormalization`` normalizes the padded buffer unmasked)."""
    m = tf.cast(key_mask, tf.float32)[..., None]
    n = tf.maximum(tf.reduce_sum(m, axis=1, keepdims=True), 1.0)
    mean = tf.reduce_sum(x * m, axis=1, keepdims=True) / n
    var = tf.reduce_sum(tf.square(x - mean) * m, axis=1, keepdims=True) / n
    return (x - mean) * tf.math.rsqrt(var + eps) * gamma + beta


def test_flowtron_partial_oracle_parity():
    """Weight-transplant twins for the parts the reference Flowtron
    actually completed (``Flowtron_TF/flowtron.py:95-276``): the text
    Encoder, MelEncoder, and the learned GaussianMixture head. The twins
    follow the upstream NVIDIA semantics the reference was porting —
    affine InstanceNorm, masked BiLSTM, mean/log-var heads sized
    n_mel·n_components — where the port is garbled (double relu inside
    ConvNorm, ``reduce_mean(axis=0)`` after the LSTM, a log-var head too
    small for its own reshape, one norm instance shared across layers)."""
    import dataclasses

    from neuraltexttospeech_tpu.models.flowtron import (
        FlowtronConfig, GaussianMixture, MelEncoder, TextEmbeddingEncoder,
    )

    cfg = dataclasses.replace(
        FlowtronConfig(), n_text=40, n_text_dim=32,
        mel_encoder_n_hidden=24, n_mel_channels=12,
        n_components=4, fixed_gaussian=False)
    rng = np.random.default_rng(17)
    L = tf.keras.layers

    # ---- text Encoder (flowtron.py:227-276) -----------------------------
    B, T = 2, 11
    text = rng.integers(1, cfg.n_text, (B, T)).astype(np.int32)
    text[1, 7:] = 0
    lens = np.asarray([T, 7], np.int32)
    key_mask = np.arange(T)[None, :] < lens[:, None]

    emb = tf.Variable(tf.random.normal([cfg.n_text, cfg.n_text_dim]) * 0.3)
    convs = [L.Conv1D(cfg.n_text_dim, 5, padding="same") for _ in range(3)]
    ins = [(tf.Variable(tf.random.normal([cfg.n_text_dim]) * 0.2 + 1.0),
            tf.Variable(tf.random.normal([cfg.n_text_dim]) * 0.1))
           for _ in range(3)]
    bilstm = L.Bidirectional(
        L.LSTM(cfg.n_text_dim // 2, return_sequences=True))

    x = tf.gather(emb, tf.constant(text))
    for conv, (g, b) in zip(convs, ins):
        x = tf.nn.relu(_tf_masked_instance_norm(conv(x), key_mask, g, b))
    mem_tf = bilstm(x, mask=tf.constant(key_mask)).numpy()
    mem_tf = mem_tf * key_mask[..., None]

    enc_params = {
        "Embed_0": {"embedding": jnp.asarray(emb.numpy())},
        **{f"Conv_{i}": _conv_p(c) for i, c in enumerate(convs)},
        **{f"MaskedInstanceNorm_{i}": {
            "scale": jnp.asarray(g.numpy()), "bias": jnp.asarray(b.numpy())}
           for i, (g, b) in enumerate(ins)},
        "OptimizedLSTMCell_0": _keras_lstm_to_flax(bilstm.forward_layer.cell),
        "OptimizedLSTMCell_1": _keras_lstm_to_flax(
            bilstm.backward_layer.cell),
    }
    mem_j = _np(TextEmbeddingEncoder(cfg).apply(
        {"params": enc_params}, jnp.asarray(text), jnp.asarray(lens)))
    np.testing.assert_allclose(mem_j, mem_tf, atol=BUDGET)

    # ---- MelEncoder (flowtron.py:161-211) -------------------------------
    Tm, H = 14, cfg.mel_encoder_n_hidden
    mel = rng.standard_normal((B, Tm, cfg.n_mel_channels)).astype(np.float32)
    mel_lens = np.asarray([Tm, 9], np.int32)
    mel_mask = np.arange(Tm)[None, :] < mel_lens[:, None]

    m_convs = [L.Conv1D(H, 3, padding="same") for _ in range(2)]
    m_ins = [(tf.Variable(tf.random.normal([H]) * 0.2 + 1.0),
              tf.Variable(tf.random.normal([H]) * 0.1)) for _ in range(2)]
    m_bilstm = L.Bidirectional(L.LSTM(H // 2, return_sequences=True))
    m_dense = L.Dense(H)

    y = tf.constant(mel)
    for conv, (g, b) in zip(m_convs, m_ins):
        y = tf.nn.relu(_tf_masked_instance_norm(conv(y), mel_mask, g, b))
    y = m_bilstm(y, mask=tf.constant(mel_mask))
    mm = tf.cast(mel_mask, tf.float32)[..., None]
    pooled = tf.reduce_sum(y * mm, axis=1) / tf.reduce_sum(mm, axis=1)
    memb_tf = m_dense(pooled).numpy()

    mel_params = {
        **{f"Conv_{i}": _conv_p(c) for i, c in enumerate(m_convs)},
        **{f"MaskedInstanceNorm_{i}": {
            "scale": jnp.asarray(g.numpy()), "bias": jnp.asarray(b.numpy())}
           for i, (g, b) in enumerate(m_ins)},
        "OptimizedLSTMCell_0": _keras_lstm_to_flax(
            m_bilstm.forward_layer.cell),
        "OptimizedLSTMCell_1": _keras_lstm_to_flax(
            m_bilstm.backward_layer.cell),
        "Dense_0": _dense_p(m_dense),
    }
    memb_j = _np(MelEncoder(cfg).apply(
        {"params": mel_params}, jnp.asarray(mel), jnp.asarray(mel_lens)))
    np.testing.assert_allclose(memb_j, memb_tf, atol=BUDGET)

    # ---- GaussianMixture head, learned variant (flowtron.py:95-158) -----
    prob_l = L.Dense(cfg.n_components)
    mean_l = L.Dense(cfg.n_mel_channels * cfg.n_components)
    lv_l = L.Dense(cfg.n_mel_channels * cfg.n_components)

    inp = tf.constant(memb_tf)
    prob_tf = tf.nn.softmax(prob_l(inp), axis=1).numpy()
    mean_tf = tf.reshape(
        mean_l(inp), [B, cfg.n_mel_channels, cfg.n_components]).numpy()
    lv_tf = tf.reshape(
        lv_l(inp), [B, cfg.n_mel_channels, cfg.n_components]).numpy()

    gm_params = {"Dense_0": _dense_p(prob_l), "Dense_1": _dense_p(mean_l),
                 "Dense_2": _dense_p(lv_l)}
    mean_j, lv_j, prob_j = GaussianMixture(cfg).apply(
        {"params": gm_params}, jnp.asarray(memb_tf))
    np.testing.assert_allclose(_np(prob_j), prob_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(mean_j), mean_tf, atol=BUDGET)
    np.testing.assert_allclose(_np(lv_j), lv_tf, atol=BUDGET)

    # ---- fixed variant: scaled axis-aligned means, unit variance --------
    fixed_cfg = dataclasses.replace(cfg, fixed_gaussian=True, mean_scale=3.0)
    gm = GaussianMixture(fixed_cfg)
    fparams = jax.jit(lambda k: gm.init(k, jnp.asarray(memb_tf)))(
        jax.random.PRNGKey(0))
    mean_f, lv_f, prob_f = gm.apply(fparams, jnp.asarray(memb_tf))
    assert mean_f.shape == (1, cfg.n_mel_channels, cfg.n_components)
    np.testing.assert_allclose(
        _np(mean_f[0]), np.eye(cfg.n_mel_channels)[:, :cfg.n_components] * 3.0)
    np.testing.assert_allclose(_np(lv_f), 0.0)
    np.testing.assert_allclose(_np(prob_f).sum(-1), 1.0, atol=1e-6)
