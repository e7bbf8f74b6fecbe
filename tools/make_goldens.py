"""Generate committed golden regression fixtures for all 8 model families.

The reference anchors its numerics with committed trained checkpoints
(``/root/reference/DiffWave_TF/diffwave_logs/checkpoints/``, SURVEY §4);
this repo's equivalent: for each family, a tiny config is initialized with
fixed seeds, briefly trained (a few deterministic Adam steps on synthetic
data — real losses, so forward+backward+optimizer numerics are all baked
into the weights), and the resulting parameters plus the outputs of one
fixed forward pass are committed under ``tests/fixtures/golden/``.

``tests/test_golden_regression.py`` restores each fixture and asserts the
recomputed outputs match at 1e-5 — any refactor that silently changes
numerics (or the parameter tree structure) fails loudly. Regenerate
deliberately with ``python tools/make_goldens.py`` after an *intentional*
numerics change, and say so in the commit message.

Everything runs on the CPU backend for cross-environment determinism.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

GOLDEN_DIR = pathlib.Path(__file__).resolve().parents[1] / (
    "tests/fixtures/golden")


def _train(loss_fn, params, steps=3, lr=1e-3):
    """A few deterministic full train steps (value_and_grad + Adam)."""
    import jax
    import optax

    tx = optax.adam(lr)
    opt = tx.init(params)
    step = jax.jit(lambda p, o: _one(tx, loss_fn, p, o))
    for _ in range(steps):
        params, opt = step(params, opt)
    return params


def _one(tx, loss_fn, params, opt):
    import jax
    import optax

    _, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt, params)
    return optax.apply_updates(params, updates), opt


def fastpitch(train=True):
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.fastpitch import (
        FastPitch, FastPitchConfig,
    )
    from neuraltexttospeech_tpu.models.fastpitch_loss import fastpitch_loss

    cfg = FastPitchConfig(
        n_symbols=40, symbols_embedding_dim=64,
        in_fft_n_layers=1, in_fft_d_head=16, in_fft_n_heads=2,
        in_fft_conv1d_filter_size=128,
        out_fft_n_layers=1, out_fft_d_head=16, out_fft_n_heads=2,
        out_fft_conv1d_filter_size=128,
        dur_predictor_filter_size=32, pitch_predictor_filter_size=32,
        energy_predictor_filter_size=32)
    model = FastPitch(cfg)
    rng = np.random.default_rng(100)
    B, TT, TM = 2, 13, 40
    text = jnp.asarray(rng.integers(1, 40, (B, TT)), jnp.int32)
    ilens = jnp.asarray([TT, 9], jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, TM, 80)), jnp.float32)
    mlens = jnp.asarray([TM, 30], jnp.int32)
    pitch = jnp.asarray(rng.standard_normal((B, 1, TM)), jnp.float32)
    energy = jnp.abs(jnp.asarray(rng.standard_normal((B, TM)), jnp.float32))
    prior = jnp.asarray(
        np.abs(rng.standard_normal((B, TM, TT))) + 0.1, jnp.float32)

    args = (text, ilens, mel, mlens, pitch, energy, None, prior)
    variables = model.init(jax.random.PRNGKey(100), *args)

    def loss(p):
        out = model.apply(p, *args)
        return fastpitch_loss(out, mel, ilens, mlens)[0]

    if train:
        variables = _train(loss, variables)

    def fwd(v):
        out = model.apply(v, *args)
        return {"mel_out": out.mel_out, "dur_pred": out.dur_pred,
                "pitch_pred": out.pitch_pred, "attn_soft": out.attn_soft}

    return variables, fwd


def hifigan(train=True):
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.hifigan import Generator, HiFiGANConfig

    cfg = HiFiGANConfig(
        resblock="2", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), n_fft=64, hop_size=16, win_size=64,
        segment_size=256, num_mels=8)
    gen = Generator(cfg)
    rng = np.random.default_rng(101)
    mel = jnp.asarray(rng.standard_normal((2, 10, 8)), jnp.float32)
    target = jnp.asarray(
        rng.standard_normal((2, 160, 1)) * 0.1, jnp.float32)
    variables = gen.init(jax.random.PRNGKey(101), mel)

    def loss(p):
        return jnp.mean(jnp.abs(gen.apply(p, mel) - target))

    if train:
        variables = _train(loss, variables)

    def fwd(v):
        return {"audio": gen.apply(v, mel)}

    return variables, fwd


def diffwave(train=True):
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.diffwave import (
        DiffWave, DiffWaveConfig, diffwave_loss,
    )

    cfg = DiffWaveConfig(residual_layers=4, residual_channels=8,
                         dilation_cycle_length=2, crop_mel_frames=4)
    model = DiffWave(cfg)
    rng = np.random.default_rng(102)
    B, F = 2, 4
    T = F * cfg.hop_length
    audio = jnp.asarray(rng.standard_normal((B, T)) * 0.1, jnp.float32)
    mel = jnp.asarray(rng.standard_normal((B, F, cfg.n_mels)), jnp.float32)
    t_step = jnp.asarray([3, 17], jnp.int32)
    variables = model.init(jax.random.PRNGKey(102), audio, t_step, mel)

    def loss(p):
        return diffwave_loss(model, p, {"audio": audio, "mel": mel},
                             jax.random.PRNGKey(7))[0]

    if train:
        variables = _train(loss, variables)

    def fwd(v):
        return {"eps": model.apply(v, audio, t_step, mel)}

    return variables, fwd


def tacotron2(train=True):
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.tacotron2 import (
        Tacotron2, Tacotron2Config,
    )
    from neuraltexttospeech_tpu.models.tacotron2_train import (
        init_tacotron2, tacotron2_train_step,
    )

    cfg = Tacotron2Config(
        n_symbols=40, symbols_embedding_dim=32, encoder_embedding_dim=32,
        decoder_rnn_dim=48, attention_rnn_dim=48, attention_dim=16,
        attention_location_n_filters=4, attention_location_kernel_size=7,
        prenet_dim=16, postnet_embedding_dim=24, postnet_n_convolutions=3,
        max_decoder_steps=24)
    rng = np.random.default_rng(103)
    B, TT, TM = 2, 9, 20
    batch = {
        "text": jnp.asarray(rng.integers(1, 40, (B, TT)), jnp.int32),
        "input_lens": jnp.asarray([TT, 6], jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, TM, 80)), jnp.float32),
        "mel_lens": jnp.asarray([TM, 14], jnp.int32),
    }
    state = init_tacotron2(cfg, jax.random.PRNGKey(103))
    if train:
        for _ in range(3):
            state, _ = tacotron2_train_step(cfg, state, batch,
                                            jax.random.PRNGKey(9))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    model = Tacotron2(cfg)

    def fwd(v):
        out = model.apply(
            v, batch["text"], batch["input_lens"], batch["mel"],
            batch["mel_lens"], train=False, prenet_deterministic=True)
        return {"mel_out": out.mel_out, "mel_post": out.mel_out_postnet,
                "gate": out.gate_out, "align": out.alignments}

    return variables, fwd


def gradtts(train=True):
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.gradtts import GradTTS, GradTTSConfig

    cfg = GradTTSConfig(
        n_symbols=40, n_enc_channels=32, filter_channels=64,
        filter_channels_dp=32, n_enc_layers=2, dec_dim=8, out_size=16)
    model = GradTTS(cfg)
    rng = np.random.default_rng(104)
    B, TT, TM = 2, 11, 32
    x = jnp.asarray(rng.integers(1, 40, (B, TT)), jnp.int32)
    xl = jnp.asarray([TT, 7], jnp.int32)
    y = jnp.asarray(rng.standard_normal((B, TM, 80)), jnp.float32)
    yl = jnp.asarray([TM, 24], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(104),
         "dropout": jax.random.PRNGKey(1)},
        x, xl, y, yl, jax.random.PRNGKey(2), out_size=cfg.out_size,
        method=GradTTS.compute_loss)

    def loss(p):
        d, pr, df = model.apply(
            p, x, xl, y, yl, jax.random.PRNGKey(3), out_size=cfg.out_size,
            method=GradTTS.compute_loss, rngs={"dropout": jax.random.PRNGKey(4)})
        return d + pr + df

    if train:
        variables = _train(loss, variables)
    noise = jnp.asarray(rng.standard_normal((B, cfg.n_feats, 32)),
                        jnp.float32)

    def fwd(v):
        enc, dec, attn, ylen = model.apply(
            v, x, xl, n_timesteps=2, max_mel_len=32, noise=noise)
        return {"enc": enc, "dec": dec, "attn": attn, "ylen": ylen}

    return variables, fwd


def flowtron(train=True):
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.flowtron import (
        Flowtron, FlowtronConfig, flowtron_loss,
    )

    cfg = FlowtronConfig(
        n_text=40, n_text_dim=32, n_flows=2, n_mel_channels=8,
        n_attn_channels=16, n_hidden=24, mel_encoder_n_hidden=16,
        n_speaker_dim=8)
    model = Flowtron(cfg)
    rng = np.random.default_rng(105)
    B, TT, TM = 2, 7, 12
    text = jnp.asarray(rng.integers(1, 40, (B, TT)), jnp.int32)
    tlens = jnp.asarray([TT, 5], jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, TM, 8)), jnp.float32)
    mlens = jnp.asarray([TM, 9], jnp.int32)
    spk = jnp.zeros((B,), jnp.int32)
    gate_tgt = (jnp.arange(TM)[None, :] >= (mlens[:, None] - 1)).astype(
        jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(105),
         "dropout": jax.random.PRNGKey(1)},
        mel, spk, text, tlens, mlens)

    def loss(p):
        out = model.apply(p, mel, spk, text, tlens, mlens)
        return flowtron_loss(out, mlens, gate_tgt)[0]

    if train:
        variables = _train(loss, variables)

    def fwd(v):
        out = model.apply(v, mel, spk, text, tlens, mlens)
        return {"z": out.z, "log_s_sum": out.log_s_sum,
                "gate": out.gate_out, "attn0": out.attns[0]}

    return variables, fwd


def fastspeech2(train=True):
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.fastspeech2 import (
        FastSpeech2, FastSpeech2Config, fastspeech2_loss,
    )

    cfg = FastSpeech2Config(
        n_symbols=40, encoder_layer=1, decoder_layer=1, encoder_hidden=32,
        decoder_hidden=32, conv_filter_size=64, variance_filter_size=16,
        n_bins=16, postnet_dim=24, postnet_layers=2)
    model = FastSpeech2(cfg)
    rng = np.random.default_rng(106)
    B, TT, TM = 2, 8, 24
    text_np = rng.integers(1, 40, (B, TT)).astype(np.int32)
    text_np[1, 5:] = 0
    text = jnp.asarray(text_np)
    ilens = jnp.asarray([TT, 5], jnp.int32)
    dur = np.zeros((B, TT), np.float32)
    dur[0, :TT] = 3
    dur[1, :5] = 4
    dur = jnp.asarray(dur)
    pitch = jnp.asarray(rng.standard_normal((B, TT)), jnp.float32)
    energy = jnp.asarray(rng.standard_normal((B, TT)), jnp.float32)
    mel = jnp.asarray(rng.standard_normal((B, TM, 80)), jnp.float32)
    olens = jnp.asarray([24, 20], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(106),
         "dropout": jax.random.PRNGKey(1)},
        text, ilens, mel_max_len=TM, dur_tgt=dur, pitch_tgt=pitch,
        energy_tgt=energy)

    def loss(p):
        out = model.apply(p, text, ilens, mel_max_len=TM, dur_tgt=dur,
                          pitch_tgt=pitch, energy_tgt=energy)
        return fastspeech2_loss(out, mel, dur, pitch, energy, ilens,
                                olens)[0]

    if train:
        variables = _train(loss, variables)

    def fwd(v):
        out = model.apply(v, text, ilens, mel_max_len=TM, dur_tgt=dur,
                          pitch_tgt=pitch, energy_tgt=energy)
        return {"mel_out": out.mel_out, "mel_postnet": out.mel_postnet,
                "log_dur_pred": out.log_dur_pred}

    return variables, fwd


def talknet(train=True):
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.talknet import (
        QuartzNetConfig, SpectrogramModel, TalkNet2Config,
    )

    bb = QuartzNetConfig(
        block_repeat=1, module_repeat=2,
        block_params=((16, 5), (16, 7)),
        initial_filters=16, initial_kernel=5,
        penultimate_filters=16, penultimate_kernel=7, final_filters=32)
    cfg = TalkNet2Config(n_symbols=30, emb_dim=16, n_mel_channels=8,
                         backbone=bb)
    model = SpectrogramModel(cfg)
    rng = np.random.default_rng(107)
    text = jnp.asarray(rng.integers(1, 30, (2, 6)), jnp.int32)
    durs = jnp.asarray(np.full((2, 6), 4.0, np.float32))
    f0 = jnp.asarray(rng.standard_normal((2, 24)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((2, 24, 8)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(107), text, durs, f0, 24)

    def loss(p):
        return jnp.mean(jnp.abs(model.apply(p, text, durs, f0, 24) - target))

    if train:
        variables = _train(loss, variables)

    def fwd(v):
        return {"mel": model.apply(v, text, durs, f0, 24)}

    return variables, fwd


def text2wav(train=True):
    """Composed FastPitch→HiFi-GAN golden — the BASELINE.json headline path
    (and the reference's Grad-TTS→HiFi-GAN composition pattern,
    ``Grad-TTS_TF/hifi-gan/hifiGAN.py``): real text front-end → FastPitch
    ``infer`` → frame-bucketed mel → generator → per-utterance trim. The
    per-family goldens cannot see a regression in the wiring BETWEEN the
    halves (mel layout, dec_lens handling, bucket arithmetic, trim); this
    one fails on any of them."""
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.fastpitch import (
        FastPitch, FastPitchConfig,
    )
    from neuraltexttospeech_tpu.models.hifigan import Generator, HiFiGANConfig
    from neuraltexttospeech_tpu.text.processing import TextProcessing
    from neuraltexttospeech_tpu.utils.serving import round_up

    fp_cfg = FastPitchConfig(    # default n_symbols: real english_basic set
        symbols_embedding_dim=64,
        in_fft_n_layers=1, in_fft_d_head=16, in_fft_n_heads=2,
        in_fft_conv1d_filter_size=128,
        out_fft_n_layers=1, out_fft_d_head=16, out_fft_n_heads=2,
        out_fft_conv1d_filter_size=128,
        dur_predictor_filter_size=32, pitch_predictor_filter_size=32,
        energy_predictor_filter_size=32)
    hg_cfg = HiFiGANConfig(      # num_mels=80 matches fp_cfg.n_mel_channels
        resblock="2", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), n_fft=64, hop_size=16, win_size=64,
        segment_size=256, num_mels=80)
    hop = int(np.prod(hg_cfg.upsample_rates))
    fp = FastPitch(fp_cfg)
    gen = Generator(hg_cfg)

    tp = TextProcessing("english_basic", ["english_cleaners_v2"],
                        p_arpabet=0.0)
    phrase = "The quick brown fox."
    text = jnp.asarray(np.asarray(tp.encode_text(phrase), np.int32))[None]
    lens = jnp.asarray([text.shape[1]], jnp.int32)
    MAX_MEL = 128

    fp_vars = fp.init(jax.random.PRNGKey(108), text, lens,
                      max_mel_len=MAX_MEL, method=FastPitch.infer)
    gen_vars = gen.init(jax.random.PRNGKey(109),
                        jnp.zeros((1, MAX_MEL, fp_cfg.n_mel_channels)))

    if train:
        rng = np.random.default_rng(110)
        mel_tgt = jnp.asarray(
            rng.standard_normal((1, MAX_MEL, 80)), jnp.float32)
        wav_tgt = jnp.asarray(
            rng.standard_normal((1, MAX_MEL * hop, 1)) * 0.1, jnp.float32)
        fp_vars = _train(lambda p: jnp.mean(jnp.square(
            fp.apply(p, text, lens, max_mel_len=MAX_MEL,
                     method=FastPitch.infer)[0] - mel_tgt)), fp_vars)
        gen_vars = _train(lambda p: jnp.mean(jnp.abs(
            gen.apply(p, mel_tgt) - wav_tgt)), gen_vars)
    variables = {"fastpitch": fp_vars, "hifigan": gen_vars}

    def fwd(v):
        # exact serving wiring (fastpitch/inference.py:131-172): infer →
        # f32 host boundary → round dec_lens up to the vocoder bucket →
        # vocode → trim to dec_lens frames / dec_lens·hop samples
        mel, dec_lens = fp.apply(v["fastpitch"], text, lens,
                                 max_mel_len=MAX_MEL,
                                 method=FastPitch.infer)[:2]
        mel = mel.astype(jnp.float32)
        n = int(np.asarray(dec_lens)[0])
        M = min(round_up(n, 32), MAX_MEL)
        audio = gen.apply(v["hifigan"], mel[:, :M]).astype(jnp.float32)
        return {"mel": mel[:, :n], "audio": audio[:, : n * hop, 0],
                "dec_lens": dec_lens}

    return variables, fwd


def gradtts2wav(train=True):
    """Composed Grad-TTS→HiFi-GAN golden — the reference's one SHIPPED
    composition (``Grad-TTS_TF/hifi-gan/hifiGAN.py``: reverse-SDE mel →
    generator → wav). Anchors the wiring the CLI uses
    (``gradtts/inference.py:128-142``): fixed-noise reverse SDE → f32 host
    boundary → round the max ``ylen`` up to the vocoder bucket → vocode →
    per-utterance trim to ``ylen`` frames / ``ylen``·hop samples. The
    per-family goldens can't see a regression between the halves (mel
    axis order, ylen handling, bucket arithmetic, trim); this one fails
    on any of them."""
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.gradtts import GradTTS, GradTTSConfig
    from neuraltexttospeech_tpu.models.hifigan import Generator, HiFiGANConfig
    from neuraltexttospeech_tpu.utils.serving import round_up

    gt_cfg = GradTTSConfig(
        n_symbols=40, n_enc_channels=32, filter_channels=64,
        filter_channels_dp=32, n_enc_layers=2, dec_dim=8, out_size=16)
    hg_cfg = HiFiGANConfig(      # num_mels=80 matches gt_cfg.n_feats
        resblock="2", upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), n_fft=64, hop_size=16, win_size=64,
        segment_size=256, num_mels=80)
    hop = int(np.prod(hg_cfg.upsample_rates))
    model = GradTTS(gt_cfg)
    gen = Generator(hg_cfg)

    rng = np.random.default_rng(111)
    B, TT, TM, MAX_MEL = 2, 11, 32, 32
    x = jnp.asarray(rng.integers(1, 40, (B, TT)), jnp.int32)
    xl = jnp.asarray([TT, 7], jnp.int32)
    y = jnp.asarray(rng.standard_normal((B, TM, 80)), jnp.float32)
    yl = jnp.asarray([TM, 24], jnp.int32)
    gt_vars = model.init(
        {"params": jax.random.PRNGKey(111), "dropout": jax.random.PRNGKey(1)},
        x, xl, y, yl, jax.random.PRNGKey(2), out_size=gt_cfg.out_size,
        method=GradTTS.compute_loss)
    gen_vars = gen.init(jax.random.PRNGKey(112),
                        jnp.zeros((B, MAX_MEL, gt_cfg.n_feats)))
    # drawn BEFORE the train-only branch so train=False replays the same
    # rng stream and reproduces the committed noise
    noise = jnp.asarray(rng.standard_normal((B, gt_cfg.n_feats, MAX_MEL)),
                        jnp.float32)

    if train:
        wav_tgt = jnp.asarray(
            rng.standard_normal((B, MAX_MEL * hop, 1)) * 0.1, jnp.float32)

        def gt_loss(p):
            d, pr, df = model.apply(
                p, x, xl, y, yl, jax.random.PRNGKey(3),
                out_size=gt_cfg.out_size, method=GradTTS.compute_loss,
                rngs={"dropout": jax.random.PRNGKey(4)})
            return d + pr + df

        gt_vars = _train(gt_loss, gt_vars)
        gen_vars = _train(lambda p: jnp.mean(jnp.abs(
            gen.apply(p, y) - wav_tgt)), gen_vars)
    variables = {"gradtts": gt_vars, "hifigan": gen_vars}

    def fwd(v):
        _, dec, _, ylen = model.apply(
            v["gradtts"], x, xl, n_timesteps=2, max_mel_len=MAX_MEL,
            noise=noise)
        dec = dec.astype(jnp.float32)
        ylen_np = np.asarray(ylen)
        M = min(round_up(int(ylen_np.max()), 16), MAX_MEL)
        audio = gen.apply(v["hifigan"], dec[:, :M]).astype(jnp.float32)
        out = {"dec": dec, "ylen": ylen}
        for r in range(B):
            n = int(ylen_np[r])
            out[f"audio_{r}"] = audio[r, : n * hop, 0]
        return out

    return variables, fwd


FAMILIES = {
    "fastpitch": fastpitch,
    "hifigan": hifigan,
    "diffwave": diffwave,
    "tacotron2": tacotron2,
    "gradtts": gradtts,
    "flowtron": flowtron,
    "fastspeech2": fastspeech2,
    "talknet": talknet,
    "text2wav": text2wav,
    "gradtts2wav": gradtts2wav,
}


def main():
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    from flax import serialization

    only = set(sys.argv[1:])           # no args = regenerate every family
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    for name, build in FAMILIES.items():
        if only and name not in only:
            continue
        variables, fwd = build()
        out = {k: np.asarray(v) for k, v in fwd(variables).items()}
        blob = serialization.to_bytes(variables)
        (GOLDEN_DIR / f"{name}.msgpack").write_bytes(blob)
        np.savez(GOLDEN_DIR / f"{name}_golden.npz", **out)
        n_params = sum(
            p.size for p in jax.tree.leaves(variables)
        )
        print(f"{name}: {len(blob)/1024:.0f} KB weights, "
              f"{n_params/1e3:.0f}k params, outputs: "
              f"{sorted(out)}")


if __name__ == "__main__":
    main()
