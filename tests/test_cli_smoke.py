"""End-to-end CLI smoke tests: synthetic LJSpeech-like data → per-model
train entry points run a couple of real optimization steps (the public
surface BASELINE.json requires). Tiny configs keep CPU runtime bounded."""

import json
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from neuraltexttospeech_tpu.data.filelist import save_wav

pytestmark = pytest.mark.slow


@pytest.fixture()
def corpus(tmp_path):
    """4 synthetic wavs + pipe-separated filelist."""
    rng = np.random.default_rng(0)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    lines = []
    texts = ["hello world", "testing speech", "one two three", "the end"]
    for i, text in enumerate(texts):
        p = wav_dir / f"utt{i}.wav"
        t = np.arange(16384) / 22050.0
        audio = 0.3 * np.sin(2 * np.pi * (120 + 30 * i) * t) \
            + 0.05 * rng.standard_normal(16384)
        save_wav(str(p), audio.astype(np.float32), 22050)
        lines.append(f"{p}|{text}")
    fl = tmp_path / "train.txt"
    fl.write_text("\n".join(lines) + "\n")
    return tmp_path, str(fl)


@pytest.fixture()
def phrases(tmp_path):
    p = tmp_path / "phrases.txt"
    p.write_text("hello world\n")
    return str(p)


@pytest.fixture()
def fs2_corpus(tmp_path):
    """Synthetic MFA-preprocessed dir matching fastspeech2/train.FS2Dataset's
    contract: train.txt ``utt|text`` + per-utterance mel/duration/pitch/energy
    npys with sum(duration) == mel length."""
    from neuraltexttospeech_tpu.text.processing import TextProcessing

    tp = TextProcessing("english_basic", ["english_cleaners"], p_arpabet=1.0)
    root = tmp_path / "preprocessed"
    root.mkdir()
    rng = np.random.default_rng(1)
    lines = []
    for i, text in enumerate(["hello world", "testing speech",
                              "one two three", "the end"]):
        utt = f"utt{i}"
        n_text = len(tp.encode_text(text))
        dur = rng.integers(1, 5, n_text).astype(np.float32)
        n_mel = int(dur.sum())
        np.save(root / f"{utt}_mel.npy",
                rng.standard_normal((n_mel, 80)).astype(np.float32))
        np.save(root / f"{utt}_duration.npy", dur)
        np.save(root / f"{utt}_pitch.npy",
                rng.standard_normal(n_text).astype(np.float32))
        np.save(root / f"{utt}_energy.npy",
                rng.standard_normal(n_text).astype(np.float32))
        lines.append(f"{utt}|{text}")
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    return str(root)


def test_fastpitch_train_cli(corpus):
    tmp, fl = corpus
    from fastpitch.train import main

    main([
        "-o", str(tmp / "out_fp"), "-d", str(tmp / "feats"),
        "--training-files", fl, "--epochs", "1", "-bs", "2",
        "--steps-per-epoch", "2",
        "--symbols-embedding-dim", "64", "--in-fft-n-layers", "1",
        "--out-fft-n-layers", "1", "--p-arpabet", "0.0",
    ])
    ckpts = list((tmp / "out_fp" / "checkpoints").iterdir())
    assert ckpts, "no checkpoint written"


def test_fastpitch_checkpoint_restores_for_inference(corpus):
    """Train-1-step checkpoint → restore via the inference loader → synth."""
    tmp, fl = corpus
    import jax
    from fastpitch.train import main

    out = tmp / "out_fp2"
    main([
        "-o", str(out), "-d", str(tmp / "feats2"),
        "--training-files", fl, "--epochs", "1", "-bs", "2",
        "--steps-per-epoch", "1",
        "--symbols-embedding-dim", "64", "--in-fft-n-layers", "1",
        "--out-fft-n-layers", "1", "--p-arpabet", "0.0",
    ])

    from fastpitch.inference import load_fastpitch
    from neuraltexttospeech_tpu.models.fastpitch import (
        FastPitch, FastPitchConfig,
    )

    cfg = FastPitchConfig(symbols_embedding_dim=64, in_fft_n_layers=1,
                          out_fft_n_layers=1)
    model, params = load_fastpitch(str(out / "checkpoints"), cfg)
    import jax.numpy as jnp

    mel, dec_lens, _, _ = model.apply(
        params, jnp.ones((1, 8), jnp.int32), jnp.full((1,), 8, jnp.int32),
        max_mel_len=32, method=FastPitch.infer)
    assert mel.shape == (1, 32, 80)

    # single-file export artifact round trip (tools/export.py)
    from flax import serialization
    from tools.export import main as export_main

    out_file = tmp / "fp.msgpack"
    export_main(["--model", "FastPitch",
                 "--checkpoint", str(out / "checkpoints"),
                 "-o", str(out_file)])
    restored = serialization.from_bytes(
        jax.tree.map(lambda x: x, params["params"]), out_file.read_bytes())
    mel2, *_ = model.apply(
        {"params": restored}, jnp.ones((1, 8), jnp.int32),
        jnp.full((1,), 8, jnp.int32), max_mel_len=32,
        method=FastPitch.infer)
    import numpy as np
    np.testing.assert_allclose(np.asarray(mel2), np.asarray(mel), atol=1e-5)

    # real CLI main with bf16 serving (--amp): self-describing config +
    # f32 params under a bf16 compute dtype
    from fastpitch.inference import main as infer_main

    phr = tmp / "phrases_fp.txt"
    phr.write_text("hello world\n")
    mel_dir = tmp / "mels_fp_amp"
    infer_main(["--checkpoint", str(out / "checkpoints"), "-i", str(phr),
                "-o", str(mel_dir), "--max-mel-len", "64", "--amp",
                "--p-arpabet", "0.0"])
    assert list(mel_dir.glob("*_mel.npy"))

    # batched serving loop: 5 phrases of varying length through -bs 2 —
    # multiple length-sorted batches, a padded final batch, and output
    # files indexed by original input order
    phr5 = tmp / "phrases_fp5.txt"
    phr5.write_text("one\nthis is a much longer utterance for bucketing\n"
                    "two\nmid length line\nthree\n")
    mel_dir5 = tmp / "mels_fp_batched"
    infer_main(["--checkpoint", str(out / "checkpoints"), "-i", str(phr5),
                "-o", str(mel_dir5), "--max-mel-len", "64", "-bs", "2",
                "--p-arpabet", "0.0"])
    assert sorted(p.name for p in mel_dir5.glob("*_mel.npy")) == [
        f"utt_{i:04d}_mel.npy" for i in range(5)]


def test_text2wav_vocoder_batched_cli(corpus, tmp_path):
    """Full text→wav through the batched serving loop: tiny FastPitch +
    tiny HiFi-GAN checkpoints → ``fastpitch/inference.py -bs 2
    --hifigan-checkpoint`` — covers the bucket-padded vocoder lane
    (128-frame rounding, per-row wav trim) that the mel-only tests skip."""
    tmp, fl = corpus

    from fastpitch.train import main as fp_train

    fp_out = tmp / "out_fp_voc"
    fp_train([
        "-o", str(fp_out), "-d", str(tmp / "feats_voc"),
        "--training-files", fl, "--epochs", "1", "-bs", "2",
        "--steps-per-epoch", "1",
        "--symbols-embedding-dim", "64", "--in-fft-n-layers", "1",
        "--out-fft-n-layers", "1", "--p-arpabet", "0.0",
    ])

    cfg = {
        "resblock": "2", "upsample_rates": [8, 8, 4],
        "upsample_kernel_sizes": [16, 16, 8],
        "upsample_initial_channel": 16,
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 2]],
        "segment_size": 4096, "num_mels": 80, "n_fft": 1024,
        "hop_size": 256, "win_size": 1024, "sampling_rate": 22050,
        "fmin": 0, "fmax": 8000, "fmax_for_loss": None,
        "learning_rate": 0.0002, "adam_b1": 0.8, "adam_b2": 0.99,
        "lr_decay": 0.999, "seed": 1234, "batch_size": 2,
    }
    cfg_path = tmp / "config_voc.json"
    cfg_path.write_text(json.dumps(cfg))
    from hifigan.train import main as hg_train

    hg_out = tmp / "out_hg_voc"
    hg_train([
        "--config", str(cfg_path), "-o", str(hg_out),
        "--training-files", fl, "--epochs", "1", "--batch-size", "2",
        "--steps-per-epoch", "1", "--checkpoint-every-steps", "1",
    ])

    from fastpitch.inference import main as infer_main

    phr = tmp / "phrases_voc.txt"
    phr.write_text("hello there\nthis is a longer phrase for the bucket\n"
                   "bye\n")
    wav_dir = tmp / "wavs_voc"
    infer_main(["--checkpoint", str(fp_out / "checkpoints"), "-i", str(phr),
                "-o", str(wav_dir), "--max-mel-len", "64", "-bs", "2",
                "--amp", "--p-arpabet", "0.0",
                "--hifigan-checkpoint", str(hg_out / "checkpoints")])
    for i in range(3):
        mel = np.load(wav_dir / f"utt_{i:04d}_mel.npy")
        from scipy.io import wavfile
        sr, wav = wavfile.read(wav_dir / f"utt_{i:04d}.wav")
        # per-row wav trimmed to that row's frame count × hop
        assert sr == 22050 and wav.shape[0] == mel.shape[0] * 256


def test_diffwave_train_cli(corpus):
    tmp, fl = corpus
    from diffwave.train import main

    main([
        "-o", str(tmp / "out_dw"), "--training-files", fl,
        "--validation-files", fl,
        "--epochs", "1", "--batch-size", "2", "--steps-per-epoch", "2",
        "--residual-layers", "2", "--residual-channels", "8",
        "--crop-mel-frames", "16", "--amp",
    ])
    assert list((tmp / "out_dw" / "checkpoints").iterdir())


def test_gradtts_train_cli(corpus):
    tmp, fl = corpus
    from gradtts.train import main

    main([
        "-o", str(tmp / "out_gt"), "-d", str(tmp / "feats_gt"),
        "--training-files", fl, "--validation-files", fl,
        "--epochs", "1", "-bs", "2", "--amp",
        "--steps-per-epoch", "1", "--out-size", "16",
        "--n-enc-layers", "1", "--n-enc-channels", "32", "--dec-dim", "8",
    ])
    assert list((tmp / "out_gt" / "checkpoints").iterdir())


def test_talknet_asr_cli(corpus):
    tmp, fl = corpus
    from talknet.train import main

    main([
        "--model", "asr", "-o", str(tmp / "out_asr"),
        "-d", fl, "--epochs", "1", "-bs", "2", "--steps-per-epoch", "1",
    ])
    assert list((tmp / "out_asr" / "checkpoints").iterdir())


def test_tacotron2_train_infer_cli(corpus, phrases):
    """Train→checkpoint→inference round trip through the real CLIs."""
    tmp, fl = corpus
    from tacotron2.train import main as train_main

    out = tmp / "out_t2"
    tiny = ["symbols_embedding_dim=32", "encoder_embedding_dim=32",
            "encoder_n_convolutions=1", "attention_rnn_dim=32",
            "decoder_rnn_dim=32", "attention_dim=16", "prenet_dim=16",
            "attention_location_n_filters=4",
            "attention_location_kernel_size=7",
            "postnet_embedding_dim=32", "postnet_n_convolutions=2"]
    argv = ["-o", str(out), "-d", str(tmp / "feats_t2"),
            "--training-files", fl, "--epochs", "1", "-bs", "2",
            "--steps-per-epoch", "1", "--amp"]
    for o in tiny:
        argv += ["--override", o]
    train_main(argv)
    assert (out / "model_config.json").exists()

    from tacotron2.inference import main as infer_main

    mel_dir = tmp / "mels_t2"
    infer_main(["--checkpoint", str(out / "checkpoints"), "-i", phrases,
                "-o", str(mel_dir), "--max-decoder-steps", "16", "--amp"])
    assert list(mel_dir.glob("*_mel.npy"))


def test_flowtron_train_infer_cli(corpus, phrases):
    tmp, fl = corpus
    cfg = {"model_config": {
        "n_text_dim": 32, "n_attn_channels": 16, "n_hidden": 24,
        "mel_encoder_n_hidden": 16, "n_speaker_dim": 8}}
    cfg_path = tmp / "flowtron_tiny.json"
    cfg_path.write_text(json.dumps(cfg))
    from flowtron.train import main as train_main

    out = tmp / "out_fl"
    train_main(["-c", str(cfg_path), "-o", str(out),
                "-d", str(tmp / "feats_fl"), "--training-files", fl,
                "--validation-files", fl,
                "--epochs", "1", "-bs", "2", "--steps-per-epoch", "1",
                "--amp"])
    assert (out / "model_config.json").exists()

    from flowtron.inference import main as infer_main

    mel_dir = tmp / "mels_fl"
    infer_main(["--checkpoint", str(out / "checkpoints"), "-i", phrases,
                "-o", str(mel_dir), "--n-frames", "16", "--amp"])
    assert list(mel_dir.glob("*_mel.npy"))


def test_fastspeech2_train_infer_cli(fs2_corpus, phrases, tmp_path):
    from fastspeech2.train import main as train_main

    out = tmp_path / "out_fs2"
    tiny = ["encoder_layer=1", "decoder_layer=1", "encoder_hidden=32",
            "decoder_hidden=32", "conv_filter_size=64",
            "variance_filter_size=16", "n_bins=16", "postnet_dim=32",
            "postnet_layers=2"]
    argv = ["-o", str(out), "-d", fs2_corpus, "--epochs", "1", "-bs", "2",
            "--steps-per-epoch", "1", "--validation-split", "train",
            "--amp"]
    for o in tiny:
        argv += ["--override", o]
    train_main(argv)
    assert (out / "model_config.json").exists()

    from fastspeech2.inference import main as infer_main

    mel_dir = tmp_path / "mels_fs2"
    infer_main(["--checkpoint", str(out / "checkpoints"), "-i", phrases,
                "-o", str(mel_dir), "--max-mel-len", "64", "--amp"])
    assert list(mel_dir.glob("*_mel.npy"))


def test_talknet_tts_heads_train_infer_cli(fs2_corpus, phrases, tmp_path):
    """duration → pitch → spectrogram heads through talknet/train.py, then
    the full text→mel pipeline through talknet/inference.py."""
    from talknet.train import main as train_main

    tiny = ["emb_dim=32", "backbone.module_repeat=1",
            "backbone.block_params=[[16, 5], [16, 5]]",
            "backbone.initial_filters=16", "backbone.initial_kernel=5",
            "backbone.penultimate_filters=16", "backbone.penultimate_kernel=5",
            "backbone.final_filters=32"]
    outs = {}
    for head in ("duration", "pitch", "spectrogram"):
        out = tmp_path / f"out_tn_{head}"
        argv = ["--model", head, "-o", str(out), "-d", fs2_corpus,
                "--epochs", "1", "-bs", "2", "--steps-per-epoch", "1",
                "--amp"]
        for o in tiny:
            argv += ["--override", o]
        train_main(argv)
        assert (out / "model_config.json").exists()
        outs[head] = str(out)

    from talknet.inference import main as infer_main

    mel_dir = tmp_path / "mels_tn"
    infer_main(["--duration-checkpoint", outs["duration"],
                "--pitch-checkpoint", outs["pitch"],
                "--spectrogram-checkpoint", outs["spectrogram"],
                "-i", phrases, "-o", str(mel_dir), "--max-mel-len", "64",
                "--amp"])
    assert list(mel_dir.glob("*_mel.npy"))


def test_gradtts_infer_cli(corpus, phrases):
    """gradtts train → inference CLI round trip (self-describing config)."""
    tmp, fl = corpus
    from gradtts.train import main as train_main

    out = tmp / "out_gt2"
    train_main([
        "-o", str(out), "-d", str(tmp / "feats_gt2"),
        "--training-files", fl, "--epochs", "1", "-bs", "2",
        "--steps-per-epoch", "1", "--out-size", "16",
        "--n-enc-layers", "1", "--n-enc-channels", "32", "--dec-dim", "8",
    ])
    from gradtts.inference import main as infer_main

    mel_dir = tmp / "mels_gt"
    infer_main(["--checkpoint", str(out / "checkpoints"), "-i", phrases,
                "-o", str(mel_dir), "--timesteps", "2", "--amp"])
    assert list(mel_dir.glob("*_mel.npy"))


def test_diffwave_infer_cli(corpus):
    """diffwave train → inference CLI round trip over a mel npy dir."""
    tmp, fl = corpus
    from diffwave.train import main as train_main

    out = tmp / "out_dw2"
    train_main([
        "-o", str(out), "--training-files", fl,
        "--epochs", "1", "--batch-size", "2", "--steps-per-epoch", "1",
        "--residual-layers", "2", "--residual-channels", "8",
        "--crop-mel-frames", "16",
    ])
    mel_in = tmp / "dw_mels"
    mel_in.mkdir()
    rng = np.random.default_rng(7)
    np.save(mel_in / "a_mel.npy",
            rng.standard_normal((8, 80)).astype(np.float32))

    from diffwave.inference import main as infer_main

    wav_dir = tmp / "dw_wavs"
    infer_main(["--checkpoint", str(out / "checkpoints"), "-i", str(mel_in),
                "-o", str(wav_dir), "--fast", "--chunked", "--amp"])
    assert list(wav_dir.glob("*.wav"))


def test_finetune_mel_dump_workflow(corpus):
    """Vocoder fine-tuning loop: FastPitch teacher-forced mel dump
    (tools/dump_mels.py) feeds hifigan/train.py --fine-tuning-mel-dir
    (reference: ``HiFiGAN_TF/data.py`` fine-tuning branch consumes
    acoustic-model-generated ``.npy`` mels)."""
    tmp, fl = corpus
    from fastpitch.train import main as fp_train

    out = tmp / "out_fp3"
    fp_train(["-o", str(out), "-d", str(tmp / "feats3"),
              "--training-files", fl, "--epochs", "1", "-bs", "2",
              "--steps-per-epoch", "1",
              "--symbols-embedding-dim", "64", "--in-fft-n-layers", "1",
              "--out-fft-n-layers", "1", "--p-arpabet", "0.0"])

    from tools.dump_mels import main as dump_main

    gen_mels = tmp / "gen_mels"
    dump_main(["--model", "fastpitch",
               "--checkpoint", str(out / "checkpoints"),
               "-d", str(tmp / "feats3"), "--training-files", fl,
               "-o", str(gen_mels), "--batch-size", "4"])
    dumped = sorted(gen_mels.glob("*_mel.npy"))
    assert len(dumped) == 4
    mel = np.load(dumped[0])
    assert mel.ndim == 2 and mel.shape[1] == 80 and np.isfinite(mel).all()
    # teacher-forced output is trimmed to the true per-utterance frame
    # count (matches the cached ground-truth mel, not the padded batch)
    gt = np.load(tmp / "feats3" / "utt0_mel.npy")
    assert mel.shape[0] == gt.shape[0]

    cfg = {
        "resblock": "2", "upsample_rates": [8, 8, 4],
        "upsample_kernel_sizes": [16, 16, 8],
        "upsample_initial_channel": 16,
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 2]],
        "segment_size": 4096, "num_mels": 80, "n_fft": 1024,
        "hop_size": 256, "win_size": 1024, "sampling_rate": 22050,
        "fmin": 0, "fmax": 8000, "fmax_for_loss": None,
        "learning_rate": 0.0002, "adam_b1": 0.8, "adam_b2": 0.99,
        "lr_decay": 0.999, "seed": 1234, "batch_size": 2,
    }
    cfg_path = tmp / "config_ft.json"
    cfg_path.write_text(json.dumps(cfg))
    from hifigan.train import main

    main([
        "--config", str(cfg_path), "-o", str(tmp / "out_hg_ft"),
        "--training-files", fl, "--epochs", "1", "--batch-size", "2",
        "--steps-per-epoch", "1", "--checkpoint-every-steps", "1",
        "--fine-tuning-mel-dir", str(gen_mels),
    ])
    assert list((tmp / "out_hg_ft" / "checkpoints").iterdir())


def test_hifigan_train_cli(corpus):
    tmp, fl = corpus
    cfg = {
        "resblock": "2", "upsample_rates": [8, 8, 4],
        "upsample_kernel_sizes": [16, 16, 8],
        "upsample_initial_channel": 16,
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 2]],
        "segment_size": 4096, "num_mels": 80, "n_fft": 1024,
        "hop_size": 256, "win_size": 1024, "sampling_rate": 22050,
        "fmin": 0, "fmax": 8000, "fmax_for_loss": None,
        "learning_rate": 0.0002, "adam_b1": 0.8, "adam_b2": 0.99,
        "lr_decay": 0.999, "seed": 1234, "batch_size": 2,
    }
    cfg_path = tmp / "config_tiny.json"
    cfg_path.write_text(json.dumps(cfg))
    from hifigan.train import main

    main([
        "--config", str(cfg_path), "-o", str(tmp / "out_hg"),
        "--training-files", fl, "--epochs", "1", "--batch-size", "2",
        "--steps-per-epoch", "2", "--checkpoint-every-steps", "1", "--amp",
    ])
    assert list((tmp / "out_hg" / "checkpoints").iterdir())

    # vocoder restore path: GAN checkpoint -> inference generator
    import jax
    import jax.numpy as jnp
    from hifigan.inference import load_generator

    gen, gen_params = load_generator(str(tmp / "out_hg" / "checkpoints"),
                                     str(cfg_path), amp=True)
    audio = gen.apply(gen_params, jnp.zeros((1, 8, 80)))
    assert audio.shape == (1, 8 * 256, 1)
    assert bool(jnp.isfinite(audio).all())


def test_align_from_fastpitch_workflow(corpus):
    """No-MFA alignment path: a trained FastPitch checkpoint produces the
    FS2-preprocessed contract (tools/align_from_fastpitch.py) that
    fastspeech2/train.py consumes directly."""
    tmp, fl = corpus
    from fastpitch.train import main as fp_train

    out = tmp / "out_fp4"
    fp_train(["-o", str(out), "-d", str(tmp / "feats4"),
              "--training-files", fl, "--epochs", "1", "-bs", "2",
              "--steps-per-epoch", "1",
              "--symbols-embedding-dim", "64", "--in-fft-n-layers", "1",
              "--out-fft-n-layers", "1", "--p-arpabet", "0.0"])

    from tools.align_from_fastpitch import main as align_main

    aligned = tmp / "aligned"
    align_main(["--checkpoint", str(out / "checkpoints"),
                "-d", str(tmp / "feats4"), "--training-files", fl,
                "-o", str(aligned), "--batch-size", "4"])
    assert (aligned / "train.txt").exists()
    durs = sorted(aligned.glob("*_duration.npy"))
    assert len(durs) == 4
    d = np.load(durs[0])
    mel = np.load(str(durs[0]).replace("_duration", "_mel"))
    # MAS durations sum exactly to the utterance's frame count
    assert int(d.sum()) == mel.shape[0]
    pitch = np.load(str(durs[0]).replace("_duration", "_pitch"))
    assert pitch.shape == d.shape

    from fastspeech2.train import main as fs2_train

    fs2_out = tmp / "out_fs2a"
    argv = ["-o", str(fs2_out), "-d", str(aligned), "--epochs", "1",
            "-bs", "2", "--steps-per-epoch", "1"]
    for o in ["encoder_layer=1", "decoder_layer=1", "encoder_hidden=32",
              "decoder_hidden=32", "conv_filter_size=64",
              "variance_filter_size=16", "n_bins=16", "postnet_dim=32",
              "postnet_layers=2"]:
        argv += ["--override", o]
    fs2_train(argv)
    assert list((fs2_out / "checkpoints").iterdir())
