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


def test_diffwave_train_cli(corpus):
    tmp, fl = corpus
    from diffwave.train import main

    main([
        "-o", str(tmp / "out_dw"), "--training-files", fl,
        "--epochs", "1", "--batch-size", "2", "--steps-per-epoch", "2",
        "--residual-layers", "2", "--residual-channels", "8",
        "--crop-mel-frames", "16",
    ])
    assert list((tmp / "out_dw" / "checkpoints").iterdir())


def test_gradtts_train_cli(corpus):
    tmp, fl = corpus
    from gradtts.train import main

    main([
        "-o", str(tmp / "out_gt"), "-d", str(tmp / "feats_gt"),
        "--training-files", fl, "--epochs", "1", "-bs", "2",
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
        "--steps-per-epoch", "2", "--checkpoint-every-steps", "1",
    ])
    assert list((tmp / "out_hg" / "checkpoints").iterdir())

    # vocoder restore path: GAN checkpoint -> inference generator
    import jax
    import jax.numpy as jnp
    from hifigan.inference import load_generator

    gen, gen_params = load_generator(str(tmp / "out_hg" / "checkpoints"),
                                     str(cfg_path))
    audio = gen.apply(gen_params, jnp.zeros((1, 8, 80)))
    assert audio.shape == (1, 8 * 256, 1)
    assert bool(jnp.isfinite(audio).all())
