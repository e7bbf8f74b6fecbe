"""Real-data end-to-end validation: overfit on the one real LJSpeech clip.

The container has exactly one real speech fixture —
``/root/reference/AudioProcessing/LJ001-0001.wav`` (22 050 Hz, 9.66 s),
whose transcript ships in ``filelists/ljs_audio_text.txt``. This script is
the closest possible substitute for trained-weights audio validation
without the dataset: drive the REAL public CLIs end-to-end on that clip,

  1. ``fastpitch/prepare_dataset.py``  — mel + YIN pitch + attention prior
  2. ``fastpitch/train.py``            — overfit the acoustic model
  3. ``hifigan/train.py``              — overfit the v1 vocoder
  4. ``fastpitch/inference.py``        — text → mel → wav with both

then score what came out:

  - ``hifigan_resynth_mel_l1``   — vocode the ground-truth mel, re-extract
    log-mel from the generated audio, L1 vs the ground truth (the
    reference's own mel-loss axis, ``HiFiGAN_TF/gan.py:47-52``)
  - ``fastpitch_teacher_mel_l1`` — teacher-aligned FastPitch forward vs the
    ground-truth mel
  - ``e2e_pred_frames``          — free-running text→wav length vs the real
    832 frames (duration model sanity)

Run on the real TPU (takes ~10 min, mostly compiles):
  python tools/overfit_real.py -o out/real_demo
"""

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

WAV = "/root/reference/AudioProcessing/LJ001-0001.wav"
TEXT = ("Printing, in the only sense with which we are at present "
        "concerned, differs from most if not from all the arts and crafts "
        "represented in the Exhibition")


def run_cli(argv):
    print("+", " ".join(argv), flush=True)
    t0 = time.time()
    subprocess.run([sys.executable] + argv, check=True, cwd=str(REPO))
    print(f"  ({time.time() - t0:.0f}s)", flush=True)


def _last_step(ckpt_dir: pathlib.Path) -> int:
    """Highest completed orbax step in ``ckpt_dir`` (tmp dirs are stale
    partial writes from an interrupted run — drop them so orbax doesn't
    refuse to save)."""
    if not ckpt_dir.is_dir():
        return -1
    import shutil
    last = -1
    for d in ckpt_dir.iterdir():
        if "orbax-checkpoint-tmp" in d.name:
            shutil.rmtree(d)
        elif d.name.isdigit():
            last = max(last, int(d.name))
    return last


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--output", default="out/real_demo")
    p.add_argument("--families", default="fastpitch,hifigan",
                   help="comma list from fastpitch,hifigan,gradtts,"
                        "tacotron2,flowtron,fastspeech2,talknet (the last "
                        "two need a trained fastpitch run as the aligner)")
    p.add_argument("--fastpitch-steps", type=int, default=3000)
    p.add_argument("--hifigan-steps", type=int, default=1500)
    p.add_argument("--gradtts-steps", type=int, default=2000)
    p.add_argument("--tacotron2-steps", type=int, default=1200)
    p.add_argument("--flowtron-steps", type=int, default=1200)
    p.add_argument("--fastspeech2-steps", type=int, default=2000)
    p.add_argument("--talknet-steps", type=int, default=800)
    args = p.parse_args(argv)
    families = set(args.families.split(","))

    out = pathlib.Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    filelist = out / "filelist.txt"
    filelist.write_text(f"{WAV}|{TEXT}\n")
    phrases = out / "phrases.txt"
    phrases.write_text(TEXT + "\n")
    feats = out / "feats"

    if "fastpitch" in families and \
            not (feats / "LJ001-0001_prior.npy").exists():
        run_cli(["fastpitch/prepare_dataset.py", "-d", str(feats),
                 "--training-files", str(filelist)])
    if "fastpitch" in families and \
            _last_step(out / "fastpitch" / "checkpoints") < args.fastpitch_steps:
        run_cli(["fastpitch/train.py", "-o", str(out / "fastpitch"),
                 "-d", str(feats), "--training-files", str(filelist),
                 "--epochs", str(args.fastpitch_steps), "-bs", "1",
                 "-lr", "3e-4", "--warmup-steps", "200",
                 "--epochs-per-checkpoint", "1000", "--resume"])
    if "hifigan" in families and \
            _last_step(out / "hifigan" / "checkpoints") < args.hifigan_steps:
        run_cli(["hifigan/train.py", "-o", str(out / "hifigan"),
                 "--training-files", str(filelist), "--config", "v1",
                 "--epochs", str(args.hifigan_steps), "--batch-size", "16",
                 "--steps-per-epoch", "1", "--epochs-per-checkpoint", "1000",
                 "--checkpoint-every-steps", "100000", "--resume"])
    if families >= {"fastpitch", "hifigan"} and \
            not list((out / "wavs").glob("*.wav")):
        run_cli(["fastpitch/inference.py",
                 "--checkpoint", str(out / "fastpitch" / "checkpoints"),
                 "-i", str(phrases), "-o", str(out / "wavs"),
                 "--hifigan-checkpoint",
                 str(out / "hifigan" / "checkpoints")])
    if "gradtts" in families and \
            _last_step(out / "gradtts" / "checkpoints") < args.gradtts_steps:
        run_cli(["gradtts/train.py", "-o", str(out / "gradtts"),
                 "-d", str(feats), "--training-files", str(filelist),
                 "--epochs", str(args.gradtts_steps), "-bs", "1",
                 "--epochs-per-checkpoint", "1000", "--resume"])
    if "tacotron2" in families and \
            _last_step(out / "tacotron2" / "checkpoints") < args.tacotron2_steps:
        run_cli(["tacotron2/train.py", "-o", str(out / "tacotron2"),
                 "-d", str(feats), "--training-files", str(filelist),
                 "--epochs", str(args.tacotron2_steps), "-bs", "1",
                 "--epochs-per-checkpoint", "400", "--resume"])
    if "flowtron" in families and \
            _last_step(out / "flowtron" / "checkpoints") < args.flowtron_steps:
        run_cli(["flowtron/train.py", "-o", str(out / "flowtron"),
                 "-d", str(feats), "--training-files", str(filelist),
                 "--epochs", str(args.flowtron_steps), "-bs", "1",
                 "--epochs-per-checkpoint", "400", "--resume"])
    if "flowtron" in families and \
            not list((out / "flowtron_mels").glob("*_mel.npy")):
        run_cli(["flowtron/inference.py",
                 "--checkpoint", str(out / "flowtron" / "checkpoints"),
                 "-i", str(phrases), "-o", str(out / "flowtron_mels"),
                 "--n-frames", "864", "--sigma", "0.5"])

    # FastSpeech2 / TalkNet need per-token alignments: derive them from the
    # trained FastPitch (MAS durations == the MFA contract).
    aligned = out / "aligned"
    if families & {"fastspeech2", "talknet"} and \
            not (aligned / "train.txt").exists():
        run_cli(["tools/align_from_fastpitch.py",
                 "--checkpoint", str(out / "fastpitch" / "checkpoints"),
                 "-d", str(feats), "--training-files", str(filelist),
                 "-o", str(aligned), "--batch-size", "1"])
    if "fastspeech2" in families and \
            _last_step(out / "fs2" / "checkpoints") < args.fastspeech2_steps:
        run_cli(["fastspeech2/train.py", "-o", str(out / "fs2"),
                 "-d", str(aligned), "--epochs", str(args.fastspeech2_steps),
                 "-bs", "1", "--warmup-steps", "200",
                 "--epochs-per-checkpoint", "1000", "--resume"])
    if "fastspeech2" in families and \
            not list((out / "fs2_mels").glob("*_mel.npy")):
        run_cli(["fastspeech2/inference.py",
                 "--checkpoint", str(out / "fs2" / "checkpoints"),
                 "-i", str(phrases), "-o", str(out / "fs2_mels")])
    if "talknet" in families:
        for head in ("duration", "pitch", "spectrogram"):
            if _last_step(out / f"tn_{head}" / "checkpoints") \
                    < args.talknet_steps:
                run_cli(["talknet/train.py", "--model", head,
                         "-o", str(out / f"tn_{head}"), "-d", str(aligned),
                         "--epochs", str(args.talknet_steps), "-bs", "1",
                         "--epochs-per-checkpoint", "400", "--resume"])
        if not list((out / "tn_mels").glob("*_mel.npy")):
            run_cli(["talknet/inference.py",
                     "--duration-checkpoint", str(out / "tn_duration"),
                     "--pitch-checkpoint", str(out / "tn_pitch"),
                     "--spectrogram-checkpoint", str(out / "tn_spectrogram"),
                     "-i", str(phrases), "-o", str(out / "tn_mels")])

    # ---- scoring --------------------------------------------------------
    import numpy as np
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.audio.stft import STFT
    from neuraltexttospeech_tpu.data.dataset import FastPitchDataset
    from neuraltexttospeech_tpu.data.filelist import load_wav

    audio, sr = load_wav(WAV, 22050)
    stft = STFT()
    gt_mel = np.asarray(stft.mel_spectrogram(jnp.asarray(audio)))
    results = {}
    if (out / "results.json").exists():
        results = json.loads((out / "results.json").read_text())
    results["gt_frames"] = int(gt_mel.shape[0])

    if "hifigan" in families:
        # HiFi-GAN resynthesis from ground-truth mel
        from hifigan.inference import load_generator
        gen, gen_params = load_generator(
            str(out / "hifigan" / "checkpoints"), "v1")
        T = (gt_mel.shape[0] // 32) * 32
        resynth = np.asarray(jax.jit(gen.apply)(
            gen_params, jnp.asarray(gt_mel[None, :T]))[0, :, 0])
        resynth_mel = np.asarray(stft.mel_spectrogram(jnp.asarray(resynth)))
        n = min(resynth_mel.shape[0], T)
        results["hifigan_resynth_mel_l1"] = float(
            np.abs(resynth_mel[:n] - gt_mel[:n]).mean())

    if "fastpitch" in families:
        # FastPitch teacher-aligned forward
        from fastpitch.inference import load_fastpitch
        fp, fp_params = load_fastpitch(str(out / "fastpitch" / "checkpoints"))
        ds = FastPitchDataset(str(feats), str(filelist))
        batch = next(ds.batches(1, shuffle=False, max_batches=1,
                                drop_last=False))
        fwd = fp.apply(
            fp_params, jnp.asarray(batch["text"]),
            jnp.asarray(batch["input_lens"]), jnp.asarray(batch["mel"]),
            jnp.asarray(batch["mel_lens"]), jnp.asarray(batch["pitch"]),
            jnp.asarray(batch["energy"]) if "energy" in batch else None,
            None, jnp.asarray(batch["attn_prior"]))
        mel_out = np.asarray(fwd.mel_out)[0]
        L = int(batch["mel_lens"][0])
        results["fastpitch_teacher_mel_l1"] = float(
            np.abs(mel_out[:L] - np.asarray(batch["mel"])[0, :L]).mean())

    if families >= {"fastpitch", "hifigan"}:
        # free-running end-to-end output
        wavs = sorted((out / "wavs").glob("*.wav"))
        if wavs:
            gen_audio, _ = load_wav(str(wavs[0]), 22050)
            results["e2e_pred_frames"] = int(len(gen_audio) // 256)
            results["e2e_wav"] = str(wavs[0])

    if "gradtts" in families:
        results.update(_score_gradtts(out, feats, filelist))
    if "tacotron2" in families:
        results.update(_score_tacotron2(out, feats, filelist))
    if "flowtron" in families:
        results.update(_score_flowtron(out, feats, filelist))
    if "fastspeech2" in families:
        results.update(_score_fastspeech2(out))
    if "talknet" in families:
        mels = sorted((out / "tn_mels").glob("*_mel.npy"))
        if mels:
            m = np.load(mels[0])
            results["talknet_pred_frames"] = int(m.shape[0])
            results["talknet_mel_finite"] = bool(np.isfinite(m).all())

    print(json.dumps(results, indent=2))
    (out / "results.json").write_text(json.dumps(results, indent=2))
    return results


def _score_gradtts(out, feats, filelist):
    """Losses on the training clip with fixed rng (prior_loss measures the
    aligned encoder fit to the GT mel) + free-running synthesis length."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.dataset import FastPitchDataset
    from neuraltexttospeech_tpu.models.gradtts import GradTTS
    from neuraltexttospeech_tpu.models.registry import load_model_config
    from neuraltexttospeech_tpu.text.processing import intersperse
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer
    from neuraltexttospeech_tpu.train.state import (
        OptimizerConfig, TrainState, make_optimizer,
    )

    _, config = load_model_config(str(out / "gradtts" / "checkpoints"))
    model = GradTTS(config)
    ds = FastPitchDataset(str(feats), str(filelist),
                          text_cleaners=["english_cleaners"], p_arpabet=0.0,
                          with_pitch=False, with_prior=False)
    batch = next(ds.batches(1, shuffle=False, max_batches=1, drop_last=False))
    ids = intersperse(list(batch["text"][0][: int(batch["input_lens"][0])]),
                      148)
    T = ((len(ids) + 15) // 16) * 16
    text = np.zeros((1, T), np.int32)
    text[0, : len(ids)] = ids
    lens = np.asarray([len(ids)], np.int32)

    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        jnp.asarray(text), jnp.asarray(lens), jnp.asarray(batch["mel"]),
        jnp.asarray(batch["mel_lens"]), jax.random.fold_in(k, 2),
        out_size=config.out_size, method=GradTTS.compute_loss))(rng)
    state = TrainState.create(params, make_optimizer(OptimizerConfig()))
    state = Checkpointer(str(out / "gradtts" / "checkpoints")).restore(state)

    dur, prior, diff = model.apply(
        state.params, jnp.asarray(text), jnp.asarray(lens),
        jnp.asarray(batch["mel"]), jnp.asarray(batch["mel_lens"]), rng,
        out_size=config.out_size, method=GradTTS.compute_loss,
        rngs={"dropout": rng})
    res = {"gradtts_dur_loss": float(dur), "gradtts_prior_loss": float(prior),
           "gradtts_diff_loss": float(diff)}

    mel, dec, attn, y_lens = model.apply(
        state.params, jnp.asarray(text), jnp.asarray(lens), 10,
        temperature=1.5, max_mel_len=1024, rng=jax.random.PRNGKey(7))
    res["gradtts_pred_frames"] = int(np.asarray(y_lens)[0])
    return res


def _score_fastspeech2(out):
    """Teacher-forced mel L1 on the aligned clip + free-running length."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fastspeech2.train import FS2Dataset
    from neuraltexttospeech_tpu.models.fastspeech2 import FastSpeech2
    from neuraltexttospeech_tpu.models.registry import load_model_config
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer
    from neuraltexttospeech_tpu.train.harness import build_state
    from neuraltexttospeech_tpu.train.state import OptimizerConfig

    _, config = load_model_config(str(out / "fs2" / "checkpoints"))
    model = FastSpeech2(config)
    ds = FS2Dataset(str(out / "aligned"))
    batch = next(ds.batches(1, shuffle=False, max_batches=1))
    T = batch["mel"].shape[1]
    params = jax.jit(lambda k: model.init(
        k, jnp.asarray(batch["text"]), jnp.asarray(batch["input_lens"]),
        mel_max_len=T, dur_tgt=jnp.asarray(batch["dur"]),
        pitch_tgt=jnp.asarray(batch["pitch"]),
        energy_tgt=jnp.asarray(batch["energy"])))(jax.random.PRNGKey(0))
    state = build_state(params, OptimizerConfig())
    state = Checkpointer(str(out / "fs2" / "checkpoints")).restore(state)

    fwd = model.apply(
        state.params, jnp.asarray(batch["text"]),
        jnp.asarray(batch["input_lens"]), mel_max_len=T,
        dur_tgt=jnp.asarray(batch["dur"]),
        pitch_tgt=jnp.asarray(batch["pitch"]),
        energy_tgt=jnp.asarray(batch["energy"]))
    mel = np.asarray(fwd.mel_postnet if fwd.mel_postnet is not None
                     else fwd.mel_out)[0]
    L = int(batch["mel_lens"][0])
    res = {"fastspeech2_teacher_mel_l1": float(
        np.abs(mel[:L] - np.asarray(batch["mel"])[0, :L]).mean())}
    mels = sorted((out / "fs2_mels").glob("*_mel.npy"))
    if mels:
        res["fastspeech2_pred_frames"] = int(np.load(mels[0]).shape[0])
    return res


def _score_flowtron(out, feats, filelist):
    """Flow NLL on the training clip with restored params + the gate-trimmed
    free-running synthesis length from the inference CLI output."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.dataset import FastPitchDataset
    from neuraltexttospeech_tpu.models.flowtron import (
        Flowtron, flowtron_loss,
    )
    from neuraltexttospeech_tpu.models.registry import load_model_config
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer
    from neuraltexttospeech_tpu.train.harness import build_state
    from neuraltexttospeech_tpu.train.state import OptimizerConfig

    _, config = load_model_config(str(out / "flowtron" / "checkpoints"))
    model = Flowtron(config)
    mel0 = jnp.zeros((1, 8, config.n_mel_channels))
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        mel0, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8), jnp.int32),
        jnp.full((1,), 8, jnp.int32), jnp.full((1,), 8, jnp.int32)))(
        jax.random.PRNGKey(0))
    state = build_state(params, OptimizerConfig())
    state = Checkpointer(str(out / "flowtron" / "checkpoints")).restore(state)

    ds = FastPitchDataset(str(feats), str(filelist),
                          text_cleaners=["english_cleaners"], p_arpabet=0.0,
                          with_pitch=False, with_prior=False)
    batch = next(ds.batches(1, shuffle=False, max_batches=1, drop_last=False))
    T = batch["mel"].shape[1]
    gate_tgt = (np.arange(T)[None, :]
                >= (batch["mel_lens"][:, None] - 1)).astype(np.float32)
    fwd = model.apply(
        state.params, jnp.asarray(batch["mel"]),
        jnp.asarray(batch["speaker"]), jnp.asarray(batch["text"]),
        jnp.asarray(batch["input_lens"]), jnp.asarray(batch["mel_lens"]),
        rngs={"dropout": jax.random.PRNGKey(3)})
    loss, meta = flowtron_loss(fwd, jnp.asarray(batch["mel_lens"]),
                               jnp.asarray(gate_tgt))
    res = {"flowtron_nll": float(loss)}
    mels = sorted((out / "flowtron_mels").glob("*_mel.npy"))
    if mels:
        m = np.load(mels[0])
        res["flowtron_pred_frames"] = int(m.shape[0])
        res["flowtron_mel_finite"] = bool(np.isfinite(m).all())
    return res


def _score_tacotron2(out, feats, filelist):
    """Teacher-forced mel L1 + gate-stopped free-running length."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.dataset import FastPitchDataset
    from neuraltexttospeech_tpu.models.registry import load_model_config
    from neuraltexttospeech_tpu.models.tacotron2 import Tacotron2
    from neuraltexttospeech_tpu.models.tacotron2_train import init_tacotron2
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer

    _, config = load_model_config(str(out / "tacotron2" / "checkpoints"))
    state = init_tacotron2(config, jax.random.PRNGKey(0))
    state = Checkpointer(str(out / "tacotron2" / "checkpoints")).restore(state)
    model = Tacotron2(config)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ds = FastPitchDataset(str(feats), str(filelist),
                          text_cleaners=["english_cleaners"], p_arpabet=0.0,
                          with_pitch=False, with_prior=False)
    batch = next(ds.batches(1, shuffle=False, max_batches=1, drop_last=False))
    fwd = model.apply(
        variables, jnp.asarray(batch["text"]), jnp.asarray(batch["input_lens"]),
        jnp.asarray(batch["mel"]), jnp.asarray(batch["mel_lens"]),
        rngs={"dropout": jax.random.PRNGKey(3)})
    L = int(batch["mel_lens"][0])
    mel_post = np.asarray(fwd.mel_out_postnet)[0]
    res = {"tacotron2_teacher_mel_l1": float(
        np.abs(mel_post[:L] - np.asarray(batch["mel"])[0, :L]).mean())}

    inf = model.apply(
        variables, jnp.asarray(batch["text"]), jnp.asarray(batch["input_lens"]),
        method=Tacotron2.infer, rngs={"dropout": jax.random.PRNGKey(5)})
    res["tacotron2_gate_stop_frame"] = int(np.asarray(inf.mel_lengths)[0])
    return res


if __name__ == "__main__":
    main()
