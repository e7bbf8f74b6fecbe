"""FastSpeech 2 inference CLI: text → mel with pitch/energy/duration
controls (→ wav with --hifigan-checkpoint).

Usage:
  python fastspeech2/inference.py --checkpoint out/fs2/checkpoints \
      -i phrases.txt -o out/mels --pitch-control 1.0 --duration-control 1.0
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--pitch-control", type=float, default=1.0)
    p.add_argument("--energy-control", type=float, default=1.0)
    p.add_argument("--duration-control", type=float, default=1.0)
    p.add_argument("--max-mel-len", type=int, default=1024)
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--sampling-rate", type=int, default=22050)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.filelist import save_wav
    from neuraltexttospeech_tpu.models.fastspeech2 import (
        FastSpeech2, FastSpeech2Config,
    )
    from neuraltexttospeech_tpu.text.processing import TextProcessing
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer
    from neuraltexttospeech_tpu.train.harness import build_state
    from neuraltexttospeech_tpu.train.state import OptimizerConfig

    from neuraltexttospeech_tpu.models.registry import (
        find_model_config, load_frontend_config, load_model_config,
    )

    if find_model_config(args.checkpoint):
        _, config = load_model_config(args.checkpoint)
    else:
        config = FastSpeech2Config()
    model = FastSpeech2(config)
    fe = load_frontend_config(args.checkpoint, default={}) or {}
    tp = TextProcessing(fe.get("symbol_set", "english_basic"),
                        fe.get("text_cleaners", ["english_cleaners"]),
                        p_arpabet=fe.get("p_arpabet", 1.0))

    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        jnp.zeros((1, 8), jnp.int32), jnp.full((1,), 8, jnp.int32),
        mel_max_len=16))(jax.random.PRNGKey(0))
    state = build_state(params, OptimizerConfig())
    state = Checkpointer(args.checkpoint).restore(state)
    params = state.params

    vocoder = None
    if args.hifigan_checkpoint:
        from hifigan.inference import load_generator
        vocoder = load_generator(args.hifigan_checkpoint)

    @jax.jit
    def synth(params, text, lens):
        return model.apply(params, text, lens, mel_max_len=args.max_mel_len,
                           p_control=args.pitch_control,
                           e_control=args.energy_control,
                           d_control=args.duration_control)

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    lines = [l.strip() for l in open(args.input, encoding="utf-8") if l.strip()]
    for i, line in enumerate(lines):
        ids = np.asarray(tp.encode_text(line), np.int32)[None]
        out = synth(params, jnp.asarray(ids),
                    jnp.asarray([ids.shape[1]], np.int32))
        n = int(out.dec_lens[0])
        mel = out.mel_postnet if out.mel_postnet is not None else out.mel_out
        np.save(out_dir / f"utt_{i:04d}_mel.npy", np.asarray(mel[0, :n]))
        if vocoder is not None:
            gen, gen_params = vocoder
            audio = np.asarray(jax.jit(gen.apply)(
                gen_params, mel[:, :n])[0, :, 0])
            save_wav(str(out_dir / f"utt_{i:04d}.wav"), audio,
                     args.sampling_rate)
        print(f"[{i}] {n} frames: {line[:60]}")


if __name__ == "__main__":
    main()
