"""DiffWave inference CLI: mel ``.npy`` → wav via the scanned reverse
process; ``--fast`` uses the 6-step aligned schedule.

Mirrors ``DiffWave_TF/inference.py`` (``predict`` / ``main``), including
``--chunked`` slice-wise synthesis at the trained crop size
(``predict_by_slice``, ``inference.py:14-62``).

Usage:
  python diffwave/inference.py --checkpoint out/diffwave/checkpoints \
      -i mels_dir -o out/wavs --fast
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("-i", "--input", required=True, help="dir of mel .npy files")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--fast", action="store_true", help="fast sampling (6 steps)")
    p.add_argument("--chunked", action="store_true",
                   help="synthesize in crop-size slices (reference "
                        "predict_by_slice)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute (recommended TPU serving config; "
                        "checkpoint params stay f32)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.filelist import save_wav
    from neuraltexttospeech_tpu.models.diffwave import (
        DiffWave, DiffWaveConfig, reverse_sample,
    )
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer

    from neuraltexttospeech_tpu.models.registry import (
        find_model_config, load_model_config,
    )

    if find_model_config(args.checkpoint):
        _, config = load_model_config(args.checkpoint)
    else:
        config = DiffWaveConfig()
    if args.amp:
        import dataclasses
        config = dataclasses.replace(config, dtype=jnp.bfloat16)
    model = DiffWave(config)
    # TrainState.params is the full variables dict ({"params": ...});
    # restore it directly instead of rebuilding the training optimizer chain.
    params = Checkpointer(args.checkpoint).restore_params()

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    sample = jax.jit(lambda p, m, k: reverse_sample(
        model, p, k, m, fast_sampling=args.fast).astype(jnp.float32))

    for i, f in enumerate(sorted(pathlib.Path(args.input).glob("*.npy"))):
        mel = np.load(f)
        if mel.ndim == 2:
            mel = mel[None]
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        if args.chunked:
            chunks = []
            crop = config.crop_mel_frames
            for s in range(0, mel.shape[1], crop):
                piece = mel[:, s : s + crop]
                if piece.shape[1] < crop:
                    piece = np.pad(piece, ((0, 0), (0, crop - piece.shape[1]),
                                           (0, 0)))
                chunks.append(np.asarray(sample(
                    params, jnp.asarray(piece), jax.random.fold_in(key, s))))
            audio = np.concatenate(chunks, axis=1)[:, : mel.shape[1] *
                                                   config.hop_length]
        else:
            audio = np.asarray(sample(params, jnp.asarray(mel), key))
        save_wav(str(out_dir / f"{f.stem}.wav"), audio[0], config.sample_rate)
        print(f"{f.stem}: {audio.shape[1]/config.sample_rate:.2f}s")


if __name__ == "__main__":
    main()
