"""HiFi-GAN inference CLI: mel ``.npy`` (or wav re-synthesis) → wav.

Counterpart of the reference's vocoder inference path
(``Grad-TTS_TF/hifi-gan/hifiGAN.py`` inference generator; the reference's
own ``HiFiGAN_TF`` has save but no load, ``gan.py:206-211``).

Usage:
  python hifigan/inference.py --checkpoint out/hifigan/checkpoints \
      -i mels_dir_or_filelist -o out/wavs [--config v1]
"""

import argparse
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--config", default="v1")
    p.add_argument("-i", "--input", required=True,
                   help="dir of *_mel.npy / *.npy mels, or a wav filelist "
                        "for copy-synthesis")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute (recommended TPU serving config; "
                        "params stay f32 from the checkpoint)")
    return p.parse_args(argv)


def load_generator(ckpt_dir: str, config_spec: str = None, amp: bool = False):
    """Restore (Generator, params) from a GAN training checkpoint.

    With no ``config_spec``, prefers the run dir's ``model_config.json``
    (written by ``hifigan/train.py``), falling back to v1. ``amp=True``
    sets the compute dtype to bf16 (the checkpoint's f32 params are cast
    per-op by flax) — the recommended TPU serving configuration."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from hifigan.train import load_config
    from neuraltexttospeech_tpu.models.hifigan import Generator
    from neuraltexttospeech_tpu.models.hifigan_gan import init_hifigan
    from neuraltexttospeech_tpu.models.registry import (
        find_model_config, load_model_config,
    )
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer

    if config_spec is None and find_model_config(ckpt_dir):
        _, config = load_model_config(ckpt_dir)
    else:
        config = load_config(config_spec or "v1")
    if amp:
        config = dataclasses.replace(config, dtype=jnp.bfloat16)
    state = init_hifigan(config, jax.random.PRNGKey(0))
    state = Checkpointer(ckpt_dir).restore(state)
    return Generator(config), {"params": state.gen_params}


def _iter_mels(input_path: str, config):
    from neuraltexttospeech_tpu.audio.stft import STFTConfig, mel_spectrogram
    from neuraltexttospeech_tpu.data.filelist import (
        load_filepaths_and_text, load_wav,
    )

    path = pathlib.Path(input_path)
    if path.is_dir():
        for f in sorted(path.glob("*.npy")):
            yield f.stem, np.load(f)
    else:
        import jax.numpy as jnp

        cfg = STFTConfig(
            filter_length=config.n_fft, frame_length=config.win_size,
            frame_step=config.hop_size, n_mel_channels=config.num_mels,
            sampling_rate=config.sampling_rate, mel_fmin=config.fmin,
            mel_fmax=config.fmax,
        )
        pad = (config.n_fft - config.hop_size) // 2
        for fields in load_filepaths_and_text(input_path):
            audio, _ = load_wav(fields[0], config.sampling_rate)
            padded = jnp.pad(jnp.asarray(audio), (pad, pad), mode="reflect")
            yield pathlib.Path(fields[0]).stem, np.asarray(
                mel_spectrogram(padded, cfg))


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from hifigan.train import load_config
    from neuraltexttospeech_tpu.data.filelist import save_wav

    config = load_config(args.config)
    gen, gen_params = load_generator(args.checkpoint, args.config,
                                     amp=args.amp)
    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    apply = jax.jit(
        lambda p, m: gen.apply(p, m).astype(jnp.float32))
    for name, mel in _iter_mels(args.input, config):
        audio = np.asarray(apply(gen_params, jnp.asarray(mel)[None])[0, :, 0])
        save_wav(str(out_dir / f"{name}.wav"), audio, config.sampling_rate)
        print(f"{name}: {len(audio)/config.sampling_rate:.2f}s")


if __name__ == "__main__":
    main()
