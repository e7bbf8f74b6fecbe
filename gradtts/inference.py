"""Grad-TTS inference CLI: text → mel via N reverse-SDE steps (→ wav with
--hifigan-checkpoint), with RTF reporting like the reference
(``Grad-TTS_TF/inference.py:76-87``).

Usage:
  python gradtts/inference.py --checkpoint out/gradtts/checkpoints \
      -i phrases.txt -o out/mels --timesteps 10
"""

import argparse
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--timesteps", type=int, default=10)
    p.add_argument("--temperature", type=float, default=1.5)
    p.add_argument("--length-scale", type=float, default=1.0)
    p.add_argument("--stoc", action="store_true")
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute for model + vocoder (recommended TPU "
                        "serving config; checkpoint params stay f32)")
    p.add_argument("-bs", "--batch-size", type=int, default=8,
                   help="utterances per device batch; inputs are length-"
                        "sorted and padded to text-length buckets so the "
                        "whole run compiles O(distinct buckets) programs, "
                        "not O(utterances)")
    p.add_argument("--max-mel-len", type=int, default=1000)
    p.add_argument("--sampling-rate", type=int, default=22050)
    p.add_argument("--hop-length", type=int, default=256)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.filelist import save_wav
    from neuraltexttospeech_tpu.models.gradtts import (
        GradTTS, GradTTSConfig, fix_len_compatibility,
    )
    from neuraltexttospeech_tpu.text.processing import (
        TextProcessing, intersperse,
    )
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer
    from neuraltexttospeech_tpu.train.harness import build_state
    from neuraltexttospeech_tpu.train.state import OptimizerConfig

    from neuraltexttospeech_tpu.models.registry import (
        find_model_config, load_model_config,
    )

    if find_model_config(args.checkpoint):
        _, config = load_model_config(args.checkpoint)
    else:
        config = GradTTSConfig()
    if args.amp:
        import dataclasses
        config = dataclasses.replace(config, dtype=jnp.bfloat16)
    model = GradTTS(config)
    tp = TextProcessing("english_basic", ["english_cleaners"], p_arpabet=1.0)
    blank_id = config.n_symbols - 1

    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        jnp.zeros((1, 16), jnp.int32), jnp.full((1,), 16, jnp.int32),
        jnp.zeros((1, 32, config.n_feats)), jnp.full((1,), 32, jnp.int32),
        jax.random.fold_in(k, 2), out_size=None,
        method=GradTTS.compute_loss))(jax.random.PRNGKey(0))
    state = build_state(params, OptimizerConfig())
    state = Checkpointer(args.checkpoint).restore(state)
    params = state.params

    vocoder = None
    if args.hifigan_checkpoint:
        from hifigan.inference import load_generator
        vocoder = load_generator(args.hifigan_checkpoint, amp=args.amp)

    max_len = fix_len_compatibility(args.max_mel_len)

    @jax.jit
    def synth(params, text, lens, key):
        enc, dec, attn, ylen = model.apply(
            params, text, lens, args.timesteps,
            temperature=args.temperature, stoc=args.stoc,
            length_scale=args.length_scale,
            max_mel_len=max_len, rng=key)
        # host boundary: mels cross back as f32 whatever the compute dtype
        return enc, dec.astype(jnp.float32), attn, ylen

    vocode = None
    if vocoder is not None:
        gen, gen_params = vocoder
        vocode = jax.jit(lambda p, m: gen.apply(p, m).astype(jnp.float32))

    from neuraltexttospeech_tpu.utils.serving import (
        round_up, serving_sharding, text_batches,
    )

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    lines = [l.strip() for l in open(args.input, encoding="utf-8") if l.strip()]

    # Batched serving loop: text padded to 16-token buckets, vocoder input
    # to 128-frame buckets — O(distinct buckets) compiles for the whole
    # run; with >1 visible devices the batch dim is sharded over all of
    # them (SPMD serving).
    put, replicate, batch_size = serving_sharding(args.batch_size)
    params = replicate(params)
    if vocode is not None:
        gen_params = replicate(gen_params)
    encoded = [np.asarray(intersperse(tp.encode_text(l), blank_id), np.int32)
               for l in lines]
    for b, (idxs, text, lens) in enumerate(
            text_batches(encoded, batch_size)):
        t0 = time.perf_counter()
        _, dec, _, ylen = synth(params, put(text), put(lens),
                                jax.random.PRNGKey(b))
        ylen = np.asarray(ylen)   # device→host fetch waits for the batch
        t = time.perf_counter() - t0
        # batch RTF like the reference's per-utterance report
        # (Grad-TTS_TF/inference.py:86-87), over the real rows' frames
        frames = int(ylen[:len(idxs)].sum())
        rtf = t * args.sampling_rate / max(frames * args.hop_length, 1)
        audio = None
        if vocode is not None:
            M = min(round_up(int(ylen[:len(idxs)].max()), 128), max_len)
            audio = np.asarray(vocode(gen_params, dec[:, :M])[..., 0])
        for r, j in enumerate(idxs):
            n = int(ylen[r])
            np.save(out_dir / f"utt_{j:04d}_mel.npy", np.asarray(dec[r, :n]))
            if audio is not None:
                save_wav(str(out_dir / f"utt_{j:04d}.wav"),
                         audio[r, :n * args.hop_length], args.sampling_rate)
            print(f"[{j}] {n} frames, batch RTF {rtf:.4f}: {lines[j][:50]}")


if __name__ == "__main__":
    main()
