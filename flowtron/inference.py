"""Flowtron inference CLI: sample z ~ N(0, σ²) and run the flows in reverse
(text → mel; → wav with --hifigan-checkpoint).

Usage:
  python flowtron/inference.py --checkpoint out/flowtron/checkpoints \
      -i phrases.txt -o out/mels --sigma 0.8 --n-frames 400
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
    p.add_argument("--sigma", type=float, default=0.8)
    p.add_argument("-bs", "--batch-size", type=int, default=8,
                   help="utterances per device batch; inputs are length-"
                        "sorted and padded to text-length buckets so the "
                        "whole run compiles O(distinct buckets) programs, "
                        "not O(utterances)")
    p.add_argument("--n-frames", type=int, default=400)
    p.add_argument("--speaker", type=int, default=0)
    p.add_argument("--hifigan-checkpoint", default=None)
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute for model + vocoder (recommended TPU "
                        "serving config; checkpoint params stay f32)")
    p.add_argument("--gate-threshold", type=float, default=0.5)
    p.add_argument("--sampling-rate", type=int, default=22050)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.filelist import save_wav
    from neuraltexttospeech_tpu.models.flowtron import Flowtron, FlowtronConfig
    from neuraltexttospeech_tpu.text.processing import TextProcessing
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer
    from neuraltexttospeech_tpu.train.harness import build_state
    from neuraltexttospeech_tpu.train.state import OptimizerConfig

    from neuraltexttospeech_tpu.models.registry import (
        find_model_config, load_model_config,
    )

    if find_model_config(args.checkpoint):
        _, config = load_model_config(args.checkpoint)
    else:
        config = FlowtronConfig()
    if args.amp:
        import dataclasses
        config = dataclasses.replace(config, dtype=jnp.bfloat16)
    model = Flowtron(config)
    tp = TextProcessing("english_basic", ["english_cleaners"], p_arpabet=0.0)

    mel0 = jnp.zeros((1, 8, config.n_mel_channels))
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": jax.random.fold_in(k, 1)},
        mel0, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8), jnp.int32),
        jnp.full((1,), 8, jnp.int32), jnp.full((1,), 8, jnp.int32)))(
        jax.random.PRNGKey(0))
    state = build_state(params, OptimizerConfig())
    state = Checkpointer(args.checkpoint).restore(state)
    params = state.params

    vocoder = None
    if args.hifigan_checkpoint:
        from hifigan.inference import load_generator
        vocoder = load_generator(args.hifigan_checkpoint, amp=args.amp)

    @jax.jit
    def synth(params, z, spk, text, tlens):
        mel, gate, attn = model.apply(params, z, spk, text, tlens,
                                      method=Flowtron.infer)
        # host boundary: mels cross back as f32 whatever the compute dtype
        return mel.astype(jnp.float32), gate.astype(jnp.float32), attn

    vocode = None
    if vocoder is not None:
        gen, gen_params = vocoder
        hop = gen.config.hop_size
        vocode = jax.jit(lambda p, m: gen.apply(p, m).astype(jnp.float32))

    from neuraltexttospeech_tpu.utils.serving import (
        round_up, serving_sharding, text_batches,
    )

    out_dir = pathlib.Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    lines = [l.strip() for l in open(args.input, encoding="utf-8") if l.strip()]

    # Batched serving loop: text padded to 16-token buckets — the AR flows
    # run all rows of a batch through one scan (attention masks cover the
    # padded text); O(distinct buckets) compiles for the whole run. With
    # >1 visible devices the batch dim is sharded over all of them (SPMD).
    put, replicate, batch_size = serving_sharding(args.batch_size)
    params = replicate(params)
    if vocode is not None:
        gen_params = replicate(gen_params)
    encoded = [np.asarray(tp.encode_text(l), np.int32) for l in lines]
    for b, (idxs, text, lens) in enumerate(
            text_batches(encoded, batch_size)):
        B = text.shape[0]
        z = jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(args.seed), b),
            (B, args.n_frames, config.n_mel_channels)) * args.sigma
        mel, gate, _ = synth(params, put(np.asarray(z)),
                             put(np.full((B,), args.speaker, np.int32)),
                             put(text), put(lens))
        gate_np = np.asarray(jax.nn.sigmoid(gate))
        # per-row trim at first gate trigger
        n_rows = []
        for r in range(B):
            stop = int(np.argmax(gate_np[r] > args.gate_threshold))
            n_rows.append(stop if gate_np[r, stop] > args.gate_threshold
                          and stop > 0 else args.n_frames)
        audio = None
        if vocode is not None:
            M = min(round_up(max(n_rows[:len(idxs)]), 128), args.n_frames)
            audio = np.asarray(vocode(gen_params, mel[:, :M])[..., 0])
        for r, j in enumerate(idxs):
            n = n_rows[r]
            np.save(out_dir / f"utt_{j:04d}_mel.npy", np.asarray(mel[r, :n]))
            if audio is not None:
                save_wav(str(out_dir / f"utt_{j:04d}.wav"),
                         audio[r, :n * hop], args.sampling_rate)
            print(f"[{j}] {n} frames: {lines[j][:60]}")


if __name__ == "__main__":
    main()
