"""HiFi-GAN training CLI.

Mirrors the reference surface (``HiFiGAN_TF/train.py:22-170``: JSON config →
hparams → Data → GAN fit) on the jitted 3-optimizer step. The reference
never completed an epoch (OOM, ``/root/reference/README.md:53-55``); this
harness trains with a fixed 8192-sample segment shape so memory is static.

Usage:
  python hifigan/train.py --config v1 -o out/hifigan \
      --training-files filelists/ljs_audio_text_train.txt --epochs 100
"""

import argparse
import json
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="v1",
                   help="v1|v2|v3 or a path to a JSON config "
                        "(reference config_v*.json keys)")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--training-files", required=True)
    p.add_argument("--validation-files", default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=None,
                   help="override config batch_size")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--checkpoint-every-steps", type=int, default=1000)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--amp", action="store_true",
                   help="bfloat16 compute (TPU mixed precision)")
    p.add_argument("--epochs-per-checkpoint", type=int, default=1)
    p.add_argument("--fine-tuning-mel-dir", default=None,
                   help="train on acoustic-model mels (fine-tuning path)")
    p.add_argument("--host-mels", action="store_true",
                   help="compute the input/loss mels in collation (the "
                        "reference pipeline) instead of inside the jitted "
                        "step — the default ships only the audio crops "
                        "(PERF.md round-5 host-fed table)")
    return p.parse_args(argv)


def load_config(spec: str):
    from neuraltexttospeech_tpu.models.hifigan import HiFiGANConfig

    if spec in ("v1", "v2", "v3"):
        return getattr(HiFiGANConfig, spec)()
    with open(spec) as f:
        raw = json.load(f)
    keys = {f.name for f in HiFiGANConfig.__dataclass_fields__.values()}
    mapped = {
        "hop_size": raw.get("hop_size"), "win_size": raw.get("win_size"),
        "num_mels": raw.get("num_mels"), "fmin": raw.get("fmin"),
        "fmax": raw.get("fmax"), "fmax_for_loss": raw.get("fmax_for_loss"),
    }
    kw = {k: v for k, v in {**raw, **mapped}.items()
          if k in keys and v is not None}
    for tup in ("upsample_rates", "upsample_kernel_sizes",
                "resblock_kernel_sizes"):
        if tup in kw:
            kw[tup] = tuple(kw[tup])
    if "resblock_dilation_sizes" in kw:
        kw["resblock_dilation_sizes"] = tuple(
            tuple(d) for d in kw["resblock_dilation_sizes"])
    return HiFiGANConfig(**kw)


def main(argv=None):
    args = parse_args(argv)
    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from neuraltexttospeech_tpu.data.mel_dataset import VocoderDataset
    from neuraltexttospeech_tpu.models.hifigan_gan import (
        hifigan_train_step, init_hifigan,
    )
    from neuraltexttospeech_tpu.parallel.mesh import (
        make_mesh, replicated, shard_batch,
    )
    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer

    config = load_config(args.config)
    if args.amp:
        import dataclasses

        import jax.numpy as jnp
        config = dataclasses.replace(config, dtype=jnp.bfloat16)
    from neuraltexttospeech_tpu.models.registry import save_model_config
    save_model_config(args.output, "HiFiGAN", config)
    batch_size = args.batch_size or config.batch_size

    ds = VocoderDataset(
        args.training_files, segment_size=config.segment_size,
        n_fft=config.n_fft, hop_size=config.hop_size,
        win_size=config.win_size, num_mels=config.num_mels,
        sampling_rate=config.sampling_rate, fmin=config.fmin,
        fmax=config.fmax, fmax_for_loss=config.fmax_for_loss,
        fine_tuning_mel_dir=args.fine_tuning_mel_dir, seed=config.seed,
    )
    steps_per_epoch = args.steps_per_epoch or max(len(ds) // batch_size, 1)

    state = init_hifigan(config, jax.random.PRNGKey(config.seed),
                         steps_per_epoch=steps_per_epoch)
    # Auto-DP over every visible device, like the 7 Trainer-based CLIs
    # (train/harness.py::_ensure_mesh): batch sharded on 'data', the
    # 3-optimizer state replicated; XLA inserts the gradient all-reduces.
    # The GAN step's MSD grouped convs default to the SPMD-safe 'gdot'
    # folded lowering on any mesh shape (resolve_msd_group_impl).
    import math

    mesh = make_mesh(n_data=max(math.gcd(batch_size, jax.device_count()), 1))
    state = jax.device_put(state, replicated(mesh))
    n_g = sum(p.size for p in jax.tree.leaves(state.gen_params))
    print(f"HiFi-GAN {args.config}: generator {n_g/1e6:.1f}M params, "
          f"{len(ds)} clips, batch {batch_size}, "
          f"dp={mesh.devices.size}")

    ckpt = Checkpointer(str(pathlib.Path(args.output) / "checkpoints"),
                        save_interval_steps=args.checkpoint_every_steps)
    if args.resume and ckpt.latest_step() is not None:
        state = jax.device_put(ckpt.restore(state), replicated(mesh))
        print(f"resumed at step {int(state.step)}")

    from neuraltexttospeech_tpu.data.prefetch import prefetch

    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        n = 0
        # Host-side step counter + prefetch thread + checkpoint gating:
        # fetching state.step (and floating metrics) every iteration is a
        # device→host sync per step — over the axon tunnel that halves the
        # host-fed rate (PERF.md round-5 host-fed table).
        start_step = int(state.step)
        # audio-only batches (mels computed inside the jitted step) +
        # host→device transfer in the producer thread
        audio_only = args.fine_tuning_mel_dir is None and not args.host_mels

        def produce(epoch=epoch):
            for b in ds.batches(batch_size, seed=config.seed + epoch,
                                max_batches=args.steps_per_epoch,
                                audio_only=audio_only):
                yield shard_batch(b, mesh)

        for batch in prefetch(produce()):
            state, metrics = hifigan_train_step(config, state, batch)
            n += 1
            step = start_step + n
            if step % 100 == 0:
                print(f"epoch {epoch} step {step} " + " ".join(
                    f"{k}={float(v):.3f}" for k, v in sorted(metrics.items())))
            if step % args.checkpoint_every_steps == 0:
                ckpt.save(step, state)
        # Epoch barrier: with no per-step syncs the loop only ENQUEUES
        # steps; fetch the last step's metrics (data-dependent on the
        # whole serialized state chain) so dt measures device work — over
        # the axon tunnel jax.block_until_ready does not block.
        if n:
            for v in metrics.values():
                float(v)
        dt = time.perf_counter() - t0
        print(f"epoch {epoch}: {n} steps in {dt:.1f}s "
              f"({n * batch_size * config.segment_size / config.sampling_rate / dt:.1f}x "
              "realtime audio throughput)")
        if (epoch + 1) % max(args.epochs_per_checkpoint, 1) == 0:
            ckpt.save(int(state.step), state, force=True)
    ckpt.save(int(state.step), state, force=True)
    ckpt.close()
    print("done")


if __name__ == "__main__":
    main()
