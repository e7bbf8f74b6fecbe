"""Capture a ``jax.profiler`` device trace of one bench step on the chip.

Companion to ``tools/trace_breakdown.py`` (which turns the trace into an
op-level roofline table). The reference's only profiling story was
tf.summary scalars; here every bench-suite step can be traced op-by-op:

    python -u tools/trace_capture.py diffwave_train --out /tmp/dw_trace
    python tools/trace_breakdown.py /tmp/dw_trace --steps 6

Configs (batch/dtype) match ``bench.py`` exactly so the table explains the
driver-captured numbers. Steps are chained data-dependently and closed with
one scalar fetch — ``jax.block_until_ready`` does not block over the axon
tunnel (see bench.py), so the fetch is what guarantees the profiled window
contains real device work.
"""

from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _steps(what: str, *, unroll=None, batch=None):
    """Return (step_once(carry, i) -> carry, carry0) for a bench case.

    ``unroll``/``batch`` override the bench defaults for the AR cases —
    used by ``tools/sweep_ar.py`` for scan-parameter A/Bs on the chip."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(0)
    key = jax.random.key(0, impl="rbg")

    if what == "diffwave_train":
        from neuraltexttospeech_tpu.models.diffwave import (
            DiffWave, DiffWaveConfig, diffwave_loss,
        )

        cfg = DiffWaveConfig(dtype=jnp.bfloat16)
        model = DiffWave(cfg)
        B, F = 16, cfg.crop_mel_frames
        batch = {
            "audio": jnp.asarray(
                rng.standard_normal((B, F * cfg.hop_length)) * 0.1,
                jnp.float32),
            "mel": jnp.asarray(rng.standard_normal((B, F, cfg.n_mels)),
                               jnp.float32),
        }
        params = jax.jit(lambda k: model.init(
            k, batch["audio"], jnp.zeros((B,), jnp.int32), batch["mel"]))(key)
        tx = optax.adam(2e-4)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt_state, i):
            def loss_fn(p):
                return diffwave_loss(model, p, batch,
                                     jax.random.fold_in(key, i))[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, i + 1

        return (lambda c, i: step(*c),
                (params, opt, jnp.zeros((), jnp.int32)))

    if what == "hifigan_infer":
        from neuraltexttospeech_tpu.models.hifigan import (
            Generator, HiFiGANConfig,
        )

        cfg = dataclasses.replace(HiFiGANConfig.v1(), dtype=jnp.bfloat16)
        gen = Generator(cfg)
        B, F = 8, 1024
        mel = jnp.asarray(rng.standard_normal((B, F, cfg.num_mels)),
                          jnp.float32)
        params = jax.jit(lambda k: gen.init(k, mel))(key)

        @jax.jit
        def step(carry):
            audio = gen.apply(params, mel + (carry * 0.0))
            return jnp.sum(audio[:, 0, 0])

        return (lambda c, i: step(c), jnp.zeros(()))

    if what == "hifigan_gan":
        from neuraltexttospeech_tpu.models.hifigan import HiFiGANConfig
        from neuraltexttospeech_tpu.models.hifigan_gan import (
            hifigan_train_step, init_hifigan,
        )

        cfg = dataclasses.replace(HiFiGANConfig.v1(), dtype=jnp.bfloat16)
        B = 16
        seg_frames = cfg.segment_size // cfg.hop_size
        state = init_hifigan(cfg, key)
        batch = {
            "mel": jnp.asarray(
                rng.standard_normal((B, seg_frames, cfg.num_mels)),
                jnp.float32),
            "audio": jnp.asarray(
                rng.standard_normal((B, cfg.segment_size, 1)) * 0.1,
                jnp.float32),
            "mel_loss": jnp.asarray(
                rng.standard_normal((B, seg_frames, cfg.num_mels)),
                jnp.float32),
        }
        return (lambda c, i: hifigan_train_step(cfg, c, batch)[0], state)

    if what == "tacotron2_train":
        from neuraltexttospeech_tpu.models.tacotron2 import Tacotron2Config
        from neuraltexttospeech_tpu.models.tacotron2_train import (
            init_tacotron2, tacotron2_train_step,
        )

        cfg = Tacotron2Config(dtype=jnp.bfloat16)     # bench.py case 8
        if unroll is not None:
            cfg = _dc.replace(cfg, scan_unroll=unroll)
        B, T, M = batch or 64, 128, 512
        state = init_tacotron2(cfg, key)
        batch = {
            "text": jnp.asarray(rng.integers(1, cfg.n_symbols, (B, T)),
                                jnp.int32),
            "input_lens": jnp.full((B,), T, jnp.int32),
            "mel": jnp.asarray(
                rng.standard_normal((B, M, cfg.n_mel_channels)), jnp.float32),
            "mel_lens": jnp.full((B,), M, jnp.int32),
        }
        return (lambda c, i: tacotron2_train_step(cfg, c, batch, key)[0],
                state)

    if what == "flowtron_train":
        from neuraltexttospeech_tpu.models.flowtron import (
            Flowtron, FlowtronConfig, flowtron_loss,
        )

        cfg = FlowtronConfig(dtype=jnp.bfloat16)      # bench.py case 9
        if unroll is not None:
            cfg = _dc.replace(cfg, scan_unroll=unroll)
        fl = Flowtron(cfg)
        B, T, M = batch or 8, 128, 384
        batch = {
            "text": jnp.asarray(rng.integers(1, cfg.n_text, (B, T)),
                                jnp.int32),
            "input_lens": jnp.full((B,), T, jnp.int32),
            "mel": jnp.asarray(
                rng.standard_normal((B, M, cfg.n_mel_channels)), jnp.float32),
            "mel_lens": jnp.full((B,), M, jnp.int32),
            "speaker": jnp.zeros((B,), jnp.int32),
        }
        gate = (jnp.arange(M)[None, :]
                >= (batch["mel_lens"][:, None] - 1)).astype(jnp.float32)
        params = jax.jit(lambda k: fl.init(
            {"params": k, "dropout": jax.random.fold_in(k, 1)},
            batch["mel"], batch["speaker"], batch["text"],
            batch["input_lens"], batch["mel_lens"]))(key)
        tx = optax.adam(1e-4)
        opt = tx.init(params)

        @jax.jit
        def fl_step(params, opt_state, i):
            def loss_fn(p):
                out = fl.apply(p, batch["mel"], batch["speaker"],
                               batch["text"], batch["input_lens"],
                               batch["mel_lens"], deterministic=False,
                               rngs={"dropout": jax.random.fold_in(key, i)})
                return flowtron_loss(out, batch["mel_lens"], gate,
                                     sigma=cfg.sigma)[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, i + 1

        return (lambda c, i: fl_step(*c),
                (params, opt, jnp.zeros((), jnp.int32)))

    if what == "gradtts_train":
        from neuraltexttospeech_tpu.models.gradtts import GradTTS, GradTTSConfig

        cfg = GradTTSConfig(dtype=jnp.bfloat16)       # bench.py case 7
        gt = GradTTS(cfg)
        B, T, M = batch or 16, 160, 512
        gt_batch = {
            "text": jnp.asarray(rng.integers(1, cfg.n_symbols, (B, T)),
                                jnp.int32),
            "input_lens": jnp.full((B,), T, jnp.int32),
            "mel": jnp.asarray(rng.standard_normal((B, M, cfg.n_feats)),
                               jnp.float32),
            "mel_lens": jnp.full((B,), M, jnp.int32),
        }
        params = jax.jit(lambda k: gt.init(
            {"params": k, "dropout": jax.random.fold_in(k, 1)},
            gt_batch["text"], gt_batch["input_lens"], gt_batch["mel"],
            gt_batch["mel_lens"], jax.random.fold_in(k, 2),
            out_size=cfg.out_size, method=GradTTS.compute_loss))(key)
        tx = optax.adam(cfg.learning_rate)
        opt = tx.init(params)

        @jax.jit
        def gt_step(params, opt_state, i):
            k = jax.random.fold_in(key, i)

            def loss_fn(p):
                dur, prior, diff = gt.apply(
                    p, gt_batch["text"], gt_batch["input_lens"],
                    gt_batch["mel"], gt_batch["mel_lens"], k,
                    out_size=cfg.out_size, method=GradTTS.compute_loss,
                    rngs={"dropout": k})
                return dur + prior + diff

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, i + 1

        return (lambda c, i: gt_step(*c),
                (params, opt, jnp.zeros((), jnp.int32)))

    if what == "talknet_spec_train":
        from neuraltexttospeech_tpu.models.talknet import (
            SpectrogramModel, TalkNet2Config,
        )
        from neuraltexttospeech_tpu.utils.masking import mask_from_lens

        cfg = TalkNet2Config(dtype=jnp.bfloat16)      # bench.py case 11
        tn = SpectrogramModel(cfg)
        B, T, M = batch or 16, 128, 768
        tn_batch = {
            "text": jnp.asarray(rng.integers(1, cfg.n_symbols, (B, T)),
                                jnp.int32),
            "dur": jnp.full((B, T), M // T, jnp.float32),
            "f0": jnp.asarray(rng.standard_normal((B, M)), jnp.float32),
            "mel": jnp.asarray(
                rng.standard_normal((B, M, cfg.n_mel_channels)), jnp.float32),
            "mel_lens": jnp.full((B,), M, jnp.int32),
        }
        tn_vars = jax.jit(lambda k: tn.init(
            {"params": k, "dropout": jax.random.fold_in(k, 1)},
            tn_batch["text"], tn_batch["dur"], tn_batch["f0"], M,
            train=True))(key)
        tx = optax.adam(1e-3)
        opt = tx.init(tn_vars["params"])
        mask = mask_from_lens(tn_batch["mel_lens"], M)[..., None].astype(
            jnp.float32)

        @jax.jit
        def tn_step(variables, opt_state, i):
            k = jax.random.fold_in(key, i)

            def loss_fn(params):
                mel, mut = tn.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    tn_batch["text"], tn_batch["dur"], tn_batch["f0"], M,
                    train=True, rngs={"dropout": k},
                    mutable=["batch_stats"])
                loss = jnp.sum(jnp.abs(mel - tn_batch["mel"]) * mask
                               ) / jnp.maximum(jnp.sum(mask), 1.0)
                return loss, mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(variables["params"])
            updates, opt_state = tx.update(grads, opt_state,
                                           variables["params"])
            return ({"params": optax.apply_updates(variables["params"],
                                                   updates),
                     "batch_stats": new_stats}, opt_state, i + 1)

        return (lambda c, i: tn_step(*c),
                (tn_vars, opt, jnp.zeros((), jnp.int32)))

    if what == "fastpitch_infer":
        from neuraltexttospeech_tpu.models.fastpitch import (
            FastPitch, FastPitchConfig,
        )

        cfg = FastPitchConfig(dtype=jnp.bfloat16)
        fp = FastPitch(cfg)
        B, T, M = 8, 128, 1024
        text = jnp.asarray(rng.integers(1, cfg.n_symbols, (B, T)), jnp.int32)
        lens = jnp.full((B,), T, jnp.int32)
        params = jax.jit(lambda k: fp.init(
            k, text, lens, max_mel_len=M, method=FastPitch.infer))(key)

        @jax.jit
        def step(carry):
            mel, _, _, _ = fp.apply(
                params, text + (carry * 0.0).astype(jnp.int32), lens,
                max_mel_len=M, method=FastPitch.infer)
            return jnp.sum(mel[:, 0, 0])

        return (lambda c, i: step(c), jnp.zeros(()))

    raise SystemExit(f"unknown case {what!r}; see _steps() for the list")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what")
    ap.add_argument("--out", default="/tmp/trace")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=None,
                    help="AR-case batch override (match bench configs)")
    ap.add_argument("--unroll", type=int, default=None,
                    help="AR-case scan unroll override")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    step_once, carry = _steps(a.what, unroll=a.unroll, batch=a.batch)

    def fetch(tree):
        # reduce over ALL leaves: a single leaf can finalize and stream
        # back before the program completes (see bench.py::_fetch), which
        # would close the profiled window early
        return float(jax.jit(lambda ls: sum(
            jnp.sum(l.astype(jnp.float32)) for l in ls))(
                jax.tree.leaves(tree)))

    carry = step_once(carry, 0)  # compile + warm
    print(f"warmup fetch: {fetch(carry):.4f}", flush=True)

    # Host/python tracing off: on this one-core container a concurrent
    # process floods the 1M-event trace cap with host events, evicting
    # every device op (observed: 1,000,000 '/host:CPU python' events,
    # zero 'XLA Ops').
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = 0
    opts.python_tracer_level = 0
    jax.profiler.start_trace(a.out, profiler_options=opts)
    try:
        for i in range(1, a.steps + 1):
            carry = step_once(carry, i)
        print(f"profiled fetch: {fetch(carry):.4f}", flush=True)
    finally:
        jax.profiler.stop_trace()
    print(f"trace written to {a.out} ({a.steps} steps)", flush=True)


if __name__ == "__main__":
    main()
