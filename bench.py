"""Driver-captured benchmark suite on the default backend (real TPU chip).

Metrics (each printed as its own JSON line; the FINAL line is the headline
RTF record with a COMPACT per-family summary embedded under ``"m"`` —
``stem: [value, vs_baseline, mfu, mbu]`` — sized to fit the driver's ~2 KB
last-line tail window; the verbose records are the lines above it):

1. ``text2wav_rtf_fastpitch_hifigan_v1`` — flagship text→wav RTF (full-size
   FastPitch infer + HiFi-GAN v1), wall / nominal audio seconds, in the
   bf16 serving config (= the inference CLIs' ``--amp``; f32/bf16 A/B in
   PERF.md). The denominator is the FIXED synthesized buffer length
   (B·MAX_MEL·hop/SR): every frame in the buffer is computed and vocoded,
   so the ratio is deterministic — not random-weight ``dec_lens``
   (round-1 flaw).
2. ``fastpitch_train_mel_frames_per_s`` — full train step (fwd+loss+grads+
   Adam) in bf16, mel-frames/s.
3. ``fastpitch_train_mfu`` — model FLOPs utilization of that step from XLA's
   compiled cost analysis vs the v5e bf16 peak (197 TFLOP/s).
4. ``hifigan_gan_step_samples_per_s`` + ``hifigan_gan_step_mfu`` — full
   3-optimizer GAN step (reference ``HiFiGAN_TF/gan.py:32-131``; upstream
   OOM'd, so the target axis is throughput, no reference number).
5. ``diffwave_fast_sampling_samples_per_s`` — scanned 6-step fast sampler
   (reference ``DiffWave_TF/inference.py:87-143``).
6. ``diffwave_train_samples_per_s`` + ``diffwave_train_mfu`` — full train
   step (noise-prediction L1 + Adam); vs_baseline is the ratio over the
   reference's measured ~165k audio samples/s (bs 4, 18–20 min/epoch on the
   2060 SUPER, ``DiffWave_TF/README.md`` Training Notes — the one model the
   reference actually trained to completion).
7. ``gradtts_train_steps_per_s`` + ``gradtts_train_mfu`` — full
   ``compute_loss`` step (dur+prior+diffusion) at the reference's batch 16;
   vs_baseline is the ratio over the reference's ~2.07 iters/s
   (10 epochs/h × 746 iters/epoch, ``Grad-TTS_TF/README.md`` Notes §1).
8. ``tacotron2_train_mel_frames_per_s`` + ``tacotron2_train_mfu`` — full
   teacher-forced train step incl. BatchNorm state (reference
   ``Tacotron2_TF/model.py:719-743``; never completed training upstream).
9. ``flowtron_train_mel_frames_per_s`` + ``flowtron_train_mfu`` — full
   AR-flow NLL train step (reference ``Flowtron_TF/flowtron.py`` stubbed
   the flows and never ran — no baseline number exists).
10. ``fastspeech2_train_mel_frames_per_s`` + ``fastspeech2_train_mfu`` —
    teacher-forced variance-adaptor train step (reference
    ``FastSpeech2_TF/model/fastspeech2.py`` was a stub — never ran).
11. ``talknet_spec_train_mel_frames_per_s`` + ``talknet_spec_train_mfu`` —
    TalkNet 2 spectrogram-head train step incl. BatchNorm state
    (reference ``TalkNet_TF/talknet.py:107-131`` was a stub — never ran).

Every ``*_mfu`` metric has a ``*_mbu`` sibling — the memory-roofline ratio
(XLA logical bytes-accessed / 819 GB/s / step time): ~1 ⇒ HBM-bound at
peak, >1 ⇒ fusion keeps traffic on-chip (compute-bound), ≪1 ⇒ the step is
overhead-bound. MFU + MBU together locate each family on the roofline.

``vs_baseline``: ratio vs BASELINE.json's north-star where defined
(RTF target 0.01 ⇒ target/actual, >1 beats it); null when the reference
has no comparable number (it never completed training, README.md:11-60).

``BENCH_ONLY=name1,name2`` (substring match) runs a subset — used to
validate individual metrics without paying the full suite's compile bill.
"""

import dataclasses
import json
import os
import time

import numpy as np

PEAK_BF16_FLOPS = 197e12  # TPU v5e per-chip bf16 peak
PEAK_HBM_BYTES_PER_S = 819e9  # TPU v5e per-chip HBM bandwidth
SR, HOP = 22050, 256

# Reference throughputs with a measured upstream number (BASELINE.md):
DIFFWAVE_REF_SAMPLES_PER_S = 165_000.0   # bs 4, 18–20 min/epoch, 2060 SUPER
GRADTTS_REF_STEPS_PER_S = 7460.0 / 3600  # 10 epochs/h × 746 iters/epoch

# Timing methodology (measured on the axon tunnel backend):
# - jax.block_until_ready does NOT block through the tunnel (a timed chained
#   8192³-matmul loop reported 28 PFLOP/s); only a device→host fetch waits.
# - one launch+fetch round trip costs ~35-50 ms, dwarfing per-step compute.
# So every metric times a CHAIN of K data-dependent steps ending in a single
# scalar fetch, at two chain lengths; (t_hi − t_lo)/(K_hi − K_lo) cancels
# the constant RTT and measures pure per-step device time.
_K_LO, _K_HI = 3, 13


_REDUCE_ALL = None


def _fetch(tree):
    """Device→host barrier: fetch a scalar data-dependent on EVERY leaf.

    Fetching a single output leaf is NOT a barrier over the axon tunnel:
    outputs stream back as their buffers finalize, so an early-finalized
    leaf (a step counter, an early param update) returns while the device
    is still computing. Measured on the DiffWave bf16 train step: fetching
    the carry's counter gave a 29 ms/step differential while the device
    profiler showed 119.7 ms/step of op time; fetching the loss matched
    the profiler (119.4 ms). A jitted sum over all leaves cannot complete
    before the last output buffer is written, so its scalar is a true
    end-of-step barrier (the extra launch is a constant that the two-chain
    differencing cancels)."""
    import jax
    import jax.numpy as jnp

    global _REDUCE_ALL
    if _REDUCE_ALL is None:
        _REDUCE_ALL = jax.jit(lambda ls: sum(
            jnp.sum(l.astype(jnp.float32)) for l in ls))
    return float(_REDUCE_ALL(jax.tree.leaves(tree)))


def _bench_chain(step_once, carry0):
    """step_once(carry, i) -> carry. Seconds per step via differencing.

    Each run continues from the previous carry (steps may donate their
    input buffers, so a consumed carry is never reused).

    The first chain AFTER the warmup call still pays a multi-second
    one-time cost on the tunnel backend (measured: 6-8 s on the first
    timed K=3 run, steady 0.25 s afterwards — executable upload /
    autotune is deferred past the first execute), which would make a
    single-pair differential negative. So: one burn-in run, then two
    (K_lo, K_hi) pairs, differencing the per-length minima — also robust
    to a transient tunnel hiccup landing inside one run."""
    carry = step_once(carry0, 0)  # compile + warm
    _fetch(carry)

    def run(k, c):
        t0 = time.perf_counter()
        for i in range(k):
            c = step_once(c, i)
        _fetch(c)
        return time.perf_counter() - t0, c

    _, carry = run(_K_LO, carry)  # burn-in
    t_lo, carry = run(_K_LO, carry)
    t_hi, carry = run(_K_HI, carry)
    t_lo2, carry = run(_K_LO, carry)
    t_hi2, carry = run(_K_HI, carry)
    return max((min(t_hi, t_hi2) - min(t_lo, t_lo2)) / (_K_HI - _K_LO),
               1e-9)


def _cost_of(jitted, *args):
    """(flops, bytes_accessed) of the compiled program, from XLA's cost
    analysis. ``bytes accessed`` is the LOGICAL read+write volume of the
    HLO (fusion keeps part of it on-chip), so bytes/(819 GB/s x time) is a
    roofline ratio, not a utilization: ~1 means HBM-bound at peak, >1 means
    fusion holds traffic in VMEM/registers (compute-bound), <<1 means the
    step is overhead-bound — the right diagnostic for the bandwidth-bound
    vocoders, where MFU is structurally low."""
    try:
        analysis = jitted.lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return (float(analysis.get("flops", 0.0)),
                float(analysis.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


_UNIT_SUFFIXES = ("_mel_frames_per_s", "_samples_per_s", "_steps_per_s")


def _compact(metrics):
    """Compact suite summary for the driver's last-line parse: maps each
    family stem to [value, vs_baseline, mfu, mbu] (mfu/mbu omitted where
    the family has none), floats to 4 significant digits. ~1 KB for the
    full 31-metric suite vs ~2 KB of driver tail window."""
    def sig(x):
        return None if x is None else float(f"{x:.4g}")

    by = {m["metric"]: m for m in metrics}
    out = {}
    for m in metrics:
        name = m["metric"]
        if name.endswith(("_mfu", "_mbu")):
            continue
        stem = name
        for s in _UNIT_SUFFIXES:
            if name.endswith(s):
                stem = name[: -len(s)]
                break
        rec = [sig(m["value"]), sig(m["vs_baseline"])]
        mfu, mbu = by.get(stem + "_mfu"), by.get(stem + "_mbu")
        if mfu is not None or mbu is not None:
            rec += [sig(mfu["value"]) if mfu else None,
                    sig(mbu["value"]) if mbu else None]
        out[stem] = rec
    return out


def _wait_for_backend(max_wait_s: float = 900.0):
    """Block until the default JAX backend initializes, retrying on
    transient tunnel outages (observed: ``UNAVAILABLE: TPU backend
    setup/compile error`` when the axon tunnel drops). Keeps the driver's
    end-of-round bench from dying before emitting a single metric."""
    import jax

    deadline = time.monotonic() + max_wait_s
    delay = 15.0
    while True:
        try:
            devs = jax.devices()
            print(f"# backend ready: {devs[0].platform} x{len(devs)}",
                  flush=True)
            return
        except RuntimeError as e:
            if time.monotonic() > deadline:
                raise
            print(f"# backend unavailable ({e}); retrying in {delay:.0f}s",
                  flush=True)
            # drop any cached failed-backend state so the retry re-attempts
            for clear in ("clear_backends",):
                try:
                    getattr(jax.extend.backend, clear)()
                except Exception:
                    pass
            time.sleep(delay)
            delay = min(delay * 1.5, 120.0)


def main():
    import jax

    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    _wait_for_backend()
    import jax.numpy as jnp
    import optax

    metrics = []

    def emit(metric, value, unit, vs_baseline):
        rec = {"metric": metric, "value": value, "unit": unit,
               "vs_baseline": vs_baseline}
        metrics.append(rec)
        print(json.dumps(rec), flush=True)
        # Re-emit the headline record after EVERY metric: executable loads
        # over the tunnel cost minutes, so if the driver kills a long run,
        # its last-line parse still gets the headline RTF instead of
        # whichever metric happened to finish last. The embedded suite is
        # COMPACT (round-3 lesson: the verbose 31-record embed overflowed
        # the driver's ~2 KB tail window and left BENCH_r03.json with
        # parsed=null) — one [value, vs_baseline, mfu, mbu] tuple per
        # family, 4 significant digits; the verbose records stay on their
        # own lines above.
        if metrics[0]["metric"] == "text2wav_rtf_fastpitch_hifigan_v1":
            print(json.dumps({**metrics[0], "m": _compact(metrics)}),
                  flush=True)

    rng = np.random.default_rng(0)
    # rbg impl matches the shipped TrainerConfig.rng_impl default: dropout
    # mask bits from XLA's RngBitGenerator instead of threefry (26.2 ->
    # 19.5 ms on the FastPitch bf16 step; PERF.md round-3 roofline).
    key = jax.random.key(0, impl="rbg")

    _only = [s for s in os.environ.get("BENCH_ONLY", "").split(",") if s]

    def _want(name):
        return not _only or any(s in name for s in _only)

    from neuraltexttospeech_tpu.models.fastpitch import (
        FastPitch, FastPitchConfig,
    )
    from neuraltexttospeech_tpu.models.hifigan import Generator, HiFiGANConfig

    # ---- 1. headline: text→wav RTF --------------------------------------
    if _want("text2wav_rtf"):
        B, T_TEXT, MAX_MEL = 8, 128, 1024
        # bf16 compute = the inference CLIs' --amp serving config (params
        # stay f32; A/B on chip in PERF.md)
        fp_cfg = FastPitchConfig(dtype=jnp.bfloat16)
        fp = FastPitch(fp_cfg)
        gen = Generator(dataclasses.replace(HiFiGANConfig.v1(),
                                            dtype=jnp.bfloat16))

        text = jnp.asarray(rng.integers(1, fp_cfg.n_symbols, (B, T_TEXT)),
                           jnp.int32)
        input_lens = jnp.full((B,), T_TEXT, jnp.int32)
        fp_params = jax.jit(lambda k: fp.init(
            k, text, input_lens, max_mel_len=MAX_MEL,
            method=FastPitch.infer))(key)
        gen_params = jax.jit(lambda k: gen.init(
            k, jnp.zeros((B, MAX_MEL, fp_cfg.n_mel_channels))))(key)

        @jax.jit
        def synthesize(carry, text, input_lens):
            # chain: the text read depends on the previous audio
            # (zero-valued), so steps serialize and none can be elided
            text = text + (carry * 0.0).astype(jnp.int32)
            mel, dec_lens, _, _ = fp.apply(
                fp_params, text, input_lens, max_mel_len=MAX_MEL,
                method=FastPitch.infer)
            audio = gen.apply(gen_params, mel)
            # full-tensor sum: a sliced scalar could finalize (and stream
            # back) before the whole waveform is written — see _fetch
            return jnp.sum(audio)

        wall = _bench_chain(
            lambda c, i: synthesize(c, text, input_lens), jnp.zeros(()))
        audio_seconds = B * MAX_MEL * HOP / SR  # fixed nominal buffer length
        rtf = wall / audio_seconds
        emit("text2wav_rtf_fastpitch_hifigan_v1", rtf,
             f"rtf (wall_s per audio_s, batch={B}x{MAX_MEL} frames, one chip)",
             0.01 / rtf)

    # ---- 2+3. FastPitch train step (bf16) + MFU -------------------------
    if _want("fastpitch_train"):
        from neuraltexttospeech_tpu.models.fastpitch_loss import fastpitch_loss

        TB, TT, TM = 16, 128, 768
        tr_cfg = FastPitchConfig(dtype=jnp.bfloat16)
        tr_model = FastPitch(tr_cfg)
        batch = {
            "text": jnp.asarray(rng.integers(1, tr_cfg.n_symbols, (TB, TT)),
                                jnp.int32),
            "input_lens": jnp.full((TB,), TT, jnp.int32),
            "mel": jnp.asarray(rng.standard_normal((TB, TM, 80)), jnp.float32),
            "mel_lens": jnp.full((TB,), TM, jnp.int32),
            "pitch": jnp.asarray(rng.standard_normal((TB, 1, TM)),
                                 jnp.float32),
            "energy": jnp.abs(jnp.asarray(rng.standard_normal((TB, TM)),
                                          jnp.float32)),
            "prior": jnp.asarray(
                np.abs(rng.standard_normal((TB, TM, TT))) + 0.1, jnp.float32),
        }
        params = jax.jit(lambda k: tr_model.init(
            k, batch["text"], batch["input_lens"], batch["mel"],
            batch["mel_lens"], batch["pitch"], batch["energy"], None,
            batch["prior"]))(key)
        tx = optax.adam(1e-4)
        opt_state = tx.init(params)

        @jax.jit
        def train_step(params, opt_state, batch):
            def loss_fn(p):
                out = tr_model.apply(
                    p, batch["text"], batch["input_lens"], batch["mel"],
                    batch["mel_lens"], batch["pitch"], batch["energy"], None,
                    batch["prior"], deterministic=False,
                    rngs={"dropout": jax.random.key(1, impl="rbg")})
                return fastpitch_loss(out, batch["mel"], batch["input_lens"],
                                      batch["mel_lens"])[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        step_wall = _bench_chain(
            lambda c, i: train_step(c[0], c[1], batch)[:2],
            (params, opt_state))
        frames_per_s = TB * TM / step_wall
        emit("fastpitch_train_mel_frames_per_s", frames_per_s,
             f"mel-frames/s (bf16 train step, batch={TB}x{TM}, one chip)",
             None)

        flops, nbytes = _cost_of(train_step, params, opt_state, batch)
        mfu = flops / step_wall / PEAK_BF16_FLOPS if flops else 0.0
        emit("fastpitch_train_mfu", mfu,
             "model FLOPs utilization (XLA cost analysis / v5e bf16 peak)",
             None)
        emit("fastpitch_train_mbu",
             nbytes / step_wall / PEAK_HBM_BYTES_PER_S if nbytes else 0.0,
             "memory-roofline ratio: XLA logical bytes-accessed / (819 GB/s x step); ~1 = HBM-bound at peak, >1 = fusion keeps traffic on-chip (compute-bound), <<1 = overhead-bound",
             None)

    # ---- 4. HiFi-GAN full GAN step + MFU --------------------------------
    if _want("hifigan_gan_step"):
        from neuraltexttospeech_tpu.models.hifigan_gan import (
            hifigan_train_step, hifigan_train_step_jitted, init_hifigan,
            resolve_msd_group_impl,
        )

        # bf16 compute = the train CLI's --amp path (A/B on chip: f32
        # 100.7 ms -> bf16 88.7 ms; the step is HBM-bound at mbu ~1.0)
        hg_cfg = dataclasses.replace(HiFiGANConfig.v1(), dtype=jnp.bfloat16)
        GB = 16
        seg_frames = hg_cfg.segment_size // hg_cfg.hop_size
        state = init_hifigan(hg_cfg, key)
        gan_batch = {
            "mel": jnp.asarray(
                rng.standard_normal((GB, seg_frames, hg_cfg.num_mels)),
                jnp.float32),
            "audio": jnp.asarray(
                rng.standard_normal((GB, hg_cfg.segment_size, 1)) * 0.1,
                jnp.float32),
            "mel_loss": jnp.asarray(
                rng.standard_normal((GB, seg_frames, hg_cfg.num_mels)),
                jnp.float32),
        }

        # flops BEFORE the chain: the step donates its state argument.
        # Cost analysis needs the jitted inner; resolve the grouped-conv
        # lowering exactly as the dispatch wrapper would (gdot default).
        # The folded/gouter lowerings' cost-analysis FLOPs include the
        # block-banded zero padding (<=2.34x inflation on the MSD's L4 —
        # PERF.md round 4), so the HONEST MFU numerator is the STOCK
        # lowering's FLOP count (same math, no padding) over the fast
        # path's wall time; the inflated figure is kept as *_mfu_nominal.
        gan_impl = resolve_msd_group_impl(hg_cfg, gan_batch)
        gan_flops, gan_bytes = _cost_of(hifigan_train_step_jitted, hg_cfg,
                                        gan_impl, state, gan_batch)
        gan_flops_model = gan_flops
        if gan_impl != "stock":
            gan_flops_model, _ = _cost_of(hifigan_train_step_jitted, hg_cfg,
                                          "stock", state, gan_batch)
            gan_flops_model = gan_flops_model or gan_flops
        gan_wall = _bench_chain(
            lambda st, i: hifigan_train_step(hg_cfg, st, gan_batch)[0], state)
        emit("hifigan_gan_step_samples_per_s",
             GB * hg_cfg.segment_size / gan_wall,
             f"audio samples/s through the full 3-optimizer GAN step "
             f"(batch={GB}x{hg_cfg.segment_size}; reference OOM'd)", None)
        gan_mfu = (gan_flops_model / gan_wall / PEAK_BF16_FLOPS
                   if gan_flops_model else 0.0)
        emit("hifigan_gan_step_mfu", gan_mfu,
             "model FLOPs utilization (stock-lowering FLOP count — the true "
             "model math, excluding folded-conv zero padding — / wall / "
             "v5e bf16 peak)",
             None)
        if gan_impl != "stock" and gan_flops:
            emit("hifigan_gan_step_mfu_nominal",
                 gan_flops / gan_wall / PEAK_BF16_FLOPS,
                 f"as-executed FLOPs ({gan_impl} lowering incl. block-banded "
                 f"zero padding) / wall / v5e bf16 peak",
                 None)
        emit("hifigan_gan_step_mbu",
             gan_bytes / gan_wall / PEAK_HBM_BYTES_PER_S if gan_bytes else 0.0,
             "memory-roofline ratio: XLA logical bytes-accessed / (819 GB/s x step); ~1 = HBM-bound at peak, >1 = fusion keeps traffic on-chip (compute-bound), <<1 = overhead-bound",
             None)

    from neuraltexttospeech_tpu.models.diffwave import (
        DiffWave, DiffWaveConfig, diffwave_loss, reverse_sample,
    )

    # ---- 5. DiffWave fast sampling --------------------------------------
    if _want("diffwave_fast_sampling"):
        dw_cfg = DiffWaveConfig()
        dw = DiffWave(dw_cfg)
        F = 256
        dw_mel = jnp.asarray(rng.standard_normal((1, F, dw_cfg.n_mels)),
                             jnp.float32)
        dw_params = jax.jit(lambda k: dw.init(
            k, jnp.zeros((1, F * HOP)), jnp.zeros((1,), jnp.int32),
            dw_mel))(key)

        @jax.jit
        def dw_step(carry):
            k = jax.random.fold_in(key, (carry * 0.0).astype(jnp.int32))
            audio = reverse_sample(dw, dw_params, k, dw_mel,
                                   fast_sampling=True)
            return jnp.sum(audio)  # full-tensor sum: see _fetch

        dw_wall = _bench_chain(lambda c, i: dw_step(c), jnp.zeros(()))
        n_samples = F * HOP
        emit("diffwave_fast_sampling_samples_per_s", n_samples / dw_wall,
             f"audio samples/s, 6-step fast sampler, {n_samples} samples",
             None)

    # ---- 6. DiffWave train step + MFU -----------------------------------
    if _want("diffwave_train"):
        # bf16 compute = the train CLI's --amp path (A/B on chip: f32
        # 218 ms -> bf16 145 ms; the step is HBM-bound, mbu ~0.86, so
        # halving activation bytes buys ~1.5x)
        dwt_cfg = DiffWaveConfig(dtype=jnp.bfloat16)
        dwt = DiffWave(dwt_cfg)
        DB, DF = 16, dwt_cfg.crop_mel_frames  # 16×62 frames (PERF.md row)
        dwt_batch = {
            "audio": jnp.asarray(
                rng.standard_normal((DB, DF * dwt_cfg.hop_length)) * 0.1,
                jnp.float32),
            "mel": jnp.asarray(rng.standard_normal((DB, DF, dwt_cfg.n_mels)),
                               jnp.float32),
        }
        dwt_params = jax.jit(lambda k: dwt.init(
            k, dwt_batch["audio"], jnp.zeros((DB,), jnp.int32),
            dwt_batch["mel"]))(key)
        dwt_tx = optax.adam(2e-4)
        dwt_opt = dwt_tx.init(dwt_params)

        @jax.jit
        def dwt_step(params, opt_state, step, batch):
            def loss_fn(p):
                return diffwave_loss(dwt, p, batch,
                                     jax.random.fold_in(key, step))[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = dwt_tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state,
                    step + 1, loss)

        dwt_flops, dwt_bytes = _cost_of(dwt_step, dwt_params, dwt_opt,
                              jnp.zeros((), jnp.int32), dwt_batch)
        dwt_wall = _bench_chain(
            lambda c, i: dwt_step(c[0], c[1], c[2], dwt_batch)[:3],
            (dwt_params, dwt_opt, jnp.zeros((), jnp.int32)))
        dwt_sps = DB * DF * dwt_cfg.hop_length / dwt_wall
        emit("diffwave_train_samples_per_s", dwt_sps,
             f"audio samples/s (train step, bf16 --amp, batch={DB}x{DF} "
             f"frames; reference ~165k at bs 4 on the 2060)",
             dwt_sps / DIFFWAVE_REF_SAMPLES_PER_S)
        dwt_mfu = dwt_flops / dwt_wall / PEAK_BF16_FLOPS if dwt_flops else 0.0
        emit("diffwave_train_mfu", dwt_mfu,
             "model FLOPs utilization (XLA cost analysis / v5e bf16 peak)",
             None)
        emit("diffwave_train_mbu",
             dwt_bytes / dwt_wall / PEAK_HBM_BYTES_PER_S if dwt_bytes else 0.0,
             "memory-roofline ratio: XLA logical bytes-accessed / (819 GB/s x step); ~1 = HBM-bound at peak, >1 = fusion keeps traffic on-chip (compute-bound), <<1 = overhead-bound",
             None)

    # ---- 7. Grad-TTS train step + MFU -----------------------------------
    if _want("gradtts_train"):
        from neuraltexttospeech_tpu.models.gradtts import GradTTS, GradTTSConfig

        # bf16 compute = the train CLI's --amp path (A/B on chip: f32
        # 39.6 ms -> bf16 34.8 ms)
        gt_cfg = GradTTSConfig(dtype=jnp.bfloat16)
        gt = GradTTS(gt_cfg)
        GTB, GTT, GTM = 16, 160, 512  # bs matches the reference's 16
        gt_batch = {
            "text": jnp.asarray(
                rng.integers(1, gt_cfg.n_symbols, (GTB, GTT)), jnp.int32),
            "input_lens": jnp.full((GTB,), GTT, jnp.int32),
            "mel": jnp.asarray(rng.standard_normal((GTB, GTM, gt_cfg.n_feats)),
                               jnp.float32),
            "mel_lens": jnp.full((GTB,), GTM, jnp.int32),
        }

        gt_params = jax.jit(lambda k: gt.init(
            {"params": k, "dropout": jax.random.fold_in(k, 1)},
            gt_batch["text"], gt_batch["input_lens"], gt_batch["mel"],
            gt_batch["mel_lens"], jax.random.fold_in(k, 2),
            out_size=gt_cfg.out_size, method=GradTTS.compute_loss))(key)
        gt_tx = optax.adam(gt_cfg.learning_rate)
        gt_opt = gt_tx.init(gt_params)

        @jax.jit
        def gt_step(params, opt_state, step, batch):
            k = jax.random.fold_in(key, step)

            def loss_fn(p):
                dur, prior, diff = gt.apply(
                    p, batch["text"], batch["input_lens"], batch["mel"],
                    batch["mel_lens"], k, out_size=gt_cfg.out_size,
                    method=GradTTS.compute_loss, rngs={"dropout": k})
                return dur + prior + diff

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = gt_tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state,
                    step + 1, loss)

        gt_flops, gt_bytes = _cost_of(gt_step, gt_params, gt_opt,
                             jnp.zeros((), jnp.int32), gt_batch)
        gt_wall = _bench_chain(
            lambda c, i: gt_step(c[0], c[1], c[2], gt_batch)[:3],
            (gt_params, gt_opt, jnp.zeros((), jnp.int32)))
        emit("gradtts_train_steps_per_s", 1.0 / gt_wall,
             f"train steps/s (batch={GTB}x{GTM} frames, out_size="
             f"{gt_cfg.out_size}; reference ~2.07 it/s at bs 16 on the 2060)",
             (1.0 / gt_wall) / GRADTTS_REF_STEPS_PER_S)
        gt_mfu = gt_flops / gt_wall / PEAK_BF16_FLOPS if gt_flops else 0.0
        emit("gradtts_train_mfu", gt_mfu,
             "model FLOPs utilization (XLA cost analysis / v5e bf16 peak)",
             None)
        emit("gradtts_train_mbu",
             gt_bytes / gt_wall / PEAK_HBM_BYTES_PER_S if gt_bytes else 0.0,
             "memory-roofline ratio: XLA logical bytes-accessed / (819 GB/s x step); ~1 = HBM-bound at peak, >1 = fusion keeps traffic on-chip (compute-bound), <<1 = overhead-bound",
             None)

    # ---- 8. Tacotron 2 train step + MFU ---------------------------------
    if _want("tacotron2_train"):
        from neuraltexttospeech_tpu.models.tacotron2 import Tacotron2Config
        from neuraltexttospeech_tpu.models.tacotron2_train import (
            init_tacotron2, tacotron2_train_step,
        )

        # bf16 --amp at batch 64: the decoder scan is launch/carry-bound at
        # small batches (mbu 0.09 at bs 16 f32); widening the batch raises
        # per-step MXU work 4x for ~2x the wall (A/B on chip: bs16 f32
        # 69 ms / bs64 f32 195 ms / bs64 bf16 131 ms = 250k frames/s)
        t2_cfg = Tacotron2Config(dtype=jnp.bfloat16)
        T2B, T2T, T2M = 64, 128, 512
        t2_state = init_tacotron2(t2_cfg, key)
        t2_batch = {
            "text": jnp.asarray(
                rng.integers(1, t2_cfg.n_symbols, (T2B, T2T)), jnp.int32),
            "input_lens": jnp.full((T2B,), T2T, jnp.int32),
            "mel": jnp.asarray(
                rng.standard_normal((T2B, T2M, t2_cfg.n_mel_channels)),
                jnp.float32),
            "mel_lens": jnp.full((T2B,), T2M, jnp.int32),
        }

        # flops BEFORE the chain: the step donates its state argument
        t2_flops, t2_bytes = _cost_of(tacotron2_train_step, t2_cfg, t2_state,
                             t2_batch, key)
        t2_wall = _bench_chain(
            lambda st, i: tacotron2_train_step(t2_cfg, st, t2_batch, key)[0],
            t2_state)
        emit("tacotron2_train_mel_frames_per_s", T2B * T2M / t2_wall,
             f"mel-frames/s (teacher-forced train step, bf16 --amp, "
             f"batch={T2B}x{T2M}, one chip; reference never completed "
             f"training)", None)
        t2_mfu = t2_flops / t2_wall / PEAK_BF16_FLOPS if t2_flops else 0.0
        emit("tacotron2_train_mfu", t2_mfu,
             "model FLOPs utilization (XLA cost analysis / v5e bf16 peak)",
             None)
        emit("tacotron2_train_mbu",
             t2_bytes / t2_wall / PEAK_HBM_BYTES_PER_S if t2_bytes else 0.0,
             "memory-roofline ratio: XLA logical bytes-accessed / (819 GB/s x step); ~1 = HBM-bound at peak, >1 = fusion keeps traffic on-chip (compute-bound), <<1 = overhead-bound",
             None)

    # ---- 9. Flowtron train step + MFU -----------------------------------
    if _want("flowtron_train"):
        from neuraltexttospeech_tpu.models.flowtron import (
            Flowtron, FlowtronConfig, flowtron_loss,
        )

        fl_cfg = FlowtronConfig(dtype=jnp.bfloat16)  # --amp serving config
        fl = Flowtron(fl_cfg)
        # batch 96: the AR-flow step is scan-overhead-bound at small
        # batches, so widening is nearly free until HBM runs out (32/64/96
        # = 80.6k/122.5k/135.2k mel-frames/s; batch 128 OOMs at compile —
        # PERF.md round-5 sweep). 96 is the recommended training batch.
        FLB, FLT, FLM = 96, 128, 384
        fl_batch = {
            "text": jnp.asarray(rng.integers(1, fl_cfg.n_text, (FLB, FLT)),
                                jnp.int32),
            "input_lens": jnp.full((FLB,), FLT, jnp.int32),
            "mel": jnp.asarray(
                rng.standard_normal((FLB, FLM, fl_cfg.n_mel_channels)),
                jnp.float32),
            "mel_lens": jnp.full((FLB,), FLM, jnp.int32),
            "speaker": jnp.zeros((FLB,), jnp.int32),
        }
        fl_gate = (jnp.arange(FLM)[None, :]
                   >= (fl_batch["mel_lens"][:, None] - 1)).astype(jnp.float32)
        fl_params = jax.jit(lambda k: fl.init(
            {"params": k, "dropout": jax.random.fold_in(k, 1)},
            fl_batch["mel"], fl_batch["speaker"], fl_batch["text"],
            fl_batch["input_lens"], fl_batch["mel_lens"]))(key)
        fl_tx = optax.adam(1e-4)
        fl_opt = fl_tx.init(fl_params)

        @jax.jit
        def fl_step(params, opt_state, step, batch):
            k = jax.random.fold_in(key, step)

            def loss_fn(p):
                out = fl.apply(p, batch["mel"], batch["speaker"],
                               batch["text"], batch["input_lens"],
                               batch["mel_lens"], deterministic=False,
                               rngs={"dropout": k})
                return flowtron_loss(out, batch["mel_lens"], fl_gate,
                                     sigma=fl_cfg.sigma)[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = fl_tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state,
                    step + 1, loss)

        fl_flops, fl_bytes = _cost_of(fl_step, fl_params, fl_opt,
                                      jnp.zeros((), jnp.int32), fl_batch)
        fl_wall = _bench_chain(
            lambda c, i: fl_step(c[0], c[1], c[2], fl_batch)[:3],
            (fl_params, fl_opt, jnp.zeros((), jnp.int32)))
        emit("flowtron_train_mel_frames_per_s", FLB * FLM / fl_wall,
             f"mel-frames/s (AR-flow NLL train step, bf16 --amp, "
             f"batch={FLB}x{FLM}, one chip; reference stubbed the flows)",
             None)
        fl_mfu = fl_flops / fl_wall / PEAK_BF16_FLOPS if fl_flops else 0.0
        emit("flowtron_train_mfu", fl_mfu,
             "model FLOPs utilization (XLA cost analysis / v5e bf16 peak)",
             None)
        emit("flowtron_train_mbu",
             fl_bytes / fl_wall / PEAK_HBM_BYTES_PER_S if fl_bytes else 0.0,
             "memory-roofline ratio: XLA logical bytes-accessed / (819 GB/s x step); ~1 = HBM-bound at peak, >1 = fusion keeps traffic on-chip (compute-bound), <<1 = overhead-bound",
             None)

    # ---- 10. FastSpeech 2 train step + MFU ------------------------------
    if _want("fastspeech2_train"):
        from neuraltexttospeech_tpu.models.fastspeech2 import (
            FastSpeech2, FastSpeech2Config, fastspeech2_loss,
        )

        fs_cfg = FastSpeech2Config(dtype=jnp.bfloat16)  # --amp config
        fs = FastSpeech2(fs_cfg)
        SB, ST, SM = 16, 128, 768
        fs_batch = {
            "text": jnp.asarray(rng.integers(1, fs_cfg.n_symbols, (SB, ST)),
                                jnp.int32),
            "input_lens": jnp.full((SB,), ST, jnp.int32),
            "mel": jnp.asarray(
                rng.standard_normal((SB, SM, fs_cfg.n_mel_channels)),
                jnp.float32),
            "mel_lens": jnp.full((SB,), SM, jnp.int32),
            # uniform teacher durations that tile the mel buffer exactly
            "dur": jnp.full((SB, ST), SM // ST, jnp.float32),
            "pitch": jnp.asarray(rng.standard_normal((SB, ST)), jnp.float32),
            "energy": jnp.asarray(rng.standard_normal((SB, ST)), jnp.float32),
        }
        fs_params = jax.jit(lambda k: fs.init(
            k, fs_batch["text"], fs_batch["input_lens"], mel_max_len=SM,
            dur_tgt=fs_batch["dur"], pitch_tgt=fs_batch["pitch"],
            energy_tgt=fs_batch["energy"]))(key)
        fs_tx = optax.adam(1e-4)
        fs_opt = fs_tx.init(fs_params)

        @jax.jit
        def fs_step(params, opt_state, step, batch):
            k = jax.random.fold_in(key, step)

            def loss_fn(p):
                out = fs.apply(p, batch["text"], batch["input_lens"],
                               mel_max_len=SM, dur_tgt=batch["dur"],
                               pitch_tgt=batch["pitch"],
                               energy_tgt=batch["energy"],
                               deterministic=False, rngs={"dropout": k})
                return fastspeech2_loss(out, batch["mel"], batch["dur"],
                                        batch["pitch"], batch["energy"],
                                        batch["input_lens"],
                                        batch["mel_lens"])[0]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = fs_tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state,
                    step + 1, loss)

        fs_flops, fs_bytes = _cost_of(fs_step, fs_params, fs_opt,
                                      jnp.zeros((), jnp.int32), fs_batch)
        fs_wall = _bench_chain(
            lambda c, i: fs_step(c[0], c[1], c[2], fs_batch)[:3],
            (fs_params, fs_opt, jnp.zeros((), jnp.int32)))
        emit("fastspeech2_train_mel_frames_per_s", SB * SM / fs_wall,
             f"mel-frames/s (teacher-forced train step, bf16 --amp, "
             f"batch={SB}x{SM}, one chip; reference model was a stub)",
             None)
        fs_mfu = fs_flops / fs_wall / PEAK_BF16_FLOPS if fs_flops else 0.0
        emit("fastspeech2_train_mfu", fs_mfu,
             "model FLOPs utilization (XLA cost analysis / v5e bf16 peak)",
             None)
        emit("fastspeech2_train_mbu",
             fs_bytes / fs_wall / PEAK_HBM_BYTES_PER_S if fs_bytes else 0.0,
             "memory-roofline ratio: XLA logical bytes-accessed / (819 GB/s x step); ~1 = HBM-bound at peak, >1 = fusion keeps traffic on-chip (compute-bound), <<1 = overhead-bound",
             None)

    # ---- 11. TalkNet 2 spectrogram-head train step + MFU ----------------
    if _want("talknet_spec_train"):
        from neuraltexttospeech_tpu.models.talknet import (
            SpectrogramModel, TalkNet2Config,
        )
        from neuraltexttospeech_tpu.utils.masking import mask_from_lens

        tn_cfg = TalkNet2Config(dtype=jnp.bfloat16)  # --amp config
        tn = SpectrogramModel(tn_cfg)
        NB, NT, NM = 16, 128, 768
        tn_batch = {
            "text": jnp.asarray(rng.integers(1, tn_cfg.n_symbols, (NB, NT)),
                                jnp.int32),
            "dur": jnp.full((NB, NT), NM // NT, jnp.float32),
            "f0": jnp.asarray(rng.standard_normal((NB, NM)), jnp.float32),
            "mel": jnp.asarray(
                rng.standard_normal((NB, NM, tn_cfg.n_mel_channels)),
                jnp.float32),
            "mel_lens": jnp.full((NB,), NM, jnp.int32),
        }
        tn_vars = jax.jit(lambda k: tn.init(
            {"params": k, "dropout": jax.random.fold_in(k, 1)},
            tn_batch["text"], tn_batch["dur"], tn_batch["f0"], NM,
            train=True))(key)
        tn_tx = optax.adam(1e-3)
        tn_opt = tn_tx.init(tn_vars["params"])
        tn_mask = mask_from_lens(tn_batch["mel_lens"], NM)[..., None].astype(
            jnp.float32)

        @jax.jit
        def tn_step(variables, opt_state, step, batch):
            k = jax.random.fold_in(key, step)

            def loss_fn(params):
                mel, mut = tn.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    batch["text"], batch["dur"], batch["f0"], NM,
                    train=True, rngs={"dropout": k},
                    mutable=["batch_stats"])
                loss = jnp.sum(jnp.abs(mel - batch["mel"]) * tn_mask
                               ) / jnp.maximum(jnp.sum(tn_mask), 1.0)
                return loss, mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(variables["params"])
            updates, opt_state = tn_tx.update(grads, opt_state,
                                              variables["params"])
            new_vars = {"params": optax.apply_updates(variables["params"],
                                                      updates),
                        "batch_stats": new_stats}
            return new_vars, opt_state, step + 1, loss

        tn_flops, tn_bytes = _cost_of(tn_step, tn_vars, tn_opt,
                                      jnp.zeros((), jnp.int32), tn_batch)
        tn_wall = _bench_chain(
            lambda c, i: tn_step(c[0], c[1], c[2], tn_batch)[:3],
            (tn_vars, tn_opt, jnp.zeros((), jnp.int32)))
        emit("talknet_spec_train_mel_frames_per_s", NB * NM / tn_wall,
             f"mel-frames/s (spectrogram-head train step incl. BatchNorm, "
             f"bf16 --amp, batch={NB}x{NM}, one chip; reference head was a "
             f"stub)", None)
        tn_mfu = tn_flops / tn_wall / PEAK_BF16_FLOPS if tn_flops else 0.0
        emit("talknet_spec_train_mfu", tn_mfu,
             "model FLOPs utilization (XLA cost analysis / v5e bf16 peak)",
             None)
        emit("talknet_spec_train_mbu",
             tn_bytes / tn_wall / PEAK_HBM_BYTES_PER_S if tn_bytes else 0.0,
             "memory-roofline ratio: XLA logical bytes-accessed / (819 GB/s x step); ~1 = HBM-bound at peak, >1 = fusion keeps traffic on-chip (compute-bound), <<1 = overhead-bound",
             None)

    # final driver line already emitted by emit() after the last metric
    # (headline RTF + the full suite embedded under "metrics")


if __name__ == "__main__":
    main()
