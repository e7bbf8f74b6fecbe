"""Headline benchmark: FastPitch + HiFi-GAN text→wav real-time factor.

Runs the flagship end-to-end synthesis path (full-size FastPitch text→mel
inference + HiFi-GAN v1 generator mel→wav) jitted on the default backend
(the real TPU chip under the driver) and reports RTF = wall_time /
audio_seconds, batched.

BASELINE.json's north-star target is RTF < 0.01 on one v5e chip;
``vs_baseline`` is reported as target/actual (>1 ⇒ beating the target).
The reference has no trained FastPitch+HiFi-GAN pipeline to time
(HiFi-GAN OOM'd, ``/root/reference/README.md:53-55``), so the target ratio
is the comparison axis.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax

    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.models.fastpitch import FastPitch, FastPitchConfig
    from neuraltexttospeech_tpu.models.hifigan import Generator, HiFiGANConfig

    B, T_TEXT, MAX_MEL = 8, 128, 1024
    HOP, SR = 256, 22050

    fp_cfg = FastPitchConfig()
    fp = FastPitch(fp_cfg)
    hg_cfg = HiFiGANConfig.v1()
    gen = Generator(hg_cfg)

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, fp_cfg.n_symbols, (B, T_TEXT)), jnp.int32)
    input_lens = jnp.full((B,), T_TEXT, jnp.int32)

    key = jax.random.PRNGKey(0)
    # jit the inits: eager init is pathologically slow over the TPU tunnel
    fp_params = jax.jit(lambda k: fp.init(
        k, text, input_lens, max_mel_len=MAX_MEL, method=FastPitch.infer))(key)
    gen_params = jax.jit(lambda k: gen.init(
        k, jnp.zeros((B, MAX_MEL, fp_cfg.n_mel_channels))))(key)

    @jax.jit
    def synthesize(fp_params, gen_params, text, input_lens):
        mel, dec_lens, _, _ = fp.apply(
            fp_params, text, input_lens, max_mel_len=MAX_MEL,
            method=FastPitch.infer)
        audio = gen.apply(gen_params, mel)
        return audio, dec_lens

    # warmup/compile
    audio, dec_lens = synthesize(fp_params, gen_params, text, input_lens)
    jax.block_until_ready(audio)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        audio, dec_lens = synthesize(fp_params, gen_params, text, input_lens)
    jax.block_until_ready(audio)
    wall = (time.perf_counter() - t0) / iters

    audio_seconds = float(jnp.sum(dec_lens)) * HOP / SR
    rtf = wall / audio_seconds
    target = 0.01
    print(json.dumps({
        "metric": "text2wav_rtf_fastpitch_hifigan_v1",
        "value": rtf,
        "unit": "rtf (wall_s per audio_s, batch=8, one chip)",
        "vs_baseline": target / rtf,
    }))


if __name__ == "__main__":
    main()
