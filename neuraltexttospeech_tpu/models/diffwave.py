"""DiffWave — diffusion waveform vocoder, TPU-native.

Re-design of ``DiffWave_TF/model.py`` (495 LoC) + ``inference.py`` +
``train.py``'s loss:

- 64-dim sin/cos diffusion-step embedding with fractional-step lerp for
  fast sampling (reference ``model.py:62-111``);
- mel upsampler: two transposed 2-D convs, ×16 time each, LeakyReLU 0.4
  (``model.py:114-146``);
- 30 gated dilated residual blocks, dilation cycle 2^(i mod 10), with
  conditioner projection and (x+residual)/√2 (``model.py:149-210``);
- the reverse-diffusion sampler is a single ``lax.scan`` over the step axis
  — per-step constants (c1, c2, σ, fractional t) are precomputed on the
  host exactly like the reference's schedule alignment
  (``inference.py:87-103``) and fed as scan inputs, so N-step sampling is
  one compiled loop instead of N Python-level forward calls
  (``inference.py:124-143``);
- the noise-prediction L1 training loss matches ``train.py:293-333``.

Defaults mirror ``DiffWave_TF/params.py:24-51``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neuraltexttospeech_tpu.nn import fastconv

__all__ = ["DiffWaveConfig", "DiffWave", "diffwave_loss", "sampling_schedule",
           "reverse_sample"]


@dataclasses.dataclass(frozen=True)
class DiffWaveConfig:
    sample_rate: int = 22050
    n_mels: int = 80
    hop_length: int = 256
    crop_mel_frames: int = 62
    residual_layers: int = 30
    residual_channels: int = 64
    dilation_cycle_length: int = 10
    unconditional: bool = False
    noise_schedule: Tuple[float, ...] = tuple(
        np.linspace(1e-4, 0.05, 50).tolist())
    inference_noise_schedule: Tuple[float, ...] = (
        0.0001, 0.001, 0.01, 0.05, 0.2, 0.5)
    audio_len: int = 22050 * 5          # unconditional synthesis length
    learning_rate: float = 2e-4
    batch_size: int = 16
    max_grad_norm: Optional[float] = None
    dtype: Optional[jnp.dtype] = None
    # Space-to-depth folded residual stack (see nn/fastconv.py): fold the
    # sample axis by 2 so the C=64 gated convs contract over 128 channels
    # (full vector lanes / MXU contraction). Exact same math + param tree;
    # the power-of-two dilations hit fastconv's dilated d%p==0 path, so
    # folded kernels stay 3 taps. Falls back to unfolded when the audio
    # length is odd.
    folded_convs: bool = False

    @property
    def num_steps(self) -> int:
        return len(self.noise_schedule)


class DiffusionEmbedding(nn.Module):
    """Step embedding with fractional lerp (reference ``model.py:62-111``)."""

    max_steps: int
    dtype: Optional[jnp.dtype] = None

    def _table(self) -> jnp.ndarray:
        # float32 throughout: the arguments reach ~5e5 rad where f32 and f64
        # trig disagree visibly; the reference builds the table in f32
        # (model.py:100-108), and matching it keeps checkpoint parity.
        steps = np.arange(self.max_steps, dtype=np.float32)[:, None]
        dims = np.arange(64, dtype=np.float32)[None, :]
        table = steps * np.float32(10.0) ** (dims * np.float32(4.0 / 63.0))
        return jnp.asarray(
            np.concatenate([np.sin(table), np.cos(table)], axis=1),
            jnp.float32)

    @nn.compact
    def __call__(self, t):
        """t: [B] int (training) or float (fast-sampling fractional step)."""
        table = self._table()
        if jnp.issubdtype(t.dtype, jnp.integer):
            x = table[t]
        else:
            low = jnp.floor(t).astype(jnp.int32)
            high = jnp.ceil(t).astype(jnp.int32)
            frac = (t - low.astype(t.dtype))[..., None]
            x = table[low] * (1 - frac) + table[high] * frac
        x = nn.silu(nn.Dense(512, dtype=self.dtype)(x))
        return nn.silu(nn.Dense(512, dtype=self.dtype)(x))


class _StencilConvTranspose16(nn.Module):
    """Drop-in twin of ``nn.ConvTranspose(1, (32, 3), strides=(16, 1),
    padding="SAME", transpose_kernel=True)`` on [B, F, M] input, computed as
    a 9-tap stencil einsum instead of an lhs-dilated convolution.

    Why: XLA lowers the 1-channel 2-D transposed conv catastrophically on
    TPU — the profiler shows ~35 ms/step of 8-40 GB/s fusions with
    batch-minor `{0,3,2,1}` layouts (reverse + copy + compare_select chains)
    for what is ~1.3 GFLOP of work. The transposed conv with stride 16 and
    kernel 32 touches exactly two taps per output phase, so it is equal to

        out[b, 16Q+r, m] = sum_{j,d in 0..2} W[j, d, r] * xpad[b, Q+j, m+d]

    with ``W[j, d, r] = flip(kernel)[16j - r + 7, d]`` (zero outside
    [0, 32)) and xpad zero-padded by 1 on both F and M — nine shifted reads
    and a [9 x 16] contraction that XLA fuses at full bandwidth. Equivalence
    to the flax layer is asserted exactly in tests/test_diffwave_upsampler.py.

    The param tree (kernel [32, 3, 1, 1] + bias [1], lecun-normal/zeros
    init) matches nn.ConvTranspose verbatim, so checkpoints are unaffected.
    """

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (32, 3, 1, 1))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        dt = self.dtype or x.dtype
        x, kernel, bias = (x.astype(dt), kernel.astype(dt), bias.astype(dt))

        # W[j, d, r] = Kp[16j - r + 7, d], Kp = spatially flipped kernel
        # (transpose_kernel=True applies the gradient-of-conv kernel).
        kp = jnp.flip(kernel[..., 0, 0], (0, 1))            # [32, 3]
        j = np.arange(3)[:, None]
        r = np.arange(16)[None, :]
        k_idx = 16 * j - r + 7                               # [3, 16]
        valid = (k_idx >= 0) & (k_idx < 32)
        w = jnp.where(jnp.asarray(valid)[:, None, :],
                      kp[np.clip(k_idx, 0, 31)].transpose(0, 2, 1),
                      0.0)                                   # [3, 3_mel, 16]

        B, F, M = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
        xs = jnp.stack([xp[:, jj:jj + F, dd:dd + M]
                        for jj in range(3) for dd in range(3)], axis=-1)
        w9 = w.reshape(9, 16)
        out = jnp.einsum("bfmk,kr->bfrm", xs, w9,
                         preferred_element_type=dt)
        return out.reshape(B, F * 16, M) + bias[0]


class SpectrogramUpsampler(nn.Module):
    """mel [B, F, n_mels] → [B, F·256, n_mels] via two ×16 transposed convs
    (reference ``model.py:114-146``), each computed by the stencil twin
    above (same math + params as nn.ConvTranspose, TPU-friendly lowering)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            # name matches the nn.ConvTranspose auto-naming this replaces,
            # keeping existing checkpoints/goldens loadable.
            x = _StencilConvTranspose16(dtype=self.dtype,
                                        name=f"ConvTranspose_{i}")(x)
            x = nn.leaky_relu(x, 0.4)
        return x


def _split_folded(y, p):
    """Per-position channel halves of a fold-``p`` array [B, Q, p*2C] —
    the folded twin of ``jnp.split(y, 2, axis=-1)`` on [B, T, 2C]."""
    if p == 1:
        return jnp.split(y, 2, axis=-1)
    b, q, pc = y.shape
    y = y.reshape(b, q, p, pc // p)
    a, c = jnp.split(y, 2, axis=-1)
    return a.reshape(b, q, -1), c.reshape(b, q, -1)


class ResidualBlock(nn.Module):
    """Gated dilated residual block (reference ``model.py:149-210``).

    With ``fold=p>1``, ``x``/``conditioner`` arrive space-to-depth folded
    ([B, T/p, p*C]) and every conv runs in folded layout (``nn/fastconv``)
    — identical math and param tree, full 128-lane tiles at C=64.
    """

    residual_channels: int
    dilation: int
    unconditional: bool = False
    dtype: Optional[jnp.dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x, diffusion_emb, conditioner=None):
        """x: [B, T, C]; diffusion_emb: [B, 512]; conditioner: [B, T, n_mels]."""
        C, p = self.residual_channels, self.fold
        step = nn.Dense(C, dtype=self.dtype)(diffusion_emb)[:, None, :]
        y = x + (jnp.tile(step, (1, 1, p)) if p > 1 else step)
        y = fastconv.Conv(2 * C, (3,), kernel_dilation=(self.dilation,),
                          padding="SAME", dtype=self.dtype, fold=p)(y)
        if not self.unconditional:
            assert conditioner is not None
            y = y + fastconv.Conv(2 * C, (1,), dtype=self.dtype,
                                  fold=p)(conditioner)
        gate, filt = _split_folded(y, p)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = fastconv.Conv(2 * C, (1,), dtype=self.dtype, fold=p)(y)
        residual, skip = _split_folded(y, p)
        return (x + residual) / np.sqrt(2.0), skip


class DiffWave(nn.Module):
    """Full network (reference ``model.py:214-283``)."""

    config: DiffWaveConfig = DiffWaveConfig()

    @nn.compact
    def __call__(self, audio, diffusion_step, spectrogram=None):
        """audio [B, T]; diffusion_step [B] (int or fractional);
        spectrogram [B, T//hop, n_mels] (None when unconditional)."""
        c = self.config
        x = nn.relu(nn.Conv(c.residual_channels, (1,), dtype=c.dtype)(
            audio[..., None]))
        emb = DiffusionEmbedding(c.num_steps, dtype=c.dtype)(diffusion_step)
        cond = None
        if not c.unconditional:
            assert spectrogram is not None
            cond = SpectrogramUpsampler(dtype=c.dtype)(spectrogram)
            cond = cond[:, : x.shape[1], :]

        # Fold the sample axis into channels for the residual stack
        # (64 -> 128-channel contractions; see nn/fastconv.py).
        p = 2 if (c.folded_convs and x.shape[1] % 2 == 0) else 1
        if p > 1:
            x = fastconv.fold(x, p)
            if cond is not None:
                cond = fastconv.fold(cond, p)

        skip_sum = None
        for i in range(c.residual_layers):
            x, skip = ResidualBlock(
                c.residual_channels, 2 ** (i % c.dilation_cycle_length),
                unconditional=c.unconditional, dtype=c.dtype,
                fold=p)(x, emb, cond)
            skip_sum = skip if skip_sum is None else skip_sum + skip

        x = skip_sum / np.sqrt(c.residual_layers)
        x = nn.relu(fastconv.Conv(c.residual_channels, (1,), dtype=c.dtype,
                                  fold=p)(x))
        x = fastconv.Conv(1, (1,), kernel_init=nn.initializers.zeros,
                          dtype=c.dtype, fold=p)(x)   # zero-init output proj
        return fastconv.unfold(x, p)[..., 0]


def diffwave_loss(model: DiffWave, params, batch, rng):
    """Random-t L1 noise-prediction loss (reference ``train.py:293-333``).

    batch: audio [B, T], mel [B, T//hop, n_mels].
    """
    c = model.config
    audio, mel = batch["audio"], batch.get("mel")
    B = audio.shape[0]
    t_rng, n_rng = jax.random.split(rng)
    t = jax.random.randint(t_rng, (B,), 0, c.num_steps)
    noise_level = jnp.cumprod(1.0 - jnp.asarray(c.noise_schedule))
    scale = jnp.sqrt(noise_level[t])[:, None]
    noise = jax.random.normal(n_rng, audio.shape)
    noisy = scale * audio + jnp.sqrt(1.0 - scale ** 2) * noise
    predicted = model.apply(params, noisy, t, mel)
    loss = jnp.mean(jnp.abs(noise - predicted))
    return loss, {"l1_noise": loss}


def sampling_schedule(config: DiffWaveConfig, fast_sampling: bool):
    """Host-side schedule alignment (reference ``inference.py:75-103``).

    Returns (T, c1, c2, sigma) numpy arrays ordered for the reverse scan
    (step N-1 first).
    """
    training = np.array(config.noise_schedule)
    inference = (np.array(config.inference_noise_schedule)
                 if fast_sampling else training)
    talpha_cum = np.cumprod(1 - training)
    beta = inference
    alpha = 1 - beta
    alpha_cum = np.cumprod(alpha)

    T = []
    for s in range(len(inference)):
        for t in range(len(training) - 1):
            if talpha_cum[t + 1] <= alpha_cum[s] <= talpha_cum[t]:
                twiddle = (talpha_cum[t] ** 0.5 - alpha_cum[s] ** 0.5) / (
                    talpha_cum[t] ** 0.5 - talpha_cum[t + 1] ** 0.5)
                T.append(t + twiddle)
                break
    T = np.array(T, np.float32)

    n = np.arange(len(alpha))
    c1 = 1.0 / alpha ** 0.5
    c2 = beta / (1 - alpha_cum) ** 0.5
    sigma = np.where(
        n > 0,
        ((1.0 - np.concatenate([[1.0], alpha_cum[:-1]])) /
         (1.0 - alpha_cum) * beta) ** 0.5,
        0.0)
    rev = slice(None, None, -1)
    return (T[rev], c1[rev].astype(np.float32), c2[rev].astype(np.float32),
            sigma[rev].astype(np.float32))


def reverse_sample(model: DiffWave, params, rng, spectrogram=None,
                   *, fast_sampling: bool = False,
                   audio_len: Optional[int] = None):
    """mel → waveform via the scanned reverse process
    (reference ``inference.py:106-143``). jit-compatible."""
    c = model.config
    T, c1, c2, sigma = sampling_schedule(c, fast_sampling)
    if c.unconditional:
        B = 1
        length = audio_len or c.audio_len
    else:
        B = spectrogram.shape[0]
        length = c.hop_length * spectrogram.shape[1]

    init_rng, scan_rng = jax.random.split(rng)
    audio0 = jax.random.normal(init_rng, (B, length))

    consts = (jnp.asarray(T), jnp.asarray(c1), jnp.asarray(c2),
              jnp.asarray(sigma))

    def step(carry, inputs):
        audio, key = carry
        t_frac, c1n, c2n, sig = inputs
        eps = model.apply(params, audio, jnp.full((B,), t_frac), spectrogram)
        audio = c1n * (audio - c2n * eps)
        key, sub = jax.random.split(key)
        audio = audio + sig * jax.random.normal(sub, audio.shape)
        audio = jnp.clip(audio, -1.0, 1.0)
        return (audio, key), None

    (audio, _), _ = jax.lax.scan(step, (audio0, scan_rng), consts)
    return audio
