"""Fused Pallas wav→log-mel kernel.

The reference computes mels as four separate TF ops (stft → abs → pow·matmul
→ log, ``FastPitch_TF/common/audio_processing_tf.py:88-106``). On TPU the
rFFT of a fixed frame length is just two matmuls against constant DFT
matrices, so the whole pipeline — DFT, magnitude, power, mel projection, log
compression — fuses into a single Pallas kernel that keeps every intermediate
in VMEM and does all the heavy lifting on the MXU:

    mag² = (frames @ Dr)² + (frames @ Di)²          # two MXU matmuls
    mel  = mag^p @ M                                # one MXU matmul
    out  = log(clip(mel, 1e-5))                     # VPU epilogue

Constant matrices (Dr, Di ∈ R^{fft×bins}, M ∈ R^{bins×mels}) stay resident in
VMEM across the frame-block grid; only frame blocks stream from HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.mel import linear_to_mel_weight_matrix
from ..audio.stft import STFTConfig, frame_signal
from ..audio.mel import hann_window

__all__ = ["fused_mel_spectrogram", "fused_frames_to_mel"]

_FRAME_BLOCK = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _dft_constants(fft_length: int, n_bins_padded: int):
    """Real/imag rDFT matrices [fft_length, n_bins_padded], zero-padded bins."""
    n_bins = fft_length // 2 + 1
    k = np.arange(fft_length, dtype=np.float64)[:, None]
    f = np.arange(n_bins, dtype=np.float64)[None, :]
    angle = -2.0 * np.pi * k * f / fft_length
    real = np.zeros((fft_length, n_bins_padded), dtype=np.float32)
    imag = np.zeros((fft_length, n_bins_padded), dtype=np.float32)
    real[:, :n_bins] = np.cos(angle)
    imag[:, :n_bins] = np.sin(angle)
    return real, imag


def _mel_kernel(frames_ref, dr_ref, di_ref, mel_ref, out_ref, *, power: float):
    # HIGHEST precision: f32 MXU passes, required for the 1e-3 parity budget.
    hi = jax.lax.Precision.HIGHEST
    frames = frames_ref[:]
    re = jnp.dot(frames, dr_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(frames, di_ref[:], preferred_element_type=jnp.float32, precision=hi)
    mag_sq = re * re + im * im
    # |X|^p computed from |X|² to skip one sqrt; p/2 == 0.25 for the canonical
    # model pipeline (power 0.5) and 1.0 for the square-magnitude variant.
    half_p = power / 2.0
    if half_p == 1.0:
        powered = mag_sq
    elif half_p == 0.5:
        powered = jnp.sqrt(mag_sq)
    else:
        powered = jnp.power(mag_sq, half_p)
    mel = jnp.dot(powered, mel_ref[:], preferred_element_type=jnp.float32, precision=hi)
    out_ref[:] = jnp.log(jnp.clip(mel, 1e-5, None))


def _mel_bwd(frames, g, dr, di, melm, power: float):
    """Analytic VJP in plain XLA against the same constant DFT/mel matrices.

    Recomputes re/im/mag² from frames (2 MXU matmuls — cheaper than spilling
    them to HBM as residuals), then chains the gradients of log∘clip, the mel
    matmul, |X|^p, and the DFT matmuls back to the frames. All matmuls run at
    ``Precision.HIGHEST`` so the gradient keeps the fused path's ≤1e-3
    fidelity (XLA:TPU schedules them on the MXU; a hand-written Pallas
    backward held too many live buffers for the 16 MB scoped-VMEM budget)."""
    hi = jax.lax.Precision.HIGHEST
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=hi)
    re = dot(frames, dr)
    im = dot(frames, di)
    mag_sq = re * re + im * im
    half_p = power / 2.0
    if half_p == 1.0:
        powered = mag_sq
    elif half_p == 0.5:
        powered = jnp.sqrt(mag_sq)
    else:
        powered = jnp.power(mag_sq, half_p)
    mel = dot(powered, melm)

    # d log(clip(mel, 1e-5)) / d mel — zero below the clip threshold.
    g_mel = jnp.where(mel >= 1e-5, g / jnp.maximum(mel, 1e-5), 0.0)
    g_pow = dot(g_mel, melm.T)
    # d |X|^p / d mag²; the mag_sq > 0 guard keeps zero-padded DFT bins
    # (and exactly-zero spectra) from producing inf·0 = nan.
    if half_p == 1.0:
        g_magsq = g_pow
    elif half_p == 0.5:
        g_magsq = jnp.where(mag_sq > 0.0,
                            0.5 * g_pow / jnp.maximum(powered, 1e-30), 0.0)
    else:
        g_magsq = jnp.where(
            mag_sq > 0.0,
            half_p * g_pow * jnp.power(jnp.maximum(mag_sq, 1e-30), half_p - 1.0),
            0.0)
    return dot(2.0 * re * g_magsq, dr.T) + dot(2.0 * im * g_magsq, di.T)


def _mel_constants(config: STFTConfig):
    fft_length = config.filter_length
    n_bins = fft_length // 2 + 1
    n_bins_p = _round_up(n_bins, 128)
    n_mel_p = _round_up(config.n_mel_channels, 128)
    dr, di = _dft_constants(fft_length, n_bins_p)
    mel_basis = np.zeros((n_bins_p, n_mel_p), dtype=np.float32)
    mel_basis[:n_bins, : config.n_mel_channels] = linear_to_mel_weight_matrix(
        num_mel_bins=config.n_mel_channels,
        num_spectrogram_bins=n_bins,
        sample_rate=float(config.sampling_rate),
        lower_edge_hertz=config.mel_fmin,
        upper_edge_hertz=config.mel_fmax,
    )
    return dr, di, mel_basis, n_bins_p, n_mel_p


def _pad_frames(frames: jax.Array, block: int = _FRAME_BLOCK):
    n = frames.shape[0]
    n_p = max(_round_up(n, block), block)
    if n_p != n:
        frames = jnp.pad(frames, ((0, n_p - n), (0, 0)))
    return frames, n, n_p


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fused_frames_to_mel(
    frames: jax.Array, config: STFTConfig = STFTConfig()
) -> jax.Array:
    """Windowed frames [N, fft_length] -> log-mel [N, n_mel_channels].

    Differentiable: the VJP is the analytic plain-XLA backward ``_mel_bwd``
    (HIGHEST-precision matmuls against the same constant DFT/mel matrices; a
    hand-written Pallas backward exceeded the 16 MB scoped-VMEM budget), so
    gradient paths (e.g. the HiFi-GAN 45×L1 mel loss, reference
    ``HiFiGAN_TF/gan.py:47-52``) keep the fused forward while the gradient
    stays ~2× closer to f64 truth than XLA-rFFT autodiff.
    """
    fft_length = config.filter_length
    dr, di, mel_basis, n_bins_p, n_mel_p = _mel_constants(config)
    frames, n, n_p = _pad_frames(frames)
    grid = (n_p // _FRAME_BLOCK,)

    flops = n_p * (2 * fft_length * n_bins_p * 2 + 2 * n_bins_p * n_mel_p)
    # Interpret on non-TPU backends so the same code path runs in CPU tests.
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_mel_kernel, power=config.magnitude_power),
        out_shape=jax.ShapeDtypeStruct((n_p, n_mel_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_FRAME_BLOCK, fft_length),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((fft_length, n_bins_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fft_length, n_bins_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins_p, n_mel_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_FRAME_BLOCK, n_mel_p), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_p * fft_length * 4 + n_p * n_mel_p * 4,
            transcendentals=n_p * n_mel_p,
        ),
        interpret=interpret,
    )(frames.astype(jnp.float32), jnp.asarray(dr), jnp.asarray(di), jnp.asarray(mel_basis))
    return out[:n, :n_mel_p][:, : config.n_mel_channels]


def _fused_fwd(frames, config):
    return fused_frames_to_mel(frames, config), frames


def _fused_bwd(config, frames, g):
    dr, di, mel_basis, n_bins_p, n_mel_p = _mel_constants(config)
    g_frames = _mel_bwd(
        frames.astype(jnp.float32), g.astype(jnp.float32),
        jnp.asarray(dr), jnp.asarray(di),
        jnp.asarray(mel_basis[:, : config.n_mel_channels]),
        config.magnitude_power)
    return (g_frames,)


fused_frames_to_mel.defvjp(_fused_fwd, _fused_bwd)


def fused_mel_spectrogram(x: jax.Array, config: STFTConfig = STFTConfig()) -> jax.Array:
    """wav [..., T] -> log-mel [..., n_frames, n_mel] via the fused kernel."""
    window = jnp.asarray(hann_window(config.frame_length))
    frames = frame_signal(x, config.frame_length, config.frame_step) * window
    if config.filter_length > config.frame_length:
        pad = [(0, 0)] * (frames.ndim - 1) + [
            (0, config.filter_length - config.frame_length)
        ]
        frames = jnp.pad(frames, pad)
    lead = frames.shape[:-1]
    flat = frames.reshape((-1, config.filter_length))
    mel = fused_frames_to_mel(flat, config)
    return mel.reshape(lead + (config.n_mel_channels,))
