"""Batched YIN pitch (f0) estimation in pure JAX.

The reference shells out to ``librosa.pyin`` on the host per utterance
(``FastPitch_TF/data_function.py:94-158``) — the single slowest piece of its
dataset prep (16h45m cold pass, BASELINE.md). This is a TPU-native
re-design: the YIN difference function is computed for **all frames and all
lags at once** via an FFT autocorrelation + cumulative-energy identity, so
one utterance is a handful of batched FFTs/matmul-scale ops instead of a
Python loop. It runs under ``jit`` on TPU or CPU.

Algorithm (de Cheveigné & Kawahara 2002, as in ``librosa.yin``):
  d(τ)    = Σ_j (x[j] − x[j+τ])²   over a window of ``win_length`` samples
          = E[0] + E[τ] − 2·r(τ)   (energies via cumsum, r via rFFT)
  d'(τ)   = d(τ) · τ / Σ_{1..τ} d  (cumulative-mean normalization)
  f0      = sr / τ*, τ* = first trough of d' below ``trough_threshold``
            (else global argmin), refined by parabolic interpolation.
Unvoiced frames (no trough below threshold) return 0.0, matching the
reference's NaN→0 convention (``data_function.py:123``).

pyin adds an HMM smoother on top of YIN; for the capability here (a dense
per-frame f0 target, mean/std-normalized) plain YIN with voicing threshold
is the same interface and runs ~3 orders of magnitude faster.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["yin_pitch", "estimate_pitch", "normalize_pitch"]

# librosa.note_to_hz('C2'), ('C7') — the reference's pyin band.
FMIN_C2 = 65.40639132514966
FMAX_C7 = 2093.004522404789


@functools.partial(
    jax.jit,
    static_argnames=("sr", "frame_length", "hop_length", "win_length",
                     "fmin", "fmax", "n_frames", "center"),
)
def yin_pitch(
    audio: jax.Array,
    *,
    sr: int = 22050,
    frame_length: int = 1024,
    hop_length: int = 256,
    win_length: Optional[int] = None,
    fmin: float = FMIN_C2,
    fmax: float = FMAX_C7,
    trough_threshold: float = 0.1,
    n_frames: Optional[int] = None,
    center: bool = True,
) -> jax.Array:
    """Per-frame f0 in Hz (0.0 = unvoiced) for a mono waveform [T].

    ``center=True`` pads by frame_length//2 (librosa semantics); with
    ``n_frames`` set, the output is truncated/zero-padded to exactly that many
    frames so it aligns 1:1 with the mel frames.
    """
    if win_length is None:
        win_length = frame_length // 2
    tau_min = max(1, int(sr / fmax))
    tau_max = min(int(sr / fmin) + 1, frame_length - win_length - 1)

    x = jnp.asarray(audio, jnp.float32)
    if center:
        x = jnp.pad(x, (frame_length // 2, frame_length // 2))
    total = x.shape[0]
    n_avail = max(1, 1 + (total - frame_length) // hop_length)

    idx = (
        np.arange(n_avail, dtype=np.int32)[:, None] * hop_length
        + np.arange(frame_length, dtype=np.int32)[None, :]
    )
    frames = x[idx]  # [N, frame_length]

    # Autocorrelation r(τ) = Σ_{j<W} x[j]·x[j+τ] for all τ, via rFFT.
    n_fft = int(2 ** np.ceil(np.log2(2 * frame_length)))
    windowed = jnp.where(
        np.arange(frame_length)[None, :] < win_length, frames, 0.0
    )
    f_full = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    f_win = jnp.fft.rfft(windowed, n=n_fft, axis=-1)
    acf = jnp.fft.irfft(f_full * jnp.conj(f_win), n=n_fft, axis=-1)[:, : tau_max + 1]

    # Energy terms E[τ] = Σ_{j<W} x[j+τ]² via cumsum of squares.
    sq_cumsum = jnp.cumsum(jnp.square(frames), axis=-1)
    sq_cumsum = jnp.pad(sq_cumsum, ((0, 0), (1, 0)))
    tau_idx = np.arange(tau_max + 1, dtype=np.int32)
    energy_tau = sq_cumsum[:, tau_idx + win_length] - sq_cumsum[:, tau_idx]
    energy_0 = energy_tau[:, :1]

    diff = energy_0 + energy_tau - 2.0 * acf  # d(τ), [N, tau_max+1]
    diff = jnp.maximum(diff, 0.0)

    # Cumulative-mean-normalized difference d'(τ); d'(0) = 1.
    tau_f = jnp.asarray(tau_idx, jnp.float32)
    cum = jnp.cumsum(diff[:, 1:], axis=-1)
    cmnd = jnp.concatenate(
        [jnp.ones_like(diff[:, :1]),
         diff[:, 1:] * tau_f[None, 1:] / jnp.maximum(cum, 1e-12)],
        axis=-1,
    )

    # Troughs below threshold within [tau_min, tau_max).
    in_band = (tau_idx >= tau_min) & (tau_idx < tau_max)
    left = jnp.pad(cmnd[:, :-1], ((0, 0), (1, 0)), constant_values=np.inf)
    right = jnp.pad(cmnd[:, 1:], ((0, 0), (0, 1)), constant_values=np.inf)
    is_trough = (cmnd <= left) & (cmnd < right) & in_band[None, :]
    below = is_trough & (cmnd < trough_threshold)

    big = jnp.float32(1e9)
    # First qualifying trough; fall back to the global in-band minimum.
    first_tau = jnp.argmin(
        jnp.where(below, tau_f[None, :], big), axis=-1
    )
    any_below = jnp.any(below, axis=-1)
    fallback = jnp.argmin(jnp.where(in_band[None, :], cmnd, big), axis=-1)
    tau_star = jnp.where(any_below, first_tau, fallback)

    # Parabolic interpolation around tau_star on d'.
    t = tau_star
    d0 = jnp.take_along_axis(cmnd, jnp.maximum(t - 1, 0)[:, None], axis=1)[:, 0]
    d1 = jnp.take_along_axis(cmnd, t[:, None], axis=1)[:, 0]
    d2 = jnp.take_along_axis(cmnd, jnp.minimum(t + 1, tau_max)[:, None], axis=1)[:, 0]
    denom = 2.0 * (2.0 * d1 - d0 - d2)
    shift = jnp.where(jnp.abs(denom) > 1e-12, (d2 - d0) / denom, 0.0)
    shift = jnp.clip(shift, -0.5, 0.5)
    period = t.astype(jnp.float32) + shift

    f0 = jnp.where(any_below, sr / jnp.maximum(period, 1.0), 0.0)

    if n_frames is not None:
        if n_frames <= n_avail:
            f0 = f0[:n_frames]
        else:
            f0 = jnp.pad(f0, (0, n_frames - n_avail))
    return f0


def normalize_pitch(pitch, mean, std):
    """Mean/std normalize, keeping unvoiced zeros at zero
    (reference ``data_function.py:152-158``)."""
    zeros = pitch == 0.0
    out = (pitch - mean) / std
    return jnp.where(zeros, 0.0, out) if isinstance(out, jax.Array) else np.where(zeros, 0.0, out)


def estimate_pitch(
    audio,
    mel_len: Optional[int] = None,
    *,
    sr: int = 22050,
    hop_length: int = 256,
    frame_length: int = 1024,
    normalize_mean: Optional[float] = None,
    normalize_std: Optional[float] = None,
    n_formants: int = 1,
) -> np.ndarray:
    """Reference-API wrapper (``data_function.py:94-149``): waveform →
    [n_formants, n_frames] normalized f0 aligned with the mel frames."""
    if n_formants != 1:
        raise NotImplementedError("only 1 formant, like the reference")
    f0 = yin_pitch(
        jnp.asarray(audio), sr=sr, frame_length=frame_length,
        hop_length=hop_length, n_frames=mel_len,
    )
    f0 = np.asarray(f0, dtype=np.float32)
    if normalize_mean is not None:
        assert normalize_std is not None
        f0 = np.asarray(normalize_pitch(f0, normalize_mean, normalize_std))
    return f0[None, :]
