"""YIN pitch estimator: accuracy on known tones, voicing, normalization."""

import numpy as np

from neuraltexttospeech_tpu.data.pitch import estimate_pitch, yin_pitch

SR = 22050


def _tone(f0: float, seconds: float = 1.0, sr: int = SR):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * f0 * t).astype(np.float32)


def test_detects_pure_tone_within_one_percent():
    for f0 in (110.0, 220.0, 440.0):
        est = np.asarray(yin_pitch(_tone(f0), sr=SR))
        voiced = est[est > 0]
        assert len(voiced) > 0.9 * len(est)
        assert abs(np.median(voiced) - f0) / f0 < 0.01, f0


def test_noise_is_mostly_unvoiced():
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(SR).astype(np.float32) * 0.1
    est = np.asarray(yin_pitch(noise, sr=SR))
    assert (est == 0).mean() > 0.5


def test_estimate_pitch_aligns_with_mel_and_normalizes():
    audio = _tone(200.0, 0.5)
    mel_len = 30
    p = estimate_pitch(audio, mel_len, sr=SR, normalize_mean=214.72203,
                       normalize_std=65.72038)
    assert p.shape == (1, mel_len)
    voiced = p[0][p[0] != 0]
    # 200 Hz normalized: (200 - 214.7)/65.7 ≈ -0.224
    assert abs(np.median(voiced) - (200.0 - 214.72203) / 65.72038) < 0.02


def test_octave_stability_on_harmonic_tone():
    """Tone with strong harmonics must not octave-jump."""
    t = np.arange(SR) / SR
    sig = (np.sin(2 * np.pi * 150 * t) + 0.5 * np.sin(2 * np.pi * 300 * t)
           + 0.3 * np.sin(2 * np.pi * 450 * t)).astype(np.float32)
    est = np.asarray(yin_pitch(sig, sr=SR))
    voiced = est[est > 0]
    assert abs(np.median(voiced) - 150.0) / 150.0 < 0.02
