from .mel import hann_window, hertz_to_mel, linear_to_mel_weight_matrix, mel_to_hertz
from .stft import (
    STFT,
    STFTConfig,
    dynamic_range_compression,
    frame_signal,
    mel_spectrogram,
    num_frames,
    stft_magnitude,
)

__all__ = [
    "STFT",
    "STFTConfig",
    "dynamic_range_compression",
    "frame_signal",
    "hann_window",
    "hertz_to_mel",
    "linear_to_mel_weight_matrix",
    "mel_spectrogram",
    "mel_to_hertz",
    "num_frames",
    "stft_magnitude",
]
