"""Data pipelines: filelist datasets with cached features, vocoder segment
datasets, pitch/prior extraction, MFA preprocessing."""

from .dataset import FastPitchDataset
from .filelist import load_filepaths_and_text, load_wav, save_wav
from .mel_dataset import VocoderDataset
from .pitch import estimate_pitch, yin_pitch
from .prior import BetaBinomialInterpolator, beta_binomial_prior_distribution

__all__ = ["FastPitchDataset", "VocoderDataset", "load_filepaths_and_text",
           "load_wav", "save_wav", "estimate_pitch", "yin_pitch",
           "BetaBinomialInterpolator", "beta_binomial_prior_distribution"]
