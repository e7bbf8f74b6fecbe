"""Model registry — name → (module class, config class).

Parity with the reference's model-arg registry
(``FastPitch_TF/models.py:8-78`` ``get_model``/``get_model_config``), one
registry for all eight families instead of per-dir copies.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from .diffwave import DiffWave, DiffWaveConfig
from .fastpitch import FastPitch, FastPitchConfig
from .fastspeech2 import FastSpeech2, FastSpeech2Config
from .flowtron import Flowtron, FlowtronConfig
from .gradtts import GradTTS, GradTTSConfig
from .hifigan import Generator as HiFiGANGenerator, HiFiGANConfig
from .tacotron2 import Tacotron2, Tacotron2Config
from .talknet import QuartzNet, QuartzNetConfig

__all__ = ["MODEL_REGISTRY", "get_model", "get_model_config"]

MODEL_REGISTRY: Dict[str, Tuple[type, type]] = {
    "FastPitch": (FastPitch, FastPitchConfig),
    "FastSpeech2": (FastSpeech2, FastSpeech2Config),
    "Tacotron2": (Tacotron2, Tacotron2Config),
    "GradTTS": (GradTTS, GradTTSConfig),
    "Flowtron": (Flowtron, FlowtronConfig),
    "QuartzNet": (QuartzNet, QuartzNetConfig),
    "HiFiGAN": (HiFiGANGenerator, HiFiGANConfig),
    "DiffWave": (DiffWave, DiffWaveConfig),
}


def get_model_config(name: str, **overrides: Any):
    """Build a model's config dataclass with keyword overrides."""
    _, config_cls = MODEL_REGISTRY[name]
    return config_cls(**overrides)


def get_model(name: str, config=None, **overrides: Any):
    """Instantiate a model by name (reference ``models.py:get_model``)."""
    model_cls, config_cls = MODEL_REGISTRY[name]
    if config is None:
        config = config_cls(**overrides)
    if name == "QuartzNet":
        # QuartzNet needs an output size; default to the ASR vocab (29).
        return model_cls(overrides.pop("c_output", 29), config)
    return model_cls(config)
