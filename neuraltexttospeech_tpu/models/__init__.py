"""Model zoo: the eight families of the reference suite, TPU-native.

Acoustic: FastPitch, FastSpeech 2, Tacotron 2, Grad-TTS, Flowtron,
TalkNet 2. Vocoders: HiFi-GAN, DiffWave.
"""

from .diffwave import DiffWave, DiffWaveConfig, diffwave_loss, reverse_sample
from .fastpitch import FastPitch, FastPitchConfig, FastPitchOutput
from .fastpitch_loss import FastPitchLossConfig, fastpitch_loss
from .fastspeech2 import FastSpeech2, FastSpeech2Config, fastspeech2_loss
from .flowtron import Flowtron, FlowtronConfig, flowtron_loss
from .gradtts import GradTTS, GradTTSConfig
from .hifigan import (
    Generator, HiFiGANConfig, MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
from .hifigan_gan import HiFiGANTrainState, hifigan_train_step, init_hifigan
from .tacotron2 import Tacotron2, Tacotron2Config, tacotron2_loss
from .tacotron2_train import init_tacotron2, tacotron2_train_step
from .talknet import QuartzNet, QuartzNetConfig, TalkNet2Config

__all__ = [
    "DiffWave", "DiffWaveConfig", "diffwave_loss", "reverse_sample",
    "FastPitch", "FastPitchConfig", "FastPitchOutput",
    "FastPitchLossConfig", "fastpitch_loss",
    "FastSpeech2", "FastSpeech2Config", "fastspeech2_loss",
    "Flowtron", "FlowtronConfig", "flowtron_loss",
    "GradTTS", "GradTTSConfig",
    "Generator", "HiFiGANConfig", "MultiPeriodDiscriminator",
    "MultiScaleDiscriminator", "HiFiGANTrainState", "hifigan_train_step",
    "init_hifigan",
    "Tacotron2", "Tacotron2Config", "tacotron2_loss", "init_tacotron2",
    "tacotron2_train_step",
    "QuartzNet", "QuartzNetConfig", "TalkNet2Config",
]
