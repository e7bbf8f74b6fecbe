"""neuraltexttospeech_tpu — a TPU-native neural TTS framework in JAX.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
dmmagdal/NeuralTextToSpeech TF2 reference suite:

- ``audio``    — STFT / mel-filterbank DSP front-end (tf.signal-compatible
                 semantics, Pallas-fused fast path).
- ``text``     — English text normalization (cleaners, numbers, acronyms,
                 CMUdict/ARPAbet) and symbol tables.
- ``data``     — LJSpeech-style filelist datasets with cached features
                 (mel, pitch, energy, attention priors), bucketed static
                 padding and segment croppers.
- ``nn``       — shared neural building blocks (FFT transformer stacks,
                 ConvAttention aligner, normalization parametrizations).
- ``ops``      — TPU-first custom ops (monotonic alignment search as a
                 scanned wavefront DP, length regulation, fused mel kernel).
- ``models``   — the model zoo: FastPitch, Tacotron 2, Grad-TTS, HiFi-GAN,
                 DiffWave, Flowtron, FastSpeech 2, TalkNet 2.
- ``parallel`` — device-mesh construction and sharding rules (pjit DP with
                 mesh axes reserved for TP growth).
- ``train``    — one shared training harness: optax optimizers, grad accum,
                 bf16, orbax checkpoint/resume, metrics.
"""

__version__ = "0.1.0"
