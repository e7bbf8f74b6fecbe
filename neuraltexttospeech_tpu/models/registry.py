"""Model registry — name → (module class, config class) + config persistence.

Parity with the reference's model-arg registry
(``FastPitch_TF/models.py:8-78`` ``get_model``/``get_model_config``), one
registry for all eight families instead of per-dir copies. Training CLIs
persist their model config as ``model_config.json`` in the run directory
(the capability the reference got from SavedModel ``get_config()``,
``DiffWave_TF/model.py:46-55``); inference CLIs restore it so a checkpoint
is self-describing.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, Tuple

from .diffwave import DiffWave, DiffWaveConfig
from .fastpitch import FastPitch, FastPitchConfig
from .fastspeech2 import FastSpeech2, FastSpeech2Config
from .flowtron import Flowtron, FlowtronConfig
from .gradtts import GradTTS, GradTTSConfig
from .hifigan import Generator as HiFiGANGenerator, HiFiGANConfig
from .tacotron2 import Tacotron2, Tacotron2Config
from .talknet import QuartzNet, QuartzNetConfig, TalkNet2Config

__all__ = ["MODEL_REGISTRY", "CONFIG_REGISTRY", "get_model",
           "get_model_config", "config_to_dict", "config_from_dict",
           "save_model_config", "load_model_config", "find_model_config",
           "load_frontend_config", "apply_overrides"]

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

# configs addressable by name (incl. the TalkNet2 head config, whose three
# heads share one config but aren't a single registry model)
CONFIG_REGISTRY: Dict[str, type] = {
    name: cfg for name, (_, cfg) in MODEL_REGISTRY.items()
}
CONFIG_REGISTRY["TalkNet2"] = TalkNet2Config


def config_to_dict(config) -> dict:
    """Dataclass config → JSON-able dict (drops ``dtype``, recurses)."""

    def conv(v):
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            return {f.name: conv(getattr(v, f.name))
                    for f in dataclasses.fields(v) if f.name != "dtype"}
        if isinstance(v, (tuple, list)):
            return [conv(x) for x in v]
        return v

    return conv(config)


def _tuplify(v):
    if isinstance(v, list):
        return tuple(_tuplify(x) for x in v)
    return v


def config_from_dict(config_cls: type, data: dict):
    """Rebuild a config dataclass: lists → tuples (configs must stay
    hashable for jit static args), nested dataclasses by default-instance
    type."""
    template = config_cls()
    kw = {}
    for f in dataclasses.fields(config_cls):
        if f.name == "dtype" or f.name not in data:
            continue
        v = data[f.name]
        current = getattr(template, f.name)
        if dataclasses.is_dataclass(current) and not isinstance(current, type):
            v = config_from_dict(type(current), v)
        else:
            v = _tuplify(v)
        kw[f.name] = v
    return config_cls(**kw)


def apply_overrides(config, overrides):
    """Apply ``["key=value", ...]`` onto a config dataclass; dotted keys reach
    nested configs (``backbone.module_repeat=1``). Values parse as JSON with a
    plain-string fallback; lists become tuples. The CLI counterpart of the
    reference's ``update_params`` (``Flowtron_TF/train.py:23-41``)."""
    for item in overrides or []:
        key, _, raw = item.partition("=")
        try:
            value = _tuplify(json.loads(raw))
        except (ValueError, TypeError):
            value = raw
        parts = key.strip().split(".")
        config = _replace_path(config, parts, value)
    return config


def _replace_path(config, parts, value):
    if len(parts) == 1:
        return dataclasses.replace(config, **{parts[0]: value})
    child = _replace_path(getattr(config, parts[0]), parts[1:], value)
    return dataclasses.replace(config, **{parts[0]: child})


def save_model_config(output_dir, name: str, config, frontend=None) -> None:
    """Write ``model_config.json`` into a training run directory.

    ``frontend``: optional dict of text front-end settings the run trained
    with (``text_cleaners``/``symbol_set``/``p_arpabet``), so downstream
    consumers (inference CLIs, ``tools/align_from_fastpitch.py``) can encode
    text exactly as the checkpoint saw it instead of guessing defaults."""
    p = pathlib.Path(output_dir)
    p.mkdir(parents=True, exist_ok=True)
    payload = {"model": name, "config": config_to_dict(config)}
    if frontend:
        payload["frontend"] = frontend
    (p / "model_config.json").write_text(json.dumps(payload, indent=1))


def load_frontend_config(path, default=None):
    """Read the saved text front-end dict from a run's ``model_config.json``
    (``path`` may be the json file, the run dir, or its checkpoints subdir);
    returns ``default`` when the file or the key is absent."""
    found = find_model_config(path)
    if found is None:
        return default
    return json.loads(found.read_text()).get("frontend", default)


def find_model_config(path) -> pathlib.Path | None:
    """Locate ``model_config.json`` for a file, run dir, or checkpoint dir
    (checks the path, the dir itself, and its parent run dir)."""
    p = pathlib.Path(path)
    if p.is_file():
        return p
    for cand in (p / "model_config.json", p.parent / "model_config.json"):
        if cand.exists():
            return cand
    return None


def load_model_config(path):
    """Read (model_name, config) from ``model_config.json``; ``path`` may be
    the json file, the run dir, or its ``checkpoints`` subdir."""
    found = find_model_config(path)
    if found is None:
        raise FileNotFoundError(f"no model_config.json near {path}")
    data = json.loads(found.read_text())
    return data["model"], config_from_dict(CONFIG_REGISTRY[data["model"]],
                                           data["config"])


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
