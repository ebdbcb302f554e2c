"""Configuration system.

Parity target: reference `env.py:5-15` (AttrDict + build_env) and the vocoder JSON
config `config_custom.json`. The JSON schema is identical so existing configs are
drop-in loadable.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Mapping


class AttrDict(dict):
    """Dict with attribute access (reference `env.py:5-8`)."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        self.__dict__ = self


def load_config(path: str) -> AttrDict:
    """Load a JSON config file into an AttrDict (reference `train.py:290-294`)."""
    with open(path, "r", encoding="utf-8") as f:
        return AttrDict(json.load(f))


def build_env(config: str, config_name: str, path: str) -> None:
    """Archive the config file next to the checkpoints (reference `env.py:11-15`)."""
    t_path = os.path.join(path, config_name)
    if config != t_path:
        os.makedirs(path, exist_ok=True)
        shutil.copyfile(config, t_path)


def save_config(h: Mapping[str, Any], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(dict(h), f, indent=2)


# Default vocoder hyperparameters, mirroring the reference `config_custom.json`.
# sr=11413, hop=420 gives exactly one mel frame per ~27.2fps rtMRI video frame —
# the core alignment invariant of the whole pipeline.
DEFAULT_VOCODER_CONFIG: dict = {
    "resblock": "1",
    "num_gpus": 1,  # kept for config compatibility; unused (device mesh instead)
    "batch_size": 16,
    "learning_rate": 5e-05,
    "adam_b1": 0.8,
    "adam_b2": 0.99,
    "lr_decay": 0.999,
    "seed": 1234,
    "upsample_rates": [10, 7, 3, 2],
    "upsample_kernel_sizes": [20, 15, 7, 4],
    "upsample_initial_channel": 512,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "segment_size": 8400,
    "num_mels": 64,
    "num_freq": 1025,
    "n_fft": 2048,
    "hop_size": 420,
    "win_size": 2048,
    "sampling_rate": 11413,
    "fmin": 0,
    "fmax": 8000,
    "fmax_for_loss": None,
    "num_workers": 4,
}


def default_vocoder_config(**overrides: Any) -> AttrDict:
    cfg = dict(DEFAULT_VOCODER_CONFIG)
    cfg.update(overrides)
    return AttrDict(cfg)
