"""Config loading: yaml per component, CLI overrides on top.

Equivalent to the reference's tiered config plumbing (scripts/run.py:171-193
argparse-over-YAML via rift/util/run_util.py:load_config, plus per-policy
yamls under cbv/planning/config/). Hydra-style dotted overrides
("train.lr=2e-4") are supported for the fine-tuner configs.
"""

from __future__ import annotations

import copy
import os
from typing import Any

import yaml

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def load_config(name_or_path: str) -> dict[str, Any]:
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(CONFIG_DIR, name_or_path)
        if not path.endswith((".yaml", ".yml")):
            path += ".yaml"
    if not os.path.exists(path):
        return {"policy": os.path.splitext(os.path.basename(name_or_path))[0]}
    with open(path) as f:
        return yaml.safe_load(f) or {}


def apply_overrides(cfg: dict[str, Any], overrides: list[str]) -> dict[str, Any]:
    """Apply "a.b.c=value" overrides (hydra-style, rlft_pluto.py:46-54)."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, value = ov.split("=", 1)
        node = cfg
        parts = key.lstrip("+").split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        parsed = yaml.safe_load(value)
        if isinstance(parsed, str):
            # YAML 1.1 rejects bare e-notation like "2e-4"; accept it anyway
            try:
                parsed = float(parsed)
            except ValueError:
                pass
        node[parts[-1]] = parsed
    return cfg


def merge(base: dict, extra: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in (extra or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge(out[k], v)
        else:
            out[k] = v
    return out
