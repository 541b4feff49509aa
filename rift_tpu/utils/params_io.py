"""Portable flax-params serialization: flat npz keyed by tree path.

The canonical pretrain artifact format: the quality-parity experiment
(tools/quality_experiment.py) saves the bootstrap-pretrained Pluto as one
npz which every fine-tuned variant then loads as its starting point — the
equivalent of the reference's `pluto_1M_aux_cil.ckpt` load path
(rift/cbv/planning/pluto/pluto.py:130-137) without the Lightning/disk
round-trip format.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np


def _key_name(k) -> str:
    """Tree-path entry -> plain dict key. str(DictKey) is version-dependent
    (\"DictKey(key='x')\" in older jax, \"['x']\" since 0.4.27), which made
    load_params_npz rebuild mismatched keys and merge_params silently keep
    the fresh init — every pretrain load was a no-op. Use the attribute."""
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def save_params_npz(params, path: str):
    """Flat npz of a (nested-dict) params pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez(path, **{
        "/".join(_key_name(k) for k in p): np.asarray(v) for p, v in flat
    })


def load_params_npz(path: str) -> dict:
    """Rebuild the nested params dict from a save_params_npz file."""
    data = np.load(path)
    out: dict = {}
    for key in data.files:
        parts = []
        for p in key.split("/"):
            # legacy stringified-path formats from older artifacts
            m = re.match(r"DictKey\(key='(.+?)'\)", p) or re.match(
                r"\['(.+?)'\]", p
            )
            parts.append(m.group(1) if m else p)
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(data[key])
    return out


def merge_params(template: dict, loaded: dict) -> dict:
    """Recursively overlay `loaded` onto `template`: keys present in both
    take the loaded value, template-only keys keep their (e.g. freshly
    initialised) value — so a pretrain without a value head still loads
    into ppo_pluto's value-headed model. Raises if NOTHING matches: a
    zero-overlap merge means the artifact's key format is wrong and the
    \"load\" would silently be a no-op."""

    def rec(template, loaded):
        out, n = {}, 0
        for k, v in template.items():
            if k in loaded:
                if isinstance(v, dict):
                    out[k], m = rec(v, loaded[k])
                    n += m
                else:
                    out[k] = loaded[k]
                    n += 1
            else:
                out[k] = v
        return out, n

    out, matched = rec(template, loaded)
    if matched == 0:
        raise ValueError(
            "merge_params: no keys in the loaded artifact match the params "
            f"template (template top-level: {list(template)[:4]}, loaded "
            f"top-level: {list(loaded)[:4]}) — wrong or corrupt npz"
        )
    return out
