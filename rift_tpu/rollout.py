"""Fused rollout: K closed-loop ticks in one device program.

The reference pays a CARLA RPC + Python round-trip per tick
(env_wrapper.py:127-197). A single jitted tick still pays one host->device
dispatch per step — through a tunneled TPU that is ~20 ms. `rollout_chunk`
scans policy-act + env-step over `num_steps` ticks inside one jit, so
dispatch cost amortizes and XLA can overlap the whole pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .map.tensor_map import TensorMap
from .models.pluto.policy import pluto_cbv_act
from .scenario.criteria import CriteriaState
from .scenario.env import env_step
from .sim.state import ScenarioSpec, SimState


@partial(
    jax.jit,
    static_argnames=("model", "max_cbvs", "num_steps", "train", "with_policy"),
)
def rollout_chunk(
    model,
    params,
    tmap: TensorMap,
    spec: ScenarioSpec,
    state: SimState,
    crit: CriteriaState,
    max_cbvs: int = 3,
    num_steps: int = 10,
    train: bool = False,
    with_policy: bool = True,
):
    """Advance all scenarios `num_steps` ticks.

    Returns (state, crit, extras) where extras (train mode) stacks per-step
    buffer samples with leading dim [num_steps]:
      features, old_logits, advantage, adv_valid, sample_valid.
    """

    def body(carry, _):
        state, crit = carry
        if with_policy:
            res = pluto_cbv_act(
                model, params, tmap, spec, state, max_cbvs=max_cbvs, train=train
            )
            state, crit = env_step(
                tmap, spec, state, crit,
                cbv_traj=res["traj"], cbv_traj_mask=res["mask"],
                max_cbvs=max_cbvs,
            )
        else:
            res = None
            state, crit = env_step(tmap, spec, state, crit, max_cbvs=max_cbvs)
        if train and res is not None:
            S, C = res["cbv_slots"].shape
            flat = lambda x: x.reshape((S * C,) + x.shape[2:])
            out = {
                "features": jax.tree.map(flat, res["features"]),
                "old_logits": flat(res["old_logits"]),
                "advantage": flat(res["advantage"]),
                "valid": flat(res["adv_valid"]),
                "sample_valid": flat(res["cbv_slots"] >= 0)
                & flat(res["adv_valid"]).any(axis=(-2, -1)),
            }
        else:
            out = None
        return (state, crit), out

    (state, crit), extras = jax.lax.scan(
        body, (state, crit), None, length=num_steps
    )
    return state, crit, extras
