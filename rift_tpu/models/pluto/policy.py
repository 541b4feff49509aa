"""Pluto CBV policy: the on-device rollout driver.

Replaces the reference's PLUTO / RIFTPluto policy objects
(rift/cbv/planning/pluto/pluto.py:78-259,
rift/cbv/planning/fine_tuner/rlft/rift_pluto/rift_pluto.py:28-161): per-env
Python loops, `.cpu().numpy()` readbacks and per-CBV PID objects become one
jitted program: features -> model forward -> candidate selection -> local
tracking waypoints, plus (in train mode) the fused GRPO advantage — all
without leaving the device.

Candidate selection follows _trim_candidates (pluto.py:196-247): softmax over
the top-k flattened R*M probabilities, with the ref-free trajectory appended
at fixed score 0.25; the executed action is the argmax.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ...map.tensor_map import TensorMap
from ...rl.evaluator import NUM_FRAMES, grpo_advantage_batched
from ...scenario.recognition import cbv_slot_assignment
from ...sim.state import ScenarioSpec, SimState
from .features import build_cbv_features

TOPK = 10  # reference config rift_pluto.yaml topk
REF_FREE_SCORE = 0.25
NUM_NEIGHBORS = 8  # forecast neighbors per CBV in train mode
TEACHER_HORIZON_S = 4.0  # teacher pose lookahead (evaluator's 40 frames)
TEACHER_NUM_FRAMES = 80  # full candidate horizon (8 s at 10 fps)
TEACHER_HORIZON_STEP = 39  # frame 40 = 4 s (waypoint i is frame i+1)
# BC supervision frames: every 8th of the 80-step candidate horizon
# BC regression anchors EVERY frame. The tracker's aim point and desired
# speed resample the raw candidate (pid_controller.py:57-76); r3 anchored
# only every 8th frame, which left the in-between frames free to collapse
# toward the origin — the zigzag inflated mean-segment desired speed (25
# m/s overshoot) after it had first produced the 0.4 m/s crawl.
BC_FRAME_IDX = tuple(range(80))


def select_trajectory(out: dict, topk: int = TOPK):
    """Executed trajectory per batch element.

    Returns (traj [B, T, 3] local frame, chosen_flat_idx [B], use_ref_free [B]).
    """
    prob = out["probability"]  # [B, R, M] (invalid R already -1e6)
    B, R, M = prob.shape
    flat = prob.reshape(B, R * M)
    k = min(topk, R * M)
    top_vals, top_idx = jax.lax.top_k(flat, k)
    sm = jax.nn.softmax(top_vals, axis=-1)
    best_cand_score = sm[:, 0]
    use_ref_free = best_cand_score < REF_FREE_SCORE

    cand = out["candidate_trajectories"].reshape(B, R * M, -1, 3)
    best_idx = top_idx[:, 0]
    best_cand = cand[jnp.arange(B), best_idx]
    if "output_ref_free_trajectory" in out:
        traj = jnp.where(
            use_ref_free[:, None, None], out["output_ref_free_trajectory"], best_cand
        )
    else:
        traj = best_cand
        use_ref_free = jnp.zeros(B, bool)
    return traj, best_idx, use_ref_free


def _neighbor_states(state: SimState, scenario, slot, n_nbr: int):
    """The CBV's nearest alive agents (train-mode forecast inputs)."""
    pos = state.pos[scenario]
    A = pos.shape[0]
    d = jnp.linalg.norm(pos - pos[slot], axis=-1)
    d = jnp.where(state.alive[scenario] & (jnp.arange(A) != slot), d, jnp.inf)
    k = min(n_nbr, A)
    neg, idx = jax.lax.top_k(-d, k)
    valid = jnp.isfinite(-neg)
    if k < n_nbr:
        idx = jnp.pad(idx, (0, n_nbr - k))
        valid = jnp.pad(valid, (0, n_nbr - k))
    return (
        state.pos[scenario][idx],
        state.heading[scenario][idx],
        state.speed[scenario][idx],
        state.control[scenario][idx],
        state.shape[scenario][idx],
        valid,
    )


@partial(jax.jit, static_argnames=("model",))
def canonical_map_tokens(model: Any, params: Any, tmap: TensorMap):
    """Precompute the canonical per-lane map tokens [L, D] (MapEncoder's
    PointsEncoder + type/speed embeds over frame-invariant lane features).

    Pure function of (params, tmap): valid for as long as both are frozen —
    a whole eval run, or between fine-tune fits. Passing the result as
    `map_tok` to pluto_cbv_act removes the map PointsEncoder from the
    per-tick forward entirely (the reference re-encodes every polygon per
    CBV per tick, pluto_feature_builder.py:259-359)."""
    from .features import canonical_map_features

    sh = canonical_map_features(tmap)
    data = {
        "shared": {
            "map_feat": sh["feat"],
            "map_type": sh["type"],
            "map_speed": sh["speed"],
        },
        "map_tokens_only": True,
    }
    return model.apply(params, data)


@partial(
    jax.jit,
    static_argnames=(
        "model", "max_cbvs", "train", "topk", "canonical", "adv_debug",
        "execute_teacher",
    ),
)
def pluto_cbv_act(
    model: Any,
    params: Any,
    tmap: TensorMap,
    spec: ScenarioSpec,
    state: SimState,
    max_cbvs: int = 3,
    train: bool = False,
    topk: int = TOPK,
    canonical: bool = False,
    map_tok: jnp.ndarray | None = None,
    adv_debug: bool = False,  # evaluator reward-component attribution
    execute_teacher: bool = False,  # BC pretrain: CBVs drive the teacher path
):
    """Plan all CBVs of all scenarios.

    Returns dict:
      traj [S, A, T, 2]  local waypoints scattered into agent slots
      mask [S, A]        which agents are CBV-controlled this tick
      features           the [S, C]-leading feature pytree (for the buffer)
      cbv_slots [S, C]
      old_logits [S, C, R, M], advantage [S, C, R, M], adv_valid [S, C, R, M]
        (train mode only; zeros otherwise)
    """
    S, A = state.alive.shape
    cbv_slots = cbv_slot_assignment(state.is_cbv, max_cbvs)  # [S, C]
    C = cbv_slots.shape[1]

    if canonical:
        # frame-invariant token mode: encoders run once per world
        # agent / map lane; the per-CBV forward gathers tokens
        feats, slot_valid, shared = build_cbv_features(
            tmap, state, cbv_slots, spec,
            canonical=True, with_sample_feats=train,
        )
    else:
        feats, slot_valid = build_cbv_features(tmap, state, cbv_slots, spec)
    flat_feats = jax.tree.map(lambda x: x.reshape((S * C,) + x.shape[2:]), feats)
    if canonical:
        model_in = dict(flat_feats)
        model_in["shared"] = {
            **shared, "scen_idx": jnp.repeat(jnp.arange(S), C)
        }
        if map_tok is not None:
            model_in["shared"]["map_tok"] = map_tok
    else:
        model_in = dict(flat_feats)
    # rollout forwards never consume the agent-prediction aux head (it
    # exists for checkpoint parity and aux-loss work); skip its compute
    model_in["no_aux"] = True
    out = model.apply(params, model_in)

    traj3, chosen_idx, _ = select_trajectory(out, topk)
    wp = traj3[..., :2]  # [S*C, T, 2] local-frame waypoints

    # scatter into the [S, A] agent layout
    T = wp.shape[-2]
    wp_sc = wp.reshape(S, C, T, 2)
    traj = jnp.zeros((S, A, T, 2))
    slot = jnp.maximum(cbv_slots, 0)
    traj = jax.vmap(
        lambda t, sl, w, v: t.at[sl].set(
            jnp.where(v[:, None, None], w, t[sl])
        )
    )(traj, slot, wp_sc, slot_valid)
    mask = jnp.zeros((S, A), bool)
    mask = jax.vmap(
        lambda m, sl, v: m.at[sl].set(v | m[sl])
    )(mask, slot, slot_valid)
    mask = mask.at[:, 0].set(False)  # slot 0 is the ego

    result = {
        "traj": traj,
        "mask": mask,
        "features": feats,
        "cbv_slots": cbv_slots,
        "chosen_idx": chosen_idx.reshape(S, C),
    }

    R, M = out["probability"].shape[1:3]
    if train:
        prob = out["probability"].reshape(S, C, R, M)

        # -------- executed-transition training signals ----------------
        # critic value (ppo_pluto's value head; zeros when the model has none)
        result["value"] = (
            out["value"].reshape(S, C)
            if "value" in out
            else jnp.zeros((S, C))
        )
        # privileged teacher TRAJECTORY: lane-chain follow with a
        # kinematically-feasible speed profile from the CBV's current speed
        # toward the leader/limit/lights-aware STEADY target — the pose+speed
        # teacher of the reference (sft/teacher/autopilot.py IDM integration;
        # sft_trainer.py:182-215 generate_target_label) and the regression
        # target for the bootstrap BC pretrain (policies.BCPlutoPolicy).
        # The profile must not depend on the student's own slow habits:
        # a stopped CBV's teacher accelerates to the limit (see
        # sim/world.autopilot_steady_speed).
        from ...sim.autopilot import IDM_BRAKE, IDM_MAX_ACCEL, lane_follow_waypoints
        from ...sim.world import autopilot_steady_speed

        scen0 = jnp.arange(S)[:, None]
        v_steady_all = autopilot_steady_speed(tmap, state)  # [S, A]
        v_steady = jnp.take_along_axis(v_steady_all, slot, axis=1)  # [S, C]
        v0 = state.speed[scen0, slot]  # [S, C]
        t_k = 0.1 * (1.0 + jnp.arange(TEACHER_NUM_FRAMES, dtype=jnp.float32))
        v_k = jnp.clip(
            v_steady[..., None],
            jnp.maximum(v0[..., None] - IDM_BRAKE * t_k, 0.0),
            v0[..., None] + IDM_MAX_ACCEL * t_k,
        )  # [S, C, 80] frame speeds
        teacher_wp = lane_follow_waypoints(
            tmap,
            state.lane[scen0, slot],
            state.pos[scen0, slot],
            state.heading[scen0, slot],
            state.bv_branch_bits[scen0, slot],
            jnp.maximum(v_k * 0.1, 1e-3),
            num_points=TEACHER_NUM_FRAMES,
            n_chain=8,  # the 80-frame horizon spans several short lanes
        )  # [S, C, 80, 2] local frame, point i = frame i+1
        # teacher label speed over the first second (the window
        # _candidate_speeds scores candidates on)
        result["teacher_speed"] = v_k[..., :10].mean(-1)
        result["teacher_pos"] = teacher_wp[..., TEACHER_HORIZON_STEP, :]
        result["teacher_traj"] = teacher_wp  # all 80 frames (BC_FRAME_IDX)
        if execute_teacher:
            # expert rollouts (BC pretrain): CBVs EXECUTE the teacher path,
            # so cloning sees expert-visitation states (the nuPlan-log
            # equivalent) instead of the student's own crawl states
            traj = jnp.zeros((S, A, TEACHER_NUM_FRAMES, 2))
            traj = jax.vmap(
                lambda t, sl, w, v: t.at[sl].set(
                    jnp.where(v[:, None, None], w, t[sl])
                )
            )(traj, slot, teacher_wp, slot_valid)
            result["traj"] = traj
        # desired speed implied by the executed trajectory (the PID tracker's
        # desired speed = mean waypoint spacing / dt, pid_controller.py:57-76)
        exec_wp = teacher_wp if execute_teacher else wp_sc
        step_d = jnp.linalg.norm(jnp.diff(exec_wp[:, :, :10], axis=2), axis=-1)
        result["exec_speed"] = step_d.mean(-1) / 0.1

        # neighbor gathering stays vmapped (cheap); the heavy evaluator runs
        # natively batched over all S*C CBVs so the sequential re-tracking
        # rollout is ONE full-occupancy Pallas kernel (ops/retrack.py)
        scen = jnp.broadcast_to(jnp.arange(S)[:, None], (S, C))
        nbr = jax.vmap(jax.vmap(
            lambda sc, sl_: _neighbor_states(state, sc, sl_, NUM_NEIGHBORS)
        ))(scen, slot)
        B = S * C
        fb = lambda x: x.reshape((B,) + x.shape[2:])
        rl = feats["reference_line"]
        traj_rm = out["trajectory"].reshape(B, R, M, -1, 6)
        adv = grpo_advantage_batched(
            tmap,
            traj_rm,
            fb(rl["valid_mask"]).any(-1),
            fb(rl["position"]),
            fb(rl["orientation"]),
            fb(rl["valid_mask"]),
            state.pos[scen, slot].reshape(B, 2),
            state.heading[scen, slot].reshape(B),
            state.speed[scen, slot].reshape(B),
            state.shape[scen, slot].reshape(B, 2),
            *[fb(x) for x in nbr],
            debug=adv_debug,
        )
        adv = jax.tree.map(lambda x: x.reshape((S, C) + x.shape[1:]), adv)
        result["old_logits"] = prob
        result["advantage"] = adv["advantage"]
        result["adv_valid"] = adv["valid_mask"] & slot_valid[..., None, None]
        result["rollout_return"] = adv["rollout_return"]
        for k, v in adv.items():
            if k.startswith("dbg_"):
                result[k] = v
    else:
        result["old_logits"] = jnp.zeros((S, C, R, M))
        result["advantage"] = jnp.zeros((S, C, R, M))
        result["adv_valid"] = jnp.zeros((S, C, R, M), bool)
        result["rollout_return"] = jnp.zeros((S, C, R, M))
        result["value"] = jnp.zeros((S, C))
        result["teacher_speed"] = jnp.zeros((S, C))
        result["teacher_pos"] = jnp.zeros((S, C, 2))
        result["teacher_traj"] = jnp.zeros((S, C, len(BC_FRAME_IDX), 2))
        result["exec_speed"] = jnp.zeros((S, C))

    return result
