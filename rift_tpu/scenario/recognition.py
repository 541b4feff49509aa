"""CBV recognition: promote background vehicles to adversaries.

Vectorized equivalent of the reference's recognition stack
(rift/cbv/recognition/base_cbv.py:66-192 + rule_cbv.py:19-24): candidates are
alive background vehicles 10-60 m from the ego, on-road, whose DRIVING
distance to some upcoming ego-route waypoint is comparable to the ego's own
route distance to it (interaction-point matching). The reference runs an A*
route query per candidate per waypoint; here the reset-time route-distance
field (ScenarioSpec.lane_route_dist/join, map/routing.py) turns each
candidate's graph distance into two gathers:
`d_cand(w) = (D[lane] - s_on_lane) + (w_s - J[lane])`.

The closest matching candidates become CBVs (RuleCBVRecog semantics), each
assigned a goal ~GOAL_AHEAD m along its OWN precomputed lane chain — the
extended random-road-option CBV route of the reference's planner
(rift/cbv/planning/route_planner/route_planner.py:162-215), with the fork
choice taken from the agent's branch bits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..map.tensor_map import TensorMap
from ..sim.state import ScenarioSpec, SimState

MIN_EGO_DIST = 10.0
MAX_EGO_DIST = 60.0  # search_radius (rule.yaml)
# |d_cbv - d_ego| acceptance threshold: min_interaction_dis_diff — 60 m in
# train mode, 20 m in eval (rule.yaml:11,27)
INTERACTION_TOLERANCE = 60.0
INTERACTION_TOLERANCE_EVAL = 20.0
MAX_EGO_ROUTE_AHEAD = 80.0  # max_ego_route_len waypoints (rule.yaml:13)
GOAL_AHEAD = 400.0  # CBV goal distance along its own chain
# (route_planner.py:162-215 + rule.yaml:12 max_route_len 400: the CBV
# route is extended to ~400 m; driving it is what accrues the paper's
# RP 564-995 m route-progress numbers)
MIN_GOAL_DIST = 20.0  # don't promote a candidate whose chain ends at its
# feet: the goal would be reached instantly and churn the slot (the r3
# quality runs logged 84 promote/demote cycles with 0 m progress)
RECOG_WARMUP_TICKS = 25  # reference: no recognition before tick 25
RECOG_INTERVAL = 2  # reference: every 2 ticks (carla_env.py:180-208)


@partial(jax.jit, static_argnames=("max_cbvs",))
def recognize_cbvs(
    tmap: TensorMap,
    spec: ScenarioSpec,
    state: SimState,
    max_cbvs: int = 3,
):
    """Returns (is_cbv [S, A], goal [S, A, 2], goal_valid [S, A],
    interaction_idx [S, A] route-waypoint index or -1).

    Existing CBVs keep their status/goal; only free slots are filled
    (the reference adds CBVs incrementally up to max_agent_num).
    """
    S, A = state.alive.shape
    ego_pos = state.pos[:, 0]
    route = spec.ego_route[..., :2]  # [S, W, 2]
    W = route.shape[1]

    # matching only looks MAX_EGO_ROUTE_AHEAD m ahead of the ego's cursor, so
    # gather that window instead of scanning the full padded route (1 m
    # spacing -> window of W_WIN waypoints)
    W_WIN = int(MAX_EGO_ROUTE_AHEAD) + 16
    base = jnp.clip(state.ego_route_cursor.astype(jnp.int32), 0, W - 1)  # [S]
    w_abs = jnp.minimum(base[:, None] + jnp.arange(W_WIN)[None], W - 1)  # [S, W']
    route_w = jax.vmap(lambda r, i: r[i])(route, w_abs)  # [S, W', 2]
    w_f = w_abs.astype(jnp.float32)
    route_valid = w_abs < spec.ego_route_len[:, None]

    # ego route distance to each windowed waypoint (1 m spacing)
    d_ego = w_f - state.ego_route_cursor[:, None]  # [S, W']
    ahead = (d_ego >= 0) & (d_ego <= MAX_EGO_ROUTE_AHEAD) & route_valid

    # candidate DRIVING distance to each waypoint via the route-distance
    # field: d_cand(w) = (D[lane] - s_on_lane) + (w_s - J[lane]); falls back
    # to the Euclidean proxy when the spec carries no field
    if spec.lane_route_dist is not None:
        lane = jnp.maximum(state.lane, 0)  # [S, A]
        s_on, _, _ = tmap.project(lane, state.pos)  # [S, A]
        D = jnp.take_along_axis(spec.lane_route_dist, lane, axis=1)  # [S, A]
        J = jnp.take_along_axis(spec.lane_route_join, lane, axis=1)
        # waypoint arclength (1 m spacing -> index = meters)
        d_cbv = (D - s_on)[..., None] + (w_f[:, None] - J[..., None])
        reachable = (D < 1e8)[..., None] & (
            w_f[:, None] >= J[..., None] - 1.0
        ) & (d_cbv > -2.0)
        d_cbv = jnp.where(reachable, jnp.maximum(d_cbv, 0.0), jnp.inf)
    else:
        d_cbv = jnp.linalg.norm(
            route_w[:, None] - state.pos[:, :, None], axis=-1
        )  # [S, A, W']
    mismatch = jnp.abs(d_cbv - d_ego[:, None])
    mismatch = jnp.where(ahead[:, None] & jnp.isfinite(d_cbv), mismatch, jnp.inf)
    best_w_win = jnp.argmin(mismatch, axis=-1)  # [S, A] window index
    best_w = jnp.take_along_axis(w_abs, best_w_win, axis=-1)  # absolute index
    best_mismatch = jnp.min(mismatch, axis=-1)
    best_mismatch = jnp.where(jnp.isfinite(best_mismatch), best_mismatch, jnp.inf)

    # goal: ~GOAL_AHEAD m along the candidate's OWN lane chain (extended
    # random-road-option CBV route; branch picked by the agent's fork bits)
    if spec.lane_chains is not None:
        goal_pos = _chain_goal(tmap, spec, state, GOAL_AHEAD)
    else:
        goal_w = jnp.minimum(
            best_w + jnp.int32(30), spec.ego_route_len[:, None] - 1
        )
        goal_pos = jnp.take_along_axis(
            route, goal_w[..., None].repeat(2, -1), axis=1
        )
    # a goal at the candidate's feet (short chain) would be "reached"
    # instantly -> demote -> re-promote churn with zero progress
    goal_far = (
        jnp.linalg.norm(goal_pos - state.pos, axis=-1) > MIN_GOAL_DIST
    )

    dist_ego = jnp.linalg.norm(state.pos - ego_pos[:, None], axis=-1)
    on_road = ~state.offroad
    # only background *vehicles* are promotable (reference candidates come
    # from the vehicle actor registry, base_cbv.py:66-192)
    is_bv = state.alive & ~state.is_cbv & (state.agent_class == 0)
    is_bv = is_bv.at[:, 0].set(False)  # ego never a CBV
    candidate = (
        is_bv
        & (dist_ego > MIN_EGO_DIST)
        & (dist_ego < MAX_EGO_DIST)
        & on_road
        & (best_mismatch < INTERACTION_TOLERANCE)
        & goal_far
    )

    # fill free CBV slots with the closest candidates
    n_current = state.is_cbv.sum(-1).astype(jnp.int32)
    free = jnp.maximum(max_cbvs - n_current, 0)  # [S]
    score = jnp.where(candidate, dist_ego, jnp.inf)
    order = jnp.argsort(score, axis=-1)  # closest first
    rank = jnp.argsort(order, axis=-1)  # rank of each agent
    promote = candidate & (rank < free[:, None])

    new_is_cbv = state.is_cbv | promote

    goal = jnp.where(promote[..., None], goal_pos, state.goal)
    goal_valid = jnp.where(promote, True, state.goal_valid)
    interaction = jnp.where(promote, best_w, -1)

    return new_is_cbv, goal, goal_valid, interaction, promote


def _chain_goal(tmap, spec, state, ahead) -> jnp.ndarray:
    """[S, A, 2] goal point `ahead` meters (scalar or per-agent [S, A])
    along each agent's lane chain (or the chain end when shorter)."""
    S, A = state.alive.shape
    ahead = jnp.broadcast_to(jnp.asarray(ahead, jnp.float32), (S, A))
    lane = jnp.maximum(state.lane, 0)  # [S, A]
    branch = (state.bv_branch_bits & 1).astype(jnp.int32)  # [S, A]
    # chains: [S, L, 2, MC] -> per agent [S, A, MC]
    chains = jax.vmap(lambda ch, l, b: ch[l, b])(
        spec.lane_chains, lane, branch
    )
    ch = jnp.maximum(chains, 0)
    lens = tmap.length[ch] * (chains >= 0)  # [S, A, MC]
    s_on, _, _ = tmap.project(lane, state.pos)  # [S, A]
    # cumulative distance from the agent to the END of each chain lane
    cum = jnp.cumsum(lens, axis=-1) - s_on[..., None]
    hit = cum >= ahead[..., None]
    idx = jnp.where(
        hit.any(-1), jnp.argmax(hit, axis=-1), (chains >= 0).sum(-1) - 1
    )
    idx = jnp.maximum(idx, 0)
    goal_lane = jnp.take_along_axis(ch, idx[..., None], axis=-1)[..., 0]
    # distance from the agent to the START of the goal lane (the agent sits
    # s_on past lane 0's start, so lane 0's start is -s_on "ahead")
    cum_start = jnp.concatenate([-s_on[..., None], cum], axis=-1)
    to_start = jnp.take_along_axis(cum_start, idx[..., None], axis=-1)[..., 0]
    remaining = jnp.clip(ahead - to_start, 0.0, None)
    frac = jnp.clip(
        remaining / jnp.maximum(tmap.length[goal_lane], 1e-3), 0.0, 1.0
    )
    # centerline vertices are arclength-uniform -> fractional index
    P = tmap.centerline.shape[1]
    fi = frac * (P - 1)
    i0 = jnp.clip(fi.astype(jnp.int32), 0, P - 2)
    w = (fi - i0)[..., None]
    cl = tmap.centerline[goal_lane]  # [S, A, P, 2]
    p0 = jnp.take_along_axis(cl, i0[..., None, None].repeat(2, -1), axis=-2)[
        ..., 0, :
    ]
    p1 = jnp.take_along_axis(
        cl, (i0 + 1)[..., None, None].repeat(2, -1), axis=-2
    )[..., 0, :]
    return p0 * (1 - w) + p1 * w


def attn_recognize_cbvs(
    tmap: TensorMap,
    spec: ScenarioSpec,
    state: SimState,
    attn_scores_fn,
    max_cbvs: int = 3,
):
    """Attention-based recognition (AttnCBVRecog semantics,
    rift/cbv/recognition/attention_based/attn_cbv.py:20-30 + attn_model.py:
    rank the rule-filtered candidates by a PlanT-style transformer's
    attention over ego+vehicle tokens, promote the top scorers).

    `attn_scores_fn(state) -> scores [S, A]` — typically built from
    rift_tpu.models.plant: tokens via build_plant_tokens, scores from the
    model's `attn_scores` gathered back to agent slots.

    Returns the same tuple as `recognize_cbvs`.
    """
    is_cbv, goal, goal_valid, interaction, promote_rule = recognize_cbvs(
        tmap, spec, state, max_cbvs
    )
    scores = attn_scores_fn(state)  # [S, A], higher = more relevant
    # rank only among the rule-passing candidates
    candidate = promote_rule | (is_cbv & ~state.is_cbv)
    n_current = state.is_cbv.sum(-1).astype(jnp.int32)
    free = jnp.maximum(max_cbvs - n_current, 0)
    score = jnp.where(candidate, scores, -jnp.inf)
    order = jnp.argsort(-score, axis=-1)
    rank = jnp.argsort(order, axis=-1)
    promote = candidate & (rank < free[:, None]) & jnp.isfinite(score)
    new_is_cbv = state.is_cbv | promote
    goal = jnp.where(promote[..., None], goal, state.goal)
    goal_valid = jnp.where(promote, goal_valid, state.goal_valid)
    interaction = jnp.where(promote, interaction, -1)
    return new_is_cbv, goal, goal_valid, interaction, promote


def cbv_slot_assignment(is_cbv: jnp.ndarray, max_cbvs: int) -> jnp.ndarray:
    """[S, A] mask -> [S, C] agent indices (-1 padded), stable order."""
    S, A = is_cbv.shape
    order = jnp.argsort(~is_cbv, axis=-1)  # CBVs first, stable
    slots = order[:, :max_cbvs]
    valid = jnp.take_along_axis(is_cbv, slots, axis=-1)
    return jnp.where(valid, slots, -1).astype(jnp.int32)
