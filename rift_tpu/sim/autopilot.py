"""Background-traffic autopilot: IDM speed + lane-follow steering.

Replaces the CARLA TrafficManager that drives plain background vehicles in
the reference (hybrid physics, target speed 20% under the limit, 8 m minimum
headway; rift/carla_runner.py:173-175). Fully vectorized over [S, A]: each
vehicle chains lane successors (pseudo-random fork choices), spaces waypoints
along the chain by its IDM-adjusted target speed, and hands them to the
shared PID tracker (pid.track_step).

IDM parameterisation follows the PDM-Lite expert's values
(rift/ego/pdm_lite/config.py: minimum gap 4 m, headway 0.25 s, comfortable
braking ~3.5-4 m/s^2, exponent 4), with TrafficManager-style headway for BVs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se2 import wrap_angle
from ..map.tensor_map import LANE_POINTS, TensorMap

# IDM parameters
IDM_MAX_ACCEL = 2.5  # m/s^2 traffic-flow accel (TM-like, not expert's 24)
IDM_BRAKE = 3.8  # comfortable deceleration
IDM_MIN_GAP = 4.0  # s0
IDM_HEADWAY = 1.0  # T — TM's 8 m headway at ~8 m/s
IDM_EXPONENT = 4.0
TM_SPEED_FACTOR = 0.8  # TrafficManager: 20% under the speed limit

LOOKAHEAD_WAYPOINTS = 30  # local path length handed to the tracker
CHAIN_LANES = 4  # lanes chained ahead for the local path


class LeaderInfo(NamedTuple):
    gap: jnp.ndarray  # [S, A] bumper-to-bumper gap to leader (m), inf if none
    speed: jnp.ndarray  # [S, A] leader speed


def find_leaders(
    pos: jnp.ndarray,  # [S, A, 2]
    heading: jnp.ndarray,  # [S, A]
    speed: jnp.ndarray,  # [S, A]
    shape: jnp.ndarray,  # [S, A, 2]
    alive: jnp.ndarray,  # [S, A]
    max_range: float = 50.0,
    lateral_tol: float = 1.8,
) -> LeaderInfo:
    """Per-agent leading vehicle: nearest alive agent ahead in the agent's
    frame within a lane-width corridor."""
    rel = pos[:, None, :, :] - pos[:, :, None, :]  # [S, A(self), A(other), 2]
    c = jnp.cos(heading)[:, :, None]
    s = jnp.sin(heading)[:, :, None]
    lon = rel[..., 0] * c + rel[..., 1] * s
    lat = -rel[..., 0] * s + rel[..., 1] * c
    A = pos.shape[1]
    eye = jnp.eye(A, dtype=bool)
    cand = (
        alive[:, None, :]
        & alive[:, :, None]
        & ~eye[None]
        & (lon > 0.0)
        & (lon < max_range)
        & (jnp.abs(lat) < lateral_tol)
    )
    lon_masked = jnp.where(cand, lon, jnp.inf)
    leader_idx = jnp.argmin(lon_masked, axis=-1)  # [S, A]
    leader_lon = jnp.min(lon_masked, axis=-1)
    # bumper-to-bumper: subtract half lengths
    own_half = shape[..., 1] * 0.5
    leader_half = jnp.take_along_axis(shape[..., 1], leader_idx, axis=1) * 0.5
    gap = leader_lon - own_half - leader_half
    leader_speed = jnp.take_along_axis(speed, leader_idx, axis=1)
    has = jnp.isfinite(leader_lon)
    return LeaderInfo(
        gap=jnp.where(has, jnp.maximum(gap, 0.1), jnp.inf),
        speed=jnp.where(has, leader_speed, 0.0),
    )


def idm_target_speed(
    speed: jnp.ndarray,
    v0: jnp.ndarray,
    leader: LeaderInfo,
    dt: float,
    horizon_steps: float = 10.0,
) -> jnp.ndarray:
    """IDM acceleration integrated over a short horizon -> target speed."""
    v0 = jnp.maximum(v0, 0.1)
    dv = speed - leader.speed
    s_star = IDM_MIN_GAP + speed * IDM_HEADWAY + speed * dv / (
        2.0 * jnp.sqrt(IDM_MAX_ACCEL * IDM_BRAKE)
    )
    s_star = jnp.maximum(s_star, 0.0)
    interaction = jnp.where(
        jnp.isfinite(leader.gap), (s_star / leader.gap) ** 2, 0.0
    )
    accel = IDM_MAX_ACCEL * (1.0 - (speed / v0) ** IDM_EXPONENT - interaction)
    accel = jnp.clip(accel, -2 * IDM_BRAKE, IDM_MAX_ACCEL)
    return jnp.clip(speed + accel * dt * horizon_steps, 0.0, v0 * 1.05)


def chain_lanes_free(
    tmap: TensorMap, lane: jnp.ndarray, branch_bits: jnp.ndarray, n_lanes: int = CHAIN_LANES
) -> jnp.ndarray:
    """Chain `n_lanes` successor lanes from `lane`, choosing forks by the
    per-agent branch bits (2 bits per hop). Free traversal (no route mask) —
    the TrafficManager-equivalent roaming behavior. Returns [..., n_lanes]."""

    def body(carry, i):
        cur, bits = carry
        succ = tmap.successors[jnp.maximum(cur, 0)]  # [..., K]
        # valid successors are front-packed (build_tensor_map fills from
        # k=0 with -1 padding), so the choice-th valid one is succ[choice]
        n_ok = (succ >= 0).sum(-1)
        choice = (bits >> (2 * i)).astype(jnp.int32) % jnp.maximum(n_ok, 1)
        nxt = jnp.take_along_axis(succ, choice[..., None], axis=-1)[..., 0]
        nxt = jnp.where((n_ok > 0) & (cur >= 0), nxt, -1)
        return (nxt, bits), nxt

    (_, _), rest = jax.lax.scan(
        body, (lane, branch_bits), jnp.arange(n_lanes - 1)
    )
    rest = jnp.moveaxis(rest, 0, -1)  # [..., n_lanes-1]
    return jnp.concatenate([lane[..., None], rest], axis=-1)


YIELD_DIST = 12.0  # start negotiating this far from the junction entry
YIELD_STOP = 5.0  # hold distance while blocked
YIELD_CRAWL = 2.0  # m/s creep while negotiating
YIELD_FLOOR = 0.6  # m/s hold-line creep: above the tracker's 0.4 m/s brake
# cutoff (pid.BRAKE_SPEED) and the 0.1 m/s AgentBlockedTest threshold, so
# queues keep oozing forward like CARLA TM traffic instead of freezing a
# whole road behind one negotiation (route_scenario.py:216 max_time=3.0)
CONFLICT_RADIUS = 12.0  # junction box radius around the connector midpoint


def junction_yield(
    tmap: TensorMap,
    lane: jnp.ndarray,  # [S, A]
    pos: jnp.ndarray,  # [S, A, 2]
    heading: jnp.ndarray,  # [S, A]
    speed: jnp.ndarray,  # [S, A]
    alive: jnp.ndarray,  # [S, A]
    agent_class: jnp.ndarray,  # [S, A] 0=vehicle 1=walker 2=static
    branch_bits: jnp.ndarray,  # [S, A]
):
    """TrafficManager-style junction negotiation (the reference's TM
    "ignores lights frozen green but still avoids junction collisions" —
    carla_runner.py:173-175 hybrid mode): a vehicle about to ENTER a
    junction connector waits while CROSS traffic or a walker occupies the
    junction box. Vehicles already inside never yield (no deadlock); same-
    and opposing-direction straight flows are not conflicts (parallel
    paths), and neither is traffic already LEAVING the box. Returns
    (approaching, blocked, dist_end) [S, A]."""
    li = jnp.maximum(lane, 0)
    on_junction = tmap.is_junction[li] & (lane >= 0)
    nxt = chain_lanes_free(tmap, lane, branch_bits, n_lanes=2)[..., 1]
    nxt_j = tmap.is_junction[jnp.maximum(nxt, 0)] & (nxt >= 0)
    s_on, _, _ = tmap.project(li, pos)
    dist_end = jnp.maximum(tmap.length[li] - s_on, 0.0)
    approaching = (
        alive & (agent_class == 0) & ~on_junction & nxt_j
        & (dist_end < YIELD_DIST)
    )
    P = tmap.centerline.shape[1]
    center = tmap.centerline[jnp.maximum(nxt, 0), P // 2]  # [S, A, 2]
    h_entry = tmap.headings[li, -1]  # [S, A]
    # occupancy of MY junction box by others
    rel = center[:, :, None, :] - pos[:, None, :, :]  # other -> my center
    d = jnp.linalg.norm(rel, axis=-1)
    inside = d < CONFLICT_RADIUS  # [S, A(self), A(other)]
    other_on_j = (tmap.is_junction[jnp.maximum(lane, 0)] & (lane >= 0))[
        :, None, :
    ]
    dh = jnp.abs(wrap_angle(heading[:, None, :] - h_entry[:, :, None]))
    crossing = (dh > jnp.pi / 4) & (dh < 3 * jnp.pi / 4)
    # moving away from the box center at > 1 m/s = already clearing it
    vel = speed[..., None] * jnp.stack(
        [jnp.cos(heading), jnp.sin(heading)], axis=-1
    )  # [S, A, 2]
    closing = (vel[:, None, :, :] * rel).sum(-1)  # [S, A(self), A(other)]
    leaving = closing < -1.0
    is_veh = (agent_class == 0) & alive
    is_walker = (agent_class == 1) & alive
    conflict = inside & ~leaving & (
        (is_veh[:, None, :] & other_on_j & crossing) | is_walker[:, None, :]
    )
    A = pos.shape[1]
    conflict &= ~jnp.eye(A, dtype=bool)[None]
    blocked = approaching & conflict.any(-1)
    return approaching, blocked, dist_end


def yield_target_speed(
    tmap: TensorMap, state, v_target: jnp.ndarray, floor: float = YIELD_FLOOR
) -> jnp.ndarray:
    """Clamp `v_target` for junction negotiation: creep toward the entry
    while the box is occupied by cross traffic, hold-line creep at the
    line (gap acceptance — a full stop would freeze the queue behind it
    into the leaderboard's 3-s AgentBlockedTest,
    route_scenario.py:216 max_time=3.0)."""
    _, blocked, dist_end = junction_yield(
        tmap, state.lane, state.pos, state.heading, state.speed,
        state.alive, state.agent_class, state.bv_branch_bits,
    )
    v = jnp.where(blocked, jnp.minimum(v_target, YIELD_CRAWL), v_target)
    return jnp.where(
        blocked & (dist_end < YIELD_STOP), jnp.minimum(v_target, floor), v
    )


def lane_follow_waypoints(
    tmap: TensorMap,
    lane: jnp.ndarray,  # [...] current lane per agent
    pos: jnp.ndarray,  # [..., 2]
    heading: jnp.ndarray,  # [...]
    branch_bits: jnp.ndarray,  # [...] uint32
    spacing: jnp.ndarray,  # [...] or [..., N] waypoint spacing (m)
    num_points: int = LOOKAHEAD_WAYPOINTS,
    n_chain: int = CHAIN_LANES,
) -> jnp.ndarray:
    """Local-frame waypoints along the agent's lane chain -> [..., N, 2].

    The tracker derives desired speed from waypoint spacing
    (pid.track_step), so `spacing = v_target * dt` makes the PID chase the
    IDM speed while pure-pursuit steering follows the lane. A per-point
    spacing [..., N] encodes a SPEED PROFILE (e.g. the privileged teacher's
    accelerate-to-target trajectory, sft/teacher/autopilot.py IDM
    integration) — point k sits sum(spacing[..k]) meters along the chain.
    """
    # closed form (no jnp.interp): lane centerline vertices are
    # arclength-uniform per lane, so a chain arclength maps to (lane j,
    # fractional vertex) with cumulative-lane-length bucketing — the same
    # trick as map/reference_lines.py. ~4x cheaper per tick at [S, A].
    chain = chain_lanes_free(tmap, lane, branch_bits, n_lanes=n_chain)
    ch = jnp.maximum(chain, 0)
    lens = tmap.length[ch] * (chain >= 0)  # [..., C]
    cum = jnp.concatenate(
        [jnp.zeros_like(lens[..., :1]), jnp.cumsum(lens, axis=-1)], axis=-1
    )  # [..., C+1]
    s0, _, _ = tmap.project(jnp.maximum(lane, 0), pos)  # [...]
    if spacing.ndim == pos.ndim - 1:  # scalar spacing per agent
        spacing = jnp.broadcast_to(
            spacing[..., None], spacing.shape + (num_points,)
        )
    targets = s0[..., None] + jnp.cumsum(spacing, axis=-1)  # [..., N]
    # clamp to the chain end so the path terminates at the last vertex
    targets = jnp.minimum(targets, cum[..., -1:])
    j = jnp.clip(
        (targets[..., None] >= cum[..., None, 1:]).sum(-1),
        0,
        chain.shape[-1] - 1,
    )  # [..., N]
    # overflow targets (== chain total length) bucket past the last VALID
    # link; chain[-1] may be -1 whose maximum(.,0) gather would read lane 0
    # — an arbitrary, possibly kilometers-distant lane on multi-route towns.
    # Clamp to the last valid link so the path pins to the chain's end.
    n_valid = (chain >= 0).sum(-1)  # [...]
    j = jnp.minimum(j, jnp.maximum(n_valid - 1, 0)[..., None])
    lane_j = jnp.take_along_axis(ch, j, axis=-1)  # [..., N]
    u = targets - jnp.take_along_axis(cum, j, axis=-1)
    P = LANE_POINTS
    frac = jnp.clip(
        u / jnp.maximum(tmap.length[lane_j], 1e-3), 0.0, 1.0
    ) * (P - 1)
    i0 = jnp.clip(frac.astype(jnp.int32), 0, P - 2)
    w = (frac - i0)[..., None]
    # chain-LOCAL one-hot matmul instead of per-point table gathers (see
    # map/reference_lines.py one_ref): one small per-agent chain gather
    # [n_chain] rows, then each waypoint selects its segment row via a
    # one-hot [N, n_chain*(P-1)] MXU matmul. The 4-wide segment row holds
    # both interpolation endpoints (x0, y0, x1, y1).
    seg = jnp.concatenate(
        [tmap.centerline[:, :-1], tmap.centerline[:, 1:]], axis=-1
    )  # [L, P-1, 4]
    chain_tab = seg[ch]  # [..., C, P-1, 4]
    chain_tab = chain_tab.reshape(
        chain_tab.shape[:-3] + (n_chain * (P - 1), 4)
    )
    local = j * (P - 1) + i0  # [..., N]
    one_hot = (
        jnp.arange(n_chain * (P - 1)) == local[..., None]
    ).astype(jnp.float32)  # [..., N, C*(P-1)]
    s01 = one_hot @ chain_tab  # [..., N, 4]
    world_wp = s01[..., :2] * (1.0 - w) + s01[..., 2:] * w
    # to local frame
    rel = world_wp - pos[..., None, :]
    c = jnp.cos(heading)[..., None]
    sn = jnp.sin(heading)[..., None]
    local = jnp.stack(
        [rel[..., 0] * c + rel[..., 1] * sn, -rel[..., 0] * sn + rel[..., 1] * c],
        axis=-1,
    )
    return local


def path_follow_waypoints(
    path: jnp.ndarray,  # [..., N, 3] (x, y, heading) dense route, padded
    path_len: jnp.ndarray,  # [...] int32 valid count
    pos: jnp.ndarray,  # [..., 2]
    heading: jnp.ndarray,  # [...]
    spacing: jnp.ndarray,  # [...]
    num_points: int = LOOKAHEAD_WAYPOINTS,
) -> jnp.ndarray:
    """Local waypoints along a dense (1 m) route polyline -> [..., N, 2].

    Used by the rule ego to follow its scenario route, standing in for
    PDM-Lite's privileged route planner."""
    # closed form: route waypoints are densified at exactly 1 m spacing
    # (map/routing.py:route_waypoints), so arclength == index — the target
    # arclengths map to fractional indices directly, no jnp.interp over the
    # 1024-padded route.
    n = path.shape[-2]
    idx_range = jnp.arange(n)
    valid = idx_range < path_len[..., None]
    pts = path[..., :2]
    d2 = jnp.sum((pts - pos[..., None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    i0 = jnp.argmin(d2, axis=-1).astype(jnp.float32)  # [...] ~ meters
    last = jnp.maximum(path_len - 1, 0).astype(jnp.float32)
    idx_f = (
        i0[..., None]
        + (1.0 + jnp.arange(num_points, dtype=jnp.float32)) * spacing[..., None]
    )
    idx_f = jnp.clip(idx_f, 0.0, last[..., None])
    j0 = jnp.clip(idx_f.astype(jnp.int32), 0, n - 2)
    w = (idx_f - j0)[..., None]
    p0 = jnp.take_along_axis(pts, j0[..., None].repeat(2, -1), axis=-2)
    p1 = jnp.take_along_axis(pts, (j0 + 1)[..., None].repeat(2, -1), axis=-2)
    world_wp = p0 * (1.0 - w) + p1 * w
    rel = world_wp - pos[..., None, :]
    c = jnp.cos(heading)[..., None]
    sn = jnp.sin(heading)[..., None]
    return jnp.stack(
        [rel[..., 0] * c + rel[..., 1] * sn, -rel[..., 0] * sn + rel[..., 1] * c],
        axis=-1,
    )
