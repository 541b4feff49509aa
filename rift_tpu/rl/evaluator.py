"""Fused trajectory evaluator: candidate rollout + dense reward + GRPO advantage.

The RIFT reward kernel. Replaces the reference's TrajEvaluator
(rift/cbv/planning/fine_tuner/rlft/traj_eval/traj_evaluator.py), which mixed
torch rollouts, numpy forecasts, shapely STRtree collision loops, a cv2
drivable-area raster and a Python double-loop discounted return — here the
whole pipeline is one jitted program:

  candidates [R, M, T, 6] (local frame)
    -> ref-line distance/angle matrices            (get_ref_line_info spec)
    -> PID + bicycle re-tracking rollout, 40 steps (TrackPropagate spec)
    -> neighbor constant-control forecast          (forecast spec)
    -> all-pairs OBB collision matrix              (STRtree replacement)
    -> lane-membership off-road matrix             (cv2 raster replacement)
    -> dense reward, discounted return gamma=0.98, stop-at-collision
    -> group z-score advantage                     (get_grpo_advantage spec)

Everything is batched over G = R*M candidates and vmappable over
(scenario, CBV).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.obb import obb_overlap
from ..geometry.se2 import rotate, wrap_angle
from ..map.tensor_map import TensorMap
from ..sim.dynamics import bicycle_forecast_step, bicycle_step
from ..sim.pid import TrackerState, track_step

GAMMA = 0.98
NUM_FRAMES = 40  # evaluator horizon (traj_evaluator.py:86 num_frames)
FUTURE_LEN = 30  # PID lookahead points (track_propogate.py:707 future_len)
BBOX_INFLATION = 1.1

# neighbor bbox inflation schedule (PDM-Lite forecasting uncertainty,
# values from rift/ego/pdm_lite/config.py:186-199)
SLOW_EXTENT_FACTOR = 1.0
SPEED_THRESHOLD = 1.0
MIN_EXTENT_X = 1.2
MIN_EXTENT_X_LANE_CHANGE = 2.0
MIN_EXTENT_Y = 1.0
EXTENT_Y_FACTOR = 1.3


# --------------------------------------------------------------------------
# Dense reward (semantics of rift/gym_carla/reward/reward_model.py:34-50)
# --------------------------------------------------------------------------
REWARD_PARAMS = dict(
    alpha_collision=20.0,
    alpha_boundary=5.0,
    alpha_comfort=0.8,
    alpha_l_align=0.5,
    alpha_vel_align=0.05,
    alpha_l_center=0.6,
    alpha_center_bias=0.0,
    alpha_velocity=0.1,
    alpha_timestep=0.1,
)


def dense_reward(
    delta_dis, delta_angle, speed, acc, angular_vel, angular_acc,
    collision, offroad, p=REWARD_PARAMS, components=False,
):
    """Vectorized RIFT dense reward. All args broadcastable; delta_dis and
    delta_angle are absolute values. With components=True, returns a dict
    of the individual terms instead of their sum (diagnostics)."""
    cos_a = jnp.cos(delta_angle)
    r_collision = -(p["alpha_collision"] + jnp.abs(speed)) * collision
    r_offroad = -p["alpha_boundary"] * offroad
    r_comfort = -p["alpha_comfort"] * (
        (jnp.abs(acc) > 4).astype(jnp.float32)
        + (jnp.abs(angular_acc) > 4).astype(jnp.float32)
    )
    r_align = p["alpha_l_align"] * (
        jnp.minimum(cos_a, 0.0)
        + p["alpha_vel_align"] * jnp.minimum(cos_a * speed, 0.0)
        + 0.25 * (1.0 - jnp.abs(delta_angle) / (jnp.pi / 2))
    )
    dev = jnp.abs(delta_dis - p["alpha_center_bias"])
    r_center = (
        -p["alpha_l_center"]
        * (cos_a > 0.5).astype(jnp.float32)
        * (dev - 0.05 / jnp.exp(dev - 0.5))
    )
    in_band = (jnp.abs(speed) > 3) & (jnp.abs(speed) < 20)
    r_velocity = (
        p["alpha_velocity"]
        * jnp.maximum(cos_a, 0.0)
        * in_band.astype(jnp.float32)
        * jnp.abs(speed)
    )
    moving = (jnp.abs(speed) > 0) | (jnp.abs(acc) > 0)
    r_time = -p["alpha_timestep"] * moving.astype(jnp.float32)
    if components:
        return {
            "collision": r_collision, "offroad": r_offroad,
            "comfort": r_comfort, "align": r_align, "center": r_center,
            "velocity": r_velocity, "time": r_time,
        }
    return (
        r_collision + r_offroad + r_comfort + r_align + r_center + r_velocity + r_time
    )


def sparse_reward(collision, offroad, alpha_collision=15.0, alpha_boundary=15.0):
    """Sparse infraction reward (reward_model.py:60-85)."""
    return -alpha_collision * collision - alpha_boundary * offroad


def executed_cbv_reward(tmap, state, slots):
    """[S, C] dense reward of the EXECUTED transition for the CBV slots —
    the env reward the reference stores per tick during fine-tune collection
    (CBVFineTuneReward dense model on the real step, cbv_reward.py:96-249 +
    reward_model.py:11-56). Lane-relative alignment stands in for the
    reference-line projection; events come from the world tick."""
    S = slots.shape[0]
    s_ix = jnp.arange(S)[:, None]
    sl = jnp.maximum(slots, 0)
    pos = state.pos[s_ix, sl]
    lane = state.lane[s_ix, sl]
    _, lat, lane_hdg = tmap.project(lane, pos)
    d_angle = jnp.abs(wrap_angle(state.heading[s_ix, sl] - lane_hdg))
    r = dense_reward(
        jnp.abs(lat),
        d_angle,
        state.speed[s_ix, sl],
        state.accel[s_ix, sl],
        state.yaw_rate[s_ix, sl],
        jnp.zeros_like(lat),
        state.collision[s_ix, sl].astype(jnp.float32),
        state.offroad[s_ix, sl].astype(jnp.float32),
    )
    return jnp.where(slots >= 0, r, 0.0)


# --------------------------------------------------------------------------
# Candidate re-tracking rollout (TrackPropagate.propagate spec)
# --------------------------------------------------------------------------
def _local_future(ref_pos, closest_idx, cur_pos, cur_heading):
    """FUTURE_LEN points of `ref_pos` [T, 2] from closest_idx onward, in the
    vehicle frame, padding with the last point."""
    T = ref_pos.shape[0]
    idx = closest_idx + jnp.arange(FUTURE_LEN)
    gathered = ref_pos[jnp.minimum(idx, T - 1)]
    rel = gathered - cur_pos
    return rotate(rel, -cur_heading)


def rollout_candidates(
    ref_pos: jnp.ndarray,  # [G, T, 2] global candidate positions
    ref_heading: jnp.ndarray,  # [G, T]
    init_speed: jnp.ndarray,  # scalar
    dt: float = 0.1,
    num_frames: int = NUM_FRAMES,
):
    """Re-track each candidate with the shared PID + bicycle model.

    Returns (center [G, Tr, 2], heading [G, Tr], speed [G, Tr]).

    On TPU the whole sequential loop runs as one Pallas kernel
    (ops/retrack.py) — as a lax.scan its ~50 tiny ops x 39 steps are pure
    dispatch overhead (~100 ms/tick at 9216 candidates)."""
    if jax.default_backend() in ("tpu", "axon"):
        from ..ops.retrack import retrack_rollout_pallas

        return retrack_rollout_pallas(
            ref_pos[:, :num_frames],
            ref_heading[:, :num_frames],
            jnp.broadcast_to(init_speed, ref_pos.shape[:1]),
            num_frames,
            dt,
        )
    G = ref_pos.shape[0]
    tracker0 = TrackerState.zeros((G,))
    pos0 = ref_pos[:, 0]
    heading0 = ref_heading[:, 0]
    speed0 = jnp.broadcast_to(init_speed, (G,))

    def body(carry, _):
        pos, heading, speed, tracker, closest = carry
        local = jax.vmap(_local_future)(ref_pos, closest, pos, heading)
        action, tracker = track_step(tracker, local, speed)
        npos, nheading, nspeed = bicycle_step(pos, heading, speed, action, dt)
        d2 = jnp.sum((ref_pos - npos[:, None]) ** 2, axis=-1)
        nclosest = jnp.argmin(d2, axis=-1).astype(jnp.int32)
        return (npos, nheading, nspeed, tracker, nclosest), (npos, nheading, nspeed)

    init = (pos0, heading0, speed0, tracker0, jnp.zeros(G, jnp.int32))
    # closed-loop tracking is inherently sequential; full unroll fuses the
    # ~15 tiny ops/step across iterations instead of paying per-step
    # dispatch overhead 39 times
    _, (ps, hs, vs) = jax.lax.scan(
        body, init, None, length=num_frames - 1, unroll=True
    )
    center = jnp.concatenate([pos0[:, None], jnp.moveaxis(ps, 0, 1)], axis=1)
    heading = jnp.concatenate([heading0[:, None], jnp.moveaxis(hs, 0, 1)], axis=1)
    speed = jnp.concatenate([speed0[:, None], jnp.moveaxis(vs, 0, 1)], axis=1)
    return center, heading, speed


def _sg_kernel5():
    """Savitzky-Golay smoothing kernel, window 5, order 2 (the reference's
    derive_kinematics smoothing, track_propogate.py:500-596)."""
    return jnp.array([-3.0, 12.0, 17.0, 12.0, -3.0]) / 35.0


def _smooth5(x):
    """Reflect-padded window-5 SG smoothing along the last axis."""
    k = _sg_kernel5()
    xp = jnp.concatenate([x[..., 2:0:-1], x, x[..., -2:-4:-1]], axis=-1)
    out = sum(k[i] * xp[..., i : i + x.shape[-1]] for i in range(5))
    return out


def _central_diff(x, dt):
    mid = (x[..., 2:] - x[..., :-2]) / (2 * dt)
    first = (x[..., 1:2] - x[..., :1]) / dt
    last = (x[..., -1:] - x[..., -2:-1]) / dt
    return jnp.concatenate([first, mid, last], axis=-1)


def _sg_matrix(T: int):
    """[T, T] linear operator: reflect-padded window-5 SG smoothing
    (equals _smooth5 applied to a length-T sequence)."""
    import numpy as onp

    k = onp.array([-3.0, 12.0, 17.0, 12.0, -3.0]) / 35.0
    M = onp.zeros((T, T), onp.float32)
    for i in range(T):
        for j, kv in enumerate(k):
            src = i + j - 2
            if src < 0:
                src = -src  # reflect: x[2:0:-1] prefix
            elif src >= T:
                src = 2 * T - 2 - src  # reflect: x[-2:-4:-1] suffix
            M[i, src] += kv
    return M


def _diff_matrix(T: int):
    """[T, T] unscaled difference operator D and per-row scale so that
    (x @ D.T) * scale == _central_diff(x, dt) with dt folded into scale."""
    import numpy as onp

    D = onp.zeros((T, T), onp.float32)
    scale = onp.empty(T, onp.float32)
    D[0, 1], D[0, 0], scale[0] = 1.0, -1.0, 1.0
    D[T - 1, T - 1], D[T - 1, T - 2], scale[T - 1] = 1.0, -1.0, 1.0
    for i in range(1, T - 1):
        D[i, i + 1], D[i, i - 1], scale[i] = 1.0, -1.0, 0.5
    return D, scale


def derive_kinematics(heading, speed, dt=0.1):
    """speed/accel/yaw-rate/yaw-accel from heading+speed sequences [..., T].

    Formulated as [T, T] matrix applications (smoothing and differencing are
    linear) — a handful of [B, T] x [T, T] matmuls instead of ~30 shifted
    elementwise ops, which at B~9k rows are pure dispatch overhead."""
    T = speed.shape[-1]
    S = jnp.asarray(_sg_matrix(T))
    D, dscale = _diff_matrix(T)
    D = jnp.asarray(D)
    dscale = jnp.asarray(dscale) / dt

    speed_s = speed @ S.T
    accel = (speed_s @ D.T) * dscale
    heading_s = heading @ S.T
    yaw_rate = wrap_angle(heading_s @ D.T) * dscale
    yaw_accel = (yaw_rate @ D.T) * dscale
    return speed_s, accel, yaw_rate, yaw_accel


# --------------------------------------------------------------------------
# Neighbor forecast (get_other_vehicle_rollout spec)
# --------------------------------------------------------------------------
def forecast_neighbors(
    pos: jnp.ndarray,  # [N, 2]
    heading: jnp.ndarray,  # [N]
    speed: jnp.ndarray,  # [N]
    control: jnp.ndarray,  # [N, 3] last throttle/steer/brake
    shape: jnp.ndarray,  # [N, 2] width, length
    valid: jnp.ndarray,  # [N]
    num_frames: int = NUM_FRAMES,
    near_lane_change: bool = True,
):
    """Constant-control bicycle forecast with speed-inflated bboxes.

    Returns (centers [N, Tr, 2], headings [N, Tr], shapes [N, Tr, 2], valid).
    """

    def body(carry, _):
        p, h, v = carry
        np_, nh, nv = bicycle_forecast_step(p, h, v, control)
        return (np_, nh, nv), (np_, nh, nv)

    _, (ps, hs, vs) = jax.lax.scan(
        body, (pos, heading, speed), None, length=num_frames, unroll=True
    )
    centers = jnp.moveaxis(ps, 0, 1)  # [N, Tr, 2]
    headings = jnp.moveaxis(hs, 0, 1)
    speeds = jnp.moveaxis(vs, 0, 1)

    t_frac = jnp.arange(num_frames, dtype=jnp.float32) / num_frames
    sx = MIN_EXTENT_X_LANE_CHANGE if near_lane_change else MIN_EXTENT_X
    fx = jnp.maximum(sx, MIN_EXTENT_X * t_frac)  # [Tr]
    fy = jnp.maximum(MIN_EXTENT_Y, EXTENT_Y_FACTOR * t_frac)
    slow = speeds < SPEED_THRESHOLD
    fx_t = jnp.where(slow, SLOW_EXTENT_FACTOR, fx[None, :])  # [N, Tr]
    fy_t = jnp.where(slow, SLOW_EXTENT_FACTOR, fy[None, :])
    shapes = (
        jnp.stack(
            [shape[:, None, 0] * fy_t, shape[:, None, 1] * fx_t], axis=-1
        )
        * BBOX_INFLATION
    )  # [N, Tr, 2]
    return centers, headings, shapes, valid


# --------------------------------------------------------------------------
# Ref-line matrices (get_ref_line_info spec)
# --------------------------------------------------------------------------
def ref_line_matrices(
    cand_pos: jnp.ndarray,  # [R, M, T, 2] local-frame candidate positions
    cand_heading: jnp.ndarray,  # [R, M, T]
    ref_pos: jnp.ndarray,  # [R, Nr, 2]
    ref_heading: jnp.ndarray,  # [R, Nr]
    ref_valid: jnp.ndarray,  # [R, Nr]
):
    """Signed lateral offset and heading error of each candidate point
    against its own reference line. Returns (delta_dis, delta_angle) [R, M, T].

    Distances use the MXU expansion |c - r|^2 = |c|^2 + |r|^2 - 2 c.r so the
    [R, M, T, Nr, 2] difference tensor never materializes — batched over all
    scenarios x CBVs that intermediate alone was >20 GB of HBM.
    """
    R, M, T, _ = cand_pos.shape
    cross2 = jnp.einsum("rmtx,rnx->rmtn", cand_pos, ref_pos)  # [R, M, T, Nr]
    d2 = (
        jnp.sum(cand_pos * cand_pos, axis=-1)[..., None]
        + jnp.sum(ref_pos * ref_pos, axis=-1)[:, None, None]
        - 2.0 * cross2
    )
    d2 = jnp.where(ref_valid[:, None, None], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=-1)  # [R, M, T]
    r_ix = jnp.arange(R)[:, None, None]
    closest_angle = ref_heading[r_ix, idx]  # [R, M, T]
    closest_pos = ref_pos[r_ix, idx]  # [R, M, T, 2]
    delta_angle = wrap_angle(cand_heading - closest_angle)
    rel = cand_pos - closest_pos
    tangent = jnp.stack([jnp.cos(closest_angle), jnp.sin(closest_angle)], axis=-1)
    cross = rel[..., 0] * tangent[..., 1] - rel[..., 1] * tangent[..., 0]
    return -cross, delta_angle


# --------------------------------------------------------------------------
# The fused advantage kernel (get_grpo_advantage spec)
# --------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("dt", "num_frames", "debug"))
def grpo_advantage_batched(
    tmap: TensorMap,
    trajectories: jnp.ndarray,  # [B, R, M, T, 6] local-frame model output
    r_valid: jnp.ndarray,  # [B, R] valid reference lines
    ref_pos: jnp.ndarray,  # [B, R, Nr, 2] local-frame reference lines
    ref_heading: jnp.ndarray,  # [B, R, Nr]
    ref_point_valid: jnp.ndarray,  # [B, R, Nr]
    center_pos: jnp.ndarray,  # [B, 2] world position of each CBV
    center_heading: jnp.ndarray,  # [B] world heading
    center_speed: jnp.ndarray,  # [B]
    center_shape: jnp.ndarray,  # [B, 2] width, length
    nbr_pos: jnp.ndarray,  # [B, N, 2] world neighbor states
    nbr_heading: jnp.ndarray,  # [B, N]
    nbr_speed: jnp.ndarray,  # [B, N]
    nbr_control: jnp.ndarray,  # [B, N, 3]
    nbr_shape: jnp.ndarray,  # [B, N, 2]
    nbr_valid: jnp.ndarray,  # [B, N]
    dt: float = 0.1,
    num_frames: int = NUM_FRAMES,
    debug: bool = False,
):
    """Group-relative advantage, batched over B CBVs at once.

    Batched natively (not vmapped) so the sequential re-tracking rollout
    runs ONCE on the flattened [B*G] candidate axis — on TPU that is a
    single full-occupancy Pallas kernel (ops/retrack.py) instead of B
    padded per-CBV calls.

    Returns dict: advantage [B, R, M], valid_mask [B, R, M],
    rollout_return [B, R, M].
    """
    B, R, M = trajectories.shape[:3]
    G = R * M
    traj = trajectories[:, :, :, :num_frames]
    cand_pos_local = traj[..., :2]
    cand_heading_local = jnp.arctan2(traj[..., 3], traj[..., 2])

    # 1. ref-line matrices in local frame. On TPU, one VMEM-tiled kernel per
    #    (CBV, ref-line) pair (ops/refline.py) — the XLA path materializes a
    #    [B, R, M, T, Nr] f32 distance tensor (~1.8 GB at B=192) in HBM.
    if jax.default_backend() in ("tpu", "axon"):
        from ..ops.refline import refline_matrices_pallas

        Nr = ref_pos.shape[2]
        dd, da = refline_matrices_pallas(
            cand_pos_local.reshape(B * R, M * num_frames, 2),
            cand_heading_local.reshape(B * R, M * num_frames),
            ref_pos.reshape(B * R, Nr, 2),
            ref_heading.reshape(B * R, Nr),
            ref_point_valid.reshape(B * R, Nr),
        )
        delta_dis = dd.reshape(B, R, M, num_frames)
        delta_angle = da.reshape(B, R, M, num_frames)
    else:
        delta_dis, delta_angle = jax.vmap(ref_line_matrices)(
            cand_pos_local, cand_heading_local, ref_pos, ref_heading,
            ref_point_valid,
        )
    delta_dis = jnp.abs(delta_dis).reshape(B, G, num_frames)
    delta_angle = jnp.abs(delta_angle).reshape(B, G, num_frames)

    # 2. candidates to world frame, anchored at the CBV pose
    #    (get_center_rollout spec: first point forced to the origin)
    flat_pos = cand_pos_local.reshape(B, G, num_frames, 2)
    flat_pos = flat_pos - flat_pos[:, :, :1]
    world_pos = rotate(flat_pos, center_heading[:, None, None]) + center_pos[
        :, None, None
    ]
    world_heading = (
        cand_heading_local.reshape(B, G, num_frames)
        + center_heading[:, None, None]
    )

    # 3. PID re-tracking rollout, flattened over [B*G]
    roll_pos, roll_heading, roll_speed = rollout_candidates(
        world_pos.reshape(B * G, num_frames, 2),
        world_heading.reshape(B * G, num_frames),
        jnp.repeat(center_speed, G),
        dt,
        num_frames,
    )
    roll_speed, roll_acc, roll_yaw_rate, roll_yaw_acc = derive_kinematics(
        roll_heading, roll_speed, dt
    )
    roll_pos = roll_pos.reshape(B, G, num_frames, 2)
    roll_heading = roll_heading.reshape(B, G, num_frames)
    roll_speed = roll_speed.reshape(B, G, num_frames)
    roll_acc = roll_acc.reshape(B, G, num_frames)
    roll_yaw_rate = roll_yaw_rate.reshape(B, G, num_frames)
    roll_yaw_acc = roll_yaw_acc.reshape(B, G, num_frames)

    # 4. neighbor forecast
    nb_center, nb_heading, nb_shape, nb_valid = jax.vmap(
        partial(forecast_neighbors, num_frames=num_frames)
    )(nbr_pos, nbr_heading, nbr_speed, nbr_control, nbr_shape, nbr_valid)

    # 5. collision matrix [B, G, Tr]. The (N, Tr) axes are flattened so
    #    the elementwise SAT runs on a [B, G, N*Tr] layout: Tr=40 as the
    #    minor dim pads to 128 lanes (3.2x wasted VPU work); N*Tr=320
    #    pads to 384 (1.2x).
    N = nb_center.shape[1]
    NT = N * num_frames
    flat = lambda x: jnp.broadcast_to(
        x, (B, G, N, num_frames) + x.shape[4:]
    ).reshape((B, G, NT) + x.shape[4:])
    hit = obb_overlap(
        flat(roll_pos[:, :, None]),  # [B, G, N*Tr, 2]
        flat(roll_heading[:, :, None]),
        flat(
            jnp.broadcast_to(
                center_shape[:, None, None, None], (B, G, 1, num_frames, 2)
            )
        ),
        flat(nb_center[:, None]),
        flat(nb_heading[:, None]),
        flat(nb_shape[:, None]),
    ).reshape(B, G, N, num_frames)
    hit &= nb_valid[:, None, :, None]
    collision = hit.any(axis=2)  # [B, G, Tr]

    # 6. off-road matrix — raster lookup (B*G*T points per tick: the exact
    #    polyline test would gather ~30 GB)
    offroad = ~tmap.on_road_raster(roll_pos.reshape(-1, 2)).reshape(
        B, G, num_frames
    )

    # 7. reward -> discounted return, zeroed after first collision
    #    (get_rollout_return spec: `break` after the collision step — the
    #    colliding step itself still contributes)
    r = dense_reward(
        delta_dis, delta_angle, roll_speed, roll_acc, roll_yaw_rate,
        roll_yaw_acc, collision.astype(jnp.float32), offroad.astype(jnp.float32),
    )
    collided_before = jnp.concatenate(
        [jnp.zeros((B, G, 1), bool), jnp.cumsum(collision, axis=-1)[..., :-1] > 0],
        axis=-1,
    )
    active = ~collided_before
    discount = GAMMA ** jnp.arange(num_frames, dtype=jnp.float32)
    ret = jnp.sum(r * active * discount, axis=-1)  # [B, G]

    # 8. group z-score over valid candidates, per CBV
    cand_valid = jnp.broadcast_to(r_valid[:, :, None], (B, R, M)).reshape(B, G)
    n = jnp.maximum(cand_valid.sum(-1, keepdims=True), 1)
    mean = jnp.sum(ret * cand_valid, -1, keepdims=True) / n
    var = jnp.sum((ret - mean) ** 2 * cand_valid, -1, keepdims=True) / n
    std = jnp.sqrt(var) + 1e-5
    adv = (ret - mean) / std

    out = {
        "advantage": (adv * cand_valid).reshape(B, R, M),
        "valid_mask": cand_valid.reshape(B, R, M),
        "rollout_return": (ret * cand_valid).reshape(B, R, M),
    }
    if debug:
        # per-candidate discounted sums of each reward component + rollout
        # event stats (tools/diag_advantage.py attribution)
        comps = dense_reward(
            delta_dis, delta_angle, roll_speed, roll_acc, roll_yaw_rate,
            roll_yaw_acc, collision.astype(jnp.float32),
            offroad.astype(jnp.float32), components=True,
        )
        w = active * discount
        for k, v in comps.items():
            out[f"dbg_{k}"] = jnp.sum(v * w, axis=-1).reshape(B, R, M)
        out["dbg_collided"] = collision.any(-1).reshape(B, R, M)
        out["dbg_offroad_frac"] = offroad.mean(-1).reshape(B, R, M)
        out["dbg_mean_speed"] = roll_speed.mean(-1).reshape(B, R, M)
        out["dbg_mean_absdd"] = delta_dis.mean(-1).reshape(B, R, M)
    return out


@partial(jax.jit, static_argnames=("dt", "num_frames"))
def grpo_advantage(
    tmap: TensorMap,
    trajectories: jnp.ndarray,  # [R, M, T, 6] local-frame model output
    r_valid: jnp.ndarray,  # [R] valid reference lines
    ref_pos: jnp.ndarray,  # [R, Nr, 2] local-frame reference lines
    ref_heading: jnp.ndarray,  # [R, Nr]
    ref_point_valid: jnp.ndarray,  # [R, Nr]
    center_pos: jnp.ndarray,  # [2] world position of the CBV
    center_heading: jnp.ndarray,  # [] world heading
    center_speed: jnp.ndarray,  # []
    center_shape: jnp.ndarray,  # [2] width, length
    nbr_pos: jnp.ndarray,  # [N, 2] world neighbor states
    nbr_heading: jnp.ndarray,  # [N]
    nbr_speed: jnp.ndarray,  # [N]
    nbr_control: jnp.ndarray,  # [N, 3]
    nbr_shape: jnp.ndarray,  # [N, 2]
    nbr_valid: jnp.ndarray,  # [N]
    dt: float = 0.1,
    num_frames: int = NUM_FRAMES,
):
    """Single-CBV wrapper over `grpo_advantage_batched` (B = 1).

    Returns dict: advantage [R, M], valid_mask [R, M], rollout_return [R, M].
    """
    out = grpo_advantage_batched(
        tmap,
        trajectories[None],
        r_valid[None],
        ref_pos[None],
        ref_heading[None],
        ref_point_valid[None],
        center_pos[None],
        center_heading[None],
        center_speed[None],
        center_shape[None],
        nbr_pos[None],
        nbr_heading[None],
        nbr_speed[None],
        nbr_control[None],
        nbr_shape[None],
        nbr_valid[None],
        dt=dt,
        num_frames=num_frames,
    )
    return jax.tree.map(lambda x: x[0], out)
