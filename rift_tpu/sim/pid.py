"""Stateless batched PID + trajectory-tracking controller.

Replaces the reference's per-CBV Python ``PIDController`` objects
(rift/cbv/planning/pluto/controller/pid_controller.py) and its batched torch
variant (track_propogate.py:318-491) with a functional design: PID state is a
small pytree carried by the caller (the env state or a scan carry), so one
fused program controls every vehicle in every scenario.

Controller semantics match the reference tracker:
  * waypoints resampled every `sample_interval` steps; desired speed = mean
    resampled segment length;
  * aim point = waypoint whose distance is closest to
    clip(0.5*v + 2.5, 5, 8) m;
  * brake if desired speed < 0.4 m/s or speed/desired > 1.1;
  * steering from aim-point angle (degrees/90), zeroed when braking/stopped;
  * speed PID (5, .5, 1), turn PID (1.25, .75, .3), window n=20.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

PID_WINDOW = 20

SPEED_KP, SPEED_KI, SPEED_KD = 5.0, 0.5, 1.0
TURN_KP, TURN_KI, TURN_KD = 1.25, 0.75, 0.3

# reference CBV PID constructor defaults (pid_controller.py:40:
# max_throttle=1.0, clip_delta=1.0 — pluto.py:47 instantiates with
# sample_interval only). clip_delta saturates Kp=5 past ~0.2 anyway; the
# throttle ceiling is what lets candidates accelerate at full authority.
MAX_THROTTLE = 1.0
BRAKE_SPEED = 0.4
BRAKE_RATIO = 1.1
CLIP_DELTA = 1.0
AIM_ALPHA, AIM_BETA = 0.5, 2.5
MIN_AIM_DIS, MAX_AIM_DIS = 5.0, 8.0


class PIDState(NamedTuple):
    """Ring buffer of recent errors; all fields share leading batch shape."""

    buf: jnp.ndarray  # [..., PID_WINDOW]
    ptr: jnp.ndarray  # [...] int32
    count: jnp.ndarray  # [...] int32

    @classmethod
    def zeros(cls, batch_shape: tuple = ()) -> "PIDState":
        return cls(
            buf=jnp.zeros(batch_shape + (PID_WINDOW,), jnp.float32),
            ptr=jnp.zeros(batch_shape, jnp.int32),
            count=jnp.zeros(batch_shape, jnp.int32),
        )

    def reset_where(self, mask: jnp.ndarray) -> "PIDState":
        """Zero the controllers where mask is True (e.g. fresh CBVs)."""
        m = mask[..., None]
        return PIDState(
            buf=jnp.where(m, 0.0, self.buf),
            ptr=jnp.where(mask, 0, self.ptr),
            count=jnp.where(mask, 0, self.count),
        )


def pid_step(
    state: PIDState, error: jnp.ndarray, kp: float, ki: float, kd: float
) -> tuple[jnp.ndarray, PIDState]:
    """One PID update. `error` has the state's batch shape.

    Matches the reference PID exactly (pid_controller.py:14-35): the window
    deque is PRE-FILLED with n zeros, so the integral is the mean over the
    full window (zeros included early on) and the derivative is
    `error - previous_error` (the previous error is 0 on the first step)."""
    idx = state.ptr
    prev = jnp.take_along_axis(
        state.buf, ((idx - 1) % PID_WINDOW)[..., None], axis=-1
    )[..., 0]
    buf = jnp.where(
        jnp.arange(PID_WINDOW) == idx[..., None], error[..., None], state.buf
    )
    count = jnp.minimum(state.count + 1, PID_WINDOW)
    integral = buf.sum(-1) / float(PID_WINDOW)
    derivative = error - prev
    out = kp * error + ki * integral + kd * derivative
    return out, PIDState(buf=buf, ptr=(idx + 1) % PID_WINDOW, count=count)


class TrackerState(NamedTuple):
    """Per-vehicle trajectory tracker (speed PID + turn PID)."""

    speed: PIDState
    turn: PIDState

    @classmethod
    def zeros(cls, batch_shape: tuple = ()) -> "TrackerState":
        return cls(PIDState.zeros(batch_shape), PIDState.zeros(batch_shape))

    def reset_where(self, mask: jnp.ndarray) -> "TrackerState":
        return TrackerState(
            self.speed.reset_where(mask), self.turn.reset_where(mask)
        )


def densify_local_waypoints(
    wp: jnp.ndarray,  # [..., K, 2] sparse local waypoints
    wp_dt: float = 0.5,  # seconds between them (first at t=wp_dt)
    dt: float = 0.1,
    num_points: int = 30,
) -> jnp.ndarray:
    """Sparse planner waypoints -> the tracker's dt-per-point trajectory.

    track_step infers desired speed from consecutive-sample spacing, so a
    K=4-point prediction (PlanT / E2E heads, 0.5 s apart) must be
    resampled to the 0.1 s grid — padding with the final waypoint reads
    as "stop" (VADEgo/PlanTEgo silently braked before this). Linear
    interpolation between knots, constant-velocity extrapolation past the
    last one (the reference's PID also extrapolates its aim point,
    plant/model.py control_pid)."""
    K = wp.shape[-2]
    origin = jnp.zeros_like(wp[..., :1, :])
    knots = jnp.concatenate([origin, wp], axis=-2)  # [..., K+1, 2] t=k*wp_dt
    t = (jnp.arange(num_points, dtype=jnp.float32) + 1.0) * dt / wp_dt
    idx = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, K - 1)
    frac = t - idx  # >1 past the last knot -> linear extrapolation
    p0 = knots[..., idx, :]
    p1 = knots[..., idx + 1, :]
    return p0 + frac[..., None] * (p1 - p0)


def extend_path(wp: jnp.ndarray, n: int) -> jnp.ndarray:
    """Pad [..., T, 2] waypoints to n points by extrapolating the last
    segment (constant-velocity continuation). The tracker derives desired
    speed from mean segment length over the FULL window (the reference PID
    resamples the whole 80-frame candidate, pid_controller.py:57-76) —
    padding by repetition would deflate it; a genuinely stationary tail
    (stop command) extrapolates to more stationary points, preserving the
    brake semantics."""
    T = wp.shape[-2]
    if T >= n:
        return wp[..., :n, :]
    if T < 2:
        return jnp.concatenate(
            [wp] + [wp[..., -1:, :]] * (n - T), axis=-2
        )
    delta = wp[..., -1:, :] - wp[..., -2:-1, :]
    k = jnp.arange(1, n - T + 1, dtype=wp.dtype)[:, None]
    ext = wp[..., -1:, :] + delta * k
    return jnp.concatenate([wp, ext], axis=-2)


def track_step(
    state: TrackerState,
    local_waypoints: jnp.ndarray,  # [..., T, 2] trajectory in vehicle frame
    speed: jnp.ndarray,  # [...] current forward speed
    sample_interval: int = 10,
) -> tuple[jnp.ndarray, TrackerState]:
    """One control step of the trajectory tracker.

    Returns (action [..., 3] = throttle/steer/brake, new state).
    `local_waypoints` is the planned trajectory expressed in the vehicle
    frame (x forward).
    """
    T = local_waypoints.shape[-2]
    if T >= sample_interval:
        wp = local_waypoints[..., sample_interval - 1 :: sample_interval, :]
    else:
        wp = local_waypoints[..., -1:, :]
    Tr = wp.shape[-2]

    if Tr > 1:
        seg = wp[..., 1:, :] - wp[..., :-1, :]
        desired_v = jnp.linalg.norm(seg, axis=-1).mean(-1)
        aim_dist = jnp.clip(AIM_ALPHA * speed + AIM_BETA, MIN_AIM_DIS, MAX_AIM_DIS)
        norms = jnp.linalg.norm(wp[..., :-1, :], axis=-1)
        idx = jnp.argmin(jnp.abs(norms - aim_dist[..., None]), axis=-1)
        aim = jnp.take_along_axis(
            wp, idx[..., None, None].repeat(2, -1), axis=-2
        )[..., 0, :]
    else:
        desired_v = jnp.zeros_like(speed)
        aim = wp[..., 0, :]

    brake = (desired_v < BRAKE_SPEED) | (
        speed / jnp.maximum(desired_v, 1e-4) > BRAKE_RATIO
    )

    delta = jnp.clip(desired_v - speed, 0.0, CLIP_DELTA)
    throttle, speed_pid = pid_step(state.speed, delta, SPEED_KP, SPEED_KI, SPEED_KD)
    throttle = jnp.clip(throttle, 0.0, MAX_THROTTLE) * (~brake)

    angle = jnp.rad2deg(jnp.arctan2(aim[..., 1], aim[..., 0])) / 90.0
    angle = jnp.where((speed < 0.01) | brake, 0.0, angle)
    steer, turn_pid = pid_step(state.turn, angle, TURN_KP, TURN_KI, TURN_KD)
    steer = jnp.clip(steer, -1.0, 1.0)

    action = jnp.stack([throttle, steer, brake.astype(jnp.float32)], axis=-1)
    return action, TrackerState(speed=speed_pid, turn=turn_pid)
