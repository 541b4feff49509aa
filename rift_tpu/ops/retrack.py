"""Pallas kernel: fused PID + bicycle candidate re-tracking rollout.

The GRPO evaluator re-tracks every candidate trajectory with the shared
PID controller and the World-on-Rails bicycle model for NUM_FRAMES closed-
loop steps (rl/evaluator.py:rollout_candidates; reference
track_propogate.py:599+ TrackPropagate.propagate). The loop is inherently
sequential — 39 steps of ~50 tiny ops each — which as a lax.scan costs
~100 ms/tick at 9216 candidates (192 CBVs x 48 candidates): pure dispatch
and HBM-tile overhead, zero arithmetic intensity.

This kernel runs the WHOLE rollout in VMEM. Layout (round 5): CANDIDATES
on the lane axis, frames on sublanes — per-candidate state is [1, BB]
(dense VREG rows) instead of the round-3 [BB, 1] columns that wasted
127/128 lanes on every one of the ~40 scalar ops per step (measured 8.1
ms/tick in-context; the transpose recovers ~an order of magnitude of VPU
utilization). Point lookups (aim waypoints at closest+9/19/29) are one-hot
masked reductions over the sublane (frame) axis — no gathers.

Semantics match rollout_candidates' jnp path bit-for-bit in structure:
  * aim/desired-speed from waypoints resampled every 10 frames
    (pid_controller.py:57-100 control_pid);
  * PID window pre-filled with zeros, integral = mean over full window,
    derivative = error - previous_error (pid_controller.py:14-35);
  * World-on-Rails throttle/brake polynomials (track_propogate.py:160-315).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sim.dynamics import (
    BRAKE_POLY,
    FRONT_WB,
    REAR_WB,
    STEER_GAIN,
    THROTTLE_MIN_EFFECT,
    THROTTLE_POLY,
)
from ..sim.pid import (
    AIM_ALPHA,
    AIM_BETA,
    BRAKE_RATIO,
    BRAKE_SPEED,
    CLIP_DELTA,
    MAX_AIM_DIS,
    MAX_THROTTLE,
    MIN_AIM_DIS,
    PID_WINDOW,
    SPEED_KD,
    SPEED_KI,
    SPEED_KP,
    TURN_KD,
    TURN_KI,
    TURN_KP,
)

BB = 512  # candidates per block (lane axis; 4 full VREG rows)

# concretize polynomial coefficients via numpy: this module is lazily
# imported from inside a jit trace, where any jnp op (even indexing a
# concrete constant) returns a tracer
import numpy as _np

_BRAKE_COEFFS = [float(c) for c in _np.asarray(BRAKE_POLY)]
_THROTTLE_COEFFS = [float(c) for c in _np.asarray(THROTTLE_POLY)]


def _atan(z):
    """arctan for |z| <= ~1, via one half-angle reduction + odd Taylor to
    w^9 (|err| < 2e-5 rad). Mosaic has no atan/atan2 lowering."""
    w = z / (1.0 + jnp.sqrt(1.0 + z * z))
    w2 = w * w
    return 2.0 * w * (
        1.0 + w2 * (-1.0 / 3.0 + w2 * (0.2 + w2 * (-1.0 / 7.0 + w2 / 9.0)))
    )


def _atan2(y, x):
    """Full-quadrant arctan2 built on _atan (t = min/max <= 1)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    t = jnp.minimum(ax, ay) / jnp.maximum(jnp.maximum(ax, ay), 1e-12)
    a = _atan(t)
    a = jnp.where(ay > ax, jnp.pi / 2 - a, a)
    a = jnp.where(x < 0, jnp.pi - a, a)
    return jnp.where(y < 0, -a, a)


def _retrack_kernel(rx_ref, ry_ref, rh_ref, v0_ref, ox_ref, oy_ref, oh_ref, ov_ref,
                    *, num_frames, dt):
    """All refs are [T, BB] (frames on sublanes, candidates on lanes);
    v0_ref is [1, BB]. Per-candidate rolling state is [1, BB]."""
    T = num_frames
    rx = rx_ref[:]  # [T, BB]
    ry = ry_ref[:]
    rh = rh_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, rx.shape, 0)  # [T, BB]
    iota_w = jax.lax.broadcasted_iota(
        jnp.int32, (PID_WINDOW, rx.shape[1]), 0
    )

    def pick(idx):
        """Per-candidate frame gather via one-hot sublane reduction.
        idx [1, BB] int32 -> (x, y) each [1, BB]."""
        m = iota == jnp.minimum(idx, T - 1)
        gx = jnp.sum(jnp.where(m, rx, 0.0), axis=0, keepdims=True)
        gy = jnp.sum(jnp.where(m, ry, 0.0), axis=0, keepdims=True)
        return gx, gy

    px = rx[:1]  # [1, BB]
    py = ry[:1]
    hd = rh[:1]
    v = v0_ref[:]
    closest = jnp.zeros_like(px, jnp.int32)
    sbuf = jnp.zeros((PID_WINDOW, rx.shape[1]), jnp.float32)
    tbuf = jnp.zeros((PID_WINDOW, rx.shape[1]), jnp.float32)
    ox = jnp.where(iota == 0, px, 0.0)
    oy = jnp.where(iota == 0, py, 0.0)
    oh = jnp.where(iota == 0, hd, 0.0)
    ov = jnp.where(iota == 0, v, 0.0)

    def body(t, carry):
        px, py, hd, v, closest, sbuf, tbuf, ox, oy, oh, ov = carry

        # resampled waypoints at closest + 9/19/29 (control_pid wp[9::10])
        x9, y9 = pick(closest + 9)
        x19, y19 = pick(closest + 19)
        x29, y29 = pick(closest + 29)
        d1 = jnp.sqrt((x19 - x9) ** 2 + (y19 - y9) ** 2)
        d2 = jnp.sqrt((x29 - x19) ** 2 + (y29 - y19) ** 2)
        desired_v = 0.5 * (d1 + d2)

        aim_dist = jnp.clip(AIM_ALPHA * v + AIM_BETA, MIN_AIM_DIS, MAX_AIM_DIS)
        n0 = jnp.sqrt((x9 - px) ** 2 + (y9 - py) ** 2)
        n1 = jnp.sqrt((x19 - px) ** 2 + (y19 - py) ** 2)
        use1 = jnp.abs(n1 - aim_dist) < jnp.abs(n0 - aim_dist)
        aim_x = jnp.where(use1, x19, x9) - px
        aim_y = jnp.where(use1, y19, y9) - py

        brake = (desired_v < BRAKE_SPEED) | (
            v / jnp.maximum(desired_v, 1e-4) > BRAKE_RATIO
        )

        ptr = t % PID_WINDOW
        # speed PID
        delta = jnp.clip(desired_v - v, 0.0, CLIP_DELTA)
        prev_s = jnp.sum(
            jnp.where(iota_w == (ptr - 1) % PID_WINDOW, sbuf, 0.0),
            axis=0, keepdims=True,
        )
        sbuf = jnp.where(iota_w == ptr, delta, sbuf)
        integral_s = jnp.sum(sbuf, axis=0, keepdims=True) / PID_WINDOW
        throttle = (
            SPEED_KP * delta + SPEED_KI * integral_s + SPEED_KD * (delta - prev_s)
        )
        throttle = jnp.clip(throttle, 0.0, MAX_THROTTLE) * (~brake)

        # turn PID: aim angle in the vehicle frame
        raw = _atan2(aim_y, aim_x) - hd
        wrapped = (raw + jnp.pi) % (2 * jnp.pi) - jnp.pi
        angle = jnp.rad2deg(wrapped) / 90.0
        angle = jnp.where((v < 0.01) | brake, 0.0, angle)
        prev_t = jnp.sum(
            jnp.where(iota_w == (ptr - 1) % PID_WINDOW, tbuf, 0.0),
            axis=0, keepdims=True,
        )
        tbuf = jnp.where(iota_w == ptr, angle, tbuf)
        integral_t = jnp.sum(tbuf, axis=0, keepdims=True) / PID_WINDOW
        steer = (
            TURN_KP * angle + TURN_KI * integral_t + TURN_KD * (angle - prev_t)
        )
        steer = jnp.clip(steer, -1.0, 1.0)

        # bicycle step (sim/dynamics.py:bicycle_step)
        wheel = STEER_GAIN * steer
        tan_w = jnp.sin(wheel) / jnp.cos(wheel)
        slip = _atan(REAR_WB / (FRONT_WB + REAR_WB) * tan_w)
        px = px + v * jnp.cos(hd + slip) * dt
        py = py + v * jnp.sin(hd + slip) * dt
        hd = hd + (v / REAR_WB) * jnp.sin(slip) * dt

        v_kph = v * 3.6
        vb = jnp.zeros_like(v_kph)
        for c in _BRAKE_COEFFS[::-1]:
            vb = (vb + c) * v_kph
        tt = throttle
        vt = (
            _THROTTLE_COEFFS[0] * v_kph
            + _THROTTLE_COEFFS[1] * v_kph * v_kph
            + _THROTTLE_COEFFS[2] * tt
            + _THROTTLE_COEFFS[3] * tt * tt
            + _THROTTLE_COEFFS[4] * v_kph * tt
            + _THROTTLE_COEFFS[5] * v_kph * tt * tt
            + _THROTTLE_COEFFS[6] * v_kph * v_kph * tt
            + _THROTTLE_COEFFS[7] * v_kph * v_kph * tt * tt
        )
        throttling = (~brake) & (throttle >= THROTTLE_MIN_EFFECT)
        v_next = jnp.where(brake, vb, v_kph)
        v_next = jnp.where(throttling, vt, v_next)
        v = jnp.maximum(v_next / 3.6, 0.0)

        # closest waypoint (first argmin, matching jnp.argmin)
        dd = (rx - px) ** 2 + (ry - py) ** 2
        mn = jnp.min(dd, axis=0, keepdims=True)
        closest = jnp.min(
            jnp.where(dd == mn, iota, T), axis=0, keepdims=True
        ).astype(jnp.int32)

        wm = iota == (t + 1)
        ox = jnp.where(wm, px, ox)
        oy = jnp.where(wm, py, oy)
        oh = jnp.where(wm, hd, oh)
        ov = jnp.where(wm, v, ov)
        return px, py, hd, v, closest, sbuf, tbuf, ox, oy, oh, ov

    carry = (px, py, hd, v, closest, sbuf, tbuf, ox, oy, oh, ov)
    carry = jax.lax.fori_loop(0, T - 1, body, carry)
    ox_ref[:] = carry[7]
    oy_ref[:] = carry[8]
    oh_ref[:] = carry[9]
    ov_ref[:] = carry[10]


def _round_up(n, m):
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("num_frames", "dt", "interpret"))
def retrack_rollout_pallas(
    ref_pos: jnp.ndarray,  # [G, T, 2] world-frame candidate waypoints
    ref_heading: jnp.ndarray,  # [G, T]
    init_speed: jnp.ndarray,  # [G]
    num_frames: int,
    dt: float = 0.1,
    interpret: bool = False,
):
    """Returns (center [G, T, 2], heading [G, T], speed [G, T])."""
    G, T = ref_heading.shape
    Gp = _round_up(G, BB)
    # transpose to the kernel layout [T, Gp]: frames on sublanes,
    # candidates on lanes
    rx = ref_pos[..., 0].T
    ry = ref_pos[..., 1].T
    rh = ref_heading.T
    if Gp != G:
        rx = jnp.pad(rx, ((0, 0), (0, Gp - G)))
        ry = jnp.pad(ry, ((0, 0), (0, Gp - G)))
        rh = jnp.pad(rh, ((0, 0), (0, Gp - G)))
        init_speed = jnp.pad(init_speed, (0, Gp - G))
    v0 = init_speed[None, :]  # [1, Gp]

    shapes = [jax.ShapeDtypeStruct((T, Gp), jnp.float32)] * 4
    bspec = pl.BlockSpec((T, BB), lambda i: (0, i), memory_space=pltpu.VMEM)
    ox, oy, oh, ov = pl.pallas_call(
        functools.partial(_retrack_kernel, num_frames=num_frames, dt=dt),
        out_shape=shapes,
        grid=(Gp // BB,),
        in_specs=[
            bspec, bspec, bspec,
            pl.BlockSpec((1, BB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[bspec] * 4,
        interpret=interpret,
    )(
        rx.astype(jnp.float32), ry.astype(jnp.float32),
        rh.astype(jnp.float32), v0.astype(jnp.float32),
    )
    center = jnp.stack([ox.T[:G], oy.T[:G]], axis=-1)
    return center, oh.T[:G], ov.T[:G]
