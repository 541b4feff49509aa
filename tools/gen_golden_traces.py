#!/usr/bin/env python
"""Generate the golden control->motion traces (tests/fixtures/golden_traces.npz).

SURVEY.md §4 calls for golden-trajectory parity tests of the dynamics stack.
CARLA itself is unavailable, so the committed stand-in is the reference's own
documented response model — the World-on-Rails kinematic bicycle + polynomial
speed response (track_propogate.py:160-282) closed-loop tracked by the
reference PID (pid_controller.py:13-100, deque window pre-filled with zeros).

This generator is an INDEPENDENT implementation: scalar float64 numpy with a
real `collections.deque` PID, no imports from rift_tpu — so the parity test
(tests/test_golden_traces.py) cross-checks the vectorized float32 JAX stack
(sim/dynamics.bicycle_step + sim/pid.track_step) against a second
implementation of the same published spec, end to end over whole maneuvers.

Maneuvers (all 10 Hz, 120 ticks):
  accel_cruise  from rest on a straight path, 8 m/s target spacing
  brake_stop    from 10 m/s, degenerate near-origin waypoints (brake branch)
  lane_change   6 m/s, 3.5 m lateral offset over 40 m (S-curve)
  turn          5 m/s on a 20 m-radius arc

Run from the repo root:  python tools/gen_golden_traces.py
"""

from __future__ import annotations

import os
from collections import deque

import numpy as np

DT = 0.1
TICKS = 120
HORIZON = 80  # local waypoints fed to the tracker per tick

# --- World-on-Rails constants (track_propogate.py:184-207) -------------------
LF = -0.090769015
LR = 1.4178275
STEER_GAIN = 0.36848336
BRAKE_POLY = [9.31711370e-03, 8.20967431e-02, -2.83832427e-03, 5.06587474e-05,
              -4.90357228e-07, 2.44419284e-09, -4.91381935e-12]
THROTTLE_POLY = [9.63873001e-01, 4.37535692e-04, -3.80192912e-01,
                 1.74950069e+00, 9.16787414e-02, -7.05461530e-02,
                 -1.05996152e-03, 6.71079346e-04]
THROTTLE_MIN = 0.3

# --- tracker constants (sim/pid.py == pid_controller.py:40 CBV defaults:
# max_throttle=1.0, clip_delta=1.0 — pluto.py:47 passes sample_interval only)
SAMPLE_INTERVAL = 10
MAX_THROTTLE = 1.0
BRAKE_SPEED = 0.4
BRAKE_RATIO = 1.1
CLIP_DELTA = 1.0
AIM_ALPHA, AIM_BETA = 0.5, 2.5
MIN_AIM, MAX_AIM = 5.0, 8.0


class PID:
    """Reference PID: deque pre-filled with n zeros (pid_controller.py:14-35)."""

    def __init__(self, kp, ki, kd, n=20):
        self.kp, self.ki, self.kd = kp, ki, kd
        self.window = deque([0.0] * n, maxlen=n)

    def step(self, error):
        self.window.append(error)
        integral = float(np.mean(self.window))
        derivative = self.window[-1] - self.window[-2]
        return self.kp * error + self.ki * integral + self.kd * derivative


def bicycle(pos, heading, speed, throttle, steer, brake):
    slip = np.arctan(LR / (LF + LR) * np.tan(STEER_GAIN * steer))
    pos = pos + speed * DT * np.array(
        [np.cos(heading + slip), np.sin(heading + slip)]
    )
    heading = heading + speed / LR * np.sin(slip) * DT
    v = speed * 3.6
    if brake:
        v = sum(c * v ** (i + 1) for i, c in enumerate(BRAKE_POLY))
    elif throttle >= THROTTLE_MIN:
        t = throttle
        feats = [v, v * v, t, t * t, v * t, v * t * t, v * v * t,
                 v * v * t * t]
        v = sum(c * f for c, f in zip(THROTTLE_POLY, feats))
    return pos, heading, max(v / 3.6, 0.0)


def control(speed_pid, turn_pid, local_wp, speed):
    """The tracker (sim/pid.track_step semantics, scalar)."""
    wp = (
        local_wp[SAMPLE_INTERVAL - 1 :: SAMPLE_INTERVAL]
        if local_wp.shape[0] >= SAMPLE_INTERVAL
        else local_wp[-1:]
    )
    if wp.shape[0] > 1:
        desired_v = float(np.linalg.norm(np.diff(wp, axis=0), axis=1).mean())
        aim_dist = np.clip(AIM_ALPHA * speed + AIM_BETA, MIN_AIM, MAX_AIM)
        norms = np.linalg.norm(wp[:-1], axis=1)
        aim = wp[int(np.abs(norms - aim_dist).argmin())]
    else:
        desired_v = 0.0
        aim = wp[0]

    brake = desired_v < BRAKE_SPEED or speed / max(desired_v, 1e-4) > BRAKE_RATIO
    delta = float(np.clip(desired_v - speed, 0.0, CLIP_DELTA))
    throttle = float(np.clip(speed_pid.step(delta), 0.0, MAX_THROTTLE))
    throttle = 0.0 if brake else throttle
    angle = np.degrees(np.arctan2(aim[1], aim[0])) / 90.0
    if speed < 0.01 or brake:
        angle = 0.0
    steer = float(np.clip(turn_pid.step(angle), -1.0, 1.0))
    return throttle, steer, bool(brake)


def global_paths():
    """name -> (path [N, 2] world-frame, v0). Spacing encodes target speed."""
    out = {}
    s = np.arange(0, 400, 0.8)  # 8 m/s
    out["accel_cruise"] = (np.stack([s, np.zeros_like(s)], -1), 0.0)
    out["brake_stop"] = (np.zeros((HORIZON, 2)), 10.0)
    x = np.arange(0, 400, 0.6)  # 6 m/s
    y = 3.5 * 0.5 * (1.0 - np.cos(np.clip(x - 10, 0, 40) / 40 * np.pi))
    out["lane_change"] = (np.stack([x, y], -1), 6.0)
    th = np.arange(0, 3.0, 0.5 / 20.0)  # 5 m/s on R=20
    out["turn"] = (
        np.stack([20 * np.sin(th), 20 * (1 - np.cos(th))], -1), 5.0
    )
    return out


def local_frame(path, pos, heading):
    """Next HORIZON path points ahead of the vehicle, in its frame."""
    d = np.linalg.norm(path - pos, axis=1)
    i = int(d.argmin())
    seg = path[i + 1 : i + 1 + HORIZON]
    if seg.shape[0] < HORIZON:
        seg = np.concatenate(
            [seg, np.repeat(path[-1:], HORIZON - seg.shape[0], axis=0)]
        )
    c, s = np.cos(heading), np.sin(heading)
    rel = seg - pos
    return np.stack(
        [rel[:, 0] * c + rel[:, 1] * s, -rel[:, 0] * s + rel[:, 1] * c], -1
    )


def main():
    fixtures = {}
    for name, (path, v0) in global_paths().items():
        pos, heading, speed = np.zeros(2), 0.0, float(v0)
        speed_pid = PID(5.0, 0.5, 1.0)
        turn_pid = PID(1.25, 0.75, 0.3)
        poss, heads, speeds, acts, wps = [], [], [], [], []
        for _ in range(TICKS):
            wp = local_frame(path, pos, heading)
            throttle, steer, brake = control(speed_pid, turn_pid, wp, speed)
            poss.append(pos.copy())
            heads.append(heading)
            speeds.append(speed)
            acts.append([throttle, steer, float(brake)])
            wps.append(wp)
            pos, heading, speed = bicycle(
                pos, heading, speed, throttle, steer, brake
            )
        fixtures[f"{name}/pos"] = np.asarray(poss, np.float64)
        fixtures[f"{name}/heading"] = np.asarray(heads, np.float64)
        fixtures[f"{name}/speed"] = np.asarray(speeds, np.float64)
        fixtures[f"{name}/action"] = np.asarray(acts, np.float64)
        fixtures[f"{name}/waypoints"] = np.asarray(wps, np.float64)
        fixtures[f"{name}/path"] = path
        fixtures[f"{name}/v0"] = np.float64(v0)
        print(
            f"{name:>14}: final pos ({pos[0]:7.2f},{pos[1]:6.2f}) "
            f"heading {np.degrees(heading):6.1f}deg speed {speed:5.2f} m/s"
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "golden_traces.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **fixtures)
    print("wrote", out)


if __name__ == "__main__":
    main()
