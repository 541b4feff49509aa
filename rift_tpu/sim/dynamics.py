"""Vehicle dynamics: kinematic bicycle with CARLA-calibrated response.

This is the simulator's motion model — it replaces CARLA/UE4 physics in the
world tick. The model family and calibration constants follow the
World-on-Rails fits used throughout the reference as its documented stand-in
for CARLA 0.9.15 control->motion response
(rift/cbv/planning/fine_tuner/rlft/traj_eval/track_propogate.py:160-315,
rift/ego/pdm_lite/kinematic_bicycle_model.py:33-111): slip-angle bicycle
geometry plus throttle/brake speed polynomials (in km/h).

Two variants, matching the reference:
  * ``bicycle_step`` — full polynomial response (used for the controlled
    vehicle and candidate rollouts).
  * ``bicycle_forecast_step`` — constant-accel approximation (used to
    forecast other vehicles' futures).

All functions are elementwise over any batch shape; state is
(pos [..., 2], heading [...], speed [...]) and action is
(throttle, steer, brake) stacked on the last axis.
"""

from __future__ import annotations

import jax.numpy as jnp

# --- World-on-Rails calibration (CARLA 0.9.15) -------------------------------
# Geometry: distances from the rear axle (meters).
FRONT_WB = -0.090769015
REAR_WB = 1.4178275
STEER_GAIN = 0.36848336

# Speed-response polynomials, inputs/outputs in km/h.
# brake: next_v = sum_i coeff[i] * v^(i+1)
BRAKE_POLY = jnp.array(
    [9.31711370e-03, 8.20967431e-02, -2.83832427e-03, 5.06587474e-05,
     -4.90357228e-07, 2.44419284e-09, -4.91381935e-12],
    dtype=jnp.float32,
)
# throttle: features [v, v^2, t, t^2, v*t, v*t^2, v^2*t, v^2*t^2]
THROTTLE_POLY = jnp.array(
    [9.63873001e-01, 4.37535692e-04, -3.80192912e-01, 1.74950069e+00,
     9.16787414e-02, -7.05461530e-02, -1.05996152e-03, 6.71079346e-04],
    dtype=jnp.float32,
)
THROTTLE_MIN_EFFECT = 0.3  # below this throttle the speed holds (coasting)

# Constant-accel forecast rates for other vehicles (m/s^2).
FORECAST_BRAKE_ACCEL = -4.952399
FORECAST_THROTTLE_ACCEL = 0.5633837


def _slip(steer: jnp.ndarray) -> jnp.ndarray:
    wheel = STEER_GAIN * steer
    return jnp.arctan(REAR_WB / (FRONT_WB + REAR_WB) * jnp.tan(wheel))


def bicycle_step(
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    speed: jnp.ndarray,
    action: jnp.ndarray,
    dt: float = 0.1,
):
    """One full-response step. Returns (pos', heading', speed')."""
    throttle = action[..., 0]
    steer = action[..., 1]
    brake = action[..., 2] >= 0.5

    slip = _slip(steer)
    dx = speed * jnp.cos(heading + slip) * dt
    dy = speed * jnp.sin(heading + slip) * dt
    new_heading = heading + (speed / REAR_WB) * jnp.sin(slip) * dt
    new_pos = pos + jnp.stack([dx, dy], axis=-1)

    v_kph = speed * 3.6
    # brake polynomial: powers v^1..v^7
    powers = jnp.stack([v_kph ** i for i in range(1, 8)], axis=-1)
    v_brake = powers @ BRAKE_POLY
    # throttle polynomial
    t = throttle
    feats = jnp.stack(
        [v_kph, v_kph * v_kph, t, t * t, v_kph * t, v_kph * t * t,
         v_kph * v_kph * t, v_kph * v_kph * t * t],
        axis=-1,
    )
    v_throttle = feats @ THROTTLE_POLY

    throttling = (~brake) & (throttle >= THROTTLE_MIN_EFFECT)
    v_next_kph = jnp.where(brake, v_brake, v_kph)
    v_next_kph = jnp.where(throttling, v_throttle, v_next_kph)
    new_speed = jnp.maximum(v_next_kph / 3.6, 0.0)
    return new_pos, new_heading, new_speed


def bicycle_forecast_step(
    pos: jnp.ndarray,
    heading: jnp.ndarray,
    speed: jnp.ndarray,
    action: jnp.ndarray,
    dt: float = 0.1,
):
    """One constant-accel forecast step for other vehicles."""
    throttle = action[..., 0]
    steer = action[..., 1]
    brake = action[..., 2] >= 0.5

    slip = _slip(steer)
    dx = speed * jnp.cos(heading + slip) * dt
    dy = speed * jnp.sin(heading + slip) * dt
    new_heading = heading + speed / REAR_WB * jnp.sin(slip) * dt
    new_pos = pos + jnp.stack([dx, dy], axis=-1)

    accel = jnp.where(brake, FORECAST_BRAKE_ACCEL, throttle * FORECAST_THROTTLE_ACCEL)
    new_speed = jnp.maximum(speed + dt * accel, 0.0)
    return new_pos, new_heading, new_speed
