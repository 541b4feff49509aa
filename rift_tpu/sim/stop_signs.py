"""Stop-sign zones and stop-once-then-proceed behavior.

Replaces the reference's `traffic.stop` trigger-volume machinery: the
RunningStopTest criterion scans stop signs whose trigger volume contains the
actor's forward waypoints and requires speed < 0.1 m/s before leaving the
volume (rift/scenario/tools/atomic_criteria.py:1806-1962); PDM-Lite's
autopilot brakes for the same volumes (rift/ego/pdm_lite/autopilot.py
stop-sign handling).

TPU model: `TensorMap.stop_lane` marks lanes whose END is a stop line. An
agent is "approaching" within STOP_BRAKE_DISTANCE of the line (autopilot
brakes) and "in the zone" within STOP_ZONE (where it must come to a halt
once). `SimState.stopped_at_stop` latches the halt; it resets on the next
zone entry, so the criterion can read it on zone exit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..map.tensor_map import TensorMap

STOP_BRAKE_DISTANCE = 15.0  # start braking this far from the stop line
STOP_ZONE = 6.0  # must have halted within this distance of the line
SPEED_STOPPED = 0.1  # m/s (RunningStopTest.SPEED_THRESHOLD)


def stop_zone_info(tmap: TensorMap, lane: jnp.ndarray, pos: jnp.ndarray):
    """(approaching, in_zone, dist) for agents bound to `lane` (...,) at
    `pos` (..., 2)."""
    is_stop = tmap.stop_lane[lane]
    lane_end = tmap.centerline[lane, -1]
    dist = jnp.linalg.norm(lane_end - pos, axis=-1)
    approaching = is_stop & (dist < STOP_BRAKE_DISTANCE)
    in_zone = is_stop & (dist < STOP_ZONE)
    return approaching, in_zone, dist


CRAWL_SPEED = 2.0  # m/s approach creep toward the stop line


def stop_target_speed(
    tmap: TensorMap,
    lane: jnp.ndarray,  # (...,)
    pos: jnp.ndarray,  # (..., 2)
    stopped_latch: jnp.ndarray,  # (...,) bool (state.stopped_at_stop)
    v_target: jnp.ndarray,  # (...,)
):
    """Clamp `v_target` for stop-sign compliance: crawl while approaching
    the line, full halt inside the zone until the latch sets, then resume.
    (Braking straight to 0 at STOP_BRAKE_DISTANCE would park the vehicle
    short of the zone and deadlock — the latch only sets inside it.)"""
    approaching, in_zone, _ = stop_zone_info(tmap, lane, pos)
    need = ~stopped_latch
    v = jnp.where(approaching & need, jnp.minimum(v_target, CRAWL_SPEED), v_target)
    return jnp.where(in_zone & need, 0.0, v)


def update_stop_memory(
    in_zone_prev: jnp.ndarray,  # [S, A] bool (state.in_stop_zone)
    stopped_prev: jnp.ndarray,  # [S, A] bool (state.stopped_at_stop)
    in_zone_now: jnp.ndarray,  # [S, A] bool
    speed_now: jnp.ndarray,  # [S, A]
):
    """New (in_stop_zone, stopped_at_stop). The latch resets on zone entry
    and persists after exit (so the exit-edge criterion can read it)."""
    enter = in_zone_now & ~in_zone_prev
    stopped = jnp.where(enter, False, stopped_prev)
    stopped = stopped | (in_zone_now & (speed_now < SPEED_STOPPED))
    return in_zone_now, stopped
