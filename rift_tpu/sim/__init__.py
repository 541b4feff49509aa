from .dynamics import bicycle_forecast_step, bicycle_step
from .pid import PIDState, TrackerState, pid_step, track_step
from .state import DEFAULT_SHAPE, HISTORY_STEPS, ScenarioSpec, SimState, init_sim_state, init_sim_state_host
from .autopilot import (
    LeaderInfo,
    chain_lanes_free,
    find_leaders,
    idm_target_speed,
    lane_follow_waypoints,
    path_follow_waypoints,
)
from .world import autopilot_waypoints, cbv_reached_goal, step

__all__ = [
    "bicycle_step",
    "bicycle_forecast_step",
    "PIDState",
    "TrackerState",
    "pid_step",
    "track_step",
    "SimState",
    "ScenarioSpec",
    "init_sim_state",
    "init_sim_state_host",
    "HISTORY_STEPS",
    "DEFAULT_SHAPE",
    "LeaderInfo",
    "find_leaders",
    "idm_target_speed",
    "chain_lanes_free",
    "lane_follow_waypoints",
    "path_follow_waypoints",
    "autopilot_waypoints",
    "step",
    "cbv_reached_goal",
]
