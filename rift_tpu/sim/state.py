"""SimState: the fixed-shape world state pytree.

Design inversion of the reference's CarlaDataProvider god-object
(rift/scenario/tools/carla_data_provider.py): per-actor Python registries,
deque histories and dict-keyed CBV bookkeeping become dense [S, A] tensors
with masks. Agent slot 0 of every scenario is the ego; background vehicles
occupy the remaining slots and are promoted to CBVs by flipping `is_cbv`
(replacing the reference's CBV spawn/destroy churn, carla_env.py:431-462).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from .pid import TrackerState

HISTORY_STEPS = 21  # reference: 2 s history @ 10 fps + current frame
DEFAULT_SHAPE = (2.0, 4.9)  # width, length — lincoln.mkz_2017-class sedan

# agent classes (the reference distinguishes collision targets by blueprint:
# vehicle.* / walker.* / static.*, atomic_criteria.py:289-423; penalties
# differ per class, statistics_manager.py:27-44)
CLASS_VEHICLE = 0
CLASS_WALKER = 1
CLASS_STATIC = 2
WALKER_SHAPE = (0.7, 0.7)  # footprint of a pedestrian
STATIC_SHAPE = (1.2, 1.8)  # small layout obstacle (e.g. parked trailer)


@struct.dataclass
class SimState:
    # kinematic state
    pos: jnp.ndarray  # [S, A, 2] float32 (rear-axle reference point)
    heading: jnp.ndarray  # [S, A]
    speed: jnp.ndarray  # [S, A] forward speed, m/s
    accel: jnp.ndarray  # [S, A] longitudinal accel estimate (m/s^2)
    yaw_rate: jnp.ndarray  # [S, A]
    control: jnp.ndarray  # [S, A, 3] last applied throttle/steer/brake

    # identity & masks
    alive: jnp.ndarray  # [S, A] bool
    is_cbv: jnp.ndarray  # [S, A] bool (slot 0 never CBV)
    # inactive background-vehicle pool: spawned along the whole route but
    # physics-off until within BV_ACTIVATE_RADIUS of the ego, then flipped
    # alive once (reference lazy activation, route_scenario.py:157-186)
    bv_pool: jnp.ndarray  # [S, A] bool
    shape: jnp.ndarray  # [S, A, 2] width, length
    agent_class: jnp.ndarray  # [S, A] int32 CLASS_VEHICLE/WALKER/STATIC

    # history ring (index -1 = most recent)
    hist_pos: jnp.ndarray  # [S, A, H, 2]
    hist_heading: jnp.ndarray  # [S, A, H]
    hist_vel: jnp.ndarray  # [S, A, H, 2] world-frame velocity
    hist_valid: jnp.ndarray  # [S, A, H] bool

    # map binding
    lane: jnp.ndarray  # [S, A] int32 current lane index
    bv_branch_bits: jnp.ndarray  # [S, A] uint32 pseudo-random fork choices

    # stop-sign memory (sim/stop_signs.py): zone membership last tick +
    # halt latch (reset on zone entry, persists after exit)
    in_stop_zone: jnp.ndarray  # [S, A] bool
    stopped_at_stop: jnp.ndarray  # [S, A] bool

    # per-agent goal (CBV route planner), world frame
    goal: jnp.ndarray  # [S, A, 2]
    goal_valid: jnp.ndarray  # [S, A] bool

    # controllers
    tracker: TrackerState  # batch [S, A]

    # events (this tick)
    collision: jnp.ndarray  # [S, A] bool
    collided_with: jnp.ndarray  # [S, A] int32 other-agent slot or -1
    offroad: jnp.ndarray  # [S, A] bool
    ego_red_entry: jnp.ndarray  # [S] bool: ego entered a red-light connector

    # episode bookkeeping
    ego_route_cursor: jnp.ndarray  # [S] float32 arclength progressed on route
    tick: jnp.ndarray  # [S] int32
    rng: jnp.ndarray  # [S, 2] uint32 per-scenario PRNG key

    @property
    def num_scenarios(self) -> int:
        return self.pos.shape[0]

    @property
    def num_agents(self) -> int:
        return self.pos.shape[1]

    @property
    def velocity(self) -> jnp.ndarray:
        """[S, A, 2] world-frame velocity from speed+heading."""
        return self.speed[..., None] * jnp.stack(
            [jnp.cos(self.heading), jnp.sin(self.heading)], axis=-1
        )


@struct.dataclass
class ScenarioSpec:
    """Episode-static per-scenario data (built at reset on host)."""

    ego_route: jnp.ndarray  # [S, RW, 3] x, y, heading (1 m spacing), padded
    ego_route_len: jnp.ndarray  # [S] int32 number of valid waypoints
    route_road_ids: jnp.ndarray  # [S, RIDS] int32, -1 padded
    route_lane_ids: jnp.ndarray  # [S, RIDS] int32
    ego_target_speed: jnp.ndarray  # [S] m/s
    timeout_ticks: jnp.ndarray  # [S] int32 (reference: 1 s per route meter)
    # lane tables (None allowed for specs that never build planner features)
    route_lane_mask: jnp.ndarray | None = None  # [S, L] lane on ego route
    lane_chains: jnp.ndarray | None = None  # [S, L, 2, MAX_CHAIN] chains
    # route-distance field (map/routing.py:route_distance_field): driving
    # distance from each lane's start to the ego route + route arclength at
    # the join — replaces the reference's per-candidate A* in recognition
    lane_route_dist: jnp.ndarray | None = None  # [S, L] float32 (inf -> 1e9)
    lane_route_join: jnp.ndarray | None = None  # [S, L] float32
    # per-scenario sensor visibility factor from route weather (fog/rain),
    # consumed by ego/sensors.py render_cameras; None -> clear weather
    visibility: jnp.ndarray | None = None  # [S] float32 in [0.2, 1]


def init_sim_state(
    num_scenarios: int,
    num_agents: int,
    rng=None,
) -> SimState:
    """Initial state on the default device (one bulk transfer)."""
    import jax

    return jax.device_put(init_sim_state_host(num_scenarios, num_agents, rng))


def init_sim_state_host(
    num_scenarios: int,
    num_agents: int,
    rng=None,
) -> SimState:
    """Build the initial state HOST-SIDE (numpy) — mutable for spawn
    logic, transferred in one device_put. Eager per-array device ops are
    pathological on remote TPU backends (one compile RPC per op)."""
    import numpy as onp

    from .pid import PID_WINDOW, PIDState

    S, A = num_scenarios, num_agents
    if rng is None:
        rng = onp.zeros((S, 2), onp.uint32)

    def pid():
        return PIDState(
            buf=onp.zeros((S, A, PID_WINDOW), onp.float32),
            ptr=onp.zeros((S, A), onp.int32),
            count=onp.zeros((S, A), onp.int32),
        )

    host_state = SimState(
        pos=onp.zeros((S, A, 2), onp.float32),
        heading=onp.zeros((S, A), onp.float32),
        speed=onp.zeros((S, A), onp.float32),
        accel=onp.zeros((S, A), onp.float32),
        yaw_rate=onp.zeros((S, A), onp.float32),
        control=onp.zeros((S, A, 3), onp.float32),
        alive=onp.zeros((S, A), bool),
        is_cbv=onp.zeros((S, A), bool),
        bv_pool=onp.zeros((S, A), bool),
        shape=onp.broadcast_to(
            onp.asarray(DEFAULT_SHAPE, onp.float32), (S, A, 2)
        ).copy(),
        agent_class=onp.zeros((S, A), onp.int32),
        hist_pos=onp.zeros((S, A, HISTORY_STEPS, 2), onp.float32),
        hist_heading=onp.zeros((S, A, HISTORY_STEPS), onp.float32),
        hist_vel=onp.zeros((S, A, HISTORY_STEPS, 2), onp.float32),
        hist_valid=onp.zeros((S, A, HISTORY_STEPS), bool),
        lane=onp.zeros((S, A), onp.int32),
        bv_branch_bits=onp.zeros((S, A), onp.uint32),
        in_stop_zone=onp.zeros((S, A), bool),
        stopped_at_stop=onp.zeros((S, A), bool),
        goal=onp.zeros((S, A, 2), onp.float32),
        goal_valid=onp.zeros((S, A), bool),
        tracker=TrackerState(speed=pid(), turn=pid()),
        collision=onp.zeros((S, A), bool),
        collided_with=onp.full((S, A), -1, onp.int32),
        offroad=onp.zeros((S, A), bool),
        ego_red_entry=onp.zeros(S, bool),
        ego_route_cursor=onp.zeros(S, onp.float32),
        tick=onp.zeros(S, onp.int32),
        rng=onp.asarray(rng, onp.uint32),
    )
    return host_state
