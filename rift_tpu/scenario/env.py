"""TrafficEnv: batched closed-loop scenarios on one device program.

The gym-layer replacement (rift/gym_carla/envs/carla_env.py +
env_wrapper.py): instead of N CarlaEnv objects sharing one CARLA world with a
two-phase step around `world.tick()`, every scenario lives in the [S] axis of
one SimState and `env_step` advances all of them in a single jitted call —
controls, dynamics, criteria, CBV recognition and churn fused together.

Reset is host-side (route sampling, spawning — episode-rare work), mirroring
RouteScenario setup (rift/scenario/scenario_manager/route_scenario.py:125-186:
ego at route start, background vehicles spawned around the route).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ego.rule_ego import rule_ego_waypoints
from ..map.routing import (
    nearest_lane_host,
    route_road_lane_ids,
    route_waypoints,
    trace_route,
)
from ..map.tensor_map import TensorMap
from ..sim.state import (
    CLASS_STATIC,
    CLASS_WALKER,
    DEFAULT_SHAPE,
    STATIC_SHAPE,
    WALKER_SHAPE,
    ScenarioSpec,
    SimState,
    init_sim_state_host,
)
from ..sim.world import cbv_reached_goal, step as world_step
from .criteria import CriteriaState, init_criteria, update_criteria
from .recognition import (
    RECOG_INTERVAL,
    RECOG_WARMUP_TICKS,
    recognize_cbvs,
)

ROUTE_PAD = 1024  # max route waypoints (1 m spacing -> 1 km routes)
RIDS_PAD = 64
BV_SPACING_MIN = 12.0  # min distance between spawned vehicles
EGO_CLEARANCE = 15.0  # no BV spawned this close to the ego start
BV_ACTIVATE_RADIUS = 150.0  # lazy-activation radius (route_scenario.py:176)
TIMEOUT_SEC_PER_M = 1.0  # reference: 1 s per route meter (route_scenario.py:110)


# ---------------------------------------------------------------------------
# Reset (host)
# ---------------------------------------------------------------------------
def sample_route(tmap: TensorMap, rng: np.random.Generator, min_length: float = 200.0):
    """Random drivable route on the map (host). Returns (waypoints [N,3],
    lane_path)."""
    valid = np.flatnonzero(np.asarray(tmap.valid))
    for _ in range(64):
        start, goal = rng.choice(valid, 2, replace=False)
        path, dist = trace_route(tmap, int(start), int(goal))
        if path is not None and dist >= min_length:
            return route_waypoints(tmap, path), path
    # fall back to the longest straight chain from a random lane
    start = int(rng.choice(valid))
    path = [start]
    succ = np.asarray(tmap.successors)
    while len(path) < 16:
        nxt = succ[path[-1], 0]
        if nxt < 0:
            break
        path.append(int(nxt))
    return route_waypoints(tmap, path), path


def make_scenario_spec(
    tmap: TensorMap,
    routes: list[np.ndarray],
    lane_paths: list[list[int]],
    ego_target_speed: float = 8.0,
    fps: int = 10,
) -> ScenarioSpec:
    S = len(routes)
    ego_route = np.zeros((S, ROUTE_PAD, 3), np.float32)
    ego_route_len = np.zeros(S, np.int32)
    rr = np.full((S, RIDS_PAD), -1, np.int32)
    rl = np.zeros((S, RIDS_PAD), np.int32)
    timeout = np.zeros(S, np.int32)
    for i, (wps, path) in enumerate(zip(routes, lane_paths)):
        n = min(len(wps), ROUTE_PAD)
        ego_route[i, :n] = wps[:n]
        # pad tail with the final waypoint so interpolation stays put
        ego_route[i, n:] = wps[n - 1] if n > 0 else 0.0
        ego_route_len[i] = n
        rr[i], rl[i] = route_road_lane_ids(tmap, path, pad_to=RIDS_PAD)
        timeout[i] = int(n * TIMEOUT_SEC_PER_M * fps)

    # episode-static lane tables: on-route mask + reference-line chains
    # (the per-tick topology walk of the reference becomes this one-time
    # precompute; see map/reference_lines.py)
    from ..map.reference_lines import build_lane_chains

    route_lane_mask = jax.vmap(tmap.on_route_mask)(
        jnp.asarray(rr), jnp.asarray(rl)
    )
    lane_chains = build_lane_chains(tmap, route_lane_mask)

    # route-distance field per scenario (host Dijkstra, reset-rare)
    from ..map.routing import route_distance_field

    L = tmap.num_lanes
    lane_route_dist = np.full((S, L), 1e9, np.float32)
    lane_route_join = np.zeros((S, L), np.float32)
    for i, path in enumerate(lane_paths):
        D, J = route_distance_field(tmap, path)
        lane_route_dist[i] = np.where(np.isfinite(D), D, 1e9)
        lane_route_join[i] = np.where(np.isfinite(J), J, 0.0)

    return ScenarioSpec(
        ego_route=ego_route,
        ego_route_len=ego_route_len,
        route_road_ids=rr,
        route_lane_ids=rl,
        ego_target_speed=np.full((S,), ego_target_speed, np.float32),
        timeout_ticks=timeout,
        route_lane_mask=np.asarray(route_lane_mask),
        lane_chains=np.asarray(lane_chains),
        lane_route_dist=lane_route_dist,
        lane_route_join=lane_route_join,
    )


def spawn_agents(
    tmap: TensorMap,
    spec: ScenarioSpec,
    num_agents: int,
    rng: np.random.Generator,
    traffic_intensity: float = 0.6,
    num_walkers: int = 0,
    num_statics: int = 0,
) -> SimState:
    """Place the ego at each route start and background vehicles on lane
    points near the route (filter_spawn_points semantics,
    rift/gym_carla/utils/common.py:72-133: seeded sampling, spacing filter,
    ego-clearance filter).

    The last `num_walkers + num_statics` agent slots become crossing
    pedestrians (patrolling perpendicular to the route) and static layout
    obstacles at the lane edge — the collision classes the leaderboard
    scores separately (atomic_criteria.py:289-423 blueprint dispatch,
    penalties statistics_manager.py:27-44)."""
    S = int(spec.ego_route_len.shape[0])
    A = num_agents
    from ..map.routing import host_map

    h = host_map(tmap)
    ego_route = np.asarray(spec.ego_route)
    route_len = np.asarray(spec.ego_route_len)
    centerline = h["centerline"]
    headings_l = h["headings"]
    valid_lanes = h["valid"]

    pos = np.zeros((S, A, 2), np.float32)
    heading = np.zeros((S, A), np.float32)
    alive = np.zeros((S, A), bool)
    pool = np.zeros((S, A), bool)
    agent_class = np.zeros((S, A), np.int32)
    shape = np.broadcast_to(
        np.asarray(DEFAULT_SHAPE, np.float32), (S, A, 2)
    ).copy()
    speed0 = np.zeros((S, A), np.float32)
    anchor = np.zeros((S, A, 2), np.float32)
    bits = rng.integers(0, 2**32, size=(S, A), dtype=np.uint32)

    n_special = min(num_walkers + num_statics, max(A - 2, 0))
    n_walkers = min(num_walkers, n_special)
    n_statics = n_special - n_walkers

    flat_all = centerline[valid_lanes].reshape(-1, 2)

    def _curb_lat(wp, side, margin):
        """Lateral offset `margin` m past the outermost lane edge on `side`
        of the route waypoint (+1 = left of route heading). The road is two
        carriageways wide now, so a fixed 4-7 m offset would sit INSIDE the
        oncoming lanes."""
        rel = flat_all - wp[:2]
        near = np.linalg.norm(rel, axis=1) < 15.0
        if not near.any():
            return (4.0 + margin) * side
        lat = -np.sin(wp[2]) * rel[near, 0] + np.cos(wp[2]) * rel[near, 1]
        half_w = 0.5 * 3.5
        if side > 0:
            return float(lat.max()) + half_w + margin
        return float(lat.min()) - half_w - margin

    for s in range(S):
        n = int(route_len[s])
        start = ego_route[s, 0]
        pos[s, 0] = start[:2]
        heading[s, 0] = start[2]
        alive[s, 0] = True
        placed = [start[:2]]

        # walkers: cross the route ahead of the ego, patrolling perpendicular
        # to the road; statics: parked at the lane edge along the route
        slot = A - n_special
        for w in range(n_walkers):
            wi = int(rng.integers(max(n // 4, 1), max(n - 10, 2)))
            wp = ego_route[s, wi]
            perp = wp[2] + np.pi / 2
            lat = _curb_lat(
                wp, float(rng.choice([-1.0, 1.0])), float(rng.uniform(1.0, 3.0))
            )
            pos[s, slot] = wp[:2] + lat * np.array(
                [np.cos(perp), np.sin(perp)], np.float32
            )
            heading[s, slot] = perp + (np.pi if lat > 0 else 0.0)
            # intrinsic walking speed derives from the spawn bits — the
            # SAME formula sim/world.py's patrol uses, so the dwell phases
            # (speed 0) never lose it; the upper bits hold a small patrol
            # phase offset so every walker starts outbound (staggered
            # within 10 s — CARLA's DynamicObjectCrossing triggers when
            # the ego approaches)
            bits[s, slot] = (int(bits[s, slot]) & 0xFFFF) | (
                int(rng.integers(0, 100)) << 16
            )
            speed0[s, slot] = 0.8 + 0.8 * (
                (int(bits[s, slot]) >> 8) & 0xFF
            ) / 255.0
            agent_class[s, slot] = CLASS_WALKER
            shape[s, slot] = WALKER_SHAPE
            anchor[s, slot] = pos[s, slot]
            alive[s, slot] = True
            slot += 1
        for _ in range(n_statics):
            wi = int(rng.integers(max(n // 3, 1), max(n - 10, 2)))
            wp = ego_route[s, wi]
            perp = wp[2] + np.pi / 2
            # ego-side lane edge only (construction blocking the route,
            # ParkedObstacle semantics) — the +side is the oncoming
            # carriageway now, where a static would dam the reverse flow
            lat = -2.2
            pos[s, slot] = wp[:2] + lat * np.array(
                [np.cos(perp), np.sin(perp)], np.float32
            )
            heading[s, slot] = wp[2]
            agent_class[s, slot] = CLASS_STATIC
            shape[s, slot] = STATIC_SHAPE
            alive[s, slot] = True
            placed.append(pos[s, slot])
            slot += 1

        # candidate spawn points: lane centerline vertices within 50 m of a
        # random subset of route waypoints (spawn_radius 50,
        # recognition/config/rule.yaml:14 — with the closed network BVs
        # then CIRCULATE near the corridor instead of draining away)
        wp_sel = ego_route[s, rng.integers(0, max(n, 1), size=64), :2]
        flat = centerline[valid_lanes].reshape(-1, 2)
        flat_h = headings_l[valid_lanes].reshape(-1)
        d = np.linalg.norm(
            flat[None, :, :] - wp_sel[:, None, :], axis=-1
        ).min(0)
        cand = np.flatnonzero(d < 50.0)
        rng.shuffle(cand)
        n_veh = A - 1 - n_special
        n_bv = min(n_veh, int(traffic_intensity * n_veh) + 1)
        k = 1
        for ci in cand:
            if k > n_bv:
                break
            p = flat[ci]
            if np.linalg.norm(p - pos[s, 0]) < EGO_CLEARANCE:
                continue
            if any(np.linalg.norm(p - q) < BV_SPACING_MIN for q in placed):
                continue
            pos[s, k] = p
            heading[s, k] = flat_h[ci]
            # lazy activation (route_scenario.py:157-186): vehicles beyond
            # BV_ACTIVATE_RADIUS of the ego start in the inactive pool and
            # wake in env_step when the ego approaches
            if np.linalg.norm(p - pos[s, 0]) <= BV_ACTIVATE_RADIUS:
                alive[s, k] = True
            else:
                pool[s, k] = True
            placed.append(p)
            k += 1

    # host-side assembly, single device transfer (remote-TPU eager ops are
    # one compile RPC each — see sim/state.py:init_sim_state)
    state = init_sim_state_host(
        S, A, rng=rng.integers(0, 2**32, size=(S, 2), dtype=np.uint32)
    )
    # host nearest-lane
    d2 = ((centerline[None, None] - pos[:, :, None, None, :]) ** 2).sum(-1).min(-1)
    d2[:, :, ~valid_lanes] = np.inf
    lane = d2.argmin(-1).astype(np.int32)

    state = state.replace(pos=pos, heading=heading, alive=alive, lane=lane,
                          bv_pool=pool, bv_branch_bits=bits,
                          agent_class=agent_class, shape=shape, speed=speed0,
                          goal=anchor)
    state.hist_pos[:, :, -1] = pos
    state.hist_heading[:, :, -1] = heading
    state.hist_valid[:, :, -1] = alive
    return jax.device_put(state)


# ---------------------------------------------------------------------------
# Step (device)
# ---------------------------------------------------------------------------
def wake_all_bvs(state):
    """Activate every pooled background vehicle immediately.

    Test/fixture helper: the lazy BV pool (route_scenario.py:157-186
    semantics) leaves far-from-ego vehicles alive=False at spawn, which
    breaks fixtures that force `is_cbv` on a specific slot at tick 0."""
    import jax.numpy as jnp

    return state.replace(
        alive=state.alive | state.bv_pool,
        bv_pool=jnp.zeros_like(state.bv_pool),
    )


@partial(jax.jit, static_argnames=("max_cbvs", "dt", "recog_model"))
def env_step(
    tmap: TensorMap,
    spec: ScenarioSpec,
    state: SimState,
    crit: CriteriaState,
    cbv_traj: jnp.ndarray | None = None,  # [S, A, T, 2] local waypoints
    cbv_traj_mask: jnp.ndarray | None = None,  # [S, A]
    ego_traj: jnp.ndarray | None = None,  # [S, T, 2] (learned egos)
    ego_ctrl: jnp.ndarray | None = None,  # [S, 3] raw throttle/steer/brake
    cbv_ctrl: jnp.ndarray | None = None,  # [S, A, 3] raw CBV controls
    cbv_ctrl_mask: jnp.ndarray | None = None,  # [S, A]
    max_cbvs: int = 3,
    dt: float = 0.1,
    recog_model=None,  # PlanT scorer model -> attention recognition
    recog_params=None,  # its params (traced pytree)
):
    """One full environment tick for every scenario.

    Control inputs, by agent kind (reference two-phase step semantics,
    carla_env.py:294-347): the ego follows `ego_traj` waypoints or raw
    `ego_ctrl` (rl-type egos, ego/rl/ppo.py), otherwise the rule ego; CBVs
    follow `cbv_traj` waypoints (Pluto family) or raw `cbv_ctrl` (classic
    rl CBVs, cbv_action.py rl-type); everyone else runs the IDM autopilot.

    Recognition is rule-based by default; passing a PlanT `recog_model` +
    `recog_params` switches to attention-based recognition (the reference's
    CBV_RECOGNITION_LIST selection, rift/cbv/recognition/__init__.py:12 +
    attn_cbv.py:20-30).
    """
    S, A = state.alive.shape

    # ---- lazy BV activation: pooled background vehicles wake when the
    # ego comes within BV_ACTIVATE_RADIUS (route_scenario.py:157-186's
    # set_simulate_physics(True) within 150 m of any ego)
    d_ego = jnp.linalg.norm(state.pos - state.pos[:, :1], axis=-1)
    wake = state.bv_pool & (d_ego < BV_ACTIVATE_RADIUS)
    state = state.replace(
        alive=state.alive | wake, bv_pool=state.bv_pool & ~wake
    )

    # ---- ego control: rule ego unless a trajectory is provided
    if ego_traj is None:
        ego_traj = rule_ego_waypoints(spec, state, dt, tmap=tmap)
    T = ego_traj.shape[-2]
    traj = jnp.zeros((S, A, T, 2))
    traj = traj.at[:, 0].set(ego_traj)
    traj_mask = jnp.zeros((S, A), bool).at[:, 0].set(True)
    if cbv_traj is not None:
        from ..sim.pid import extend_path

        Tc = cbv_traj.shape[-2]
        Tm = max(T, Tc)
        # constant-velocity extrapolation, not repetition: the tracker's
        # desired speed averages segments over the merged window
        traj = extend_path(traj, Tm)
        cbv_traj = extend_path(cbv_traj, Tm)
        traj = jnp.where(cbv_traj_mask[..., None, None], cbv_traj, traj)
        traj_mask |= cbv_traj_mask

    # raw-control agents (rl-type action converters)
    ctrl = jnp.zeros((S, A, 3)).at[..., 2].set(1.0)
    ctrl_mask = jnp.zeros((S, A), bool)
    if cbv_ctrl is not None:
        ctrl = jnp.where(cbv_ctrl_mask[..., None], cbv_ctrl, ctrl)
        ctrl_mask |= cbv_ctrl_mask
    if ego_ctrl is not None:
        ctrl = ctrl.at[:, 0].set(ego_ctrl)
        ctrl_mask = ctrl_mask.at[:, 0].set(True)
        traj_mask = traj_mask.at[:, 0].set(False)

    # freeze finished scenarios: everything brakes
    frozen = crit.done
    brake = jnp.zeros(3).at[2].set(1.0)
    ctrl = jnp.where(frozen[:, None, None], brake, ctrl)
    ctrl_mask = ctrl_mask | frozen[:, None]

    state = world_step(
        tmap, spec, state,
        traj=traj, traj_mask=traj_mask & ~ctrl_mask,
        ctrl=ctrl, ctrl_mask=ctrl_mask,
        dt=dt,
    )

    crit = update_criteria(crit, state, spec, dt, tmap=tmap)

    # ---- CBV churn (carla_env.py:431-462)
    reached = cbv_reached_goal(state)
    cbv_collided = state.collision & state.is_cbv
    # reach-goal -> back to plain BV (autopilot); collision -> destroyed
    is_cbv = state.is_cbv & ~reached & ~cbv_collided
    goal_valid = state.goal_valid & ~reached & ~cbv_collided
    alive = state.alive & ~cbv_collided
    # plain BVs that collide are also removed (UE4 would have stopped them;
    # the kinematic tick has no contact resolution)
    bv_collided = state.collision & ~state.is_cbv
    bv_collided = bv_collided.at[:, 0].set(False)  # ego persists
    alive &= ~bv_collided
    state = state.replace(is_cbv=is_cbv, goal_valid=goal_valid, alive=alive)

    # ---- recognition cadence (carla_env.py:180-208)
    do_recog = (
        (state.tick > RECOG_WARMUP_TICKS)
        & (state.tick % RECOG_INTERVAL == 0)
        & ~crit.done
    )
    # ticks advance in lockstep across scenarios, so the cadence check is
    # scalar — lax.cond skips the whole recognition computation on
    # off-cadence ticks instead of discarding it through jnp.where
    tick0 = state.tick.reshape(-1)[0]
    any_recog = (tick0 > RECOG_WARMUP_TICKS) & (tick0 % RECOG_INTERVAL == 0)

    if recog_model is not None:
        from ..models.plant.train import plant_attn_scores
        from .recognition import attn_recognize_cbvs

        def _do_recog():
            scores = plant_attn_scores(recog_model, recog_params, spec, state)
            return attn_recognize_cbvs(
                tmap, spec, state, lambda _s: scores, max_cbvs
            )
    else:
        def _do_recog():
            return recognize_cbvs(tmap, spec, state, max_cbvs)

    new_is_cbv, goal, gvalid, _, promote = jax.lax.cond(
        any_recog,
        _do_recog,
        lambda: (
            state.is_cbv,
            state.goal,
            state.goal_valid,
            jnp.full_like(state.lane, -1),
            jnp.zeros_like(state.is_cbv),
        ),
    )
    gate = do_recog[:, None]
    promote &= gate
    state = state.replace(
        is_cbv=jnp.where(gate, new_is_cbv, state.is_cbv),
        goal=jnp.where(promote[..., None], goal, state.goal),
        goal_valid=jnp.where(promote, gvalid, state.goal_valid),
        # fresh controllers for promoted CBVs
        tracker=state.tracker.reset_where(promote),
    )
    return state, crit


class TrafficEnv:
    """Host-side convenience wrapper: reset + step + episode bookkeeping."""

    def __init__(
        self,
        tmap: TensorMap,
        num_scenarios: int = 4,
        num_agents: int = 16,
        max_cbvs: int = 3,
        dt: float = 0.1,
        seed: int = 0,
        num_walkers: int = 0,
        num_statics: int = 0,
    ):
        self.tmap = tmap
        self.num_scenarios = num_scenarios
        self.num_agents = num_agents
        self.max_cbvs = max_cbvs
        self.dt = dt
        self.num_walkers = num_walkers
        self.num_statics = num_statics
        self.rng = np.random.default_rng(seed)
        # attention recognition (episode-static selection; None -> rule)
        self.recog_model = None
        self.recog_params = None

    def set_recognition(self, model=None, params=None):
        """Select attention-based CBV recognition (PlanT scorer) for
        subsequent steps; call with no args to revert to rule recognition."""
        self.recog_model = model
        self.recog_params = params

    def reset(self, routes=None, lane_paths=None):
        if routes is None:
            routes, lane_paths = [], []
            for _ in range(self.num_scenarios):
                wps, path = sample_route(self.tmap, self.rng)
                routes.append(wps)
                lane_paths.append(path)
        self.spec = jax.device_put(
            make_scenario_spec(self.tmap, routes, lane_paths)
        )
        state = spawn_agents(
            self.tmap, self.spec, self.num_agents, self.rng,
            num_walkers=self.num_walkers, num_statics=self.num_statics,
        )
        crit = jax.device_put(init_criteria(self.num_scenarios, self.num_agents))
        return state, crit, self.spec

    def step(self, state, crit, cbv_traj=None, cbv_traj_mask=None,
             ego_traj=None, ego_ctrl=None, cbv_ctrl=None, cbv_ctrl_mask=None):
        return env_step(
            self.tmap, self.spec, state, crit,
            cbv_traj=cbv_traj, cbv_traj_mask=cbv_traj_mask, ego_traj=ego_traj,
            ego_ctrl=ego_ctrl, cbv_ctrl=cbv_ctrl, cbv_ctrl_mask=cbv_ctrl_mask,
            max_cbvs=self.max_cbvs, dt=self.dt,
            recog_model=self.recog_model, recog_params=self.recog_params,
        )

    def all_done(self, crit) -> bool:
        return bool(crit.done.all())
