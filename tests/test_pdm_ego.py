import jax.numpy as jnp
import numpy as np

from rift_tpu.ego.pdm_ego import pdm_ego_waypoints
from rift_tpu.map import make_straight_town
from rift_tpu.scenario import TrafficEnv
from rift_tpu.sim import ScenarioSpec, init_sim_state


def _spec(S, rw=400):
    route = np.zeros((S, rw, 3), np.float32)
    route[:, :, 0] = np.arange(rw)
    return ScenarioSpec(
        ego_route=jnp.asarray(route),
        ego_route_len=jnp.full((S,), rw, jnp.int32),
        route_road_ids=jnp.full((S, 16), -1, jnp.int32),
        route_lane_ids=jnp.zeros((S, 16), jnp.int32),
        ego_target_speed=jnp.full((S,), 8.0),
        timeout_ticks=jnp.full((S,), 4000, jnp.int32),
    )


def test_pdm_ego_free_road_cruises():
    st = init_sim_state(1, 2)
    st = st.replace(
        pos=jnp.array([[[10.0, 0.0], [10.0, 60.0]]]),  # other far off-route
        alive=jnp.ones((1, 2), bool),
        speed=jnp.array([[5.0, 0.0]]),
    )
    wp = pdm_ego_waypoints(_spec(1), st)
    # spacing ~ desired speed * dt: last point ~24 m ahead at 8 m/s target
    assert wp.shape == (1, 30, 2)
    dx = np.diff(np.asarray(wp[0, :, 0]))
    assert dx.mean() > 0.5  # cruising spacing


def test_pdm_ego_brakes_for_blocker():
    st = init_sim_state(1, 2)
    st = st.replace(
        pos=jnp.array([[[10.0, 0.0], [25.0, 0.0]]]),  # parked car 15 m ahead
        alive=jnp.ones((1, 2), bool),
        speed=jnp.array([[8.0, 0.0]]),
    )
    wp_blocked = pdm_ego_waypoints(_spec(1), st)
    st_free = st.replace(pos=jnp.array([[[10.0, 0.0], [10.0, 60.0]]]))
    wp_free = pdm_ego_waypoints(_spec(1), st_free)
    # hazard shrinks the waypoint spacing (lower target speed)
    sp_blocked = float(jnp.linalg.norm(jnp.diff(wp_blocked[0], axis=0), axis=1).mean())
    sp_free = float(jnp.linalg.norm(jnp.diff(wp_free[0], axis=0), axis=1).mean())
    assert sp_blocked < sp_free * 0.8


def test_pdm_ego_stuck_recovery_creep():
    """Round 3 (VERDICT r2 item 10, autopilot.py:1053-1205): an ego stalled
    for STUCK_WINDOW ticks with no close hazard creeps forward; with the
    hazard inside CREEP_MIN_GAP it stays stopped."""
    st = init_sim_state(1, 2)
    # history says: barely moved, ego at rest; hazard parked 12 m ahead
    # (far enough that a creep is safe)
    hist = jnp.broadcast_to(
        jnp.array([10.0, 0.0]), st.hist_pos[:, 0].shape
    )
    st = st.replace(
        pos=jnp.array([[[10.0, 0.0], [22.0, 0.0]]]),
        alive=jnp.ones((1, 2), bool),
        speed=jnp.zeros((1, 2)),
        hist_pos=st.hist_pos.at[:, 0].set(hist),
        hist_valid=st.hist_valid.at[:, 0].set(True),
    )
    wp = pdm_ego_waypoints(_spec(1), st)
    sp = float(jnp.linalg.norm(jnp.diff(wp[0], axis=0), axis=1).mean())
    assert sp > 0.1, f"stuck ego did not creep (spacing {sp:.3f})"

    # hazard right on the bumper: no creep
    st_close = st.replace(pos=jnp.array([[[10.0, 0.0], [13.0, 0.0]]]))
    wp2 = pdm_ego_waypoints(_spec(1), st_close)
    sp2 = float(jnp.linalg.norm(jnp.diff(wp2[0], axis=0), axis=1).mean())
    assert sp2 < sp * 0.5, f"crept into a close hazard (spacing {sp2:.3f})"


def test_pdm_ego_detects_crossing_traffic():
    # crossing vehicle will intersect the ego route ahead: leader-gap IDM
    # would miss this, forecast sweep must not
    st = init_sim_state(1, 2)
    st = st.replace(
        pos=jnp.array([[[10.0, 0.0], [26.0, -8.0]]]),
        heading=jnp.array([[0.0, jnp.pi / 2]]),  # other heading +y, crossing
        alive=jnp.ones((1, 2), bool),
        speed=jnp.array([[8.0, 4.0]]),  # both reach (26, 0) around t = 2 s
    )
    wp_cross = pdm_ego_waypoints(_spec(1), st)
    st_free = st.replace(alive=jnp.ones((1, 2), bool).at[0, 1].set(False))
    wp_free = pdm_ego_waypoints(_spec(1), st_free)
    sp_cross = float(jnp.linalg.norm(jnp.diff(wp_cross[0], axis=0), axis=1).mean())
    sp_free = float(jnp.linalg.norm(jnp.diff(wp_free[0], axis=0), axis=1).mean())
    assert sp_cross < sp_free


def test_pdm_ego_closed_loop_no_collision():
    tm = make_straight_town(length=400.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=8, seed=21)
    state, crit, spec = env.reset()
    for _ in range(100):
        wp = pdm_ego_waypoints(spec, state)
        state, crit = env.step(state, crit, ego_traj=wp)
    assert int(crit.collisions_vehicle.sum()) == 0
    assert float(state.ego_route_cursor.min()) > 10.0
