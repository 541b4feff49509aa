import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.map import make_straight_town
from rift_tpu.sim import (
    HISTORY_STEPS,
    PIDState,
    ScenarioSpec,
    TrackerState,
    bicycle_forecast_step,
    bicycle_step,
    find_leaders,
    idm_target_speed,
    init_sim_state,
    lane_follow_waypoints,
    pid_step,
    step,
    track_step,
)


# ---------------------------------------------------------------- dynamics
def test_bicycle_straight_throttle():
    pos = jnp.zeros((1, 2))
    heading = jnp.zeros(1)
    speed = jnp.zeros(1)
    action = jnp.array([[0.75, 0.0, 0.0]])
    for _ in range(50):
        pos, heading, speed = bicycle_step(pos, heading, speed, action)
    # full throttle from rest for 5 s: car moves forward, gains speed
    assert float(pos[0, 0]) > 5.0
    assert abs(float(pos[0, 1])) < 1e-3
    assert float(speed[0]) > 3.0


def test_bicycle_brake_stops():
    pos = jnp.zeros((1, 2))
    heading = jnp.zeros(1)
    speed = jnp.array([10.0])
    action = jnp.array([[0.0, 0.0, 1.0]])
    for _ in range(80):
        pos, heading, speed = bicycle_step(pos, heading, speed, action)
    assert float(speed[0]) < 0.5


def test_bicycle_steer_turns():
    pos = jnp.zeros((1, 2))
    heading = jnp.zeros(1)
    speed = jnp.array([8.0])
    action = jnp.array([[0.5, 0.5, 0.0]])
    for _ in range(30):
        pos, heading, speed = bicycle_step(pos, heading, speed, action)
    assert float(heading[0]) > 0.3  # turned left


def test_bicycle_speed_nonnegative():
    pos = jnp.zeros((4, 2))
    heading = jnp.zeros(4)
    speed = jnp.array([0.0, 0.1, 1.0, 30.0])
    action = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (4, 1))
    for _ in range(100):
        pos, heading, speed = bicycle_step(pos, heading, speed, action)
    assert (np.asarray(speed) >= 0).all()


def test_forecast_step():
    pos = jnp.zeros((2, 2))
    heading = jnp.zeros(2)
    speed = jnp.array([5.0, 5.0])
    # agent 0 throttles, agent 1 brakes
    action = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    p, h, v = bicycle_forecast_step(pos, heading, speed, action)
    assert float(v[0]) > 5.0
    assert float(v[1]) < 5.0


# ---------------------------------------------------------------- PID
def test_pid_proportional():
    st = PIDState.zeros((3,))
    err = jnp.array([1.0, 0.0, -1.0])
    out, st2 = pid_step(st, err, kp=2.0, ki=0.0, kd=0.0)
    np.testing.assert_allclose(np.asarray(out), [2.0, 0.0, -2.0], atol=1e-6)


def test_pid_integral_accumulates():
    """Reference PID semantics (pid_controller.py:14-35): the window deque is
    pre-filled with 20 zeros, so the integral is the mean over the FULL
    window — 1/20 after one unit error, 2/20 after two."""
    st = PIDState.zeros(())
    out1, st = pid_step(st, jnp.array(1.0), kp=0.0, ki=1.0, kd=0.0)
    out2, st = pid_step(st, jnp.array(1.0), kp=0.0, ki=1.0, kd=0.0)
    np.testing.assert_allclose(float(out1), 1.0 / 20.0, atol=1e-6)
    np.testing.assert_allclose(float(out2), 2.0 / 20.0, atol=1e-6)


def test_pid_derivative_uses_previous_error():
    """derivative = error - previous_error (reference window[-1]-window[-2]),
    NOT error minus the oldest ring entry."""
    st = PIDState.zeros(())
    out1, st = pid_step(st, jnp.array(1.0), kp=0.0, ki=0.0, kd=1.0)
    np.testing.assert_allclose(float(out1), 1.0, atol=1e-6)  # 1 - 0
    out2, st = pid_step(st, jnp.array(3.0), kp=0.0, ki=0.0, kd=1.0)
    np.testing.assert_allclose(float(out2), 2.0, atol=1e-6)  # 3 - 1


def test_tracker_drives_forward():
    """The tracker should accelerate toward waypoints laid out ahead."""
    st = TrackerState.zeros((1,))
    # waypoints 1 m apart straight ahead -> desired speed ~10 m/s at 10 fps
    wp = jnp.stack(
        [jnp.arange(1.0, 31.0), jnp.zeros(30)], axis=-1
    )[None]
    speed = jnp.zeros(1)
    action, st = track_step(st, wp, speed)
    assert float(action[0, 0]) > 0.0  # throttle
    assert abs(float(action[0, 1])) < 0.05  # straight
    assert float(action[0, 2]) == 0.0  # no brake


def test_tracker_brakes_when_overspeed():
    st = TrackerState.zeros((1,))
    # waypoints nearly stationary -> desired speed ~0
    wp = jnp.tile(jnp.array([[0.5, 0.0]]), (30, 1))[None]
    action, st = track_step(st, wp, jnp.array([10.0]))
    assert float(action[0, 2]) == 1.0  # brake
    assert float(action[0, 0]) == 0.0  # no throttle


def test_tracker_steers_toward_offset_waypoints():
    st = TrackerState.zeros((1,))
    # waypoints curving left
    x = jnp.arange(1.0, 31.0)
    y = 0.3 * x
    wp = jnp.stack([x, y], axis=-1)[None]
    action, st = track_step(st, wp, jnp.array([5.0]))
    assert float(action[0, 1]) > 0.05  # steer left (positive)


# ---------------------------------------------------------------- autopilot
def test_find_leaders():
    pos = jnp.array([[[0.0, 0.0], [20.0, 0.0], [0.0, 50.0]]])
    heading = jnp.zeros((1, 3))
    speed = jnp.array([[5.0, 3.0, 0.0]])
    shape = jnp.tile(jnp.array([2.0, 4.0]), (1, 3, 1))
    alive = jnp.ones((1, 3), bool)
    info = find_leaders(pos, heading, speed, shape, alive)
    # agent 0's leader is agent 1: gap = 20 - 2 - 2 = 16
    np.testing.assert_allclose(float(info.gap[0, 0]), 16.0, atol=1e-4)
    np.testing.assert_allclose(float(info.speed[0, 0]), 3.0, atol=1e-6)
    # agent 1 has no leader
    assert not bool(jnp.isfinite(info.gap[0, 1]))


def test_idm_free_road_accelerates():
    from rift_tpu.sim.autopilot import LeaderInfo

    leader = LeaderInfo(gap=jnp.array([jnp.inf]), speed=jnp.array([0.0]))
    v = idm_target_speed(jnp.array([5.0]), jnp.array([14.0]), leader, 0.1)
    assert float(v[0]) > 5.0


def test_idm_close_leader_brakes():
    from rift_tpu.sim.autopilot import LeaderInfo

    leader = LeaderInfo(gap=jnp.array([3.0]), speed=jnp.array([0.0]))
    v = idm_target_speed(jnp.array([8.0]), jnp.array([14.0]), leader, 0.1)
    assert float(v[0]) < 8.0


def test_lane_follow_waypoints_shapes():
    tm = make_straight_town(length=300.0, num_lanes=1)
    lane = jnp.zeros((2, 3), jnp.int32)
    pos = jnp.zeros((2, 3, 2))
    heading = jnp.zeros((2, 3))
    bits = jnp.zeros((2, 3), jnp.uint32)
    spacing = jnp.full((2, 3), 0.8)
    wp = lane_follow_waypoints(tm, lane, pos, heading, bits, spacing)
    assert wp.shape == (2, 3, 30, 2)
    # waypoints march forward along +x at ~spacing
    dx = np.diff(np.asarray(wp[0, 0, :, 0]))
    assert (dx > 0.5).all()


# ---------------------------------------------------------------- world step
def _make_world(S=2, A=4):
    tm = make_straight_town(length=400.0, num_lanes=2)
    st = init_sim_state(S, A)
    # place agents along lane -1 (y=0), spaced 30 m
    xs = jnp.arange(A, dtype=jnp.float32) * 30.0 + 10.0
    pos = jnp.stack([jnp.tile(xs, (S, 1)), jnp.zeros((S, A))], axis=-1)
    st = st.replace(
        pos=pos,
        alive=jnp.ones((S, A), bool),
        lane=tm.nearest_lane(pos),
        speed=jnp.full((S, A), 5.0),
    )
    rw = 400
    route = np.zeros((S, rw, 3), np.float32)
    route[:, :, 0] = np.arange(rw)
    spec = ScenarioSpec(
        ego_route=jnp.asarray(route),
        ego_route_len=jnp.full((S,), rw, jnp.int32),
        route_road_ids=jnp.full((S, 16), -1, jnp.int32),
        route_lane_ids=jnp.zeros((S, 16), jnp.int32),
        ego_target_speed=jnp.full((S,), 8.0),
        timeout_ticks=jnp.full((S,), 4000, jnp.int32),
    )
    return tm, spec, st


def test_world_step_runs_and_moves():
    tm, spec, st = _make_world()
    st1 = step(tm, spec, st)
    assert int(st1.tick[0]) == 1
    # all agents moved forward (they had speed 5)
    assert (np.asarray(st1.pos[..., 0]) > np.asarray(st.pos[..., 0])).all()
    # histories updated
    np.testing.assert_allclose(
        np.asarray(st1.hist_pos[:, :, -1]), np.asarray(st1.pos), atol=1e-6
    )
    assert bool(st1.hist_valid[:, :, -1].all())
    assert not bool(st1.hist_valid[:, :, 0].any())


def test_world_autopilot_follows_lane():
    tm, spec, st = _make_world()
    for _ in range(60):
        st = step(tm, spec, st)
    # agents stay on the road (y within lane), keep moving
    assert (np.abs(np.asarray(st.pos[..., 1])) < 1.8).all()
    assert not bool(st.offroad.any())
    assert (np.asarray(st.speed) > 1.0).all()


def test_world_collision_detected():
    tm, spec, st = _make_world(S=1, A=2)
    # place two agents overlapping
    pos = jnp.array([[[10.0, 0.0], [12.0, 0.0]]])
    st = st.replace(pos=pos, speed=jnp.zeros((1, 2)))
    st1 = step(tm, spec, st)
    assert bool(st1.collision.all())
    assert int(st1.collided_with[0, 0]) == 1
    assert int(st1.collided_with[0, 1]) == 0


def test_world_no_collision_when_dead():
    tm, spec, st = _make_world(S=1, A=2)
    pos = jnp.array([[[10.0, 0.0], [12.0, 0.0]]])
    alive = jnp.array([[True, False]])
    st = st.replace(pos=pos, alive=alive, speed=jnp.zeros((1, 2)))
    st1 = step(tm, spec, st)
    assert not bool(st1.collision.any())


def test_world_traj_control():
    tm, spec, st = _make_world(S=1, A=2)
    # external trajectory for agent 1: curve left
    T = 30
    x = jnp.arange(1.0, T + 1.0) * 0.6
    y = 0.25 * x
    traj = jnp.zeros((1, 2, T, 2)).at[0, 1].set(jnp.stack([x, y], axis=-1))
    mask = jnp.array([[False, True]])
    for _ in range(20):
        st = step(tm, spec, st, traj=traj, traj_mask=mask)
    # agent 1 moved left (positive y) relative to start; agent 0 stayed in lane
    assert float(st.pos[0, 1, 1]) > 0.3
    assert abs(float(st.pos[0, 0, 1])) < 1.0


def test_world_ctrl_override():
    tm, spec, st = _make_world(S=1, A=2)
    ctrl = jnp.zeros((1, 2, 3)).at[0, 0].set(jnp.array([0.0, 0.0, 1.0]))
    mask = jnp.array([[True, False]])
    for _ in range(30):
        st = step(tm, spec, st, ctrl=ctrl, ctrl_mask=mask)
    assert float(st.speed[0, 0]) < 0.5  # braked to stop
    assert float(st.speed[0, 1]) > 1.0  # autopilot keeps driving


def test_world_route_cursor_advances():
    tm, spec, st = _make_world(S=1, A=1)
    c0 = float(st.ego_route_cursor[0])
    for _ in range(40):
        st = step(tm, spec, st)
    assert float(st.ego_route_cursor[0]) > c0 + 10.0


def test_world_step_jit_stable_shapes():
    tm, spec, st = _make_world()
    st1 = step(tm, spec, st)
    st2 = step(tm, spec, st1)
    # same pytree structure (no recompiles on steady state)
    assert jax.tree.structure(st1) == jax.tree.structure(st2)


# ------------------------------------------------- r4 teacher/tracker fixes
def test_extend_path_extrapolates_last_segment():
    """Padding by constant-velocity extrapolation (the reference PID reads
    desired speed from mean segment length over the FULL candidate,
    pid_controller.py:57-76 — repetition-padding deflated it)."""
    from rift_tpu.sim.pid import extend_path

    wp = jnp.asarray([[1.0, 0.0], [2.0, 0.5], [3.0, 1.0]])[None]
    out = extend_path(wp, 6)[0]
    assert out.shape == (6, 2)
    np.testing.assert_allclose(out[3], [4.0, 1.5], atol=1e-6)
    np.testing.assert_allclose(out[5], [6.0, 2.5], atol=1e-6)
    # stationary tail stays stationary (stop command keeps braking)
    stop = jnp.ones((1, 4, 2)) * 3.0
    np.testing.assert_allclose(extend_path(stop, 8)[0, -1], [3.0, 3.0])
    # a 1-point path repeats (no segment to extrapolate)
    one = jnp.zeros((1, 1, 2))
    assert extend_path(one, 5).shape == (1, 5, 2)
    assert bool(jnp.isfinite(extend_path(one, 5)).all())


def test_autopilot_steady_speed_independent_of_own_speed():
    """A stopped agent's teacher target is the (factored) speed limit, not
    'current speed + 1 s of IDM' — the crawl-equilibrium fix (the r3 BC
    pretrain chased its own slow states down to 0.4 m/s CBVs)."""
    from rift_tpu.sim.autopilot import TM_SPEED_FACTOR
    from rift_tpu.sim.world import autopilot_steady_speed

    tm = make_straight_town(length=400.0, num_lanes=2, pad_lanes_to=16)
    state = init_sim_state(2, 4)
    pos = jnp.zeros((2, 4, 2)).at[:, :, 0].set(
        jnp.asarray([[10.0, 60.0, 120.0, 180.0]] * 2)
    ).at[:, :, 1].set(-1.75)
    state = state.replace(
        pos=pos,
        alive=jnp.ones((2, 4), bool),
        lane=jnp.zeros((2, 4), jnp.int32),
        speed=jnp.zeros((2, 4)),
    )
    v = autopilot_steady_speed(tm, state)
    limit = float(tm.speed_limit[0]) * TM_SPEED_FACTOR
    # agent 3 has a free road ahead: steady target ~= factored limit
    assert abs(float(v[0, 3]) - limit) < 1e-3
    # agent 0 sits 50 m behind stopped agent 1: approach speed positive but
    # bounded by the comfortable-brake profile, well under the limit... and
    # a NEAR leader pins it near zero
    near = state.replace(pos=pos.at[:, 0, 0].set(54.0))
    v_near = autopilot_steady_speed(tm, near)
    assert float(v_near[0, 0]) < 0.25 * limit


def test_tracker_full_horizon_accelerates_from_stop():
    """A stopped vehicle fed an accelerate-to-target teacher profile must
    actually reach cruising speed (r3's 30-frame clip + 0.75 throttle cap
    kept CBVs at ~1 m/s)."""
    from rift_tpu.sim.pid import extend_path

    v0, a, v_max, dt = 0.0, 2.5, 10.0, 0.1
    pos = jnp.zeros(2)
    heading = jnp.zeros(())
    speed = jnp.asarray(v0)
    trk = TrackerState.zeros(())
    for _ in range(80):
        # rebuild the teacher profile from the CURRENT speed each tick,
        # like models/pluto/policy.py does
        t_k = dt * (1.0 + jnp.arange(80, dtype=jnp.float32))
        v_k = jnp.clip(v_max, 0.0, speed + a * t_k)
        s_k = jnp.cumsum(v_k * dt)
        wp = jnp.stack([s_k, jnp.zeros(80)], -1)  # straight ahead
        act, trk = track_step(trk, wp, speed)
        pos, heading, speed = bicycle_step(pos, heading, speed, act, dt)
    assert float(speed) > 0.8 * v_max, float(speed)
    assert float(speed) < 1.3 * v_max, float(speed)


def test_recognition_skips_near_goal_candidates():
    """Candidates whose chain goal sits at their feet are not promoted
    (instant reach-goal would churn the slot, r3's 84-promotion loops)."""
    from rift_tpu.scenario.recognition import MIN_GOAL_DIST, recognize_cbvs
    from rift_tpu.scenario.env import TrafficEnv, wake_all_bvs

    tm = make_straight_town(length=400.0, num_lanes=2, pad_lanes_to=16)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=6, max_cbvs=3, seed=1)
    state, crit, spec = env.reset()
    state = wake_all_bvs(state)
    state = state.replace(tick=state.tick + 30)
    is_cbv, goal, goal_valid, _, promote = recognize_cbvs(
        tm, spec, state, max_cbvs=3
    )
    promote = np.asarray(promote)
    if promote.any():
        gd = np.linalg.norm(
            np.asarray(goal) - np.asarray(state.pos), axis=-1
        )[promote]
        assert (gd > MIN_GOAL_DIST).all(), gd
