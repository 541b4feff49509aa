import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.map import make_straight_town
from rift_tpu.rl import (
    NUM_FRAMES,
    dense_reward,
    derive_kinematics,
    forecast_neighbors,
    grpo_advantage,
    ref_line_matrices,
    rollout_candidates,
)


# ----------------------------------------------------------------- reward
def test_dense_reward_collision_dominates():
    base = dense_reward(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    hit = dense_reward(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 1.0, 0.0)
    assert float(hit) < float(base) - 25.0  # -(20 + |v|)


def test_dense_reward_offroad_penalty():
    base = dense_reward(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    off = dense_reward(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 1.0)
    np.testing.assert_allclose(float(base - off), 5.0, atol=1e-5)


def test_dense_reward_prefers_aligned_fast():
    slow = dense_reward(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    fast = dense_reward(0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    misaligned = dense_reward(0.0, jnp.pi / 2, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    assert float(fast) > float(slow)
    assert float(fast) > float(misaligned)


def test_dense_reward_comfort_penalty():
    smooth = dense_reward(0.0, 0.0, 10.0, 2.0, 0.0, 0.0, 0.0, 0.0)
    harsh = dense_reward(0.0, 0.0, 10.0, 6.0, 0.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(float(smooth - harsh), 0.8, atol=1e-5)


# ----------------------------------------------------------------- kinematics
def test_derive_kinematics_constant_speed():
    T = 40
    heading = jnp.zeros((3, T))
    speed = jnp.full((3, T), 8.0)
    v, a, w, wa = derive_kinematics(heading, speed)
    np.testing.assert_allclose(np.asarray(v), 8.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-6)


def test_derive_kinematics_turning():
    T = 40
    t = jnp.arange(T) * 0.1
    heading = jnp.tile(0.5 * t, (1, 1))  # 0.5 rad/s yaw rate
    speed = jnp.full((1, T), 5.0)
    _, _, w, _ = derive_kinematics(heading, speed)
    np.testing.assert_allclose(np.asarray(w[0, 5:-5]), 0.5, atol=0.05)


# ----------------------------------------------------------------- ref lines
def test_ref_line_matrices_signs():
    R, M, T, Nr = 1, 2, 10, 50
    ref_pos = jnp.stack(
        [jnp.linspace(0, 49, Nr), jnp.zeros(Nr)], axis=-1
    )[None]  # +x line
    ref_heading = jnp.zeros((R, Nr))
    ref_valid = jnp.ones((R, Nr), bool)
    x = jnp.linspace(0, 9, T)
    # mode 0 exactly on the line, mode 1 offset +2 in y (left)
    cand_pos = jnp.stack(
        [
            jnp.stack([x, jnp.zeros(T)], axis=-1),
            jnp.stack([x, jnp.full(T, 2.0)], axis=-1),
        ]
    )[None]
    cand_heading = jnp.zeros((R, M, T))
    dd, da = ref_line_matrices(cand_pos, cand_heading, ref_pos, ref_heading, ref_valid)
    np.testing.assert_allclose(np.asarray(dd[0, 0]), 0.0, atol=1e-5)
    # reference sign convention: delta_dis = -cross(rel, tangent);
    # +y offset with +x tangent -> cross = rel_x*t_y - rel_y*t_x = -2 -> dd=+2
    np.testing.assert_allclose(np.asarray(dd[0, 1]), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(da), 0.0, atol=1e-6)


# ----------------------------------------------------------------- rollout
def test_rollout_tracks_straight_candidate():
    G, T = 2, NUM_FRAMES
    spacing = 0.8  # 8 m/s at 10 fps
    x = jnp.arange(T, dtype=jnp.float32) * spacing
    ref = jnp.stack([x, jnp.zeros(T)], axis=-1)
    ref2 = jnp.stack([x, 0.05 * x], axis=-1)  # slight drift
    ref_pos = jnp.stack([ref, ref2])
    ref_heading = jnp.zeros((G, T))
    c, h, v = rollout_candidates(ref_pos, ref_heading, jnp.asarray(8.0))
    assert c.shape == (G, T, 2)
    # tracked rollout stays near the candidate path
    err = np.abs(np.asarray(c[0, :, 1]))
    assert err.max() < 1.0
    # forward progress close to the candidate's
    assert float(c[0, -1, 0]) > 0.6 * float(ref[-1, 0])
    assert bool(jnp.isfinite(v).all())


def test_rollout_slows_for_dense_waypoints():
    G, T = 1, NUM_FRAMES
    x = jnp.arange(T, dtype=jnp.float32) * 0.05  # ~0.5 m/s target
    ref_pos = jnp.stack([x, jnp.zeros(T)], axis=-1)[None]
    ref_heading = jnp.zeros((G, T))
    c, h, v = rollout_candidates(ref_pos, ref_heading, jnp.asarray(8.0))
    assert float(v[0, -1]) < 4.0  # braked toward slow target


def test_refline_pallas_matches_jnp():
    """The streamed Pallas refline kernel (interpret mode) reproduces
    ref_line_matrices on random candidate/ref geometries."""
    from rift_tpu.ops.refline import refline_matrices_pallas
    from rift_tpu.rl.evaluator import ref_line_matrices

    rng = np.random.default_rng(5)
    R, M, T, Nr = 3, 4, 10, 17
    cand_pos = jnp.asarray(rng.normal(0, 20, (R, M, T, 2)).astype(np.float32))
    cand_heading = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (R, M, T)).astype(np.float32)
    )
    ref_pos = jnp.asarray(rng.normal(0, 20, (R, Nr, 2)).astype(np.float32))
    ref_heading = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (R, Nr)).astype(np.float32)
    )
    ref_valid = jnp.asarray(rng.random((R, Nr)) > 0.2)
    ref_valid = ref_valid.at[:, 0].set(True)
    dd_ref, da_ref = ref_line_matrices(
        cand_pos, cand_heading, ref_pos, ref_heading, ref_valid
    )
    dd_pl, da_pl = refline_matrices_pallas(
        cand_pos.reshape(R, M * T, 2),
        cand_heading.reshape(R, M * T),
        ref_pos, ref_heading, ref_valid,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(dd_pl).reshape(R, M, T), np.asarray(dd_ref), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(da_pl).reshape(R, M, T), np.asarray(da_ref), atol=1e-4
    )


def test_retrack_pallas_matches_jnp_scan():
    """The Pallas kernel (interpret mode) reproduces the lax.scan reference
    path of rollout_candidates on mixed candidate geometries."""
    from rift_tpu.ops.retrack import retrack_rollout_pallas

    rng = np.random.default_rng(3)
    G, T = 7, NUM_FRAMES
    t = np.arange(T, dtype=np.float32)
    paths = []
    for g in range(G):
        v = rng.uniform(0.3, 1.5)
        curve = rng.uniform(-0.02, 0.02)
        x = t * v
        y = curve * x**2 / 10.0
        paths.append(np.stack([x, y], axis=-1))
    ref_pos = jnp.asarray(np.stack(paths))
    ref_heading = jnp.asarray(
        np.arctan2(
            np.gradient(np.stack(paths)[..., 1], axis=1),
            np.gradient(np.stack(paths)[..., 0], axis=1) + 1e-9,
        ).astype(np.float32)
    )
    v0 = jnp.asarray(rng.uniform(0.0, 12.0, G).astype(np.float32))
    c_ref, h_ref, v_ref = rollout_candidates(ref_pos, ref_heading, v0)
    c_pl, h_pl, v_pl = retrack_rollout_pallas(
        ref_pos, ref_heading, v0, NUM_FRAMES, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(c_pl), np.asarray(c_ref), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(v_pl), np.asarray(v_ref), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(h_pl), np.asarray(h_ref), atol=2e-3
    )


# ----------------------------------------------------------------- forecast
def test_forecast_neighbors_moves_forward():
    N = 2
    pos = jnp.array([[0.0, 0.0], [10.0, 0.0]])
    heading = jnp.zeros(N)
    speed = jnp.array([5.0, 0.0])
    control = jnp.zeros((N, 3))
    shape = jnp.tile(jnp.array([2.0, 4.5]), (N, 1))
    valid = jnp.ones(N, bool)
    c, h, sh, v = forecast_neighbors(pos, heading, speed, control, shape, valid)
    assert c.shape == (N, NUM_FRAMES, 2)
    assert float(c[0, -1, 0]) > 10.0  # moving neighbor advanced
    np.testing.assert_allclose(float(c[1, -1, 0]), 10.0, atol=0.2)  # stopped stays
    # stationary (slow) neighbor keeps its true extent
    np.testing.assert_allclose(
        np.asarray(sh[1, 0]), np.asarray(shape[1]) * 1.1, atol=1e-5
    )
    # fast neighbor's late bbox is inflated beyond its true size
    assert float(sh[0, -1, 1]) > float(shape[0, 1])


# ----------------------------------------------------------------- advantage
def _advantage_setup(with_blocker: bool):
    tm = make_straight_town(length=400.0, num_lanes=2, pad_lanes_to=16)
    R, M, T = 2, 3, NUM_FRAMES
    # candidates in local frame: mode m drives at speed (m+1)*0.35 m/frame,
    # ref 1 curves off-road
    t = jnp.arange(T, dtype=jnp.float32)
    trajs = []
    for r in range(R):
        for m in range(M):
            x = t * 0.35 * (m + 1)
            y = jnp.zeros(T) if r == 0 else 0.3 * t  # ref 1 drifts left off-road
            cos_h = jnp.ones(T)
            sin_h = jnp.zeros(T) if r == 0 else jnp.full(T, 0.28)
            trajs.append(jnp.stack([x, y, cos_h, sin_h, x * 0, x * 0], axis=-1))
    trajectories = jnp.stack(trajs).reshape(R, M, T, 6)
    r_valid = jnp.array([True, True])
    Nr = 120
    rx = jnp.linspace(0, 119, Nr)
    ref_pos = jnp.stack(
        [
            jnp.stack([rx, jnp.zeros(Nr)], axis=-1),
            jnp.stack([rx, 0.3 * rx], axis=-1),
        ]
    )
    ref_heading = jnp.zeros((R, Nr)).at[1].set(0.29)
    ref_point_valid = jnp.ones((R, Nr), bool)

    center_pos = jnp.array([50.0, 0.0])
    if with_blocker:
        nbr_pos = jnp.array([[58.0, 0.0]])  # parked 8 m ahead
        nbr_valid = jnp.ones(1, bool)
    else:
        nbr_pos = jnp.array([[0.0, 50.0]])
        nbr_valid = jnp.zeros(1, bool)
    return tm, dict(
        trajectories=trajectories,
        r_valid=r_valid,
        ref_pos=ref_pos,
        ref_heading=ref_heading,
        ref_point_valid=ref_point_valid,
        center_pos=center_pos,
        center_heading=jnp.asarray(0.0),
        center_speed=jnp.asarray(5.0),
        center_shape=jnp.array([2.0, 4.5]),
        nbr_pos=nbr_pos,
        nbr_heading=jnp.zeros(1),
        nbr_speed=jnp.zeros(1),
        nbr_control=jnp.zeros((1, 3)),
        nbr_shape=jnp.tile(jnp.array([2.0, 4.5]), (1, 1)),
        nbr_valid=nbr_valid,
    )


def test_grpo_advantage_shapes_and_zscore():
    tm, kw = _advantage_setup(with_blocker=False)
    out = grpo_advantage(tm, **kw)
    assert out["advantage"].shape == (2, 3)
    assert bool(out["valid_mask"].all())
    adv = np.asarray(out["advantage"]).reshape(-1)
    np.testing.assert_allclose(adv.mean(), 0.0, atol=1e-3)
    np.testing.assert_allclose(adv.std(), 1.0, atol=0.05)


def test_grpo_advantage_prefers_on_road():
    tm, kw = _advantage_setup(with_blocker=False)
    out = grpo_advantage(tm, **kw)
    ret = np.asarray(out["rollout_return"])
    # ref 0 stays in lane; ref 1 drifts off-road -> lower return
    assert ret[0].mean() > ret[1].mean()


def test_grpo_advantage_penalizes_collision_course():
    tm, kw = _advantage_setup(with_blocker=True)
    out_blocked = grpo_advantage(tm, **kw)
    tm2, kw2 = _advantage_setup(with_blocker=False)
    out_free = grpo_advantage(tm2, **kw2)
    # the fast straight mode (r=0, m=2) hits the parked car when present
    assert float(out_blocked["rollout_return"][0, 2]) < float(
        out_free["rollout_return"][0, 2]
    )


def test_grpo_advantage_invalid_ref_masked():
    tm, kw = _advantage_setup(with_blocker=False)
    kw["r_valid"] = jnp.array([True, False])
    out = grpo_advantage(tm, **kw)
    assert not bool(out["valid_mask"][1].any())
    np.testing.assert_allclose(np.asarray(out["advantage"][1]), 0.0, atol=1e-6)
    # z-score over the remaining group
    adv0 = np.asarray(out["advantage"][0])
    np.testing.assert_allclose(adv0.mean(), 0.0, atol=1e-3)


def test_derive_kinematics_matrix_matches_direct():
    """The [T,T]-matrix formulation must equal the shifted-window reference
    implementation (_smooth5 / _central_diff)."""
    from rift_tpu.rl.evaluator import (
        _central_diff,
        _smooth5,
        derive_kinematics,
        wrap_angle,
    )

    rng = np.random.default_rng(7)
    T = 40
    speed = jnp.asarray(rng.uniform(0, 15, (6, T)).astype(np.float32))
    heading = jnp.asarray(
        np.cumsum(rng.normal(0, 0.3, (6, T)), -1).astype(np.float32)
    )
    dt = 0.1

    s_s, acc, yr, ya = derive_kinematics(heading, speed, dt)

    speed_ref = _smooth5(speed)
    acc_ref = _central_diff(speed_ref, dt)
    h_s = _smooth5(heading)
    dth = wrap_angle(h_s[..., 2:] - h_s[..., :-2]) / (2 * dt)
    first = wrap_angle(h_s[..., 1:2] - h_s[..., :1]) / dt
    last = wrap_angle(h_s[..., -1:] - h_s[..., -2:-1]) / dt
    yr_ref = jnp.concatenate([first, dth, last], axis=-1)
    ya_ref = _central_diff(yr_ref, dt)

    np.testing.assert_allclose(np.asarray(s_s), np.asarray(speed_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yr_ref), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(ya_ref), rtol=1e-4, atol=1e-2)
