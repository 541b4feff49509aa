import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.map import make_straight_town
from rift_tpu.rl.classic import (
    ClassicPPO,
    cbv_full_train_reward,
    cbv_normal_obs,
    control_to_rl_action,
    ego_normal_obs,
    ego_shaped_reward,
    rl_action_to_control,
)
from rift_tpu.sim import init_sim_state


def _state():
    tm = make_straight_town(length=200.0, num_lanes=2)
    st = init_sim_state(2, 4)
    pos = jnp.asarray(
        [[[10.0, 0.0], [30.0, 0.0], [50.0, -3.5], [0.0, 0.0]]] * 2
    )
    st = st.replace(
        pos=pos,
        alive=jnp.ones((2, 4), bool).at[:, 3].set(False),
        speed=jnp.asarray([[5.0, 3.0, 2.0, 0.0]] * 2),
        heading=jnp.zeros((2, 4)),
        goal=st.goal.at[:, 1].set(jnp.array([80.0, 0.0])),
        goal_valid=st.goal_valid.at[:, 1].set(True),
        is_cbv=st.is_cbv.at[:, 1].set(True),
    )
    return tm, st


def test_cbv_normal_obs_layout():
    tm, st = _state()
    obs = cbv_normal_obs(st, jnp.asarray(0), jnp.asarray(1))
    assert obs.shape == (4, 6)
    # row 0 = self: zero position, own speed
    np.testing.assert_allclose(np.asarray(obs[0, :2]), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(obs[0, 5]), 3.0, atol=1e-5)
    # row 1 = ego at relative x = -20
    np.testing.assert_allclose(float(obs[1, 0]), -20.0, atol=1e-4)
    # goal row distance = 50
    np.testing.assert_allclose(float(obs[3, 5]), 50.0, atol=1e-4)


def test_ego_normal_obs_shape():
    tm, st = _state()
    route_wp = jnp.asarray([[20.0, 0.0]] * 2)
    obs = ego_normal_obs(st, route_wp)
    assert obs.shape == (2, 4, 6)
    np.testing.assert_allclose(float(obs[0, 3, 0]), 10.0, atol=1e-4)


def test_action_conversion_roundtrip():
    a = jnp.array([[0.5, 0.3], [-0.8, -0.5], [1.0, 1.0]])
    ctrl = rl_action_to_control(a)
    # positive acc -> throttle, no brake
    assert float(ctrl[0, 0]) > 0 and float(ctrl[0, 2]) == 0
    # negative acc -> brake, no throttle
    assert float(ctrl[1, 0]) == 0 and float(ctrl[1, 2]) > 0
    back = control_to_rl_action(ctrl)
    np.testing.assert_allclose(np.asarray(back), np.asarray(a), atol=1e-5)


def test_cbv_full_train_reward():
    r = cbv_full_train_reward(
        jnp.asarray(10.0), jnp.asarray(9.5),
        jnp.asarray(False), jnp.asarray(False),
    )
    np.testing.assert_allclose(float(r), 0.5, atol=1e-6)
    r_goal = cbv_full_train_reward(
        jnp.asarray(3.0), jnp.asarray(1.0), jnp.asarray(False), jnp.asarray(True)
    )
    np.testing.assert_allclose(float(r_goal), 16.0, atol=1e-6)
    r_col = cbv_full_train_reward(
        jnp.asarray(3.0), jnp.asarray(3.0), jnp.asarray(True), jnp.asarray(False)
    )
    np.testing.assert_allclose(float(r_col), -15.0, atol=1e-6)


def test_ego_shaped_reward_direction():
    good = ego_shaped_reward(
        jnp.asarray(6.0), jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(False)
    )
    crash = ego_shaped_reward(
        jnp.asarray(6.0), jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(True)
    )
    assert float(good) - float(crash) == 10.0


def test_classic_ppo_trains():
    ppo = ClassicPPO(epochs=3)
    rng = jax.random.PRNGKey(0)
    B = 32
    obs = jax.random.normal(rng, (B, 4, 6))
    action, logp = ppo.act(ppo.params, obs, rng)
    assert action.shape == (B, 2)
    assert bool(jnp.isfinite(logp).all())
    value = ppo.value(ppo.params, obs)
    batch = {
        "obs": obs,
        "action": action,
        "old_log_prob": logp,
        "advantage": jax.random.normal(jax.random.fold_in(rng, 2), (B,)),
        "returns": jax.random.normal(jax.random.fold_in(rng, 3), (B,)),
    }
    losses = ppo.train(batch)
    assert len(losses) == 3 and all(np.isfinite(losses))
    # deterministic act returns the mean
    a1, _ = ppo.act(ppo.params, obs, rng, deterministic=True)
    a2, _ = ppo.act(ppo.params, obs, jax.random.fold_in(rng, 9), deterministic=True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
