import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.map import make_straight_town
from rift_tpu.models.plant import PlanTModel, build_plant_tokens, plant_ego_waypoints
from rift_tpu.scenario import TrafficEnv


def test_plant_model_forward():
    model = PlanTModel(dim=64, num_layers=2, num_heads=2)
    B, O = 2, 18
    tokens = jnp.zeros((B, O, 7)).at[:, :4, 0].set(1.0)
    target = jnp.array([[20.0, 0.0], [15.0, 3.0]])
    light = jnp.zeros((B, 1))
    params = model.init(jax.random.PRNGKey(0), tokens, target, light)
    out = model.apply(params, tokens, target, light)
    assert out["pred_wp"].shape == (B, 4, 2)
    assert out["attn_scores"].shape == (B, O)
    assert bool(jnp.isfinite(out["pred_wp"]).all())
    # padded tokens get -inf-ish attention
    assert float(out["attn_scores"][0, -1]) < -1e8


def test_plant_forecast_heads():
    model = PlanTModel(dim=64, num_layers=1, num_heads=2, forecast_heads=True)
    tokens = jnp.zeros((1, 8, 7)).at[:, :3, 0].set(1.0)
    target = jnp.zeros((1, 2))
    light = jnp.zeros((1, 1))
    params = model.init(jax.random.PRNGKey(0), tokens, target, light)
    out = model.apply(params, tokens, target, light)
    assert out["forecast_logits"].shape == (1, 8, 6, 16)


def test_build_plant_tokens_and_ego_waypoints():
    tm = make_straight_town(length=400.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=8, seed=4)
    state, crit, spec = env.reset()
    tokens, target, light = build_plant_tokens(spec, state)
    assert tokens.shape[0] == 2 and tokens.shape[2] == 7
    # route tokens present (type 2)
    assert bool((tokens[..., 0] == 2.0).any())
    # target point ahead of the ego (positive local x)
    assert float(target[0, 0]) > 5.0

    model = PlanTModel(dim=64, num_layers=2, num_heads=2)
    params = model.init(jax.random.PRNGKey(0), tokens, target, light)
    wp = plant_ego_waypoints(model, params, spec, state)
    assert wp.shape == (2, 4, 2)

    # drive closed-loop with the PlanT ego
    for _ in range(5):
        wp = plant_ego_waypoints(model, params, spec, state)
        state, crit = env.step(state, crit, ego_traj=wp)
    assert bool(jnp.isfinite(state.pos).all())
