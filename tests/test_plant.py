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
    # densified to the tracker's 0.1 s grid (sim/pid.densify_local_waypoints)
    assert wp.shape == (2, 30, 2)

    # drive closed-loop with the PlanT ego
    for _ in range(5):
        wp = plant_ego_waypoints(model, params, spec, state)
        state, crit = env.step(state, crit, ego_traj=wp)
    assert bool(jnp.isfinite(state.pos).all())


def test_plant_bc_training_and_attn_scorer(tmp_path):
    """End-to-end PlanT path: collect -> BC fit (loss drops) -> trained
    scorer drives attention-based recognition (reference lit_module.py +
    attn_cbv.py)."""
    import jax

    from rift_tpu.map import make_straight_town
    from rift_tpu.models.plant.model import PlanTModel
    from rift_tpu.models.plant.train import (
        fit_plant,
        make_attn_scores_fn,
        plant_bc_dataset,
    )
    from rift_tpu.rl.collect import CollectBuffer
    from rift_tpu.scenario import TrafficEnv
    from rift_tpu.scenario.recognition import attn_recognize_cbvs

    tmap = make_straight_town(length=300.0, num_lanes=2)
    env = TrafficEnv(tmap, num_scenarios=2, num_agents=6, seed=3)
    state, crit, spec = env.reset()
    buf = CollectBuffer(str(tmp_path), "pdm_lite", "standard")
    buf.set_static({"ego_route": spec.ego_route, "ego_route_len": spec.ego_route_len})
    for _ in range(40):
        state, crit = env.step(state, crit)
        buf.store(state)
    path = buf.save()
    data = CollectBuffer.load(path)
    dataset = plant_bc_dataset(data, pred_len=2, stride=5)
    assert dataset[0].shape[0] > 0

    model = PlanTModel(dim=32, num_layers=1, num_heads=2, pred_len=2)
    params = model.init(
        jax.random.PRNGKey(0), dataset[0][:2], dataset[1][:2], dataset[2][:2]
    )
    params, losses = fit_plant(
        model, params, dataset, lr=3e-4, epochs=4, batch_size=16
    )
    assert losses[-1] < losses[0], f"BC loss did not drop: {losses}"

    # the trained scorer plugs into attention recognition
    scores_fn = make_attn_scores_fn(model, params, env.spec)
    scores = scores_fn(state)
    assert scores.shape == state.alive.shape
    out = attn_recognize_cbvs(tmap, env.spec, state, scores_fn, max_cbvs=2)
    new_is_cbv = out[0]
    assert new_is_cbv.shape == state.alive.shape
