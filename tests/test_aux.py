import os

import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.map import make_straight_town
from rift_tpu.scenario import TrafficEnv


def test_checkpoint_roundtrip(tmp_path):
    from rift_tpu.utils.checkpoint import CheckpointManager

    params = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.latest_episode() is None
    mgr.save(params, episode=3)
    mgr.save(jax.tree.map(lambda x: x * 2, params), episode=7)
    assert mgr.latest_episode() == 7
    restored, ep = mgr.restore(params)
    assert ep == 7
    np.testing.assert_allclose(np.asarray(restored["a"]), np.arange(4.0) * 2)
    restored3, _ = mgr.restore(params, episode=3)
    np.testing.assert_allclose(np.asarray(restored3["a"]), np.arange(4.0))


def test_statistics_checkpoint_resume(tmp_path):
    from rift_tpu.scenario.statistics import StatisticsManager

    tm = make_straight_town(length=300.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=6, seed=9)
    state, crit, spec = env.reset()
    for _ in range(30):
        state, crit = env.step(state, crit)

    path = str(tmp_path / "results.json")
    sm = StatisticsManager(path)
    sm.register_episode(crit, state, spec)
    assert os.path.exists(path)

    # resume must be explicit (reference gates it, carla_runner.py:513-527)
    sm_fresh = StatisticsManager(path)
    assert sm_fresh.resume_index == 0
    sm2 = StatisticsManager(path, resume=True)
    assert sm2.resume_index == 2
    g = sm2.compute_global_statistics()
    assert g.total_routes == 2


def test_bev_renderer_and_gif(tmp_path):
    from rift_tpu.viz import VideoRecorder

    tm = make_straight_town(length=300.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=4, seed=11)
    state, crit, spec = env.reset()
    rec = VideoRecorder(tm, str(tmp_path / "video"), every_n_ticks=2)
    route = np.asarray(spec.ego_route[0, :, :2])
    for _ in range(6):
        state, crit = env.step(state, crit)
        rec.maybe_capture(state, 0, route=route)
    gif = rec.save("test")
    assert gif is not None and os.path.exists(gif)
    assert os.path.exists(str(tmp_path / "video" / "test_last.png"))


def test_route_xml_parsing():
    from rift_tpu.scenario.routes import (
        EvalDataLoader,
        TrainDataLoader,
        group_by_town,
        parse_routes_file,
    )

    path = "/root/reference/rift/scenario/route/drivetransformer_bench2drive_dev10.xml"
    configs = parse_routes_file(path)
    assert len(configs) == 10
    assert all(len(c.keypoints) > 20 for c in configs)
    assert configs[0].town.startswith("Town")

    # subset selection
    ids = [c.route_id for c in configs]
    sub = parse_routes_file(path, routes_subset=f"{ids[0]},{ids[2]}")
    assert len(sub) == 2

    grouped = group_by_town(configs, repetitions=2)
    assert sum(len(v) for v in grouped.values()) == 20

    loader = EvalDataLoader(configs, num_scenario=3)
    batch = loader.sampler()
    assert 1 <= len(batch) <= 3
    # non-overlap within the batch
    total = len(batch)
    while loader.configs:
        total += len(loader.sampler())
    assert total == 10

    tl = TrainDataLoader(configs, num_scenario=4, seed=0)
    b1 = tl.sampler()
    assert len(b1) >= 1


def test_map_from_route():
    from rift_tpu.map.from_route import map_from_route
    from rift_tpu.scenario.routes import parse_routes_file

    configs = parse_routes_file(
        "/root/reference/rift/scenario/route/drivetransformer_bench2drive_dev10.xml"
    )
    tm = map_from_route(configs[0].keypoints, num_lanes=2)
    assert tm.num_lanes > 2
    assert bool(tm.valid.all())
    # the compiled corridor's first lane vertex is on the map (routes are
    # tiled into map frame, so raw XML coordinates no longer apply)
    start = tm.centerline[0, 0]
    assert bool(tm.on_road(start))


def test_attn_recognition():
    from rift_tpu.scenario.recognition import attn_recognize_cbvs

    tm = make_straight_town(length=400.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=2, num_agents=10, max_cbvs=2, seed=13)
    state, crit, spec = env.reset()
    for _ in range(40):
        state, crit = env.step(state, crit)

    # fake attention: prefer the highest agent slot
    def scores_fn(st):
        return jnp.broadcast_to(
            jnp.arange(st.alive.shape[1], dtype=jnp.float32), st.alive.shape
        )

    is_cbv, goal, gvalid, inter, promote = attn_recognize_cbvs(
        tm, spec, state, scores_fn, max_cbvs=2
    )
    assert is_cbv.shape == state.is_cbv.shape
    # never promotes the ego
    assert not bool(is_cbv[:, 0].any())
    assert int(is_cbv.sum(-1).max()) <= 2


def test_collect_buffer_hdf5(tmp_path):
    from rift_tpu.rl.collect import CollectBuffer

    tm = make_straight_town(length=300.0, num_lanes=2)
    env = TrafficEnv(tm, num_scenarios=1, num_agents=4, seed=30)
    state, crit, spec = env.reset()
    buf = CollectBuffer(str(tmp_path / "data"), "pdm_lite", "standard")
    assert not buf.exists()
    for _ in range(10):
        state, crit = env.step(state, crit)
        buf.store(state)
    path = buf.save()
    assert buf.exists()
    data = CollectBuffer.load(path)
    assert data["pos"].shape == (10, 1, 4, 2)
    assert data["rl_action"].shape == (10, 1, 4, 2)
    assert (data["tick"][:, 0] == np.arange(1, 11)).all()


def test_params_npz_roundtrip_and_merge(tmp_path):
    """save/load must preserve EXACT tree keys across jax DictKey-str
    changes (a format drift once made every pretrain load a silent no-op),
    and merge_params must raise on zero overlap instead of no-opping."""
    import jax
    import jax.numpy as jnp
    import pytest

    from rift_tpu.utils.params_io import (
        load_params_npz, merge_params, save_params_npz,
    )

    params = {
        "params": {
            "enc": {"kernel": jnp.arange(6.0).reshape(2, 3), "bias": jnp.ones(3)},
            "pi_head": {"kernel": jnp.full((3, 1), 2.0)},
        }
    }
    p = str(tmp_path / "p.npz")
    save_params_npz(params, p)
    loaded = load_params_npz(p)
    assert jax.tree_util.tree_structure(loaded) == jax.tree_util.tree_structure(params)
    assert all(
        bool((a == b).all())
        for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params))
    )
    # merge keeps template-only keys, takes loaded values elsewhere
    template = {
        "params": {
            "enc": {"kernel": jnp.zeros((2, 3)), "bias": jnp.zeros(3)},
            "pi_head": {"kernel": jnp.zeros((3, 1))},
            "value_head": {"kernel": jnp.full((3, 1), 7.0)},
        }
    }
    merged = merge_params(template, loaded)
    assert float(merged["params"]["enc"]["kernel"][1, 2]) == 5.0
    assert float(merged["params"]["value_head"]["kernel"][0, 0]) == 7.0
    with pytest.raises(ValueError):
        merge_params(template, {"bogus": {"x": jnp.zeros(1)}})
