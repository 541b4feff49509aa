import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.map import build_lane_chains, make_straight_town
from rift_tpu.models.pluto import PlutoModel, build_cbv_features
from rift_tpu.sim import init_sim_state
from rift_tpu.sim.state import ScenarioSpec


def _spec_all_on_route(tm, S):
    """Minimal ScenarioSpec for feature tests: every lane on route."""
    L = tm.num_lanes
    mask = jnp.broadcast_to(tm.valid, (S, L))
    return ScenarioSpec(
        ego_route=jnp.zeros((S, 8, 3)),
        ego_route_len=jnp.full((S,), 8, jnp.int32),
        route_road_ids=jnp.full((S, 4), -1, jnp.int32),
        route_lane_ids=jnp.zeros((S, 4), jnp.int32),
        ego_target_speed=jnp.full((S,), 8.0),
        timeout_ticks=jnp.full((S,), 100, jnp.int32),
        route_lane_mask=mask,
        lane_chains=build_lane_chains(tm, mask),
    )


def _setup(S=2, A=6):
    tm = make_straight_town(length=400.0, num_lanes=2, pad_lanes_to=16)
    st = init_sim_state(S, A)
    xs = jnp.tile(jnp.arange(A, dtype=jnp.float32) * 15.0 + 10.0, (S, 1))
    pos = jnp.stack([xs, jnp.zeros((S, A))], axis=-1)
    st = st.replace(
        pos=pos,
        alive=jnp.ones((S, A), bool),
        lane=tm.nearest_lane(pos),
        speed=jnp.full((S, A), 5.0),
        # give agents one valid history frame
        hist_pos=st.hist_pos.at[:, :, -1].set(pos),
        hist_valid=st.hist_valid.at[:, :, -1].set(True),
        is_cbv=jnp.zeros((S, A), bool).at[:, 1].set(True),
    )
    return tm, st


def test_cbv_features_shapes_and_frame():
    tm, st = _setup()
    S, C, L = 2, 2, tm.num_lanes
    cbv_slots = jnp.full((S, C), -1, jnp.int32).at[:, 0].set(1)
    feats, valid = build_cbv_features(tm, st, cbv_slots, _spec_all_on_route(tm, S))
    assert feats["agent"]["position"].shape == (S, C, 32, 21, 2)
    assert feats["map"]["point_position"].shape == (S, C, 64, 3, 20, 2)
    assert feats["reference_line"]["position"].shape == (S, C, 4, 120, 2)
    assert bool(valid[0, 0]) and not bool(valid[0, 1])

    # center agent (slot 0 of the feature) is at its own origin
    center_pos = feats["agent"]["position"][0, 0, 0, -1]
    np.testing.assert_allclose(np.asarray(center_pos), [0.0, 0.0], atol=1e-4)
    # center heading ~0 in own frame
    np.testing.assert_allclose(
        float(feats["agent"]["heading"][0, 0, 0, -1]), 0.0, atol=1e-5
    )
    # neighbors are along the x axis (straight road): |y| small
    nbr_pos = np.asarray(feats["agent"]["position"][0, 0, 1:, -1])
    nbr_valid = np.asarray(feats["agent"]["valid_mask"][0, 0, 1:, -1])
    assert nbr_valid.sum() >= 4
    assert (np.abs(nbr_pos[nbr_valid][:, 1]) < 0.5).all()

    # reference line starts near the center agent and heads +x (local frame)
    r_valid = np.asarray(feats["reference_line"]["valid_mask"][0, 0, 0])
    r_pos = np.asarray(feats["reference_line"]["position"][0, 0, 0])
    assert r_valid.sum() > 50
    assert abs(r_pos[0, 1]) < 2.0
    assert np.all(np.diff(r_pos[r_valid][:, 0]) > 0)

    # map polygons: on-route flags set, finite
    assert bool(feats["map"]["polygon_on_route"][0, 0].any())
    assert bool(jnp.isfinite(feats["map"]["point_position"]).all())


def test_features_feed_model():
    tm, st = _setup()
    cbv_slots = jnp.zeros((2, 1), jnp.int32).at[:].set(1)
    feats, valid = build_cbv_features(tm, st, cbv_slots, _spec_all_on_route(tm, 2))
    # flatten [S, C] -> batch
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), feats)
    model = PlutoModel(encoder_depth=1, decoder_depth=1)
    params = model.init(jax.random.PRNGKey(0), flat)
    out = model.apply(params, flat)
    assert out["trajectory"].shape[0] == 2
    assert bool(jnp.isfinite(out["probability"]).all())
