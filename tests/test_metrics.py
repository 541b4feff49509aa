import jax.numpy as jnp
import numpy as np

from rift_tpu.scenario.metrics import ego_criticality, pairwise_criticality


def _pair(xa=0.0, va=5.0, ha=0.0, xb=20.0, vb=0.0, hb=0.0, yb=0.0):
    return dict(
        pos_a=jnp.array([xa, 0.0]),
        heading_a=jnp.asarray(ha),
        speed_a=jnp.asarray(va),
        shape_a=jnp.array([1.8, 4.8]),
        pos_b=jnp.array([xb, yb]),
        heading_b=jnp.asarray(hb),
        speed_b=jnp.asarray(vb),
        shape_b=jnp.array([1.8, 4.8]),
    )


def test_rttc_head_on_approach():
    # A at 5 m/s toward stationary B 20 m ahead: gap = 20 - 4.8 = 15.2 m
    m = pairwise_criticality(**_pair())
    rttc = float(m["RTTC"])
    np.testing.assert_allclose(rttc, 15.2 / 5.0, atol=0.05)
    # ACT defined and close to RTTC for a head-on line-up
    assert np.isfinite(float(m["ACT"]))


def test_rttc_receding_is_nan():
    # B ahead moving away faster
    m = pairwise_criticality(**_pair(vb=10.0))
    assert np.isnan(float(m["RTTC"]))
    assert np.isnan(float(m["ACT"]))


def test_rttc_lateral_miss_is_nan():
    # B far to the side, A driving straight: ray misses the box
    m = pairwise_criticality(**_pair(yb=10.0))
    assert np.isnan(float(m["RTTC"]))


def test_head_on_collision_course_both_moving():
    # B driving toward A: closing speed 10 -> RTTC = 15.2/10
    m = pairwise_criticality(**_pair(vb=5.0, hb=np.pi))
    np.testing.assert_allclose(float(m["RTTC"]), 15.2 / 10.0, atol=0.05)


def test_ei_sign():
    # near-collision (small lateral offset): EI should be finite & large-ish
    m_near = pairwise_criticality(**_pair(yb=0.5))
    m_far = pairwise_criticality(**_pair(yb=3.0))
    # far lateral offset -> bigger MFD -> smaller in-depth -> smaller EI
    if np.isfinite(float(m_near["EI"])) and np.isfinite(float(m_far["EI"])):
        assert float(m_near["EI"]) > float(m_far["EI"])


def test_ego_criticality_aggregation():
    S, N = 2, 3
    ego_pos = jnp.zeros((S, 2))
    ego_heading = jnp.zeros(S)
    ego_speed = jnp.full(S, 5.0)
    ego_shape = jnp.tile(jnp.array([1.8, 4.8]), (S, 1))
    nbr_pos = jnp.tile(jnp.array([[20.0, 0.0], [40.0, 0.0], [0.0, 30.0]]), (S, 1, 1))
    nbr_heading = jnp.zeros((S, N))
    nbr_speed = jnp.zeros((S, N))
    nbr_shape = jnp.tile(jnp.array([1.8, 4.8]), (S, N, 1))
    valid = jnp.ones((S, N), bool)
    agg = ego_criticality(
        ego_pos, ego_heading, ego_speed, ego_shape,
        nbr_pos, nbr_heading, nbr_speed, nbr_shape, valid,
    )
    # min over neighbors: the 20 m one dominates
    np.testing.assert_allclose(float(agg["RTTC"][0]), 15.2 / 5.0, atol=0.05)
    # masking all invalid -> NaN
    agg2 = ego_criticality(
        ego_pos, ego_heading, ego_speed, ego_shape,
        nbr_pos, nbr_heading, nbr_speed, nbr_shape, jnp.zeros((S, N), bool),
    )
    assert np.isnan(float(agg2["RTTC"][0]))
