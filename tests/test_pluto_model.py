import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rift_tpu.models.pluto import PlutoModel


def make_feature_batch(B=2, A=8, T=21, M=16, P=20, R=4, N=120, NS=1, key=0):
    k = jax.random.PRNGKey(key)
    ks = jax.random.split(k, 10)
    return {
        "agent": {
            "position": jax.random.normal(ks[0], (B, A, T, 2)) * 20,
            "heading": jax.random.uniform(ks[1], (B, A, T), minval=-3, maxval=3),
            "velocity": jax.random.normal(ks[2], (B, A, T, 2)) * 3,
            "shape": jnp.full((B, A, T, 2), 2.0),
            "category": jnp.zeros((B, A), jnp.int32),
            "valid_mask": jnp.ones((B, A, T), bool).at[:, -2:].set(False),
        },
        "map": {
            "point_position": jax.random.normal(ks[3], (B, M, 3, P, 2)) * 50,
            "point_vector": jax.random.normal(ks[4], (B, M, 3, P, 2)),
            "point_orientation": jax.random.uniform(ks[5], (B, M, 3, P)),
            "polygon_center": jax.random.normal(ks[6], (B, M, 3)) * 50,
            "polygon_type": jnp.zeros((B, M), jnp.int32),
            "polygon_on_route": jnp.zeros((B, M), bool),
            "polygon_tl_status": jnp.zeros((B, M), jnp.int32),
            "polygon_has_speed_limit": jnp.ones((B, M), bool),
            "polygon_speed_limit": jnp.full((B, M), 14.0),
            "valid_mask": jnp.ones((B, M, P), bool).at[:, -4:].set(False),
        },
        "reference_line": {
            "position": jax.random.normal(ks[7], (B, R, N, 2)) * 30,
            "vector": jax.random.normal(ks[8], (B, R, N, 2)),
            "orientation": jnp.zeros((B, R, N)),
            # last ref line invalid -> exercises masking
            "valid_mask": jnp.ones((B, R, N), bool).at[:, -1].set(False),
        },
        "static_objects": {
            "position": jnp.zeros((B, NS, 2)),
            "heading": jnp.zeros((B, NS)),
            "shape": jnp.zeros((B, NS, 2)),
            "category": jnp.zeros((B, NS), jnp.int32),
            "valid_mask": jnp.zeros((B, NS), bool),
        },
        "current_state": jnp.zeros((B, 7)).at[:, 3].set(5.0),
    }


@pytest.fixture(scope="module")
def model_and_params():
    model = PlutoModel(encoder_depth=2, decoder_depth=2)
    data = make_feature_batch(B=1)
    params = model.init(jax.random.PRNGKey(0), data)
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    data = make_feature_batch(B=2)
    out = model.apply(params, data)
    B, R, M, T = 2, 4, 12, 80
    assert out["trajectory"].shape == (B, R, M, T, 6)
    assert out["probability"].shape == (B, R, M)
    assert out["prediction"].shape == (B, 7, T, 6)
    assert out["output_trajectory"].shape == (B, T, 3)
    assert out["candidate_trajectories"].shape == (B, R, M, T, 3)
    assert out["ref_free_trajectory"].shape == (B, T, 4)
    assert out["hidden"].shape == (B, 128)


def test_forward_finite(model_and_params):
    model, params = model_and_params
    data = make_feature_batch(B=2, key=3)
    out = model.apply(params, data)
    for k in ("trajectory", "probability", "prediction", "output_trajectory"):
        assert bool(jnp.isfinite(out[k]).all()), f"{k} has non-finite values"


def test_invalid_ref_line_masked(model_and_params):
    model, params = model_and_params
    data = make_feature_batch(B=1)
    out = model.apply(params, data)
    # last reference line was invalid: its probabilities must be -1e6
    np.testing.assert_array_less(
        np.asarray(out["probability"][:, -1]), -1e5
    )
    # best trajectory never comes from the masked line
    flat_best = int(jnp.argmax(out["probability"].reshape(1, -1), -1)[0])
    assert flat_best < 3 * 12


def test_train_mode_with_dropout_rng(model_and_params):
    model, params = model_and_params
    data = make_feature_batch(B=1)
    out = model.apply(
        params, data, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert bool(jnp.isfinite(out["probability"]).all())


def test_jit_and_grad(model_and_params):
    model, params = model_and_params
    data = make_feature_batch(B=1)

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, data)
        return (out["probability"] ** 2).mean() + (out["trajectory"] ** 2).mean()

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    # pi_head gets gradient
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    pi_grads = [x for pth, x in flat if "pi_head" in str(pth)]
    assert pi_grads and any(float(jnp.abs(x).max()) > 0 for x in pi_grads)


def test_param_count_reasonable(model_and_params):
    model, params = model_and_params
    n = sum(x.size for x in jax.tree.leaves(params))
    # reference Pluto is a few-million-parameter model; 2+2 layers here
    assert 1_000_000 < n < 20_000_000, n
