"""Multi-device SPMD tests on the 8-device virtual CPU mesh (conftest.py).

SURVEY §2.8 contract: one pjit program over a `scenario` mesh axis — rollout
sharded data-parallel, params replicated, gradient reduction via the psum XLA
inserts. These tests assert the sharded programs produce the same numbers as
their single-device counterparts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rift_tpu.map import make_grid_town
from rift_tpu.parallel import make_mesh, replicate, shard_batch
from rift_tpu.rl import TrainConfig
from rift_tpu.runner import Runner, RunnerConfig


def _runner(shard: bool, S=8):
    tmap = make_grid_town(blocks=1, num_lanes=1)
    cfg = RunnerConfig(
        num_scenarios=S,
        num_agents=6,
        max_cbvs=2,
        encoder_depth=1,
        decoder_depth=1,
        buffer_capacity=32,
        train=TrainConfig(epochs=1, warmup_epochs=1, batch_size=8),
        seed=3,
        shard=shard,
    )
    return Runner(tmap, cfg)


def test_mesh_uses_all_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("scenario",)


def test_shard_batch_places_leading_axis():
    mesh = make_mesh()
    x = {"a": jnp.zeros((16, 3)), "b": jnp.zeros((16,))}
    sx = shard_batch(x, mesh)
    for leaf in jax.tree.leaves(sx):
        assert leaf.sharding.is_fully_replicated is False
        # leading dim split 8 ways
        shard_shape = leaf.sharding.shard_shape(leaf.shape)
        assert shard_shape[0] == 2
    p = replicate({"w": jnp.ones((4, 4))}, mesh)
    assert p["w"].sharding.is_fully_replicated


def test_sharded_rollout_matches_unsharded():
    from rift_tpu.rollout import rollout_chunk

    r1 = _runner(shard=False)
    r2 = _runner(shard=True)
    assert r2.mesh is not None

    s1, c1, sp1 = r1.init_params()
    s2, c2, sp2 = r2.init_params()
    # same seeds -> identical resets
    np.testing.assert_allclose(np.asarray(s1.pos), np.asarray(s2.pos))

    s1, c1, _ = rollout_chunk(r1.model, r1.params, r1.tmap, sp1, s1, c1,
                              max_cbvs=2, num_steps=5)
    s2, c2, _ = rollout_chunk(r2.model, r2.params, r2.tmap, sp2, s2, c2,
                              max_cbvs=2, num_steps=5)
    np.testing.assert_allclose(
        np.asarray(s1.pos), np.asarray(s2.pos), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(c1.driven_meters), np.asarray(c2.driven_meters),
        rtol=1e-4, atol=1e-4,
    )


def test_sharded_train_step_matches_unsharded():
    """One fused train round: grads psum-reduced across shards must equal the
    single-device gradient."""
    from rift_tpu.rl import fit, ring_append, ring_init

    r1 = _runner(shard=False)
    r2 = _runner(shard=True)
    # f32 compute for this test: exact-ish grads isolate sharding errors
    # from bf16 reduction noise
    r1.model = r1.model.clone(dtype=None)
    r2.model = r2.model.clone(dtype=None)
    s1, _, sp1 = r1.init_params()
    r2.init_params()
    # params are identical (same seed); build one deterministic batch
    from rift_tpu.models.pluto.policy import pluto_cbv_act

    from rift_tpu.scenario import wake_all_bvs

    s1 = wake_all_bvs(s1)
    st = s1.replace(
        is_cbv=s1.is_cbv.at[:, 1].set(s1.alive[:, 1]),
        goal=s1.goal.at[:, 1].set(s1.pos[:, 1] + 40.0),
        goal_valid=s1.goal_valid.at[:, 1].set(s1.alive[:, 1]),
    )
    res = pluto_cbv_act(r1.model, r1.params, r1.tmap, sp1, st,
                        max_cbvs=2, train=True)
    S, C = res["cbv_slots"].shape
    flat = lambda x: x.reshape((S * C,) + x.shape[2:])
    samples = {
        "features": jax.tree.map(flat, res["features"]),
        "old_logits": flat(res["old_logits"]),
        "advantage": flat(res["advantage"]),
        "valid": flat(res["adv_valid"]),
    }
    ok = jnp.ones(S * C, bool)

    # gradients are linear in the batch reduction: a missing psum would show
    # up as a ~n_devices-factor error here (post-Adam params are a bad probe —
    # Adam normalizes away gradient scale and amplifies bf16 noise to lr-scale)
    def loss_of(r, batch):
        return r._rift_loss_fn(r.params, batch, None)

    g1 = jax.jit(jax.grad(lambda p, b: r1._rift_loss_fn(p, b, None)))(
        r1.params, samples
    )
    sharded_samples = shard_batch(samples, r2.mesh)
    g2 = jax.jit(jax.grad(lambda p, b: r2._rift_loss_fn(p, b, None)))(
        r2.params, sharded_samples
    )
    # a missing psum would scale grads ~n_devices on every element — far
    # outside this band; the slack only absorbs bf16 reduction-order noise
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-7
        )

    # and the full fit runs under the mesh with matching losses
    losses = {}
    for name, r in [("single", r1), ("sharded", r2)]:
        buf = ring_init(jax.tree.map(lambda x: x[0], samples), capacity=16)
        buf = ring_append(buf, samples, ok)
        _, ls = fit(
            r.params, buf, r._rift_loss_fn, r.cfg.train,
            jax.random.PRNGKey(7), mesh=r.mesh,
        )
        losses[name] = ls
    np.testing.assert_allclose(
        losses["single"], losses["sharded"], rtol=5e-2, atol=1e-8
    )


def test_runner_episode_under_mesh():
    """End-to-end: a sharded Runner episode runs and registers statistics."""
    r = _runner(shard=True)
    r.cfg.max_episode_ticks = 20
    r.run_episode(train=False, chunk=5)
    assert len(r.stats.records) == 8
