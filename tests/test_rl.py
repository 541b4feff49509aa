import jax
import jax.numpy as jnp
import numpy as np

from rift_tpu.rl import (
    TrainConfig,
    fit,
    gae,
    gather_batch,
    grpo_loss,
    make_optimizer,
    ppo_candidate_loss,
    reinforce_loss,
    rift_loss,
    ring_append,
    ring_init,
    ring_reset,
    sample_batches,
    sft_loss,
    trainable_mask,
)


def _fake_batch(bs=4, R=3, M=4, key=0):
    k = jax.random.split(jax.random.PRNGKey(key), 4)
    prob = jax.random.normal(k[0], (bs, R, M))
    r_padding = jnp.zeros((bs, R), bool).at[:, -1].set(True)
    old = prob + 0.1 * jax.random.normal(k[1], (bs, R, M))
    adv = jax.random.normal(k[2], (bs, R, M))
    valid = ~jnp.broadcast_to(r_padding[:, :, None], (bs, R, M))
    return prob, r_padding, old, adv, valid


# ------------------------------------------------------------------- losses
def test_rift_loss_finite_and_zero_at_old_policy():
    prob, pad, old, adv, valid = _fake_batch()
    l = rift_loss(prob, pad, old, adv, valid)
    assert bool(jnp.isfinite(l))
    # at ratio == 1 and advantage A: objective = A (unclipped) for A>=0,
    # and max(A, 3A)=A for A<0 -> loss = -mean(A)
    l_same = rift_loss(prob, pad, prob, adv, valid)
    expected = -float((adv * valid).sum() / valid.sum())
    np.testing.assert_allclose(float(l_same), expected, atol=1e-5)


def test_rift_loss_dual_clip_bounds_negative():
    prob, pad, old, _, valid = _fake_batch()
    adv = -jnp.ones_like(valid, dtype=jnp.float32)
    # extreme ratio: current logits strongly favor one action
    extreme = prob + 10.0
    l = rift_loss(extreme, pad, old, adv, valid)
    # dual clip bounds each negative-advantage objective at 3*A = -3
    assert float(l) <= 3.0 + 1e-5


def test_rift_gradient_flows():
    prob, pad, old, adv, valid = _fake_batch()
    g = jax.grad(lambda p: rift_loss(p, pad, old, adv, valid))(prob)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_grpo_loss_kl_pulls_to_ref():
    prob, pad, old, adv, valid = _fake_batch()
    zero_adv = jnp.zeros_like(adv)
    # with zero advantage, the loss is pure KL: minimized when pi == ref
    l_at_ref = grpo_loss(prob, pad, old, prob, zero_adv, valid)
    l_off_ref = grpo_loss(prob, pad, old, prob + 2.0 * _fake_batch(key=7)[0], zero_adv, valid)
    assert float(l_at_ref) < float(l_off_ref)


def test_reinforce_loss_direction():
    prob, pad, _, _, _ = _fake_batch()
    bs = prob.shape[0]
    chosen = jnp.zeros(bs, jnp.int32)
    ret = jnp.ones(bs)
    g = jax.grad(lambda p: reinforce_loss(p, pad, chosen, ret))(prob)
    # positive return -> gradient pushes chosen logit up (negative grad of loss)
    assert float(g[0, 0, 0]) < 0


def test_ppo_candidate_loss_runs():
    prob, pad, old, _, _ = _fake_batch()
    bs = prob.shape[0]
    l = ppo_candidate_loss(
        prob, pad,
        chosen_idx=jnp.zeros(bs, jnp.int32),
        old_log_prob=jnp.full(bs, -2.0),
        advantage=jnp.ones(bs),
        value_pred=jnp.zeros(bs),
        reward_sum=jnp.ones(bs),
    )
    assert bool(jnp.isfinite(l))


def test_sft_loss_decreases_with_confidence():
    prob, pad, _, _, _ = _fake_batch()
    bs = prob.shape[0]
    teacher = jnp.zeros(bs, jnp.int32)
    l1 = sft_loss(prob, pad, teacher)
    boosted = prob.at[:, 0, 0].add(5.0)
    l2 = sft_loss(boosted, pad, teacher)
    assert float(l2) < float(l1)


def test_gae_matches_reference_recursion():
    T = 6
    rewards = jnp.asarray(np.random.default_rng(0).normal(size=T).astype(np.float32))
    values = jnp.asarray(np.random.default_rng(1).normal(size=T + 1).astype(np.float32))
    dones = jnp.zeros(T).at[3].set(1.0)
    adv, ret = gae(rewards, values, dones, gamma=0.9, lam=0.8)
    # slow reference
    adv_ref = np.zeros(T)
    acc = 0.0
    for t in reversed(range(T)):
        nd = 1.0 - float(dones[t])
        delta = float(rewards[t]) + 0.9 * float(values[t + 1]) * nd - float(values[t])
        acc = delta + 0.9 * 0.8 * nd * acc
        adv_ref[t] = acc
    np.testing.assert_allclose(np.asarray(adv), adv_ref, atol=1e-5)


# ------------------------------------------------------------------- buffer
def test_ring_buffer_append_and_wrap():
    spec = {"x": jnp.zeros((3,)), "y": jnp.zeros((), jnp.int32)}
    buf = ring_init(spec, capacity=8)
    for i in range(3):
        samples = {
            "x": jnp.full((4, 3), float(i)),
            "y": jnp.full((4,), i, jnp.int32),
        }
        valid = jnp.array([True, True, True, i > 0])  # 3, 4, 4 appended
        buf = ring_append(buf, samples, valid)
    assert int(buf.size) == 8  # capped at capacity
    assert bool(buf.full)
    # ring wrapped: ptr = (3+4+4) % 8 = 3
    assert int(buf.ptr) == 3
    # oldest surviving entries were overwritten by i=2
    ys = np.asarray(buf.data["y"])
    assert (ys >= 0).all() and ys.max() == 2


def test_ring_buffer_invalid_not_written():
    spec = {"x": jnp.zeros(())}
    buf = ring_init(spec, capacity=4)
    buf = ring_append(
        buf, {"x": jnp.array([1.0, 2.0, 3.0])}, jnp.array([True, False, True])
    )
    assert int(buf.size) == 2
    np.testing.assert_allclose(np.asarray(buf.data["x"][:2]), [1.0, 3.0])
    buf = ring_reset(buf)
    assert int(buf.size) == 0


def test_sample_and_gather():
    spec = {"x": jnp.zeros(())}
    buf = ring_init(spec, capacity=16)
    buf = ring_append(buf, {"x": jnp.arange(10.0)}, jnp.ones(10, bool))
    idx = sample_batches(buf, jax.random.PRNGKey(0), batch_size=4, num_batches=3)
    assert idx.shape == (3, 4)
    assert int(idx.max()) < 10
    batch = gather_batch(buf, idx[0])
    assert batch["x"].shape == (4,)


# ------------------------------------------------------------------- trainer
def test_trainable_mask_and_fit_only_updates_pi_head():
    from rift_tpu.models.pluto import PlutoModel
    from tests.test_pluto_model import make_feature_batch

    model = PlutoModel(encoder_depth=1, decoder_depth=1)
    data = make_feature_batch(B=2, key=5)
    params = model.init(jax.random.PRNGKey(0), data)

    mask = trainable_mask(params, ("planning_decoder/pi_head",))
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    n_trainable = sum(1 for p, v in flat if v)
    assert 0 < n_trainable < len(flat)

    # buffer of RIFT samples built from the fixed feature batch
    bs, R, M = 2, 4, 12
    spec = {
        "features": jax.tree.map(lambda x: x[0], data),
        "old_logits": jnp.zeros((R, M)),
        "advantage": jnp.zeros((R, M)),
        "valid": jnp.zeros((R, M), bool),
    }
    buf = ring_init(spec, capacity=8)
    samples = {
        "features": data,
        "old_logits": jnp.zeros((bs, R, M)),
        "advantage": jax.random.normal(jax.random.PRNGKey(1), (bs, R, M)),
        "valid": jnp.ones((bs, R, M), bool).at[:, -1].set(False),
    }
    buf = ring_append(buf, samples, jnp.ones(bs, bool))

    def loss_fn(p, batch, rng):
        out = model.apply(p, batch["features"])
        r_pad = ~batch["features"]["reference_line"]["valid_mask"].any(-1)
        return rift_loss(
            out["probability"], r_pad, batch["old_logits"],
            batch["advantage"], batch["valid"],
        )

    cfg = TrainConfig(epochs=2, warmup_epochs=1, batch_size=2)
    new_params, losses = fit(params, buf, loss_fn, cfg, jax.random.PRNGKey(2))
    assert len(losses) == 2 and all(np.isfinite(losses))

    # only pi_head params changed
    diffs = jax.tree_util.tree_map_with_path(
        lambda pth, a, b: (np.abs(np.asarray(a) - np.asarray(b)).max(), str(pth)),
        params, new_params,
    )
    for (d, pth) in jax.tree.leaves(diffs, is_leaf=lambda x: isinstance(x, tuple)):
        if "pi_head" in pth:
            continue
        assert d == 0.0, f"frozen param changed: {pth}"
    pi_changed = [
        d for d, pth in jax.tree.leaves(
            diffs, is_leaf=lambda x: isinstance(x, tuple)
        ) if "pi_head" in pth
    ]
    assert any(d > 0 for d in pi_changed)
