"""Torch->Flax Pluto weight converter tests.

Two layers of protection:
  * module-level parity: real torch modules (MultiheadAttention, Linear/LN
    stacks, BatchNorm folding, Conv1d) vs the flax blocks fed converted
    weights — validates every tensor transform numerically;
  * full-tree structure: a fabricated reference state dict (key names/shapes
    from rift/cbv/planning/pluto/model/*) converts into exactly the
    PlutoModel(points_norm="none") parameter tree and the model runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from rift_tpu.models.pluto.convert import (  # noqa: E402
    _fold_bn_into_linear,
    _mha,
    _mlp_layer,
    check_against_template,
    convert_state_dict,
)
from rift_tpu.models.pluto.layers import Attention, MLPLayer  # noqa: E402

torch.manual_seed(0)


def _sd(module, prefix=""):
    return {
        (prefix + k if not prefix else f"{prefix}.{k}"): v.detach().numpy()
        for k, v in module.state_dict().items()
    }


# ---------------------------------------------------------------------------
def test_mha_parity():
    D, H, B, N = 128, 4, 2, 7
    mha = tnn.MultiheadAttention(D, H, batch_first=True)
    x = torch.randn(B, N, D)
    with torch.no_grad():
        want = mha(x, x, x)[0].numpy()

    sd = {"attn." + k: v for k, v in _sd(mha).items()}
    params = {"params": _mha(sd, "attn", H)}
    got = Attention(D, H).apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_mlp_layer_parity_and_bn_fold():
    # reference MLPLayer: Linear -> LayerNorm -> ReLU -> Linear
    m = tnn.Sequential(tnn.Linear(16, 32), tnn.LayerNorm(32), tnn.ReLU(), tnn.Linear(32, 8))
    holder = tnn.Module()
    holder.mlp = m
    x = torch.randn(5, 16)
    with torch.no_grad():
        want = m(x).numpy()
    params = {"params": _mlp_layer({"h." + k: v for k, v in _sd(holder).items()}, "h")}
    got = MLPLayer(32, 8).apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    # BatchNorm folding: Linear -> BN(eval) == folded Linear
    lin = tnn.Linear(16, 32)
    bn = tnn.BatchNorm1d(32)
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.normal_()
    bn.bias.data.normal_()
    bn.eval()
    with torch.no_grad():
        want = bn(lin(x)).numpy()
    sd = {"lin." + k: v.detach().numpy() for k, v in lin.state_dict().items()}
    sd |= {"bn." + k: v.detach().numpy() for k, v in bn.state_dict().items()}
    k, b = _fold_bn_into_linear(sd, "lin", "bn")
    got = x.numpy() @ k + b
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv1d_parity():
    from flax import linen as nn

    conv = tnn.Conv1d(9, 32, kernel_size=3, padding=1)
    x = torch.randn(2, 9, 21)  # [B, C, T]
    with torch.no_grad():
        want = conv(x).numpy().transpose(0, 2, 1)  # [B, T, C]
    kernel = conv.weight.detach().numpy().transpose(2, 1, 0)
    bias = conv.bias.detach().numpy()
    got = nn.Conv(32, kernel_size=(3,), padding="SAME").apply(
        {"params": {"kernel": kernel, "bias": bias}},
        jnp.asarray(x.numpy().transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


# ---------------------------------------------------------------------------
# full-tree structural test on a fabricated reference state dict
# ---------------------------------------------------------------------------
def _fake_fourier(sd, key, c, dim=128, f=64):
    r = np.random.default_rng(abs(hash(key)) % 2**32)
    sd[f"{key}.freqs.weight"] = r.normal(size=(c, f)).astype(np.float32)
    for i in range(c):
        sd[f"{key}.mlps.{i}.0.weight"] = r.normal(size=(dim, 2 * f + 1), scale=0.02).astype(np.float32)
        sd[f"{key}.mlps.{i}.0.bias"] = np.zeros(dim, np.float32)
        sd[f"{key}.mlps.{i}.1.weight"] = np.ones(dim, np.float32)
        sd[f"{key}.mlps.{i}.1.bias"] = np.zeros(dim, np.float32)
        sd[f"{key}.mlps.{i}.3.weight"] = r.normal(size=(dim, dim), scale=0.02).astype(np.float32)
        sd[f"{key}.mlps.{i}.3.bias"] = np.zeros(dim, np.float32)
    sd[f"{key}.to_out.0.weight"] = np.ones(dim, np.float32)
    sd[f"{key}.to_out.0.bias"] = np.zeros(dim, np.float32)
    sd[f"{key}.to_out.2.weight"] = r.normal(size=(dim, dim), scale=0.02).astype(np.float32)
    sd[f"{key}.to_out.2.bias"] = np.zeros(dim, np.float32)


def _fake_linear(sd, key, cin, cout, scale=0.02):
    r = np.random.default_rng(abs(hash(key)) % 2**32)
    sd[f"{key}.weight"] = r.normal(size=(cout, cin), scale=scale).astype(np.float32)
    sd[f"{key}.bias"] = np.zeros(cout, np.float32)


def _fake_ln(sd, key, d):
    sd[f"{key}.weight"] = np.ones(d, np.float32)
    sd[f"{key}.bias"] = np.zeros(d, np.float32)


def _fake_bn(sd, key, d):
    r = np.random.default_rng(abs(hash(key)) % 2**32)
    sd[f"{key}.weight"] = np.ones(d, np.float32)
    sd[f"{key}.bias"] = np.zeros(d, np.float32)
    sd[f"{key}.running_mean"] = r.normal(size=d, scale=0.1).astype(np.float32)
    sd[f"{key}.running_var"] = np.ones(d, np.float32)
    sd[f"{key}.num_batches_tracked"] = np.asarray(1)


def _fake_mlp_layer(sd, key, cin, hidden, cout):
    _fake_linear(sd, f"{key}.mlp.0", cin, hidden)
    _fake_ln(sd, f"{key}.mlp.1", hidden)
    _fake_linear(sd, f"{key}.mlp.3", hidden, cout)


def _fake_points_encoder(sd, key, cin, dim=128):
    _fake_linear(sd, f"{key}.first_mlp.0", cin, 128)
    _fake_bn(sd, f"{key}.first_mlp.1", 128)
    _fake_linear(sd, f"{key}.first_mlp.3", 128, 256)
    _fake_linear(sd, f"{key}.second_mlp.0", 512, 256)
    _fake_bn(sd, f"{key}.second_mlp.1", 256)
    _fake_linear(sd, f"{key}.second_mlp.3", 256, dim)


def _fake_mha(sd, key, d=128):
    r = np.random.default_rng(abs(hash(key)) % 2**32)
    sd[f"{key}.in_proj_weight"] = r.normal(size=(3 * d, d), scale=0.02).astype(np.float32)
    sd[f"{key}.in_proj_bias"] = np.zeros(3 * d, np.float32)
    sd[f"{key}.out_proj.weight"] = r.normal(size=(d, d), scale=0.02).astype(np.float32)
    sd[f"{key}.out_proj.bias"] = np.zeros(d, np.float32)


def _fake_conv(sd, key, cin, cout, bias=True):
    r = np.random.default_rng(abs(hash(key)) % 2**32)
    sd[f"{key}.weight"] = r.normal(size=(cout, cin, 3), scale=0.05).astype(np.float32)
    if bias:
        sd[f"{key}.bias"] = np.zeros(cout, np.float32)


def _fake_nat_layer(sd, key, c, heads, k):
    r = np.random.default_rng(abs(hash(key)) % 2**32)
    _fake_ln(sd, f"{key}.norm1", c)
    sd[f"{key}.attn.qkv.weight"] = r.normal(size=(3 * c, c), scale=0.02).astype(np.float32)
    sd[f"{key}.attn.qkv.bias"] = np.zeros(3 * c, np.float32)
    sd[f"{key}.attn.rpb"] = r.normal(size=(heads, 2 * k - 1), scale=0.02).astype(np.float32)
    sd[f"{key}.attn.proj.weight"] = r.normal(size=(c, c), scale=0.02).astype(np.float32)
    sd[f"{key}.attn.proj.bias"] = np.zeros(c, np.float32)
    _fake_ln(sd, f"{key}.norm2", c)
    _fake_linear(sd, f"{key}.mlp.fc1", c, 3 * c)
    _fake_linear(sd, f"{key}.mlp.fc2", 3 * c, c)


def fake_reference_state_dict(dim=128, enc_depth=4, dec_depth=4):
    """Key names/shapes of the reference PlanningModel state dict
    (pluto_model.py + modules; fine_tuner loads the same keys)."""
    sd = {}
    _fake_fourier(sd, "pos_emb", 3)
    # agent encoder
    _fake_conv(sd, "agent_encoder.history_encoder.embed.proj", 9, 32)
    dims = [32, 32, 64, 64, 128, 128]
    heads = [2, 2, 4, 4, 8, 8]
    ks = [3, 3, 3, 3, 5, 5]
    for level in range(3):
        for i in range(2):
            _fake_nat_layer(
                sd, f"agent_encoder.history_encoder.levels.{level}.blocks.{i}",
                dims[2 * level], heads[2 * level], ks[2 * level],
            )
        _fake_ln(sd, f"agent_encoder.history_encoder.norm{level}", dims[2 * level])
        if level < 2:
            _fake_conv(
                sd,
                f"agent_encoder.history_encoder.levels.{level}.downsample.reduction",
                dims[2 * level], dims[2 * level] * 2, bias=False,
            )
            _fake_ln(
                sd,
                f"agent_encoder.history_encoder.levels.{level}.downsample.norm",
                dims[2 * level] * 2,
            )
    for j, d in enumerate((32, 64, 128)):
        _fake_conv(sd, f"agent_encoder.history_encoder.lateral_convs.{j}", d, 128)
    _fake_conv(sd, "agent_encoder.history_encoder.fpn_conv", 128, 128)
    for i in range(6):
        _fake_linear(sd, f"agent_encoder.ego_state_emb.linears.{i}", 1, dim)
    _fake_mha(sd, "agent_encoder.ego_state_emb.attn")
    r = np.random.default_rng(7)
    sd["agent_encoder.ego_state_emb.pos_embed"] = r.normal(size=(1, 6, dim), scale=0.02).astype(np.float32)
    sd["agent_encoder.ego_state_emb.query"] = r.normal(size=(1, 1, dim), scale=0.02).astype(np.float32)
    sd["agent_encoder.type_emb.weight"] = r.normal(size=(4, dim), scale=0.02).astype(np.float32)
    # map encoder
    _fake_points_encoder(sd, "map_encoder.polygon_encoder", 10)
    _fake_fourier(sd, "map_encoder.speed_limit_emb", 1)
    sd["map_encoder.type_emb.weight"] = r.normal(size=(3, dim), scale=0.02).astype(np.float32)
    sd["map_encoder.on_route_emb.weight"] = r.normal(size=(2, dim), scale=0.02).astype(np.float32)
    sd["map_encoder.traffic_light_emb.weight"] = r.normal(size=(4, dim), scale=0.02).astype(np.float32)
    sd["map_encoder.unknown_speed_emb.weight"] = r.normal(size=(1, dim), scale=0.02).astype(np.float32)
    # statics
    _fake_fourier(sd, "static_objects_encoder.obj_encoder", 2)
    sd["static_objects_encoder.type_emb.weight"] = r.normal(size=(4, dim), scale=0.01).astype(np.float32)
    # encoder blocks
    for i in range(enc_depth):
        _fake_ln(sd, f"encoder_blocks.{i}.norm1", dim)
        _fake_mha(sd, f"encoder_blocks.{i}.attn")
        _fake_ln(sd, f"encoder_blocks.{i}.norm2", dim)
        _fake_linear(sd, f"encoder_blocks.{i}.mlp.fc1", dim, 4 * dim)
        _fake_linear(sd, f"encoder_blocks.{i}.mlp.fc2", 4 * dim, dim)
    _fake_ln(sd, "norm", dim)
    # predictor + decoder
    for name in ("loc", "yaw", "vel"):
        _fake_mlp_layer(sd, f"agent_predictor.{name}_predictor", dim, 2 * dim, 160)
    _fake_fourier(sd, "planning_decoder.r_pos_emb", 3)
    _fake_points_encoder(sd, "planning_decoder.r_encoder", 6)
    _fake_linear(sd, "planning_decoder.q_proj", 2 * dim, dim)
    sd["planning_decoder.m_emb"] = r.normal(size=(1, 1, 12, dim), scale=0.01).astype(np.float32)
    sd["planning_decoder.m_pos"] = r.normal(size=(1, 12, dim), scale=0.01).astype(np.float32)
    _fake_linear(sd, "planning_decoder.cat_x_proj", 2 * dim, dim)
    for i in range(dec_depth):
        key = f"planning_decoder.decoder_blocks.{i}"
        for n in range(1, 5):
            _fake_ln(sd, f"{key}.norm{n}", dim)
        for attn in ("r2r_attn", "m2m_attn", "cross_attn"):
            _fake_mha(sd, f"{key}.{attn}")
        _fake_linear(sd, f"{key}.ffn.0", dim, 4 * dim)
        _fake_linear(sd, f"{key}.ffn.3", 4 * dim, dim)
    for name in ("loc", "yaw", "vel"):
        _fake_mlp_layer(sd, f"planning_decoder.{name}_head", dim, 2 * dim, 160)
    _fake_mlp_layer(sd, "planning_decoder.pi_head", dim, dim, 1)
    _fake_linear(sd, "hidden_proj.0", dim, dim)
    _fake_linear(sd, "hidden_proj.2", dim, dim)
    _fake_mlp_layer(sd, "ref_free_decoder", dim, 2 * dim, 320)
    return sd


def _fake_features(B=2):
    A, T, M, P, R, N = 4, 21, 6, 20, 4, 120
    r = np.random.default_rng(1)
    f32 = lambda *s: jnp.asarray(r.normal(size=s).astype(np.float32))
    return {
        "agent": {"position": f32(B, A, T, 2), "heading": f32(B, A, T),
                  "velocity": f32(B, A, T, 2), "shape": jnp.abs(f32(B, A, T, 2)),
                  "category": jnp.ones((B, A), jnp.int32),
                  "valid_mask": jnp.ones((B, A, T), bool)},
        "map": {"point_position": f32(B, M, 3, P, 2), "point_vector": f32(B, M, 3, P, 2),
                "point_orientation": f32(B, M, 3, P), "polygon_center": f32(B, M, 3),
                "polygon_type": jnp.zeros((B, M), jnp.int32),
                "polygon_on_route": jnp.zeros((B, M), bool),
                "polygon_tl_status": jnp.zeros((B, M), jnp.int32),
                "polygon_has_speed_limit": jnp.ones((B, M), bool),
                "polygon_speed_limit": jnp.abs(f32(B, M)),
                "valid_mask": jnp.ones((B, M, P), bool)},
        "reference_line": {"position": f32(B, R, N, 2), "vector": f32(B, R, N, 2),
                           "orientation": f32(B, R, N),
                           "valid_mask": jnp.ones((B, R, N), bool)},
        "static_objects": {"position": jnp.zeros((B, 1, 2)), "heading": jnp.zeros((B, 1)),
                           "shape": jnp.zeros((B, 1, 2)),
                           "category": jnp.zeros((B, 1), jnp.int32),
                           "valid_mask": jnp.zeros((B, 1), bool)},
        "current_state": f32(B, 7),
    }


def test_full_tree_convert_and_run():
    from rift_tpu.models.pluto.model import PlutoModel

    sd = fake_reference_state_dict()
    params = convert_state_dict(sd)

    model = PlutoModel(points_norm="none")
    feats = _fake_features()
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0), feats)
    problems = check_against_template(params, template)
    assert not problems, problems[:10]

    out = model.apply(jax.tree.map(jnp.asarray, params), feats)
    assert out["trajectory"].shape == (2, 4, 12, 80, 6)
    assert bool(jnp.isfinite(out["probability"]).all())
    assert bool(jnp.isfinite(out["trajectory"]).all())


def test_convert_rejects_leftovers():
    sd = fake_reference_state_dict()
    sd["unexpected.key"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconverted"):
        convert_state_dict(sd)
