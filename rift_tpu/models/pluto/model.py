"""Pluto planner in Flax.

Architecture parity with the reference PlanningModel
(rift/cbv/planning/pluto/model/pluto_model.py: dim 128, 21 history steps, 80
future steps, 4 encoder + 4 decoder layers, 12 modes, reference-line x mode
query decoder with a trainable `pi` head), rebuilt for TPU: everything is
dense, masked, static-shape; boolean indexing becomes where-masking; natten
becomes banded attention (see layers.py).

Feature dict layout (produced by rift_tpu.models.pluto.features):
  agent:     position [B,A,T,2] heading [B,A,T] velocity [B,A,T,2]
             shape [B,A,T,2] category [B,A] valid_mask [B,A,T]
  map:       point_position [B,M,3,P,2] point_vector [B,M,3,P,2]
             point_orientation [B,M,3,P] polygon_center [B,M,3]
             polygon_type/on_route/tl_status/has_speed_limit/speed_limit [B,M]
             valid_mask [B,M,P]
  reference_line: position [B,R,N,2] vector [B,R,N,2] orientation [B,R,N]
             valid_mask [B,R,N]
  static_objects: position [B,N_s,2] heading [B,N_s] shape [B,N_s,2]
             category [B,N_s] valid_mask [B,N_s]
  current_state: [B, 7]
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Attention,
    FourierEmbedding,
    HistoryEncoder,
    MLPLayer,
    PointsEncoder,
    StateAttentionEncoder,
    TransformerEncoderLayer,
)


def _wrap(a):
    return (a + math.pi) % (2 * math.pi) - math.pi


class AgentEncoder(nn.Module):
    """Vectorized history differences -> temporal encoder -> agent tokens
    (reference modules/agent_encoder.py)."""

    dim: int = 128
    state_channel: int = 6
    hist_steps: int = 21
    drop_path: float = 0.2
    state_dropout: float = 0.75
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, data, deterministic: bool = True):
        T = self.hist_steps
        category = data["agent"]["category"].astype(jnp.int32)
        valid_mask = data["agent"]["valid_mask"][:, :, :T]
        hist_enc = HistoryEncoder(
            embed_dim=self.dim // 4, drop_path_rate=self.drop_path,
            dtype=self.dtype,
        )

        if "shared" in data and "hist_feat" in data["shared"]:
            # canonical mode, deduplicated path: encode each WORLD agent's
            # own-frame history once, gather tokens per CBV slot
            hf = data["shared"]["hist_feat"]  # [S, A_w, T-1, 9]
            S, A_w, Tm1, C = hf.shape
            tok = hist_enc(hf.reshape(S * A_w, Tm1, C), deterministic)
            tok = tok.reshape(S, A_w, self.dim)
            scen = data["shared"]["scen_idx"]  # [B]
            x = tok[scen[:, None], data["agent"]["order"]]  # [B, A, D]
        elif "hist_feat" in data["agent"]:
            # canonical mode, per-sample path (buffered fit samples)
            feat = data["agent"]["hist_feat"]  # [B, A, T-1, 9]
            B, A, Tm1, C = feat.shape
            x = hist_enc(
                feat.reshape(B * A, Tm1, C), deterministic
            ).reshape(B, A, self.dim)
        else:
            position = data["agent"]["position"][:, :, :T]
            heading = data["agent"]["heading"][:, :, :T]
            velocity = data["agent"]["velocity"][:, :, :T]
            shape = data["agent"]["shape"][:, :, :T]

            vec_mask = valid_mask[..., :-1] & valid_mask[..., 1:]

            def to_vec(feat):
                d = feat[:, :, 1:] - feat[:, :, :-1]
                m = vec_mask
                while m.ndim < d.ndim:
                    m = m[..., None]
                return jnp.where(m, d, 0.0)

            heading_vec = to_vec(heading)
            feat = jnp.concatenate(
                [
                    to_vec(position),
                    to_vec(velocity),
                    jnp.stack(
                        [jnp.cos(heading_vec), jnp.sin(heading_vec)], axis=-1
                    ),
                    shape[:, :, 1:],
                    vec_mask[..., None].astype(jnp.float32),
                ],
                axis=-1,
            )  # [B, A, T-1, 9]
            B, A, Tm1, C = feat.shape
            x = hist_enc(
                feat.reshape(B * A, Tm1, C), deterministic
            ).reshape(B, A, self.dim)
        x = jnp.where(valid_mask.any(-1)[..., None], x, 0.0)

        # ego token from current state channels (use_ego_history=False path)
        ego = StateAttentionEncoder(
            self.state_channel, self.dim, self.state_dropout, dtype=self.dtype
        )(data["current_state"][:, : self.state_channel], deterministic)
        x = x.at[:, 0].set(ego)

        type_emb = nn.Embed(4, self.dim, dtype=self.dtype)(category)
        return x + type_emb


class MapEncoder(nn.Module):
    """Polygon tokens from boundary-aware point features
    (reference modules/map_encoder.py, use_lane_boundary=True)."""

    dim: int = 128
    dtype: Optional[jnp.dtype] = None
    points_norm: str = "ln"

    @nn.compact
    def __call__(self, data):
        m = data.get("map", {})
        pe = PointsEncoder(self.dim, dtype=self.dtype, norm=self.points_norm)
        type_emb = nn.Embed(3, self.dim, name="type_emb", dtype=self.dtype)
        speed_emb_mod = FourierEmbedding(
            self.dim, 64, name="speed_emb", dtype=self.dtype
        )
        unknown = self.param(
            "unknown_speed_emb", nn.initializers.normal(0.02), (self.dim,)
        )

        def per_slot_embeds():
            on_route_e = nn.Embed(
                2, self.dim, name="on_route_emb", dtype=self.dtype
            )(m["polygon_on_route"].astype(jnp.int32))
            tl_e = nn.Embed(4, self.dim, name="tl_emb", dtype=self.dtype)(
                m["polygon_tl_status"].astype(jnp.int32)
            )
            return on_route_e, tl_e

        if "shared" in data and "map_feat" in data["shared"]:
            # canonical mode, deduplicated path: one frame-invariant token
            # per map lane, gathered per CBV polygon slot
            sh = data["shared"]
            if "map_tok" in sh:
                # tokens precomputed once per episode (eval / between fits:
                # params and tmap are frozen, so the per-lane PointsEncoder
                # output is tick-invariant — models/pluto/policy.py
                # canonical_map_tokens)
                tok = sh["map_tok"].astype(self.dtype or jnp.float32)
            else:
                mf = sh["map_feat"]  # [L, P, 10]
                L, P, _ = mf.shape
                tok = pe(mf[None], jnp.ones((1, L, P), bool))[0]  # [L, D]
                tok = tok + type_emb(sh["map_type"].astype(jnp.int32))
                tok = tok + speed_emb_mod(sh["map_speed"][..., None])
            if "map_tokens_only" in data:
                return tok
            on_route_e, tl_e = per_slot_embeds()
            x = tok[m["lane_idx"]]  # [B, M, D]
            return x + on_route_e + tl_e
        if "canonical_feat" in m:
            # canonical mode, per-sample path (buffered fit samples)
            feat = m["canonical_feat"]  # [B, M, P, 10]
            x = pe(feat, jnp.ones(feat.shape[:-1], bool))
            x = x + type_emb(m["polygon_type"].astype(jnp.int32))
            x = x + speed_emb_mod(m["polygon_speed_limit"][..., None])
            on_route_e, tl_e = per_slot_embeds()
            return x + on_route_e + tl_e
        if True:
            center = m["polygon_center"]  # [B, M, 3]
            on_route_e, tl_e = per_slot_embeds()
            pt_pos = m["point_position"]  # [B, M, 3, P, 2]
            pt_vec = m["point_vector"]
            pt_ori = m["point_orientation"]
            valid = m["valid_mask"]  # [B, M, P]

            feat = jnp.concatenate(
                [
                    pt_pos[:, :, 0] - center[..., None, :2],
                    pt_vec[:, :, 0],
                    jnp.stack(
                        [jnp.cos(pt_ori[:, :, 0]), jnp.sin(pt_ori[:, :, 0])],
                        axis=-1,
                    ),
                    pt_pos[:, :, 1] - pt_pos[:, :, 0],
                    pt_pos[:, :, 2] - pt_pos[:, :, 0],
                ],
                axis=-1,
            )  # [B, M, P, 10]
            # legacy (reference-convention) path — add order preserved for
            # converted-checkpoint parity
            x = pe(feat, valid)
            x = x + type_emb(m["polygon_type"].astype(jnp.int32))
            x = x + on_route_e
            x = x + tl_e
            speed_emb = speed_emb_mod(m["polygon_speed_limit"][..., None])
            has = m["polygon_has_speed_limit"][..., None]
            x = x + jnp.where(has, speed_emb, unknown)
            return x


class StaticObjectsEncoder(nn.Module):
    """(reference modules/static_objects_encoder.py)"""

    dim: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, data):
        so = data["static_objects"]
        pos, heading = so["position"], so["heading"]
        emb = FourierEmbedding(self.dim, 64, dtype=self.dtype)(
            so["shape"]
        ) + nn.Embed(4, self.dim, dtype=self.dtype)(
            so["category"].astype(jnp.int32)
        )
        valid = so["valid_mask"]
        emb = jnp.where(valid[..., None], emb, 0.0)
        obj_pos = jnp.concatenate([pos, _wrap(heading)[..., None]], axis=-1)
        return emb, obj_pos, ~valid


class AgentPredictor(nn.Module):
    dim: int = 128
    future_steps: int = 80
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        loc = MLPLayer(2 * self.dim, self.future_steps * 2, dtype=self.dtype)(x)
        yaw = MLPLayer(2 * self.dim, self.future_steps * 2, dtype=self.dtype)(x)
        vel = MLPLayer(2 * self.dim, self.future_steps * 2, dtype=self.dtype)(x)
        out = jnp.concatenate(
            [
                loc.reshape(B, N, self.future_steps, 2),
                yaw.reshape(B, N, self.future_steps, 2),
                vel.reshape(B, N, self.future_steps, 2),
            ],
            axis=-1,
        )
        return out


class DecoderLayer(nn.Module):
    """R2R self-attn, M2M self-attn, cross-attn, FFN
    (reference modules/planning_decoder.py:DecoderLayer)."""

    dim: int
    num_heads: int
    mlp_ratio: int
    dropout: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, tgt, memory, r_key_padding, memory_key_padding, m_pos, deterministic=True
    ):
        B, R, M, D = tgt.shape
        # r2r: attend across reference lines (batched over modes)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(tgt)
        h = h.transpose(0, 2, 1, 3).reshape(B * M, R, D)
        pad = jnp.repeat(r_key_padding, M, axis=0)  # (B*M, R)
        h = Attention(self.dim, self.num_heads, self.dropout, name="r2r",
                      dtype=self.dtype)(
            h, key_padding_mask=pad, deterministic=deterministic
        )
        h = h.reshape(B, M, R, D).transpose(0, 2, 1, 3)
        tgt = tgt + h

        # m2m: attend across modes (batched over reference lines)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(tgt)
        h = h.reshape(B * R, M, D)
        hq = h + m_pos
        h = Attention(self.dim, self.num_heads, self.dropout, name="m2m",
                      dtype=self.dtype)(
            hq, hq, h, deterministic=deterministic
        )
        h = h.reshape(B, R, M, D)
        h = jnp.where(r_key_padding[:, :, None, None], 0.0, h)
        tgt = tgt + h

        # cross-attention to the scene encoding
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(tgt).reshape(B, R * M, D)
        h = Attention(self.dim, self.num_heads, self.dropout, name="cross",
                      dtype=self.dtype)(
            h, memory, memory,
            key_padding_mask=memory_key_padding,
            deterministic=deterministic,
        ).reshape(B, R, M, D)
        tgt = tgt + h

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(tgt)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return tgt + h


class PlanningDecoder(nn.Module):
    """(reference modules/planning_decoder.py:PlanningDecoder)"""

    num_modes: int = 12
    depth: int = 4
    dim: int = 128
    num_heads: int = 4
    mlp_ratio: int = 4
    dropout: float = 0.1
    future_steps: int = 80
    cat_x: bool = True
    dtype: Optional[jnp.dtype] = None
    points_norm: str = "ln"

    @nn.compact
    def __call__(self, data, enc_emb, enc_key_padding, deterministic=True):
        r = data["reference_line"]
        r_pos, r_vec, r_ori, r_valid = (
            r["position"],
            r["vector"],
            r["orientation"],
            r["valid_mask"],
        )
        r_key_padding = ~r_valid.any(-1)  # (B, R)

        feat = jnp.concatenate(
            [
                r_pos - r_pos[..., 0:1, :],
                r_vec,
                jnp.stack([jnp.cos(r_ori), jnp.sin(r_ori)], axis=-1),
            ],
            axis=-1,
        )  # (B, R, N, 6)
        r_emb = PointsEncoder(
            self.dim, name="r_encoder", dtype=self.dtype, norm=self.points_norm
        )(feat, r_valid)
        r_pos_feat = jnp.concatenate(
            [r_pos[:, :, 0], r_ori[:, :, 0, None]], axis=-1
        )
        r_emb = r_emb + FourierEmbedding(
            self.dim, 64, name="r_pos_emb", dtype=self.dtype
        )(r_pos_feat)

        B, R, _ = r_emb.shape
        M = self.num_modes
        m_emb = self.param("m_emb", nn.initializers.normal(0.01), (1, 1, M, self.dim))
        m_pos = self.param("m_pos", nn.initializers.normal(0.01), (1, M, self.dim))

        q = jnp.concatenate(
            [jnp.broadcast_to(r_emb[:, :, None], (B, R, M, self.dim)),
             jnp.broadcast_to(m_emb, (B, R, M, self.dim))],
            axis=-1,
        )
        q = nn.Dense(self.dim, name="q_proj", dtype=self.dtype)(q)

        for i in range(self.depth):
            q = DecoderLayer(
                self.dim, self.num_heads, self.mlp_ratio, self.dropout,
                name=f"layer{i}", dtype=self.dtype,
            )(q, enc_emb, r_key_padding, enc_key_padding, m_pos, deterministic)

        if self.cat_x:
            x0 = enc_emb[:, 0][:, None, None]
            q = nn.Dense(self.dim, name="cat_x_proj", dtype=self.dtype)(
                jnp.concatenate(
                    [q, jnp.broadcast_to(x0, (B, R, M, self.dim)).astype(q.dtype)],
                    axis=-1,
                )
            )

        loc = MLPLayer(2 * self.dim, self.future_steps * 2, name="loc_head",
                       dtype=self.dtype)(q)
        yaw = MLPLayer(2 * self.dim, self.future_steps * 2, name="yaw_head",
                       dtype=self.dtype)(q)
        vel = MLPLayer(2 * self.dim, self.future_steps * 2, name="vel_head",
                       dtype=self.dtype)(q)
        pi = MLPLayer(self.dim, 1, name="pi_head", dtype=self.dtype)(q)[..., 0]

        traj = jnp.concatenate(
            [
                loc.reshape(B, R, M, self.future_steps, 2),
                yaw.reshape(B, R, M, self.future_steps, 2),
                vel.reshape(B, R, M, self.future_steps, 2),
            ],
            axis=-1,
        )
        return traj.astype(jnp.float32), pi.astype(jnp.float32)


class PlutoModel(nn.Module):
    """The full planner (reference pluto_model.py:PlanningModel)."""

    dim: int = 128
    state_channel: int = 6
    history_steps: int = 21
    future_steps: int = 80
    encoder_depth: int = 4
    decoder_depth: int = 4
    num_heads: int = 4
    num_modes: int = 12
    drop_path: float = 0.2
    dropout: float = 0.1
    state_dropout: float = 0.75
    use_hidden_proj: bool = True
    ref_free_traj: bool = True
    # state-value head on the center-agent token — the ppo_pluto variant's
    # critic (reference ppo_trainer.py:126-184 adds a value head + GAE);
    # off by default so converted pretrained checkpoints stay structural
    value_head: bool = False
    # compute dtype: bf16 halves activation bandwidth / doubles MXU rate on
    # TPU; params and outputs stay float32
    dtype: Optional[jnp.dtype] = jnp.bfloat16
    # "none" when loading converted torch weights (BN folded into Linears)
    points_norm: str = "ln"

    @nn.compact
    def __call__(self, data: Dict[str, Any], deterministic: bool = True):
        if "map_tokens_only" in data:
            # canonical per-lane map tokens [L, D] only (params/tmap frozen
            # between fits -> precomputable once per episode; the auto
            # module name MapEncoder_0 matches the full forward's instance)
            return MapEncoder(
                self.dim, dtype=self.dtype, points_norm=self.points_norm
            )(data)
        if "cur_pos" in data["agent"]:  # canonical mode
            agent_pos = data["agent"]["cur_pos"]
            agent_heading = data["agent"]["cur_heading"]
        else:
            agent_pos = data["agent"]["position"][:, :, self.history_steps - 1]
            agent_heading = data["agent"]["heading"][
                :, :, self.history_steps - 1
            ]
        agent_mask = data["agent"]["valid_mask"][:, :, : self.history_steps]
        polygon_center = data["map"]["polygon_center"]
        polygon_mask = data["map"]["valid_mask"]

        B, A = agent_pos.shape[:2]

        position = jnp.concatenate([agent_pos, polygon_center[..., :2]], axis=1)
        angle = jnp.concatenate([agent_heading, polygon_center[..., 2]], axis=1)
        pos = jnp.concatenate([position, _wrap(angle)[..., None]], axis=-1)

        agent_key_padding = ~agent_mask.any(-1)
        polygon_key_padding = ~polygon_mask.any(-1)

        x_agent = AgentEncoder(
            self.dim, self.state_channel, self.history_steps,
            self.drop_path, self.state_dropout, dtype=self.dtype,
        )(data, deterministic)
        x_polygon = MapEncoder(
            self.dim, dtype=self.dtype, points_norm=self.points_norm
        )(data)
        x_static, static_pos, static_key_padding = StaticObjectsEncoder(
            self.dim, dtype=self.dtype
        )(data)

        x = jnp.concatenate([x_agent, x_polygon, x_static], axis=1)
        pos = jnp.concatenate([pos, static_pos], axis=1)
        key_padding_mask = jnp.concatenate(
            [agent_key_padding, polygon_key_padding, static_key_padding], axis=-1
        )
        x = x + FourierEmbedding(self.dim, 64, name="pos_emb", dtype=self.dtype)(pos)

        for i in range(self.encoder_depth):
            rate = self.drop_path * i / max(self.encoder_depth - 1, 1)
            x = TransformerEncoderLayer(
                self.dim, self.num_heads, drop_path_rate=rate, name=f"enc{i}",
                dtype=self.dtype,
            )(x, key_padding_mask=key_padding_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="enc_norm", dtype=self.dtype)(x)

        # the agent-prediction AUX head only feeds training losses (reference
        # pluto_model.py computes it unconditionally and eval discards it);
        # data["no_aux"] skips it in the rollout-eval forward. nn.cond-free:
        # the flag is a static dict key, so each variant traces its own
        # program. Params exist either way (init never passes no_aux).
        no_aux = "no_aux" in data
        if not no_aux:
            prediction = AgentPredictor(
                self.dim, self.future_steps, name="agent_predictor",
                dtype=self.dtype,
            )(x[:, 1:A]).astype(jnp.float32)

        trajectory, probability = PlanningDecoder(
            self.num_modes, self.decoder_depth, self.dim, self.num_heads,
            4, self.dropout, self.future_steps, cat_x=True,
            name="planning_decoder", dtype=self.dtype,
            points_norm=self.points_norm,
        )(data, x, key_padding_mask, deterministic)

        out = {
            "trajectory": trajectory,  # (B, R, M, T, 6)
            "probability": probability,  # (B, R, M)
        }
        if not no_aux:
            out["prediction"] = prediction  # (B, A-1, T, 6)

        if self.value_head:
            out["value"] = MLPLayer(
                self.dim, 1, name="value_head", dtype=self.dtype
            )(x[:, 0])[..., 0].astype(jnp.float32)

        if self.use_hidden_proj:
            h = nn.Dense(self.dim, name="hidden_proj_fc1", dtype=self.dtype)(x[:, 0])
            h = nn.relu(h)
            out["hidden"] = nn.Dense(
                self.dim, name="hidden_proj_fc2", dtype=self.dtype
            )(h).astype(jnp.float32)

        if self.ref_free_traj:
            rf = MLPLayer(
                2 * self.dim, self.future_steps * 4, name="ref_free_decoder",
                dtype=self.dtype,
            )(x[:, 0]).reshape(B, self.future_steps, 4).astype(jnp.float32)
            out["ref_free_trajectory"] = rf
            rf_angle = jnp.arctan2(rf[..., 3], rf[..., 2])
            out["output_ref_free_trajectory"] = jnp.concatenate(
                [rf[..., :2], rf_angle[..., None]], axis=-1
            )

        # world-frame prediction outputs (reference pluto_model.py:190-199)
        if not no_aux:
            out["output_prediction"] = jnp.concatenate(
                [
                    prediction[..., :2] + agent_pos[:, 1:A, None],
                    (
                        jnp.arctan2(prediction[..., 3], prediction[..., 2])
                        + agent_heading[:, 1:A, None]
                    )[..., None],
                    prediction[..., 4:6],
                ],
                axis=-1,
            )

        # mask invalid reference lines, emit best trajectory
        r_padding = ~data["reference_line"]["valid_mask"].any(-1)  # (B, R)
        probability = jnp.where(r_padding[:, :, None], -1e6, probability)
        out["probability"] = probability

        angle = jnp.arctan2(trajectory[..., 3], trajectory[..., 2])
        out_traj = jnp.concatenate([trajectory[..., :2], angle[..., None]], axis=-1)
        R, M = out_traj.shape[1:3]
        flat_prob = probability.reshape(B, R * M)
        best = jnp.argmax(flat_prob, axis=-1)
        out["output_trajectory"] = out_traj.reshape(B, R * M, self.future_steps, 3)[
            jnp.arange(B), best
        ]
        out["candidate_trajectories"] = out_traj
        return out
