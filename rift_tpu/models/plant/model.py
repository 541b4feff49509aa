"""PlanT object-token ego planner in Flax.

Re-design of the reference's HFLM (rift/ego/plant/model.py:22-366): object
tokens (vehicles + route segments, 6 attributes each) through a BERT-style
encoder; a CLS token feeds a GRU that autoregressively decodes waypoints
conditioned on the target point and a traffic-light flag; optional forecast
heads (discretized attribute classification) for pretraining. Attention
weights from the CLS token are exposed — they drive the attention-based CBV
recognizer (rift/cbv/recognition/attn_cbv.py ranks vehicles by PlanT-style
attention).

"PlanT_medium" ~ hidden 512, 8 layers, 8 heads.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..pluto.layers import Attention

NUM_ATTRIBUTES = 6  # x, y, yaw, speed-or-id, extent_x, extent_y
TYPE_PAD, TYPE_VEHICLE, TYPE_ROUTE = 0, 1, 2
LIDAR_OFFSET_X = 1.3  # vehicle -> lidar frame shift used by the reference


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        h = nn.LayerNorm()(x)
        h = Attention(self.dim, self.num_heads, self.dropout)(
            h, key_padding_mask=key_padding_mask, deterministic=deterministic
        )
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * 4)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


class PlanTModel(nn.Module):
    dim: int = 512
    num_layers: int = 8
    num_heads: int = 8
    pred_len: int = 4
    dropout: float = 0.1
    forecast_heads: bool = False
    attribute_vocab: int = 16  # 2^4 bins per attribute (precision 4)

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # [B, O, 1 + NUM_ATTRIBUTES] (type, attrs...)
        target_point: jnp.ndarray,  # [B, 2]
        light_hazard: jnp.ndarray,  # [B, 1]
        deterministic: bool = True,
    ):
        B, O, _ = tokens.shape
        token_type = tokens[..., 0].astype(jnp.int32)
        attrs = tokens[..., 1:]

        emb = nn.Dense(self.dim, name="tok_emb")(attrs)
        emb = emb + nn.Embed(3, self.dim, name="type_emb")(
            jnp.clip(token_type, 0, 2)
        )
        cls = self.param("cls_emb", nn.initializers.normal(0.02), (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), emb], axis=1)

        pad = jnp.concatenate(
            [jnp.zeros((B, 1), bool), token_type == TYPE_PAD], axis=1
        )
        attn_maps = []
        for i in range(self.num_layers):
            x = EncoderBlock(self.dim, self.num_heads, self.dropout, name=f"layer{i}")(
                x, key_padding_mask=pad, deterministic=deterministic
            )
        x = nn.LayerNorm(name="final_norm")(x)

        # CLS attention proxy for the recognizer: similarity of each token to
        # the CLS embedding after the encoder
        cls_vec = x[:, 0]
        attn_scores = jnp.einsum("bd,bod->bo", cls_vec, x[:, 1:]) / jnp.sqrt(
            self.dim
        )
        attn_scores = jnp.where(token_type == TYPE_PAD, -1e9, attn_scores)

        # waypoint GRU (model.py:260-283)
        z = nn.Dense(64, name="wp_head")(cls_vec)
        z = jnp.concatenate([z, light_hazard], axis=-1)  # [B, 65]
        gru = nn.GRUCell(features=65, name="wp_decoder")
        wp_output = nn.Dense(2, name="wp_output")
        wp = jnp.zeros((B, 2))
        outputs = []
        for _ in range(self.pred_len):
            x_in = jnp.concatenate([wp, target_point], axis=-1)  # [B, 4]
            z, _ = gru(z, x_in)
            wp = wp + wp_output(z)
            outputs.append(wp)
        pred_wp = jnp.stack(outputs, axis=1)  # [B, pred_len, 2]
        pred_wp = pred_wp.at[..., 0].add(-LIDAR_OFFSET_X)

        out = {"pred_wp": pred_wp, "attn_scores": attn_scores, "cls": cls_vec}

        if self.forecast_heads:
            logits = [
                nn.Dense(self.attribute_vocab, name=f"forecast_head{i}")(x[:, 1:])
                for i in range(NUM_ATTRIBUTES)
            ]
            out["forecast_logits"] = jnp.stack(logits, axis=-2)  # [B,O,A,V]
        return out
