"""E2E camera AV stacks: compact TPU-native UniAD / VAD / SparseDrive.

The reference vendors three full E2E driving stacks (rift/ego/b2d/
e2e_agent.py:20-142 + adzoo/{uniad,vad,sparsedrive}, ~130k LoC of mmcv)
whose CUDA hot ops we re-implemented as XLA composites in ops/e2e.py.
These models are their tpu-first counterparts, not ports: the same
architecture *shapes* (multi-camera features -> deformable perception ->
query-based planning) at framework scale, each variant consuming the op
its reference namesake is built around:

  uniad       query-chain: BEV (ms_deform_attn spatial cross-attention,
              BEVFormer-style) -> detection queries -> track/motion
              queries -> ego plan query -> GRU waypoints
  vad         vectorized planning: BEV -> ego query -> scored trajectory
              vocabulary, collision prior pooled under each candidate's
              end-pose via roi_align_rotated; argmax (eval) /
              softmax-blend (train)
  sparsedrive BEV-free sparse instance anchors refined by
              deformable_aggregation over the camera pyramid; rotated-NMS
              de-duplicated detections feed the plan query

All three share the conv backbone and emit `pred_wp [B, T, 2]` ego-frame
waypoints for the env's ego_traj interface (like PlanT), plus detection
outputs for the BC auxiliary loss.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ego.sensors import (
    IMG_H,
    IMG_W,
    NUM_CAMERAS,
    NUM_CHANNELS,
    project_points,
)
from ...ops.e2e import (
    deformable_aggregation,
    dynamic_scatter_mean,
    furthest_point_sample,
    knn,
    ms_deform_attn,
    nms3d,
    nms_rotated,
    roi_align_rotated,
    voxelize,
)

PRED_LEN = 4  # waypoints, 0.5 s apart (PlanT convention, plant/model.py)
WP_STRIDE_S = 0.5

# BEV grid: forward-biased ego-frame lattice
BEV_H, BEV_W = 16, 16
BEV_X0, BEV_X1 = -8.0, 56.0  # longitudinal extent (m)
BEV_Y0, BEV_Y1 = -32.0, 32.0  # lateral extent (m)

NUM_LEVELS = 2  # feature pyramid scales per camera
NUM_POINTS = 4  # deformable sampling points per level


def bev_cell_centers() -> np.ndarray:
    """[BEV_H * BEV_W, 2] ego-frame (x fwd, y left) cell centers."""
    xs = np.linspace(BEV_X0, BEV_X1, BEV_W, endpoint=False) + (
        (BEV_X1 - BEV_X0) / BEV_W / 2
    )
    ys = np.linspace(BEV_Y0, BEV_Y1, BEV_H, endpoint=False) + (
        (BEV_Y1 - BEV_Y0) / BEV_H / 2
    )
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gx, gy], -1).reshape(-1, 2).astype(np.float32)


class CameraBackbone(nn.Module):
    """Shared conv pyramid: [B, N_CAM, H, W, C] -> per-camera feature
    levels [(H/2, W/2, dim), (H/4, W/4, dim)] flattened for the
    deformable ops (value layout [B, num_keys, heads, head_dim])."""

    dim: int = 64
    num_heads: int = 4

    @nn.compact
    def __call__(self, imgs: jnp.ndarray):
        B = imgs.shape[0]
        x = imgs.reshape((B * NUM_CAMERAS, IMG_H, IMG_W, NUM_CHANNELS))
        x = nn.Conv(32, (3, 3), strides=2, name="conv1")(x)
        x = nn.relu(nn.LayerNorm(name="ln1")(x))
        l1 = nn.Conv(self.dim, (3, 3), name="proj1")(x)  # [*, H/2, W/2, D]
        x = nn.Conv(self.dim, (3, 3), strides=2, name="conv2")(x)
        x = nn.relu(nn.LayerNorm(name="ln2")(x))
        l2 = nn.Conv(self.dim, (3, 3), name="proj2")(x)  # [*, H/4, W/4, D]

        shapes = []  # [(cam, level) -> (h, w)] row-major by camera
        flat = []
        for cam in range(NUM_CAMERAS):
            row = []
            for lvl in (l1, l2):
                h, w = lvl.shape[1], lvl.shape[2]
                row.append((h, w))
                flat.append(
                    lvl.reshape(B, NUM_CAMERAS, h * w, self.dim)[:, cam]
                )
            shapes.append(row)
        value = jnp.concatenate(flat, axis=1)  # [B, sum hw, D]
        return value, shapes


def _value_heads(value: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    B, K, D = value.shape
    return value.reshape(B, K, num_heads, D // num_heads)


class BEVCrossAttention(nn.Module):
    """BEVFormer-style spatial cross-attention: each BEV query deform-
    samples the camera pyramid around its (static) projected anchor via
    ops.e2e.ms_deform_attn (the reference's
    mmcv/ops/csrc/pytorch/ms_deform_attn CUDA kernel)."""

    dim: int = 64
    num_heads: int = 4

    @nn.compact
    def __call__(self, queries, value, shapes, base_uv, in_view):
        # queries [B, Q, D]; base_uv [Q, N_CAM, 2]; in_view [Q, N_CAM]
        B, Q, D = queries.shape
        L = NUM_CAMERAS * NUM_LEVELS
        H, P = self.num_heads, NUM_POINTS

        off = nn.Dense(H * L * P * 2, name="sampling_offsets")(queries)
        off = off.reshape(B, Q, H, L, P, 2)
        attn = nn.Dense(H * L * P, name="attention_weights")(queries)
        attn = attn.reshape(B, Q, H, L, P)

        # anchor each (cam, level) at the camera projection; hide
        # out-of-view cameras from the softmax
        base = jnp.repeat(base_uv, NUM_LEVELS, axis=1)  # [Q, L, 2]
        vis = jnp.repeat(in_view, NUM_LEVELS, axis=1)  # [Q, L]
        loc = base[None, :, None, :, None] + off * 0.05
        attn = jnp.where(vis[None, :, None, :, None], attn, -1e9)
        attn = jax.nn.softmax(attn.reshape(B, Q, H, L * P), -1).reshape(
            B, Q, H, L, P
        )
        # all-hidden queries (point behind every camera) keep zero weight
        attn = attn * vis.any(-1)[None, :, None, None, None]

        flat_shapes = [hw for cam in shapes for hw in cam]
        out = ms_deform_attn(
            _value_heads(value, H), flat_shapes, loc, attn
        )  # [B, Q, D]
        return nn.Dense(D, name="out_proj")(out)


class TransformerBlock(nn.Module):
    dim: int = 64
    num_heads: int = 4

    @nn.compact
    def __call__(self, x, kv=None):
        kv = x if kv is None else kv
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim
        )(h, nn.LayerNorm()(kv))
        x = x + h
        h = nn.Dense(self.dim * 4)(nn.LayerNorm()(x))
        x = x + nn.Dense(self.dim)(nn.relu(h))
        return x


class DetectionHead(nn.Module):
    """Per-BEV-cell single-anchor detection: center offset, log-size, yaw
    and objectness; decode with rotated NMS (ops.e2e.nms_rotated — the
    reference's mmcv nms_rotated CUDA op)."""

    dim: int = 64
    top_k: int = 16

    @nn.compact
    def __call__(self, bev):  # [B, Q, D]
        reg = nn.Dense(6, name="reg")(bev)  # dx, dy, logw, logl, sin, cos
        score = nn.Dense(1, name="cls")(bev)[..., 0]
        centers = jnp.asarray(bev_cell_centers())
        cell = jnp.asarray(
            [(BEV_X1 - BEV_X0) / BEV_W, (BEV_Y1 - BEV_Y0) / BEV_H]
        )
        xy = centers + jnp.tanh(reg[..., :2]) * cell
        wl = jnp.exp(jnp.clip(reg[..., 2:4], -2.0, 2.0)) * 2.0
        yaw = jnp.arctan2(reg[..., 4], reg[..., 5])
        boxes = jnp.concatenate(
            [xy, wl, yaw[..., None]], -1
        )  # [B, Q, 5] (cx, cy, w, l, yaw)
        return boxes, score

    @staticmethod
    def decode(boxes, score, top_k=16, iou_thr=0.5):
        """NMS + top-k: ([B, k, 5] boxes, [B, k] scores; suppressed -> 0)."""

        def one(b, s):
            p = jax.nn.sigmoid(s)
            keep = nms_rotated(b, p, iou_threshold=iou_thr)
            ps = jnp.where(keep, p, 0.0)
            order = jnp.argsort(-ps)[:top_k]
            return b[order], ps[order]

        return jax.vmap(one)(boxes, score)


class WaypointGRU(nn.Module):
    """Autoregressive waypoint decoder conditioned on the target point
    (plant/model.py:260-283 convention)."""

    hidden: int = 65

    @nn.compact
    def __call__(self, z, target):
        B = z.shape[0]
        h = nn.Dense(self.hidden, name="init")(z)
        gru = nn.GRUCell(features=self.hidden, name="cell")
        in_proj = nn.Dense(self.hidden, name="in_proj")
        delta = nn.Dense(2, name="delta")
        wp = jnp.zeros((B, 2))
        out = []
        for _ in range(PRED_LEN):
            inp = jnp.concatenate([wp, target], -1)
            h, _ = gru(h, in_proj(inp))
            wp = wp + delta(h)
            out.append(wp)
        return jnp.stack(out, 1)  # [B, T, 2]


class E2EModel(nn.Module):
    """variant in {'uniad', 'vad', 'sparsedrive'}. __call__(imgs, target,
    speed) -> {'pred_wp', 'det_boxes', 'det_scores', ...}."""

    variant: str = "uniad"
    dim: int = 64
    num_heads: int = 4
    num_modes: int = 16  # VAD vocabulary size
    num_instances: int = 16  # UniAD track / SparseDrive anchor count

    @nn.compact
    def __call__(self, imgs, target, speed):
        value, shapes = CameraBackbone(
            self.dim, self.num_heads, name="backbone"
        )(imgs)
        ctx = jnp.concatenate([target / 30.0, speed[:, None] / 10.0], -1)
        if self.variant == "sparsedrive":
            return self._sparsedrive(value, shapes, ctx, target)
        bev = self._build_bev(value, shapes, imgs)
        if self.variant == "vad":
            return self._vad(bev, ctx, target)
        return self._uniad(bev, ctx, target)

    # --- dense BEV (uniad / vad) -----------------------------------------
    def _splat_bev(self, imgs):
        """Pillar-splat BEV prior from raw semantic pixels: every camera
        pixel's (static) ego-frame ground point + its semantic channels
        form a pseudo point cloud, hard-voxelized onto the BEV lattice and
        mean-pooled per pillar (LSS/PointPillars view transform via the
        reference's mmcv Voxelization op, ops/e2e.py:voxelize) ->
        [B, Q, dim]."""
        from ...ego.sensors import pixel_ground_table

        pts, hit = pixel_ground_table()
        N = NUM_CAMERAS * IMG_H * IMG_W
        xyz = jnp.concatenate(
            [pts.reshape(N, 2), jnp.zeros((N, 1), jnp.float32)], -1
        )
        hit_flat = hit.reshape(N)
        vx = (BEV_X1 - BEV_X0) / BEV_W
        vy = (BEV_Y1 - BEV_Y0) / BEV_H
        Q = BEV_H * BEV_W

        def one(img):
            feats = img.reshape(N, NUM_CHANNELS)
            valid = hit_flat & (feats[:, 0] > 0.5)  # CH_VALID
            points = jnp.concatenate([xyz, feats], -1)
            vox, coords, num, vvalid = voxelize(
                points, valid, voxel_size=(vx, vy, 4.0),
                pc_range=(BEV_X0, BEV_Y0, -2.0, BEV_X1, BEV_Y1, 2.0),
                max_voxels=Q, max_points=8,
            )
            m = jnp.arange(vox.shape[1])[None, :] < num[:, None]
            pillar = jnp.where(m[..., None], vox[..., 3:], 0.0).sum(1)
            pillar = pillar / jnp.maximum(num[:, None], 1)
            cell = coords[:, 1] * BEV_W + coords[:, 0]  # (iy, ix) row-major
            dense = jnp.zeros((Q + 1, NUM_CHANNELS), jnp.float32)
            dense = dense.at[jnp.where(vvalid, cell, Q)].add(
                jnp.where(vvalid[:, None], pillar, 0.0)
            )
            return dense[:Q]

        return nn.Dense(self.dim, name="pillar_splat")(jax.vmap(one)(imgs))

    def _scatter_l0(self, value, shapes):
        """Feature-splat BEV prior: level-0 backbone features mean-pooled
        into the BEV cell under each pixel's static ground point (the
        reference's mmcv DynamicScatter, ops/e2e.py:dynamic_scatter_mean)
        -> [B, Q, dim]."""
        from ...ego.sensors import pixel_ground_table

        pts, hit = pixel_ground_table()
        p0, h0 = pts[:, ::2, ::2], hit[:, ::2, ::2]  # level-0 grid (H/2)
        vx = (BEV_X1 - BEV_X0) / BEV_W
        vy = (BEV_Y1 - BEV_Y0) / BEV_H
        ix = jnp.floor((p0[..., 0] - BEV_X0) / vx).astype(jnp.int32)
        iy = jnp.floor((p0[..., 1] - BEV_Y0) / vy).astype(jnp.int32)
        ok = h0 & (ix >= 0) & (ix < BEV_W) & (iy >= 0) & (iy < BEV_H)
        vid = jnp.where(ok, iy * BEV_W + ix, -1).reshape(-1)

        feats, off = [], 0
        for cam in range(NUM_CAMERAS):
            for lvl, (h, w) in enumerate(shapes[cam]):
                if lvl == 0:
                    feats.append(value[:, off:off + h * w])
                off += h * w
        l0 = jnp.concatenate(feats, 1)  # [B, N_CAM*h0*w0, D]
        Q = BEV_H * BEV_W
        pooled = jax.vmap(lambda f: dynamic_scatter_mean(f, vid, Q))(l0)
        return nn.Dense(self.dim, name="l0_splat")(pooled)

    def _build_bev(self, value, shapes, imgs):
        Q = BEV_H * BEV_W
        centers = jnp.asarray(bev_cell_centers())
        base_uv, in_view = project_points(centers)  # static geometry
        emb = self.param(
            "bev_query", nn.initializers.normal(0.02), (Q, self.dim)
        )
        bev = jnp.broadcast_to(emb, (value.shape[0], Q, self.dim))
        # splat priors seed the queries before deformable refinement
        bev = bev + self._splat_bev(imgs) + self._scatter_l0(value, shapes)
        for i in range(2):
            bev = bev + BEVCrossAttention(
                self.dim, self.num_heads, name=f"sca_{i}"
            )(bev, value, shapes, base_uv, in_view)
            bev = TransformerBlock(self.dim, self.num_heads, name=f"self_{i}")(
                bev
            )
        return bev

    def _uniad(self, bev, ctx, target):
        B = bev.shape[0]
        det = DetectionHead(self.dim, name="det")
        boxes, score = det(bev)

        # track queries attend the BEV (det -> track -> motion chain)
        tq = self.param(
            "track_query",
            nn.initializers.normal(0.02),
            (self.num_instances, self.dim),
        )
        track = jnp.broadcast_to(tq, (B, self.num_instances, self.dim))
        for i in range(2):
            track = TransformerBlock(
                self.dim, self.num_heads, name=f"track_{i}"
            )(track, kv=bev)
        motion = nn.Dense(self.dim, name="motion")(track)

        # ego plan query attends motion + BEV
        pq = self.param(
            "plan_query", nn.initializers.normal(0.02), (1, self.dim)
        )
        plan = jnp.broadcast_to(pq, (B, 1, self.dim))
        plan = TransformerBlock(self.dim, self.num_heads, name="plan_m")(
            plan, kv=motion
        )
        plan = TransformerBlock(self.dim, self.num_heads, name="plan_b")(
            plan, kv=bev
        )[:, 0]
        z = jnp.concatenate([plan, nn.Dense(self.dim, name="ctx")(ctx)], -1)
        wp = WaypointGRU(name="wp")(z, target)
        return {"pred_wp": wp, "det_boxes": boxes, "det_scores": score}

    def _vad(self, bev, ctx, target):
        B = bev.shape[0]
        det = DetectionHead(self.dim, name="det")
        boxes, score = det(bev)

        eq = self.param(
            "ego_query", nn.initializers.normal(0.02), (1, self.dim)
        )
        ego = jnp.broadcast_to(eq, (B, 1, self.dim))
        for i in range(2):
            ego = TransformerBlock(self.dim, self.num_heads, name=f"ego_{i}")(
                ego, kv=bev
            )
        ego = ego[:, 0]

        # trajectory vocabulary: learned end-pose modes, scored by the ego
        # query + a collision prior pooled under each mode's end box from
        # the BEV objectness map (roi_align_rotated — mmcv/layers/csrc
        # ROIAlignRotated)
        modes = self.param(
            "traj_modes",
            nn.initializers.normal(0.5),
            (self.num_modes, PRED_LEN, 2),
        )
        mode_emb = nn.Dense(self.dim, name="mode_emb")(
            modes.reshape(self.num_modes, -1)
        )
        z = nn.Dense(self.dim, name="score_in")(
            jnp.concatenate([ego, nn.Dense(self.dim, name="ctx")(ctx)], -1)
        )
        logits = jnp.einsum("bd,kd->bk", z, mode_emb) / jnp.sqrt(
            jnp.float32(self.dim)
        )

        # collision prior: objectness under each mode's final pose
        obj_map = jax.nn.sigmoid(score).reshape(B, BEV_H, BEV_W, 1)
        ends = modes[:, -1]  # [K, 2] ego-frame
        # map ego frame -> BEV pixel coords
        px = (ends[:, 1] - BEV_Y0) / (BEV_Y1 - BEV_Y0) * BEV_W
        py = (ends[:, 0] - BEV_X0) / (BEV_X1 - BEV_X0) * BEV_H
        head = jnp.arctan2(
            modes[:, -1, 1] - modes[:, -2, 1], modes[:, -1, 0] - modes[:, -2, 0]
        )
        rois = jnp.stack(
            [px, py, jnp.full_like(px, 2.0), jnp.full_like(px, 4.0), head], -1
        )
        pooled = jax.vmap(
            lambda m: roi_align_rotated(m, rois, out_size=2)
        )(obj_map)  # [B, K, 2, 2, 1]
        collision = pooled.mean((-1, -2, -3))  # [B, K]
        logits = logits - 4.0 * collision

        sel = jax.nn.softmax(logits, -1)
        soft_wp = jnp.einsum("bk,ktc->btc", sel, modes)
        hard_wp = modes[jnp.argmax(logits, -1)]
        refine = nn.Dense(PRED_LEN * 2, name="refine")(
            jnp.concatenate([z, ego], -1)
        ).reshape(B, PRED_LEN, 2)
        return {
            "pred_wp": hard_wp + refine,
            "pred_wp_soft": soft_wp + refine,
            "mode_logits": logits,
            "det_boxes": boxes,
            "det_scores": score,
        }

    # --- sparse (sparsedrive) --------------------------------------------
    def _sparsedrive(self, value, shapes, ctx, target):
        B = value.shape[0]
        Qd = self.num_instances
        anchors = self.param(
            "anchors",
            lambda k, s: jax.random.uniform(
                k, s, minval=jnp.asarray([BEV_X0, BEV_Y0, 1.5, 3.5, -0.3]),
                maxval=jnp.asarray([BEV_X1, BEV_Y1, 2.5, 5.5, 0.3]),
            ),
            (Qd, 5),
        )
        inst = jnp.broadcast_to(
            self.param(
                "inst_emb", nn.initializers.normal(0.02), (Qd, self.dim)
            ),
            (B, Qd, self.dim),
        )
        boxes = jnp.broadcast_to(anchors, (B, Qd, 5))
        flat_shapes = shapes  # [(cam) -> [(h, w) per level]]
        for i in range(2):
            # key points: center + 4 corners of each anchor, projected
            kp = self._key_points(boxes)  # [B, Qd, 5pts, 2]
            uv, vis = project_points(kp)  # [B, Qd, 5, N_CAM, 2]
            Bq = B * Qd * 5
            loc = uv.reshape(Bq, NUM_CAMERAS, 1, 2)
            loc = jnp.repeat(loc, NUM_LEVELS, axis=2).reshape(
                B, Qd * 5, NUM_CAMERAS, NUM_LEVELS, 2
            )
            w = nn.Dense(
                5 * NUM_CAMERAS * NUM_LEVELS, name=f"agg_w_{i}"
            )(inst).reshape(B, Qd * 5, NUM_CAMERAS, NUM_LEVELS)
            w = jax.nn.softmax(w, -1) * jnp.repeat(
                vis.reshape(B, Qd * 5, NUM_CAMERAS, 1), NUM_LEVELS, -1
            )
            feat = deformable_aggregation(
                value, flat_shapes, loc, w
            )  # [B, Qd*5, D]
            feat = feat.reshape(B, Qd, 5, self.dim).mean(2)
            inst = inst + nn.Dense(self.dim, name=f"agg_proj_{i}")(feat)
            # sparse instance interaction: message-pass over each
            # instance's k nearest neighbors in BEV (the sparse-graph
            # attention of the namesake; ops/e2e.py:knn = mmcv ops/knn)
            nb = jax.vmap(lambda c: knn(c, c, 4))(boxes[..., :2])
            neigh = jax.vmap(lambda f, ii: f[ii])(inst, nb)  # [B, Qd, 4, D]
            inst = inst + nn.Dense(self.dim, name=f"knn_msg_{i}")(
                neigh.mean(2)
            )
            inst = TransformerBlock(
                self.dim, self.num_heads, name=f"inst_{i}"
            )(inst)
            delta = nn.Dense(5, name=f"refine_{i}")(inst)
            boxes = boxes + delta * jnp.asarray([2.0, 2.0, 0.2, 0.2, 0.1])

        score = nn.Dense(1, name="cls")(inst)[..., 0]
        # 3D-NMS detection decode: lift (cx, cy, w, l, yaw) to 7-dof boxes
        # and greedy-suppress on 3D IoU (mmcv iou3d nms_gpu,
        # ops/e2e.py:nms3d / boxes_iou3d)
        zc = jnp.full(boxes.shape[:-1] + (1,), 0.9)
        hh = jnp.full_like(zc, 1.8)
        b7 = jnp.concatenate(
            [boxes[..., :2], zc, boxes[..., 2:4], hh, boxes[..., 4:5]], -1
        )
        det_keep = jax.vmap(lambda b, s: nms3d(b, s, 0.3))(b7, score)

        pq = self.param(
            "plan_query", nn.initializers.normal(0.02), (1, self.dim)
        )
        plan = jnp.broadcast_to(pq, (B, 1, self.dim))
        # plan context: spatially-diverse instances picked by
        # furthest-point sampling over detected centers (high-score half
        # eligible; mmcv ops/furthest_point_sample)
        n_ctx = min(8, Qd)
        fps_idx = jax.vmap(
            lambda c, s: furthest_point_sample(
                c, n_ctx, valid=s >= jnp.median(s)
            )
        )(boxes[..., :2], score)
        plan_kv = jax.vmap(lambda f, ii: f[ii])(inst, fps_idx)
        plan = TransformerBlock(self.dim, self.num_heads, name="plan")(
            plan, kv=plan_kv
        )[:, 0]
        z = jnp.concatenate([plan, nn.Dense(self.dim, name="ctx")(ctx)], -1)
        wp = WaypointGRU(name="wp")(z, target)
        return {
            "pred_wp": wp,
            "det_boxes": boxes,
            "det_scores": score,
            "det_keep": det_keep,
        }

    @staticmethod
    def _key_points(boxes):
        cx, cy, w, l, yaw = (boxes[..., i] for i in range(5))
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        dx = jnp.stack([jnp.zeros_like(w), l, -l, l, -l], -1) * 0.5
        dy = jnp.stack([jnp.zeros_like(w), w, w, -w, -w], -1) * 0.5
        x = cx[..., None] + dx * c[..., None] - dy * s[..., None]
        y = cy[..., None] + dx * s[..., None] + dy * c[..., None]
        return jnp.stack([x, y], -1)  # [..., 5, 2]
