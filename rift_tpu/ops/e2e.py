"""TPU-native equivalents of the reference's vendored CUDA ops.

The reference's E2E-AV stack (UniAD / VAD / SparseDrive, rift/ego/b2d/)
compiles ~25k lines of C++/CUDA for a handful of tensor ops
(mmcv/ops/csrc/pytorch/*: ms_deform_attn, nms_rotated, box_iou_rotated,
roi_align(_rotated); adzoo/sparsedrive .../ops/src: deformable_aggregation).
On TPU each is an XLA composite — gathers for the bilinear samples, einsums
for the weighted sums, masked Sutherland-Hodgman for rotated-box clipping,
a lax.scan for greedy NMS — that the compiler fuses and tiles; no custom
lowering needed at these shapes (the MXU work in these models lives in the
surrounding matmuls, not the sampling ops).

Semantics:
  * ms_deform_attn — multi_scale_deformable_attn_pytorch
    (mmcv/ops/multi_scale_deform_attn.py:94-150): grid_sample with
    align_corners=False, zero padding.
  * box_iou_rotated / nms_rotated — mmcv box_iou_rotated.cpp semantics
    ((cx, cy, w, h, angle_rad) boxes, exact polygon clipping).
  * roi_align / roi_align_rotated — mmcv roi_align.py aligned=True
    (pixel-shift -0.5), average pooling.
  * deformable_aggregation — SparseDrive deformable_aggregation_ext:
    multi-camera multi-scale bilinear sampling, weighted sum over
    (cam, scale, points, groups).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# bilinear sampling (grid_sample semantics, align_corners=False, zeros pad)
# ---------------------------------------------------------------------------
def _bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """img [H, W, C]; x/y [...] pixel coordinates (already in pixel units,
    center-of-pixel convention). Out-of-bounds reads contribute zero."""
    H, W, _ = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    outs = 0.0
    for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
        for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
            outs = outs + v * (wx * wy * inb)[..., None]
    return outs


def ms_deform_attn(
    value: jnp.ndarray,  # [bs, num_keys, num_heads, head_dim]
    spatial_shapes,  # [(H, W), ...] static python list of tuples
    sampling_locations: jnp.ndarray,  # [bs, Q, H, L, P, 2] in [0, 1] (x, y)
    attention_weights: jnp.ndarray,  # [bs, Q, H, L, P]
) -> jnp.ndarray:
    """Multi-scale deformable attention -> [bs, Q, num_heads * head_dim].

    Matches multi_scale_deformable_attn_pytorch: locations are normalized
    to [0, 1]; grid_sample(align_corners=False) => pixel = loc * size - 0.5.
    """
    bs, _, num_heads, head_dim = value.shape
    Q = sampling_locations.shape[1]
    starts = []
    s = 0
    for (h, w) in spatial_shapes:
        starts.append(s)
        s += h * w

    out = 0.0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, starts[lvl] : starts[lvl] + h * w]  # [bs, h*w, H, D]
        v = v.reshape(bs, h, w, num_heads, head_dim)
        loc = sampling_locations[:, :, :, lvl]  # [bs, Q, H, P, 2]
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5

        def sample_one(img_b, px_b, py_b):
            # img_b [h, w, H, D]; px_b/py_b [Q, H, P]
            def per_head(img_h, x, y):
                return _bilinear_sample(img_h, x, y)  # [Q, P, D]

            return jax.vmap(per_head, in_axes=(2, 1, 1), out_axes=1)(
                img_b, px_b, py_b
            )  # [Q, H, P, D]

        sampled = jax.vmap(sample_one)(v, px, py)  # [bs, Q, H, P, D]
        out = out + jnp.sum(
            sampled * attention_weights[:, :, :, lvl][..., None], axis=3
        )  # [bs, Q, H, D]
    return out.reshape(bs, Q, num_heads * head_dim)


# ---------------------------------------------------------------------------
# rotated boxes
# ---------------------------------------------------------------------------
def _box_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 5] (cx, cy, w, h, angle) -> [..., 4, 2] corners (ccw)."""
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    c, s = jnp.cos(a), jnp.sin(a)
    dx = jnp.stack([w, w, -w, -w], -1) * 0.5
    dy = jnp.stack([-h, h, h, -h], -1) * 0.5
    x = cx[..., None] + dx * c[..., None] - dy * s[..., None]
    y = cy[..., None] + dx * s[..., None] + dy * c[..., None]
    return jnp.stack([x, y], -1)


_MAX_V = 8  # intersection of two convex quads has <= 8 vertices


def _clip_poly(pts, valid, a, b):
    """Clip polygon (pts [..., V, 2], valid [..., V]) against the half-plane
    left of edge a->b (a, b [..., 2]). Fixed-size output [..., _MAX_V]."""
    V = pts.shape[-2]
    nxt = jnp.concatenate([pts[..., 1:, :], pts[..., :1, :]], axis=-2)
    nxt_valid = jnp.concatenate([valid[..., 1:], valid[..., :1]], axis=-1)
    # roll so each vertex's successor is the next VALID vertex: with a
    # contiguous-prefix representation, successor of the last valid vertex
    # wraps to vertex 0
    n = valid.sum(-1, keepdims=True)  # [..., 1]
    is_last = jnp.arange(V) == (n - 1)  # [..., V]
    first = pts[..., :1, :]
    nxt = jnp.where(is_last[..., None], first, nxt)

    e = b - a
    def side(p):
        d = p - a[..., None, :]
        return e[..., None, 0] * d[..., 1] - e[..., None, 1] * d[..., 0]

    s_cur = side(pts)
    s_nxt = side(nxt)
    cur_in = s_cur >= 0
    nxt_in = s_nxt >= 0
    t = s_cur / jnp.where(jnp.abs(s_cur - s_nxt) < 1e-12, 1e-12, s_cur - s_nxt)
    inter = pts + (nxt - pts) * jnp.clip(t, 0.0, 1.0)[..., None]

    # each input edge emits up to 2 points: (cur if cur_in), (inter if edge
    # crosses). Lay out as [..., V, 2 slots] then compact.
    emit1 = cur_in & valid
    emit2 = (cur_in ^ nxt_in) & valid
    out_pts = jnp.stack([pts, inter], axis=-2)  # [..., V, 2, 2]
    out_ok = jnp.stack([emit1, emit2], axis=-1)  # [..., V, 2]
    out_pts = out_pts.reshape(out_pts.shape[:-3] + (2 * V, 2))
    out_ok = out_ok.reshape(out_ok.shape[:-2] + (2 * V,))
    # compact to contiguous prefix of _MAX_V entries
    order = jnp.argsort(~out_ok, axis=-1, stable=True)[..., :_MAX_V]
    pts_c = jnp.take_along_axis(out_pts, order[..., None].repeat(2, -1), axis=-2)
    ok_c = jnp.take_along_axis(out_ok, order, axis=-1)
    return pts_c, ok_c


def _poly_area(pts, valid):
    """Shoelace area of a contiguous-prefix polygon [..., V, 2]."""
    V = pts.shape[-2]
    n = valid.sum(-1, keepdims=True)
    idx = jnp.arange(V)
    nxt_idx = jnp.where(idx == (n - 1), 0, jnp.minimum(idx + 1, V - 1))
    # gather successor points (invalid slots contribute zero below)
    nxt_idx = jnp.broadcast_to(nxt_idx, pts.shape[:-1])
    nxt = jnp.take_along_axis(
        pts, nxt_idx[..., None].repeat(2, -1), axis=-2
    )
    cross = pts[..., 0] * nxt[..., 1] - pts[..., 1] * nxt[..., 0]
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0), axis=-1))


def rotated_box_intersection(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of rotated boxes b1, b2 [..., 5] -> [...]."""
    poly = _box_corners(b1)  # [..., 4, 2]
    pts = jnp.concatenate(
        [poly, jnp.zeros(poly.shape[:-2] + (_MAX_V - 4, 2))], axis=-2
    )
    valid = jnp.concatenate(
        [jnp.ones(poly.shape[:-2] + (4,), bool),
         jnp.zeros(poly.shape[:-2] + (_MAX_V - 4,), bool)],
        axis=-1,
    )
    clip = _box_corners(b2)
    for i in range(4):
        a = clip[..., i, :]
        b = clip[..., (i + 1) % 4, :]
        pts, valid = _clip_poly(pts, valid, a, b)
    return _poly_area(pts, valid)


def box_iou_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """[N, 5] x [M, 5] -> [N, M] IoU (mmcv box_iou_rotated, mode 'iou')."""
    b1 = boxes1[:, None]
    b2 = boxes2[None, :]
    inter = rotated_box_intersection(
        jnp.broadcast_to(b1, (boxes1.shape[0], boxes2.shape[0], 5)),
        jnp.broadcast_to(b2, (boxes1.shape[0], boxes2.shape[0], 5)),
    )
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    return inter / jnp.maximum(a1 + a2 - inter, 1e-9)


def nms_rotated(
    boxes: jnp.ndarray,  # [N, 5]
    scores: jnp.ndarray,  # [N]
    iou_threshold: float = 0.5,
) -> jnp.ndarray:
    """Greedy rotated NMS -> keep mask [N] (in original order).

    Matches mmcv nms_rotated: process boxes by descending score, suppress
    any box with IoU > threshold against an already-kept box.
    """
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    iou = box_iou_rotated(boxes[order], boxes[order])

    def body(kept, i):
        sup = (iou[i] > iou_threshold) & kept & (jnp.arange(N) < i)
        keep_i = ~sup.any()
        kept = kept.at[i].set(keep_i)
        return kept, keep_i

    kept, _ = jax.lax.scan(body, jnp.zeros(N, bool), jnp.arange(N))
    # back to original order
    inv = jnp.argsort(order)
    return kept[inv]


# ---------------------------------------------------------------------------
# RoIAlign
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("out_size", "sampling_ratio", "spatial_scale"))
def roi_align(
    features: jnp.ndarray,  # [H, W, C] one image
    rois: jnp.ndarray,  # [R, 4] (x1, y1, x2, y2)
    out_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
) -> jnp.ndarray:
    """mmcv RoIAlign (aligned=True): -0.5 pixel shift, average pooling of
    sampling_ratio^2 bilinear samples per output bin -> [R, out, out, C]."""
    r = rois * spatial_scale
    x1, y1, x2, y2 = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    bw = jnp.maximum((x2 - x1) / out_size, 1e-6)
    bh = jnp.maximum((y2 - y1) / out_size, 1e-6)
    gi = (jnp.arange(sampling_ratio) + 0.5) / sampling_ratio
    ox = jnp.arange(out_size)

    # sample grid: [R, out, sr] per axis
    xs = x1[:, None, None] + (ox[None, :, None] + gi[None, None, :]) * bw[:, None, None]
    ys = y1[:, None, None] + (ox[None, :, None] + gi[None, None, :]) * bh[:, None, None]
    xs = xs - 0.5  # aligned=True
    ys = ys - 0.5

    def per_roi(xr, yr):
        # xr/yr [out, sr] -> grid [out, out, sr, sr]
        gx = jnp.broadcast_to(
            xr[None, :, None, :], (out_size, out_size, sampling_ratio, sampling_ratio)
        )
        gy = jnp.broadcast_to(
            yr[:, None, :, None], (out_size, out_size, sampling_ratio, sampling_ratio)
        )
        v = _bilinear_sample(features, gx, gy)  # [out, out, sr, sr, C]
        return v.mean(axis=(2, 3))

    return jax.vmap(per_roi)(xs, ys)


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio", "spatial_scale"))
def roi_align_rotated(
    features: jnp.ndarray,  # [H, W, C]
    rois: jnp.ndarray,  # [R, 5] (cx, cy, w, h, angle)
    out_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0,
) -> jnp.ndarray:
    """mmcv RoIAlignRotated (aligned=True, clockwise=False):
    sample an axis-aligned grid in the box frame, rotate into the image."""
    r = rois.at[:, :4].multiply(spatial_scale)
    cx, cy, w, h, ang = (r[:, i] for i in range(5))
    gi = (jnp.arange(sampling_ratio) + 0.5) / sampling_ratio
    ox = jnp.arange(out_size)
    # local offsets in [-0.5, 0.5] box units
    u = ((ox[:, None] + gi[None, :]) / out_size - 0.5)  # [out, sr]

    def per_roi(cx, cy, w, h, ang):
        lx = jnp.broadcast_to(
            u[None, :, None, :] * w, (out_size, out_size, sampling_ratio, sampling_ratio)
        )
        ly = jnp.broadcast_to(
            u[:, None, :, None] * h, (out_size, out_size, sampling_ratio, sampling_ratio)
        )
        c, s = jnp.cos(ang), jnp.sin(ang)
        gx = cx + lx * c - ly * s - 0.5
        gy = cy + lx * s + ly * c - 0.5
        v = _bilinear_sample(features, gx, gy)
        return v.mean(axis=(2, 3))

    return jax.vmap(per_roi)(cx, cy, w, h, ang)


# ---------------------------------------------------------------------------
# SparseDrive deformable aggregation
# ---------------------------------------------------------------------------
def deformable_aggregation(
    mc_ms_feat: jnp.ndarray,  # [bs, num_keys, C] stacked cam x scale maps
    spatial_shapes,  # [(cam, scale) -> (h, w)] list of lists of tuples
    sampling_location: jnp.ndarray,  # [bs, pts, cam, scale, 2] in [0, 1]
    weights: jnp.ndarray,  # [bs, pts, cam, scale]
) -> jnp.ndarray:
    """SparseDrive's deformable_aggregation_ext forward: bilinear-sample
    each (camera, scale) feature map at the projected anchor points and
    reduce with the predicted weights -> [bs, pts, C]."""
    bs, _, C = mc_ms_feat.shape
    starts = []
    s = 0
    for cam_shapes in spatial_shapes:
        row = []
        for (h, w) in cam_shapes:
            row.append(s)
            s += h * w
        starts.append(row)

    out = 0.0
    for ci, cam_shapes in enumerate(spatial_shapes):
        for si, (h, w) in enumerate(cam_shapes):
            fmap = mc_ms_feat[:, starts[ci][si] : starts[ci][si] + h * w]
            fmap = fmap.reshape(bs, h, w, C)
            loc = sampling_location[:, :, ci, si]  # [bs, pts, 2]
            px = loc[..., 0] * w - 0.5
            py = loc[..., 1] * h - 0.5
            v = jax.vmap(_bilinear_sample)(fmap, px, py)  # [bs, pts, C]
            out = out + v * weights[:, :, ci, si][..., None]
    return out
