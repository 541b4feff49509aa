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


# ---------------------------------------------------------------------------
# point-cloud ops (mmcv/ops/csrc: voxelization, knn, furthest_point_sample,
# iou3d) — fixed-shape TPU formulations: ragged voxel lists become padded
# [max_voxels, max_points] tensors with validity masks, scatters become
# sort + segment ranking (compiler-friendly; no atomics)
# ---------------------------------------------------------------------------
@partial(
    jax.jit,
    static_argnames=("voxel_size", "pc_range", "max_voxels", "max_points"),
)
def voxelize(
    points: jnp.ndarray,  # [N, C>=3] (x, y, z, feats...)
    valid: jnp.ndarray,  # [N] bool
    voxel_size: tuple,  # (vx, vy, vz)
    pc_range: tuple,  # (x0, y0, z0, x1, y1, z1)
    max_voxels: int = 256,
    max_points: int = 16,
):
    """Hard voxelization (mmcv ops/voxelize.py Voxelization.forward):
    returns (voxels [V, P, C], coords [V, 3] int32 (ix, iy, iz),
    num_points [V], voxel_valid [V]). Points beyond `max_points` in a
    voxel and voxels beyond `max_voxels` are dropped, like the CUDA op."""
    N, C = points.shape
    x0, y0, z0, x1, y1, z1 = pc_range
    vx, vy, vz = voxel_size
    nx = max(int(round((x1 - x0) / vx)), 1)
    ny = max(int(round((y1 - y0) / vy)), 1)
    nz = max(int(round((z1 - z0) / vz)), 1)

    ix = jnp.floor((points[:, 0] - x0) / vx).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - y0) / vy).astype(jnp.int32)
    iz = jnp.floor((points[:, 2] - z0) / vz).astype(jnp.int32)
    in_range = (
        (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) & (iz >= 0) & (iz < nz)
    )
    ok = valid & in_range
    lin = jnp.where(ok, (iz * ny + iy) * nx + ix, jnp.iinfo(jnp.int32).max)

    # stable sort by voxel id keeps the CUDA op's first-come point order
    order = jnp.argsort(lin, stable=True)
    slin = lin[order]
    # rank of each point within its voxel run
    same = jnp.concatenate([jnp.array([False]), slin[1:] == slin[:-1]])
    seg_start = jnp.where(~same, jnp.arange(N), 0)
    start_cummax = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = jnp.arange(N) - start_cummax
    # voxel index = number of distinct ids before this run
    new_voxel = (~same) & (slin != jnp.iinfo(jnp.int32).max)
    vidx = jnp.cumsum(new_voxel) - 1  # [N] sorted-order voxel slot

    keep = (
        (slin != jnp.iinfo(jnp.int32).max)
        & (rank < max_points)
        & (vidx < max_voxels)
    )
    dst_v = jnp.where(keep, vidx, max_voxels)  # overflow row
    dst_p = jnp.where(keep, rank, 0)

    voxels = jnp.zeros((max_voxels + 1, max_points, C), points.dtype)
    voxels = voxels.at[dst_v, dst_p].set(points[order])[: max_voxels]
    num = (
        jnp.zeros(max_voxels + 1, jnp.int32)
        .at[dst_v]
        .add(keep.astype(jnp.int32))[:max_voxels]
    )
    slin_clip = jnp.maximum(slin, 0)
    cz = slin_clip // (nx * ny)
    cy = (slin_clip - cz * nx * ny) // nx
    cx = slin_clip - cz * nx * ny - cy * nx
    coords = jnp.zeros((max_voxels + 1, 3), jnp.int32)
    coords = coords.at[dst_v].set(
        jnp.stack([cx, cy, cz], -1).astype(jnp.int32)
    )[:max_voxels]
    return voxels, coords, num, num > 0


def dynamic_scatter_mean(
    feats: jnp.ndarray,  # [N, C] per-point features
    voxel_id: jnp.ndarray,  # [N] int32 target voxel slot (< V), -1 = drop
    num_voxels: int,
):
    """mmcv DynamicScatter(mode='mean'): mean-pool point features per
    voxel -> [V, C] (zero where empty)."""
    ok = voxel_id >= 0
    dst = jnp.where(ok, voxel_id, num_voxels)
    s = jnp.zeros((num_voxels + 1, feats.shape[-1]), feats.dtype).at[dst].add(
        jnp.where(ok[:, None], feats, 0.0)
    )
    n = jnp.zeros(num_voxels + 1, jnp.int32).at[dst].add(ok.astype(jnp.int32))
    return s[:num_voxels] / jnp.maximum(n[:num_voxels, None], 1)


def knn(
    query: jnp.ndarray,  # [Q, D]
    points: jnp.ndarray,  # [N, D]
    k: int,
    valid: jnp.ndarray | None = None,  # [N] bool
):
    """mmcv ops/knn: indices [Q, k] of the k nearest `points` per query
    (invalid points excluded; all-invalid queries return index 0s)."""
    d = jnp.sum((query[:, None] - points[None]) ** 2, -1)  # [Q, N]
    if valid is not None:
        d = jnp.where(valid[None], d, jnp.inf)
    _, idx = jax.lax.top_k(-d, k)
    return idx


@partial(jax.jit, static_argnames=("num_samples",))
def furthest_point_sample(
    points: jnp.ndarray,  # [N, D]
    num_samples: int,
    valid: jnp.ndarray | None = None,
):
    """mmcv ops/furthest_point_sample: greedy max-min selection starting
    from index 0 -> indices [num_samples]."""
    N = points.shape[0]
    big = jnp.where(valid, 0.0, -jnp.inf) if valid is not None else jnp.zeros(N)

    def body(carry, _):
        mind, last = carry
        d = jnp.sum((points - points[last]) ** 2, -1)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind + big)
        return (mind, nxt), nxt

    init = (jnp.full((N,), jnp.inf), jnp.int32(0))
    _, idx = jax.lax.scan(body, init, None, length=num_samples - 1)
    return jnp.concatenate([jnp.array([0], jnp.int32), idx.astype(jnp.int32)])


def boxes_iou3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """mmcv iou3d boxes_iou3d_gpu: [N, 7] x [M, 7] (x, y, z, dx, dy, dz,
    yaw; z = box center) -> IoU [N, M]: exact rotated BEV intersection x
    z-extent overlap."""
    bev1 = boxes1[:, [0, 1, 3, 4, 6]]
    bev2 = boxes2[:, [0, 1, 3, 4, 6]]
    inter_bev = jax.vmap(
        lambda b1: jax.vmap(lambda b2: rotated_box_intersection(b1, b2))(bev2)
    )(bev1)  # [N, M]
    z1lo = boxes1[:, 2] - boxes1[:, 5] * 0.5
    z1hi = boxes1[:, 2] + boxes1[:, 5] * 0.5
    z2lo = boxes2[:, 2] - boxes2[:, 5] * 0.5
    z2hi = boxes2[:, 2] + boxes2[:, 5] * 0.5
    zo = jnp.maximum(
        jnp.minimum(z1hi[:, None], z2hi[None]) -
        jnp.maximum(z1lo[:, None], z2lo[None]),
        0.0,
    )
    inter = inter_bev * zo
    v1 = boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5]
    v2 = boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5]
    return inter / jnp.maximum(v1[:, None] + v2[None] - inter, 1e-8)


def nms3d(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float = 0.3):
    """mmcv iou3d nms_gpu: greedy NMS on 3D IoU -> keep mask [N]."""
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    iou = boxes_iou3d(boxes[order], boxes[order])

    def body(kept, i):
        sup = (iou[i] > iou_threshold) & kept & (jnp.arange(N) < i)
        keep_i = ~sup.any()
        return kept.at[i].set(keep_i), keep_i

    kept, _ = jax.lax.scan(body, jnp.zeros(N, bool), jnp.arange(N))
    return kept[jnp.argsort(order)]
