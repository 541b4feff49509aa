"""TensorMap: the precompiled on-device vector map.

Replaces the reference's geopandas/shapely `CarlaMap`
(rift/cbv/planning/pluto/utils/nuplan_map_utils.py): GeoDataFrames + STRtree
spatial index become dense lane tensors queried with gathers/top-k, so every
map lookup lives inside the jitted world tick.

Lane layout mirrors the reference's preprocessing (nuplan_map_utils.py:292-308):
each lane is resampled to ``P + 1 = 21`` centerline vertices plus left/right
edge polylines; topology is successor indices + left/right adjacency
(HD-Map-Anno.md format). "Lane connectors" are lanes with ``is_junction``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..geometry.polyline import (
    polyline_arclength,
    project_point_to_polyline,
)

# Number of sampled segments per lane (21 vertices), matching the reference's
# map_sample_points=20 (nuplan_map_utils.py:49).
LANE_POINTS = 21


@struct.dataclass
class TensorMap:
    """Per-town static map as a pytree of device arrays.

    All lane arrays have leading dim L (padded); invalid slots have
    ``valid == False`` and index fields set to -1.
    """

    centerline: jnp.ndarray  # [L, LANE_POINTS, 2] float32
    left_edge: jnp.ndarray  # [L, LANE_POINTS, 2]
    right_edge: jnp.ndarray  # [L, LANE_POINTS, 2]
    headings: jnp.ndarray  # [L, LANE_POINTS] centerline tangent headings
    width: jnp.ndarray  # [L]
    length: jnp.ndarray  # [L] centerline arclength
    road_id: jnp.ndarray  # [L] int32
    lane_id: jnp.ndarray  # [L] int32 (signed, CARLA convention)
    is_junction: jnp.ndarray  # [L] bool (True -> lane connector)
    speed_limit: jnp.ndarray  # [L] float32 m/s
    successors: jnp.ndarray  # [L, K_SUC] int32, -1 padded
    predecessors: jnp.ndarray  # [L, K_SUC] int32, -1 padded
    left_adj: jnp.ndarray  # [L] int32, -1 if none
    right_adj: jnp.ndarray  # [L] int32, -1 if none
    valid: jnp.ndarray  # [L] bool
    # traffic lights: phase group per lane, -1 = unsignalised. Lanes in group
    # 2*j + axis share the light of junction j's `axis` approach (the
    # gen_hdmap.py Trigger_Volumes equivalent; see sim/traffic_lights.py).
    light_group: jnp.ndarray  # [L] int32
    # crosswalks: 3 edge polylines (center/left/right) x Pc points, like
    # nuplan_map_utils.py:_get_crosswalk_edges
    crosswalk_edges: jnp.ndarray  # [C, 3, Pc, 2]
    crosswalk_valid: jnp.ndarray  # [C] bool

    @property
    def num_lanes(self) -> int:
        return self.centerline.shape[0]

    @property
    def lane_mid(self) -> jnp.ndarray:
        """[L, 2] centerline midpoints (cheap query key)."""
        return self.centerline[:, LANE_POINTS // 2]

    # ------------------------------------------------------------------
    # Queries (all jit-safe, fixed output shapes)
    # ------------------------------------------------------------------

    def lane_point_dist2(self, point: jnp.ndarray) -> jnp.ndarray:
        """Squared distance from `point` (..., 2) to each lane's nearest
        centerline vertex -> (..., L). Invalid lanes get +inf."""
        diff = self.centerline - point[..., None, None, :]  # (..., L, P, 2)
        d2 = jnp.sum(diff * diff, axis=-1).min(axis=-1)  # (..., L)
        return jnp.where(self.valid, d2, jnp.inf)

    def nearest_lane(self, point: jnp.ndarray) -> jnp.ndarray:
        """Index of the nearest valid lane to `point` (..., 2) -> (...,) int32."""
        return jnp.argmin(self.lane_point_dist2(point), axis=-1).astype(jnp.int32)

    def nearest_lanes(self, point: jnp.ndarray, k: int):
        """Top-k nearest lanes by centerline-vertex distance.

        Returns (indices (..., k) int32, dist2 (..., k)). Mirrors the
        distance-sorted output of query_proximal_map_data
        (nuplan_map_utils.py:354-433).
        """
        d2 = self.lane_point_dist2(point)
        kk = min(k, self.num_lanes)
        neg, idx = jax.lax.top_k(-d2, kk)
        if kk < k:
            idx = jnp.concatenate(
                [idx, jnp.zeros(idx.shape[:-1] + (k - kk,), idx.dtype)], axis=-1
            )
            neg = jnp.concatenate(
                [neg, jnp.full(neg.shape[:-1] + (k - kk,), -jnp.inf)], axis=-1
            )
        return idx.astype(jnp.int32), -neg

    def query_proximal(self, point: jnp.ndarray, radius: float, max_objects: int):
        """Lanes+connectors within `radius` of `point`, distance-sorted,
        padded to `max_objects`.

        Returns (lane_idx [max_objects] int32 with -1 pad, valid [max_objects]).
        """
        idx, d2 = self.nearest_lanes(point, max_objects)
        within = d2 <= radius * radius
        return jnp.where(within, idx, -1), within

    def project(self, lane_idx: jnp.ndarray, point: jnp.ndarray):
        """Project (..., 2) points onto lanes given by (...,) indices.

        Returns (arclength, signed_lateral, heading) each (...,).
        """
        line = self.centerline[lane_idx]  # (..., P, 2)
        return project_point_to_polyline(line, point)

    def on_road(
        self,
        point: jnp.ndarray,
        k: int = 4,
        margin: float = 0.3,
    ) -> jnp.ndarray:
        """Drivable-area membership test for (..., 2) points.

        Replaces the reference's cv2-rasterised drivable mask
        (traj_evaluator.py:273-331): a point is on-road iff its lateral
        offset to one of the k nearest lane centerlines is within that
        lane's half width (+margin).
        """
        idx, _ = self.nearest_lanes(point, k)  # (..., k)
        line = self.centerline[idx]  # (..., k, P, 2)
        _, lat, _ = project_point_to_polyline(line, point[..., None, :])
        half_w = self.width[idx] * 0.5 + margin
        lane_ok = jnp.abs(lat) <= half_w
        lane_ok &= self.valid[idx]
        return lane_ok.any(axis=-1)

    def on_route_mask(self, route_road_ids: jnp.ndarray, route_lane_ids: jnp.ndarray) -> jnp.ndarray:
        """[L] bool: lane lies on the route.

        Matches `has_matching_pair` (nuplan_map_utils.py:589-593): same
        road_id and same lane_id sign. `route_*_ids` are fixed-size arrays
        padded with 0 road ids (road id 0 unused by convention; padding is
        road_id=-1).
        """
        same_road = self.road_id[:, None] == route_road_ids[None, :]
        same_sign = (self.lane_id[:, None] * route_lane_ids[None, :]) > 0
        pad = route_road_ids[None, :] < 0
        return (same_road & same_sign & ~pad).any(axis=-1) & self.valid

    def lane_frame_speed_limit(self, lane_idx: jnp.ndarray) -> jnp.ndarray:
        return self.speed_limit[lane_idx]


def build_tensor_map(
    lanes: list[dict[str, Any]],
    crosswalks: list[np.ndarray] | None = None,
    pad_lanes_to: int | None = None,
    max_successors: int = 4,
) -> TensorMap:
    """Host-side constructor from a list of lane dicts.

    Each lane dict:
      centerline [N, 2], left [N, 2] (optional), right [N, 2] (optional),
      width float, road_id int, lane_id int, is_junction bool,
      successors list[(road_id, lane_id)], left_adj / right_adj
      (road_id, lane_id) or None, speed_limit float,
      light_group int (optional, -1 = unsignalised).

    Polylines are arclength-resampled to LANE_POINTS vertices, mirroring
    nuplan_map_utils.py:build_lane_edges.
    """
    import numpy as onp

    L = len(lanes)
    Lp = pad_lanes_to or L
    assert Lp >= L

    def _resample(poly: onp.ndarray) -> onp.ndarray:
        poly = onp.asarray(poly, dtype=onp.float64)
        if len(poly) < 2:
            poly = onp.repeat(poly[:1], 2, axis=0) if len(poly) else onp.zeros((2, 2))
        seg = onp.linalg.norm(onp.diff(poly, axis=0), axis=1)
        s = onp.concatenate([[0.0], onp.cumsum(seg)])
        total = max(s[-1], 1e-9)
        t = onp.linspace(0, total, LANE_POINTS)
        return onp.stack(
            [onp.interp(t, s, poly[:, 0]), onp.interp(t, s, poly[:, 1])], axis=-1
        )

    centerline = onp.zeros((Lp, LANE_POINTS, 2), onp.float32)
    left_edge = onp.zeros_like(centerline)
    right_edge = onp.zeros_like(centerline)
    width = onp.zeros(Lp, onp.float32)
    length = onp.zeros(Lp, onp.float32)
    road_id = onp.full(Lp, -1, onp.int32)
    lane_id = onp.zeros(Lp, onp.int32)
    is_junction = onp.zeros(Lp, bool)
    speed_limit = onp.zeros(Lp, onp.float32)
    valid = onp.zeros(Lp, bool)
    light_group = onp.full(Lp, -1, onp.int32)

    key_to_idx: dict[tuple[int, int], int] = {}
    for i, ln in enumerate(lanes):
        key_to_idx[(int(ln["road_id"]), int(ln["lane_id"]))] = i

    for i, ln in enumerate(lanes):
        c = _resample(ln["centerline"])
        centerline[i] = c
        w = float(ln.get("width", 3.5))
        if ln.get("left") is not None and len(ln["left"]) >= 2:
            left_edge[i] = _resample(ln["left"])
        else:
            left_edge[i] = _offset_polyline(c, +w / 2)
        if ln.get("right") is not None and len(ln["right"]) >= 2:
            right_edge[i] = _resample(ln["right"])
        else:
            right_edge[i] = _offset_polyline(c, -w / 2)
        width[i] = w
        length[i] = float(
            onp.linalg.norm(onp.diff(c, axis=0), axis=1).sum()
        )
        road_id[i] = int(ln["road_id"])
        lane_id[i] = int(ln["lane_id"])
        is_junction[i] = bool(ln.get("is_junction", False))
        speed_limit[i] = float(ln.get("speed_limit", 14.0))
        valid[i] = True
        light_group[i] = int(ln.get("light_group", -1))

    successors = onp.full((Lp, max_successors), -1, onp.int32)
    predecessors = onp.full((Lp, max_successors), -1, onp.int32)
    left_adj = onp.full(Lp, -1, onp.int32)
    right_adj = onp.full(Lp, -1, onp.int32)
    pred_count = onp.zeros(Lp, onp.int32)

    for i, ln in enumerate(lanes):
        succ = [
            key_to_idx[tuple(map(int, s))]
            for s in ln.get("successors", [])
            if tuple(map(int, s)) in key_to_idx
        ]
        for k, j in enumerate(succ[:max_successors]):
            successors[i, k] = j
            if pred_count[j] < max_successors:
                predecessors[j, pred_count[j]] = i
                pred_count[j] += 1
        la = ln.get("left_adj")
        if la is not None and tuple(map(int, la)) in key_to_idx:
            left_adj[i] = key_to_idx[tuple(map(int, la))]
        ra = ln.get("right_adj")
        if ra is not None and tuple(map(int, ra)) in key_to_idx:
            right_adj[i] = key_to_idx[tuple(map(int, ra))]

    vec = onp.diff(centerline, axis=1)
    headings = onp.arctan2(vec[..., 1], vec[..., 0])
    headings = onp.concatenate([headings, headings[:, -1:]], axis=1).astype(onp.float32)

    cw = crosswalks or []
    Pc = LANE_POINTS
    C = max(len(cw), 1)
    crosswalk_edges = onp.zeros((C, 3, Pc, 2), onp.float32)
    crosswalk_valid = onp.zeros(C, bool)
    for i, poly in enumerate(cw):
        crosswalk_edges[i] = _crosswalk_edges(onp.asarray(poly), Pc)
        crosswalk_valid[i] = True

    return TensorMap(
        centerline=jnp.asarray(centerline),
        left_edge=jnp.asarray(left_edge),
        right_edge=jnp.asarray(right_edge),
        headings=jnp.asarray(headings),
        width=jnp.asarray(width),
        length=jnp.asarray(length),
        road_id=jnp.asarray(road_id),
        lane_id=jnp.asarray(lane_id),
        is_junction=jnp.asarray(is_junction),
        speed_limit=jnp.asarray(speed_limit),
        successors=jnp.asarray(successors),
        predecessors=jnp.asarray(predecessors),
        left_adj=jnp.asarray(left_adj),
        right_adj=jnp.asarray(right_adj),
        valid=jnp.asarray(valid),
        light_group=jnp.asarray(light_group),
        crosswalk_edges=jnp.asarray(crosswalk_edges),
        crosswalk_valid=jnp.asarray(crosswalk_valid),
    )


def _offset_polyline(poly: np.ndarray, offset: float) -> np.ndarray:
    """Offset a polyline along its left normal by `offset` (host-side)."""
    import numpy as onp

    vec = onp.diff(poly, axis=0)
    vec = onp.concatenate([vec, vec[-1:]], axis=0)
    norm = onp.linalg.norm(vec, axis=1, keepdims=True)
    norm = onp.maximum(norm, 1e-9)
    normal = onp.stack([-vec[:, 1], vec[:, 0]], axis=-1) / norm
    return (poly + offset * normal).astype(onp.float32)


def _crosswalk_edges(polygon: np.ndarray, n: int) -> np.ndarray:
    """Center/left/right edge polylines of a crosswalk polygon's oriented
    bbox, following nuplan_map_utils.py:_get_crosswalk_edges (without shapely:
    we use the PCA-aligned box of the polygon vertices)."""
    import numpy as onp

    pts = onp.asarray(polygon, dtype=onp.float64)
    c = pts.mean(axis=0)
    x = pts - c
    cov = x.T @ x
    evals, evecs = onp.linalg.eigh(cov)
    major = evecs[:, onp.argmax(evals)]
    minor = evecs[:, onp.argmin(evals)]
    lon = x @ major
    lat = x @ minor
    lo, hi = lon.min(), lon.max()
    la, lb = lat.min(), lat.max()
    t = onp.linspace(lo, hi, n)
    center = c + t[:, None] * major
    left = center + lb * minor
    right = center + la * minor
    return onp.stack([center, left, right], axis=0).astype(onp.float32)
