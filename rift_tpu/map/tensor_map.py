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

# Spatial hash grid: each cell stores the GRID_K nearest distinct lanes to its
# center. Replaces the reference's STRtree spatial index with an O(1) gather —
# per-tick lane binding / drivable-area tests never scan all L lanes.
# K must cover the worst-case lane overlap: a 2-lane 4-way junction has up to
# ~24 connectors crossing its box, so 16 candidates + exact re-rank keeps the
# nearest-lane binding faithful where it matters (signalised junctions).
GRID_K = 16
GRID_CELL = 2.0  # meters


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
    # stop signs: True -> the lane END is a stop line (CARLA places
    # `traffic.stop` trigger volumes on junction approaches; RunningStopTest
    # semantics in sim/stop_signs.py + scenario/criteria.py)
    stop_lane: jnp.ndarray  # [L] bool
    # crosswalks: 3 edge polylines (center/left/right) x Pc points, like
    # nuplan_map_utils.py:_get_crosswalk_edges
    crosswalk_edges: jnp.ndarray  # [C, 3, Pc, 2]
    crosswalk_valid: jnp.ndarray  # [C] bool
    # spatial hash grid (host-precomputed): GRID_K nearest lanes per cell
    grid_lanes: jnp.ndarray  # [GY, GX, GRID_K] int32
    grid_origin: jnp.ndarray  # [2] float32 world position of cell (0, 0)
    grid_inv_cell: jnp.ndarray  # [] float32 1 / cell_size
    # drivable-area raster at RASTER_CELL resolution (host-precomputed) —
    # the TPU analogue of the reference's cv2 drivable mask
    # (traj_evaluator.py:273-331): one gather per query point
    drivable_grid: jnp.ndarray  # [RY, RX] bool
    drivable_inv_cell: jnp.ndarray  # [] float32
    # signed road clearance at the same raster cells (half_width - dist to
    # nearest centerline, meters, clamped to +-CLEARANCE_CLAMP): bilinear
    # sampling of this field replaces the per-tick exact polyline projection
    # in `on_road` (16 candidate lanes x 20 segments per query) with 4
    # gathers + a lerp, at ~cm accuracy near lane boundaries
    drivable_clearance: jnp.ndarray  # [RY, RX] float32

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
        centerline vertex -> (..., L). Invalid lanes get +inf.

        Uses the MXU expansion |p - v|^2 = |p|^2 + |v|^2 - 2 p.v so the
        (..., L, P, 2) difference tensor never materializes in HBM."""
        L, P, _ = self.centerline.shape
        verts = self.centerline.reshape(L * P, 2)
        cross = point @ verts.T  # (..., L*P) on the MXU
        d2 = (
            jnp.sum(point * point, axis=-1, keepdims=True)
            + jnp.sum(verts * verts, axis=-1)
            - 2.0 * cross
        )
        d2 = jnp.maximum(d2.reshape(point.shape[:-1] + (L, P)).min(-1), 0.0)
        return jnp.where(self.valid, d2, jnp.inf)

    # ------------------------------------------------------------------
    # Spatial-hash queries: O(GRID_K) per point instead of O(L)
    # ------------------------------------------------------------------
    def grid_candidates(self, point: jnp.ndarray) -> jnp.ndarray:
        """(..., 2) -> (..., GRID_K) int32: the nearest lanes to the point's
        grid cell (host-precomputed; -1 padded for sparse regions)."""
        gy, gx = self.grid_lanes.shape[:2]
        cell = (point - self.grid_origin) * self.grid_inv_cell
        cx = jnp.clip(cell[..., 0].astype(jnp.int32), 0, gx - 1)
        cy = jnp.clip(cell[..., 1].astype(jnp.int32), 0, gy - 1)
        return self.grid_lanes[cy, cx]

    def _candidate_dist2(self, cand: jnp.ndarray, point: jnp.ndarray):
        """Exact min-vertex distance to each candidate lane (..., K), plus
        the lane heading at that nearest vertex."""
        idx = jnp.maximum(cand, 0)
        pts = self.centerline[idx]  # (..., K, P, 2)
        diff = pts - point[..., None, None, :]
        d2v = jnp.sum(diff * diff, axis=-1)  # (..., K, P)
        vi = jnp.argmin(d2v, axis=-1)  # (..., K)
        d2 = jnp.take_along_axis(d2v, vi[..., None], axis=-1)[..., 0]
        hdg = jnp.take_along_axis(self.headings[idx], vi[..., None], axis=-1)[..., 0]
        return jnp.where(cand >= 0, d2, jnp.inf), hdg

    # weight (m^2) of full heading misalignment in the lane-binding score: a
    # crossing connector directly underfoot loses to the aligned lane ~2 m
    # away — matching CARLA's direction-aware waypoint binding
    HEADING_TIEBREAK_W = 4.0

    def nearest_lane(
        self, point: jnp.ndarray, heading: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        """Index of the nearest valid lane to `point` (..., 2) -> (...,) int32.

        Grid-accelerated: exact re-rank over the cell's GRID_K candidates.
        With `heading` (...,), overlapping lanes (junction boxes) resolve to
        the direction-aligned one instead of an arbitrary tie-break."""
        cand = self.grid_candidates(point)
        d2, lane_hdg = self._candidate_dist2(cand, point)
        if heading is not None:
            mis = 1.0 - jnp.cos(lane_hdg - heading[..., None])
            d2 = d2 + self.HEADING_TIEBREAK_W * mis
        best = jnp.argmin(d2, axis=-1)
        return jnp.take_along_axis(cand, best[..., None], axis=-1)[..., 0]

    def nearest_lane_full(self, point: jnp.ndarray) -> jnp.ndarray:
        """Exact O(L) nearest lane (reset-time / reference path)."""
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

    def road_clearance(self, point: jnp.ndarray) -> jnp.ndarray:
        """Bilinear-sampled signed road clearance (m) for (..., 2) points:
        >= 0 inside a lane, < 0 outside (distance beyond the lane edge),
        clamped to +-CLEARANCE_CLAMP far from any road."""
        ry, rx = self.drivable_clearance.shape
        cell = (point - self.grid_origin) * self.drivable_inv_cell - 0.5
        cx = jnp.clip(cell[..., 0], 0.0, rx - 1.001)
        cy = jnp.clip(cell[..., 1], 0.0, ry - 1.001)
        x0 = cx.astype(jnp.int32)
        y0 = cy.astype(jnp.int32)
        fx = cx - x0
        fy = cy - y0
        g = self.drivable_clearance
        c00 = g[y0, x0]
        c01 = g[y0, x0 + 1]
        c10 = g[y0 + 1, x0]
        c11 = g[y0 + 1, x0 + 1]
        top = c00 + (c01 - c00) * fx
        bot = c10 + (c11 - c10) * fx
        return top + (bot - top) * fy

    def on_road(
        self,
        point: jnp.ndarray,
        margin: float = 0.3,
    ) -> jnp.ndarray:
        """Drivable-area membership test for (..., 2) points.

        Replaces the reference's cv2-rasterised drivable mask
        (traj_evaluator.py:273-331). Samples the precomputed signed
        clearance raster bilinearly — same answer as the exact polyline
        test (`on_road_exact`) to ~cm near boundaries, at 4 gathers per
        point instead of GRID_K lanes x P segments of projection.
        """
        return self.road_clearance(point) >= -margin

    def on_road_exact(
        self,
        point: jnp.ndarray,
        margin: float = 0.3,
    ) -> jnp.ndarray:
        """Exact drivable-area test: point is on-road iff its lateral
        offset to one of the cell's GRID_K nearest lane centerlines is
        within that lane's half width (+margin). O(GRID_K * P) per point;
        the raster `on_road` is the hot-path variant.

        Known artifact: the clamped-segment perpendicular lateral extends
        every lane infinitely past its ends, so points far beyond a
        terminal lane still read "on road" here. The raster field is
        finite (clearance saturates past ~CLEARANCE_CLAMP from the road),
        matching the reference's finite cv2 drivable mask
        (traj_evaluator.py:273-331); the two only disagree >~10 m outside
        the road network, where no bound agent drives."""
        cand = self.grid_candidates(point)  # (..., K)
        idx = jnp.maximum(cand, 0)
        line = self.centerline[idx]  # (..., K, P, 2)
        _, lat, _ = project_point_to_polyline(line, point[..., None, :])
        half_w = self.width[idx] * 0.5 + margin
        lane_ok = jnp.abs(lat) <= half_w
        lane_ok &= (cand >= 0) & self.valid[idx]
        return lane_ok.any(axis=-1)

    def on_road_raster(self, point: jnp.ndarray) -> jnp.ndarray:
        """Raster drivable-area test: one gather per point. Use for bulk
        queries (candidate rollouts: ~400k points/tick) where the exact
        polyline projection of `on_road` would gather GBs of lane geometry."""
        ry, rx = self.drivable_grid.shape
        cell = (point - self.grid_origin) * self.drivable_inv_cell
        cx = jnp.clip(cell[..., 0].astype(jnp.int32), 0, rx - 1)
        cy = jnp.clip(cell[..., 1].astype(jnp.int32), 0, ry - 1)
        return self.drivable_grid[cy, cx]

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
    grid_shape: tuple[int, int] | None = None,
    raster_shape: tuple[int, int] | None = None,
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
    stop_lane = onp.zeros(Lp, bool)

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
        stop_lane[i] = bool(ln.get("stop", False))

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

    grid_lanes, grid_origin, grid_inv_cell = _build_spatial_grid(
        centerline, valid, fixed_shape=grid_shape
    )
    drivable_grid, _, drivable_inv_cell = _build_drivable_raster(
        centerline, width, valid, grid_origin, fixed_shape=raster_shape
    )
    drivable_clearance = _build_clearance_raster(
        centerline, width, valid, grid_lanes, grid_origin, grid_inv_cell,
        drivable_grid.shape, drivable_inv_cell,
    )

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
        stop_lane=jnp.asarray(stop_lane),
        crosswalk_edges=jnp.asarray(crosswalk_edges),
        crosswalk_valid=jnp.asarray(crosswalk_valid),
        grid_lanes=jnp.asarray(grid_lanes),
        grid_origin=jnp.asarray(grid_origin),
        grid_inv_cell=jnp.asarray(grid_inv_cell),
        drivable_grid=jnp.asarray(drivable_grid),
        drivable_inv_cell=jnp.asarray(drivable_inv_cell),
        drivable_clearance=jnp.asarray(drivable_clearance),
    )


RASTER_CELL = 1.0  # m — matches the reference's raster granularity
MAX_RASTER_CELLS = 4_000_000  # coarsen beyond this (multi-km route maps)
# clearance raster saturation (m): beyond this distance from a lane edge the
# sign can never flip, so the field clamps — keeps bilinear interpolation
# well-behaved across the near/far prefilter boundary (cutoff slack is 6 m)
CLEARANCE_CLAMP = 6.0
MAX_GRID_CELLS = 1_500_000  # same cap for the lane hash grid


def _pad_grid_edge(arr, fixed_shape):
    """Edge-replicate-pad the leading two (cell) dims to `fixed_shape`.

    Replication preserves the clip-to-edge lookup semantics EXACTLY: a
    query clamped into the padded region reads a copy of the nearest real
    edge cell — the same value the unpadded grid's clamp would return. A
    fixed shape keeps every downstream jitted program's signature constant
    across maps (per-episode route maps must not recompile)."""
    import numpy as onp

    gy, gx = arr.shape[:2]
    fy, fx = fixed_shape
    assert gy <= fy and gx <= fx, (arr.shape, fixed_shape)
    pad = [(0, fy - gy), (0, fx - gx)] + [(0, 0)] * (arr.ndim - 2)
    return onp.pad(arr, pad, mode="edge")


def _fit_cell(lo, hi, nominal_cell, fixed_shape):
    """Smallest cell >= nominal such that ceil(extent/cell)+1 <= shape."""
    ey = float(hi[1] - lo[1])
    ex = float(hi[0] - lo[0])
    fy, fx = fixed_shape
    return max(nominal_cell, ey / (fy - 1.01), ex / (fx - 1.01))


def _build_drivable_raster(
    centerline: np.ndarray,  # [L, P, 2]
    width: np.ndarray,  # [L]
    valid: np.ndarray,  # [L]
    origin: np.ndarray,  # [2] (shared with the lane grid)
    cell: float = RASTER_CELL,
    margin: float = 0.3,
    k: int = 8,
    fixed_shape: tuple[int, int] | None = None,
):
    """[RY, RX] bool: cell center within half-width(+margin) of a lane
    centerline. Host-side, exact point-to-segment distances over the k
    nearest candidate lanes per cell. (The float clearance field lives in
    `_build_clearance_raster`, which mirrors on_road_exact's grid-hash
    candidate semantics.)"""
    import numpy as onp
    from scipy.spatial import cKDTree

    lane_ids_valid = onp.flatnonzero(valid)
    if len(lane_ids_valid) == 0:
        out = onp.zeros(fixed_shape or (1, 1), bool)
        return out, None, onp.float32(1.0 / cell)
    verts = centerline[lane_ids_valid].reshape(-1, 2)
    vert_lane = onp.repeat(lane_ids_valid, centerline.shape[1])
    hi = verts.max(0) + 12.0
    if fixed_shape is not None:
        cell = _fit_cell(origin, hi, cell, fixed_shape)
    # adaptive resolution: real-town routes span kilometers — cap the raster
    # at ~MAX_RASTER_CELLS by coarsening (accuracy loss documented; the
    # evaluator treats off-road at raster granularity either way)
    area = float(hi[0] - origin[0]) * float(hi[1] - origin[1])
    if area / (cell * cell) > MAX_RASTER_CELLS:
        cell = float(onp.sqrt(area / MAX_RASTER_CELLS))
    rx = int(onp.ceil((hi[0] - origin[0]) / cell)) + 1
    ry = int(onp.ceil((hi[1] - origin[1]) / cell)) + 1
    xs = origin[0] + (onp.arange(rx) + 0.5) * cell
    ys = origin[1] + (onp.arange(ry) + 0.5) * cell
    centers = onp.stack(
        [onp.repeat(xs[None], ry, 0), onp.repeat(ys[:, None], rx, 1)], axis=-1
    ).reshape(-1, 2)

    tree = cKDTree(verts)
    # cheap pre-filter: cells farther than any plausible half-width from the
    # nearest vertex can never be drivable — skip the expensive k-query
    # (route-union maps are mostly empty AABB)
    d1, _ = tree.query(centers, k=1, workers=-1)
    cutoff = float(width[lane_ids_valid].max()) * 0.5 + margin + 6.0
    near = onp.flatnonzero(d1 <= cutoff)

    out = onp.zeros(centers.shape[0], bool)
    q = min(8 * k, len(verts))
    chunk = 65536
    for lo in range(0, len(near), chunk):
        sel = near[lo : lo + chunk]
        pts = centers[sel]  # [n, 2]
        _, vidx = tree.query(pts, k=q, workers=-1)
        lanes = vert_lane[onp.atleast_2d(vidx)]  # [n, q] (dupes fine)
        lanes = lanes[:, :: max(q // k, 1)][:, :k]  # subsample to k candidates
        cl = centerline[lanes]  # [n, k, P, 2]
        a, b = cl[:, :, :-1], cl[:, :, 1:]  # segments
        ab = b - a
        ap = pts[:, None, None] - a
        t = onp.clip(
            (ap * ab).sum(-1) / onp.maximum((ab * ab).sum(-1), 1e-9), 0.0, 1.0
        )
        proj = a + t[..., None] * ab
        d = onp.linalg.norm(pts[:, None, None] - proj, axis=-1).min(-1)  # [n, k]
        half_w = width[lanes] * 0.5 + margin
        out[sel] = (d <= half_w).any(-1)
    out = out.reshape(ry, rx)
    if fixed_shape is not None:
        out = _pad_grid_edge(out, fixed_shape)
    return out, None, onp.float32(1.0 / cell)


def _build_clearance_raster(
    centerline: np.ndarray,  # [L, P, 2]
    width: np.ndarray,  # [L]
    valid: np.ndarray,  # [L]
    grid_lanes: np.ndarray,  # [GY, GX, GRID_K] the lane hash grid
    origin: np.ndarray,  # [2]
    grid_inv_cell: np.ndarray,  # []
    raster_shape: tuple[int, int],
    raster_inv_cell: np.ndarray,  # []
) -> np.ndarray:
    """[RY, RX] float32 signed clearance at raster cell centers, computed
    with EXACTLY `on_road_exact`'s semantics: candidates from the spatial
    hash grid, clearance = max over candidates of
    (half_width - |clamped-segment perpendicular lateral|), clamped to
    +-CLEARANCE_CLAMP. Bilinear sampling of this field (`on_road`)
    then reproduces the exact test up to interpolation error (~cm on
    straight boundaries, <~0.2 m at sharp junction corners)."""
    import numpy as onp

    from scipy.spatial import cKDTree

    ry, rx = raster_shape
    cell = 1.0 / float(raster_inv_cell)
    xs = origin[0] + (onp.arange(rx) + 0.5) * cell
    ys = origin[1] + (onp.arange(ry) + 0.5) * cell
    out = onp.full((ry, rx), -CLEARANCE_CLAMP, onp.float32)
    if not valid.any():
        return out

    # prefilter: only cells that could have clearance > -CLAMP need the
    # exact projection (route-union maps are mostly empty AABB). Vertex
    # spacing bounds the vertex-vs-segment distance gap by max_seg/2.
    verts_all = centerline[valid].reshape(-1, 2)
    seg_len = onp.linalg.norm(onp.diff(centerline[valid], axis=1), axis=-1)
    cutoff = (
        CLEARANCE_CLAMP
        + float(width[valid].max()) * 0.5
        + float(seg_len.max()) * 0.5
        + cell
    )
    tree = cKDTree(verts_all)

    gy, gx = grid_lanes.shape[:2]
    chunk_rows = max(1, 262_144 // max(rx, 1))
    for r0 in range(0, ry, chunk_rows):
        yy = ys[r0 : r0 + chunk_rows]
        grid_pts = onp.stack(
            [
                onp.repeat(xs[None], len(yy), 0),
                onp.repeat(yy[:, None], rx, 1),
            ],
            axis=-1,
        ).reshape(-1, 2)
        d1, _ = tree.query(grid_pts, k=1, workers=-1)
        nearsel = onp.flatnonzero(d1 <= cutoff)
        if len(nearsel) == 0:
            continue
        pts = grid_pts[nearsel]  # [n, 2]
        cellf = (pts - origin[None]) * float(grid_inv_cell)
        cx = onp.clip(cellf[:, 0].astype(onp.int64), 0, gx - 1)
        cy = onp.clip(cellf[:, 1].astype(onp.int64), 0, gy - 1)
        cand = grid_lanes[cy, cx]  # [n, K]
        has = cand >= 0
        li = onp.maximum(cand, 0)
        cl = centerline[li]  # [n, K, P, 2]
        a, b = cl[:, :, :-1], cl[:, :, 1:]
        ab = b - a
        ap = pts[:, None, None] - a
        t = onp.clip(
            (ap * ab).sum(-1) / onp.maximum((ab * ab).sum(-1), 1e-12),
            0.0, 1.0,
        )
        proj = a + t[..., None] * ab
        d2 = onp.sum((pts[:, None, None] - proj) ** 2, axis=-1)  # [n, K, P-1]
        seg = onp.argmin(d2, axis=-1)
        take = lambda arr: onp.take_along_axis(
            arr, seg[..., None, None].repeat(2, -1), axis=2
        )[:, :, 0]
        pb = take(proj)
        tb = take(ab)
        tb /= onp.maximum(onp.linalg.norm(tb, axis=-1, keepdims=True), 1e-12)
        rel = pts[:, None] - pb
        lat = onp.abs(rel[..., 0] * tb[..., 1] - rel[..., 1] * tb[..., 0])
        clr = width[li] * 0.5 - lat
        clr = onp.where(has & valid[li], clr, -onp.inf)
        clr = clr.max(-1)  # [n]
        block = out[r0 : r0 + chunk_rows].reshape(-1)
        block[nearsel] = onp.clip(clr, -CLEARANCE_CLAMP, CLEARANCE_CLAMP)
        out[r0 : r0 + chunk_rows] = block.reshape(len(yy), rx)
    return out


def _build_spatial_grid(
    centerline: np.ndarray,  # [L, P, 2]
    valid: np.ndarray,  # [L]
    cell: float = GRID_CELL,
    k: int = GRID_K,
    margin: float = 12.0,
    fixed_shape: tuple[int, int] | None = None,
):
    """[GY, GX, k] int32 table of the k nearest distinct lanes per cell center
    (host, cKDTree over all valid centerline vertices)."""
    import numpy as onp
    from scipy.spatial import cKDTree

    lane_ids_valid = onp.flatnonzero(valid)
    if len(lane_ids_valid) == 0:
        return (
            onp.full(
                (fixed_shape or (1, 1)) + (k,), -1, onp.int32
            ),
            onp.zeros(2, onp.float32),
            onp.float32(1.0 / cell),
        )
    verts = centerline[lane_ids_valid].reshape(-1, 2)
    vert_lane = onp.repeat(lane_ids_valid, centerline.shape[1])
    lo = verts.min(0) - margin
    hi = verts.max(0) + margin
    if fixed_shape is not None:
        cell = _fit_cell(lo, hi, cell, fixed_shape)
    # adaptive cell on multi-km maps (exactness kept by the K-candidate
    # re-rank as long as the cell's K nearest lanes cover the local overlap)
    area = float(hi[0] - lo[0]) * float(hi[1] - lo[1])
    if area / (cell * cell) > MAX_GRID_CELLS:
        cell = float(onp.sqrt(area / MAX_GRID_CELLS))
    gx = int(onp.ceil((hi[0] - lo[0]) / cell)) + 1
    gy = int(onp.ceil((hi[1] - lo[1]) / cell)) + 1
    xs = lo[0] + (onp.arange(gx) + 0.5) * cell
    ys = lo[1] + (onp.arange(gy) + 0.5) * cell
    centers = onp.stack(
        [onp.repeat(xs[None], gy, 0), onp.repeat(ys[:, None], gx, 1)], axis=-1
    ).reshape(-1, 2)

    tree = cKDTree(verts)
    n_cells = centers.shape[0]
    # pre-filter: distant cells only ever need their single nearest lane
    # (queries there are lane binding for stray agents, not overlap logic)
    d1, i1 = tree.query(centers, k=1, workers=-1)
    near = onp.flatnonzero(d1 <= 40.0)
    chosen = onp.repeat(vert_lane[i1][:, None], k, axis=1).astype(onp.int64)

    # query enough vertices to find k distinct lanes (vertices cluster by lane)
    q = min(max(8 * k, 32), len(verts))
    if len(near):
        _, idx = tree.query(centers[near], k=q, workers=-1)
        lanes = vert_lane[onp.atleast_2d(idx)]  # [Nn, q]
        sub = onp.full((len(near), k), -1, onp.int64)
        count = onp.zeros(len(near), onp.int64)
        rows = onp.arange(len(near))
        for j in range(lanes.shape[1]):
            lane_j = lanes[:, j]
            is_new = (sub != lane_j[:, None]).all(1) & (count < k)
            sub[rows[is_new], count[is_new]] = lane_j[is_new]
            count[is_new] += 1
            if (count >= k).all():
                break
        # pad unfilled slots with the cell's nearest lane (never -1 when any
        # lane exists) so gathers stay in-bounds / at worst redundant
        sub = onp.where(sub < 0, sub[:, :1], sub)
        chosen[near] = sub
    chosen = chosen.reshape(gy, gx, k).astype(onp.int32)
    if fixed_shape is not None:
        chosen = _pad_grid_edge(chosen, fixed_shape)
    return (
        chosen,
        lo.astype(onp.float32),
        onp.float32(1.0 / cell),
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
