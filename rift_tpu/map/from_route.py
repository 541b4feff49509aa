"""Corridor maps derived from Bench2Drive routes.

The reference repo ships Bench2Drive route XMLs but not the CARLA HD-map npz
artifacts (see DESIGN.md). This builder turns route keypoint polylines into a
drivable TensorMap corridor — the route lane plus parallel same-direction
lanes — so the shipped routes run closed-loop end to end. `map_from_routes`
merges a whole batch of routes into ONE map (distinct road-id ranges per
route) so the data loader's non-overlapping batches co-simulate in one
device program. When real `TownXX_HD_map.npz` files are present,
`compiler.compile_town` supersedes this.
"""

from __future__ import annotations

import numpy as np

from .tensor_map import TensorMap, build_tensor_map

SEGMENT_LEN = 100.0
LANE_WIDTH = 3.5
ROAD_ID_STRIDE = 1000  # road-id block per route in a merged map


def _route_lanes(
    keypoints: np.ndarray,
    road_base: int,
    num_lanes: int,
    lane_width: float,
    speed_limit: float,
):
    """Lane dicts for one route corridor. Returns (lanes, primary_keys) where
    primary_keys are the (road_id, lane_id) of the route lane's segments in
    driving order."""
    pts = np.asarray(keypoints, dtype=np.float64)[:, :2]
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = max(s[-1], 4.0)
    t = np.arange(0.0, total, 2.0)
    pts = np.stack(
        [np.interp(t, s, pts[:, 0]), np.interp(t, s, pts[:, 1])], axis=-1
    )

    vec = np.gradient(pts, axis=0)
    norm = np.maximum(np.linalg.norm(vec, axis=1, keepdims=True), 1e-9)
    d = vec / norm
    right = np.stack([d[:, 1], -d[:, 0]], axis=-1)

    n_seg = max(int(np.ceil(total / SEGMENT_LEN)), 1)
    pts_per_seg = max(len(pts) // n_seg, 2)

    lanes = []
    primary_keys = []
    for li in range(num_lanes):
        off = li * lane_width
        lane_pts = pts + right * off
        lane_id = -(li + 1)
        for si in range(n_seg):
            lo = si * pts_per_seg
            hi = min((si + 1) * pts_per_seg + 1, len(pts))
            if hi - lo < 2:
                continue
            road = road_base + si + 1
            succ = [(road + 1, lane_id)] if si + 1 < n_seg else []
            lanes.append(
                dict(
                    centerline=lane_pts[lo:hi],
                    width=lane_width,
                    road_id=road,
                    lane_id=lane_id,
                    is_junction=False,
                    successors=succ,
                    left_adj=(road, lane_id + 1) if li > 0 else None,
                    right_adj=(road, lane_id - 1) if li + 1 < num_lanes else None,
                    speed_limit=speed_limit,
                )
            )
            if li == 0:
                primary_keys.append((road, lane_id))
    return lanes, primary_keys


def map_from_routes(
    keypoints_list: list[np.ndarray],
    num_lanes: int = 2,
    lane_width: float = LANE_WIDTH,
    speed_limit: float = 14.0,
    pad_lanes_to: int | None = None,
):
    """One TensorMap covering every route in the batch.

    Returns (tmap, lane_paths) with lane_paths[i] = the lane indices of route
    i's primary corridor lane, in driving order (feeds TrafficEnv.reset).
    """
    all_lanes: list[dict] = []
    all_keys: list[list[tuple]] = []
    for ri, kp in enumerate(keypoints_list):
        lanes, keys = _route_lanes(
            kp, ri * ROAD_ID_STRIDE, num_lanes, lane_width, speed_limit
        )
        all_lanes.extend(lanes)
        all_keys.append(keys)

    tmap = build_tensor_map(all_lanes, pad_lanes_to=pad_lanes_to)
    key_to_idx = {
        (int(r), int(l)): i
        for i, (r, l) in enumerate(
            zip(np.asarray(tmap.road_id), np.asarray(tmap.lane_id))
        )
        if int(r) >= 0
    }
    lane_paths = [
        [key_to_idx[k] for k in keys if k in key_to_idx] for keys in all_keys
    ]
    return tmap, lane_paths


def map_from_route(
    keypoints: np.ndarray,
    num_lanes: int = 2,
    lane_width: float = LANE_WIDTH,
    speed_limit: float = 14.0,
    pad_lanes_to: int | None = None,
) -> TensorMap:
    """Single-route corridor (back-compat convenience)."""
    tmap, _ = map_from_routes(
        [keypoints], num_lanes, lane_width, speed_limit, pad_lanes_to
    )
    return tmap
