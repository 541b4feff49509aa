"""Corridor map derived from a Bench2Drive route.

The reference repo ships Bench2Drive route XMLs but not the CARLA HD-map npz
artifacts (see DESIGN.md). This builder turns a route's dense keypoint
polyline into a drivable TensorMap corridor — the route lane plus parallel
same-direction lanes — so the shipped routes run closed-loop end to end.
When real `TownXX_HD_map.npz` files are present, `compiler.compile_town`
supersedes this.
"""

from __future__ import annotations

import numpy as np

from .tensor_map import TensorMap, build_tensor_map

SEGMENT_LEN = 100.0
LANE_WIDTH = 3.5


def map_from_route(
    keypoints: np.ndarray,  # [N, >=2] route polyline (x, y, ...)
    num_lanes: int = 2,
    lane_width: float = LANE_WIDTH,
    speed_limit: float = 14.0,
    pad_lanes_to: int | None = None,
) -> TensorMap:
    pts = np.asarray(keypoints, dtype=np.float64)[:, :2]
    # resample to 2 m spacing for stable normals
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = s[-1]
    t = np.arange(0.0, total, 2.0)
    pts = np.stack(
        [np.interp(t, s, pts[:, 0]), np.interp(t, s, pts[:, 1])], axis=-1
    )

    vec = np.gradient(pts, axis=0)
    norm = np.linalg.norm(vec, axis=1, keepdims=True)
    norm = np.maximum(norm, 1e-9)
    d = vec / norm
    right = np.stack([d[:, 1], -d[:, 0]], axis=-1)

    n_seg = max(int(np.ceil(total / SEGMENT_LEN)), 1)
    pts_per_seg = max(len(pts) // n_seg, 2)

    lanes = []
    for li in range(num_lanes):
        off = li * lane_width
        lane_pts = pts + right * off
        lane_id = -(li + 1)
        for si in range(n_seg):
            lo = si * pts_per_seg
            hi = min((si + 1) * pts_per_seg + 1, len(pts))
            if hi - lo < 2:
                continue
            road = si + 1
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
    return build_tensor_map(lanes, pad_lanes_to=pad_lanes_to)
