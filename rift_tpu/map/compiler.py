"""Offline HD-map compiler: CARLA npz dump -> TensorMap.

Consumes the reference's HD-map artifact format (documented at
/root/reference/data/map_data/anno/HD-Map-Anno.md, produced by
data/gen_hdmap.py): a per-town dict of road_id -> lane_id -> LaneMark
Left/Center/Right point lists with topology, plus crosswalk polygons.

Equivalent in role to CarlaMap._load_hd_map/_preprocess_data
(nuplan_map_utils.py:68-290), but emits dense tensors instead of
GeoDataFrames.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .tensor_map import TensorMap, build_tensor_map

JUNCTION_TYPES = {"Junction", "EnterJunction", "PassJunction", "StartJunctionMultiChange"}


def load_npz(path: str) -> dict[Any, Any]:
    data = np.load(path, allow_pickle=True)
    return dict(data["arr"])


def compile_town(
    map_data: dict[Any, Any],
    speed_limit_mps: float = 14.0,
    pad_lanes_to: int | None = None,
) -> TensorMap:
    """Compile the raw HD-map dict into a TensorMap."""
    lanes: list[dict] = []
    crosswalks: list[np.ndarray] = []

    for road_id, road_data in map_data.items():
        if road_id == "Crosswalks":
            for cw in road_data:
                poly = cw.get("Polygon")
                if poly is None:
                    continue
                coords = getattr(poly, "exterior", None)
                if coords is not None:
                    pts = np.stack(coords.coords.xy, axis=-1)
                else:
                    pts = np.asarray(poly, dtype=np.float64)
                if len(pts) >= 3:
                    crosswalks.append(pts)
            continue
        for lane_id, lane_data in road_data.items():
            if lane_id == "Trigger_Volumes":
                continue
            marks = dict(lane_data.get("LaneMark", {}))
            # merge multi-part marks per side (nuplan_map_utils.py:167-178)
            sides = {}
            for side in ("Left", "Center", "Right"):
                parts = marks.get(side, [])
                if not parts:
                    sides[side] = None
                    continue
                merged = dict(parts[0])
                merged["Points"] = list(parts[0]["Points"])
                if "Topology" in merged:
                    merged["Topology"] = list(parts[0].get("Topology", []))
                for p in parts[1:]:
                    merged["Points"].extend(p["Points"])
                    if "Topology" in merged:
                        merged["Topology"].extend(p.get("Topology", []))
                sides[side] = merged

            center = sides["Center"]
            if center is None or len(center["Points"]) < 3:
                continue

            def _coords(mark):
                if mark is None:
                    return None
                return np.array(
                    [[p[0][0], p[0][1]] for p in mark["Points"]], dtype=np.float64
                )

            topo_type = center.get("TopologyType", "Normal")
            lanes.append(
                dict(
                    centerline=_coords(center),
                    left=_coords(sides["Left"]),
                    right=_coords(sides["Right"]),
                    width=float(lane_data.get("LaneWidth", 3.5)),
                    road_id=int(road_id),
                    lane_id=int(lane_id),
                    is_junction=topo_type in JUNCTION_TYPES,
                    successors=[tuple(map(int, t)) for t in center.get("Topology", [])],
                    left_adj=tuple(map(int, center["Left"]))
                    if center.get("Left") is not None
                    else None,
                    right_adj=tuple(map(int, center["Right"]))
                    if center.get("Right") is not None
                    else None,
                    speed_limit=speed_limit_mps,
                )
            )

    return build_tensor_map(lanes, crosswalks=crosswalks, pad_lanes_to=pad_lanes_to)


def compile_town_from_npz(path: str, **kw) -> TensorMap:
    return compile_town(load_npz(path), **kw)
