from .se2 import (
    wrap_angle,
    rotate,
    rotation_matrix,
    global_to_local,
    local_to_global,
    se2_compose,
    se2_inverse,
)
from .obb import box_corners, obb_overlap, obb_overlap_matrix, point_in_obb
from .polyline import (
    polyline_arclength,
    resample_polyline,
    project_point_to_polyline,
    nearest_point_index,
    polyline_headings,
)

__all__ = [
    "wrap_angle",
    "rotate",
    "rotation_matrix",
    "global_to_local",
    "local_to_global",
    "se2_compose",
    "se2_inverse",
    "box_corners",
    "obb_overlap",
    "obb_overlap_matrix",
    "point_in_obb",
    "polyline_arclength",
    "resample_polyline",
    "project_point_to_polyline",
    "nearest_point_index",
    "polyline_headings",
]
