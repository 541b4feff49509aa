from .lane_query import lane_min_dist2

__all__ = ["lane_min_dist2"]
