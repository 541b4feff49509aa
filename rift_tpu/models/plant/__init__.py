from .model import PlanTModel
from .policy import build_plant_tokens, plant_ego_waypoints

__all__ = ["PlanTModel", "build_plant_tokens", "plant_ego_waypoints"]
