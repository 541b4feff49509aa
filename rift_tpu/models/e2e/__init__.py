from .model import E2EModel, PRED_LEN
from .policy import e2e_ego_waypoints, e2e_inputs
from .train import bc_train

__all__ = [
    "E2EModel",
    "PRED_LEN",
    "e2e_ego_waypoints",
    "e2e_inputs",
    "bc_train",
]
