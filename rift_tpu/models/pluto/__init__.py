from .model import PlutoModel
from .features import build_cbv_features, build_features_for_agent

__all__ = ["PlutoModel", "build_cbv_features", "build_features_for_agent"]
