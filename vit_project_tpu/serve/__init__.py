from .engine import (InferenceEngine, clip_hba_engine, vit_classifier_engine,
                     vit_features_engine)
from .server import MicroBatcher, ServingDaemon

__all__ = ["InferenceEngine", "vit_classifier_engine", "vit_features_engine",
           "clip_hba_engine", "MicroBatcher", "ServingDaemon"]
