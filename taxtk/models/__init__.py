from .rpa import RpaTask, PairKey
from .lca import (
    DummyPredictionModel,
    LCASimplePredictionModel,
    MeganLCAPredictionModel,
    NBestLCAPredictionModel,
)

__all__ = [
    "RpaTask",
    "PairKey",
    "DummyPredictionModel",
    "LCASimplePredictionModel",
    "MeganLCAPredictionModel",
    "NBestLCAPredictionModel",
]
