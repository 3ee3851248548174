from .consensus import combine_prediction_ranges
from .binner import run_binner

__all__ = ["combine_prediction_ranges", "run_binner"]
