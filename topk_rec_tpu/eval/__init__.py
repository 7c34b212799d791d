from .protocol import evaluate_oracle, EvalResult
from .device import DeviceEvaluator, evaluate_scores_device

__all__ = [
    "evaluate_oracle",
    "EvalResult",
    "DeviceEvaluator",
    "evaluate_scores_device",
]
