from .fusion import (
    ModalityScores,
    average_weights,
    rank_geometric_weights,
    error_weights,
    svm_fusion_weights,
    bpr_fusion_weights,
    evaluate_fused,
)

__all__ = [
    "ModalityScores",
    "average_weights",
    "rank_geometric_weights",
    "error_weights",
    "svm_fusion_weights",
    "bpr_fusion_weights",
    "evaluate_fused",
]
