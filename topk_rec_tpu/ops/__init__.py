from .sampling import TripletSampler
from .als import batched_solve, gram_matrix, weighted_als_user_update

__all__ = [
    "TripletSampler",
    "batched_solve",
    "gram_matrix",
    "weighted_als_user_update",
]
