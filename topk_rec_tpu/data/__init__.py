from .io import (
    load_id_map,
    load_inverse_id_map,
    parse_ratings,
    read_dat,
    write_dat,
    load_features,
)
from .dataset import Interactions, synthetic_interactions, synthetic_features

__all__ = [
    "load_id_map",
    "load_inverse_id_map",
    "parse_ratings",
    "read_dat",
    "write_dat",
    "load_features",
    "Interactions",
    "synthetic_interactions",
    "synthetic_features",
]
