from .mesh import make_mesh, shard_params, replicate
from .train_step import DistributedBPRTrainer
from .als import DistributedALS

__all__ = [
    "make_mesh",
    "shard_params",
    "replicate",
    "DistributedBPRTrainer",
    "DistributedALS",
]
