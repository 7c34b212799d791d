from .mesh import make_mesh, shard_params, replicate
from .train_step import DistributedBPRTrainer, DistributedVBPRTrainer
from .als import DistributedALS
