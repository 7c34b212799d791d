from .base import Recommender
from .bpr import BPR
from .vbpr import VBPR
from .wmf import WMF
from .cer import CER
from .dpm import DPM
from .encoders import Encoder, MLPEncoder, SDAEEncoder

__all__ = [
    "Recommender",
    "BPR",
    "VBPR",
    "WMF",
    "CER",
    "DPM",
    "Encoder",
    "MLPEncoder",
    "SDAEEncoder",
]
