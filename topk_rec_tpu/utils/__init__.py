from .logging import tprint, Timer

__all__ = ["tprint", "Timer"]
