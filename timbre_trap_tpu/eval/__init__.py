from . import multipitch
from .multipitch import evaluate, resample_multipitch

__all__ = ["multipitch", "evaluate", "resample_multipitch"]
