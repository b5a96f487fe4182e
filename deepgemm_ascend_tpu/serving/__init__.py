from .engine import Engine, sample_logits
from .scheduler import Admission, Request, Scheduler

__all__ = ["Engine", "sample_logits", "Admission", "Request", "Scheduler"]
