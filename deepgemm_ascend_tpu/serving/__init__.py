from .engine import Engine
from .scheduler import Admission, Request, Scheduler

__all__ = ["Engine", "Admission", "Request", "Scheduler"]
