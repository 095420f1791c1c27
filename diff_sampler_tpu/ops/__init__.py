from . import multistep, schedules
from .schedules import get_schedule

__all__ = ["get_schedule", "multistep", "schedules"]
