from .schedules import (
    get_beta_schedule,
    DiffusionSchedule,
    make_schedule,
)

__all__ = ["get_beta_schedule", "DiffusionSchedule", "make_schedule"]
