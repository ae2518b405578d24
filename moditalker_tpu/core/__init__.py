from . import adan, diffusion, ema, schedules, sharding  # noqa: F401
