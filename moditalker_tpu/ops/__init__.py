from . import attention, rotary  # noqa: F401
