"""Configuration, timing, and IO utilities."""
from . import config  # noqa: F401
