"""Shared utilities: typed config, trace logging, profiling hooks."""

from .config import VfpConfig  # noqa: F401
from .logging import trace  # noqa: F401
from .profiling import profile_trace, StageTimer  # noqa: F401
