"""High-level experiment workflows (durability/robustness harnesses)."""

from .durability import run_durability  # noqa: F401
