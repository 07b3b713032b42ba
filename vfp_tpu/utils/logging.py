"""Trace decorator (reference: src/offmark/common/__logging.py:6-16)."""

from __future__ import annotations

import functools


def trace(logger):
    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            logger.debug("Entering %s()", fn.__name__)
            return fn(*args, **kwargs)

        return wrapper

    return decorator
