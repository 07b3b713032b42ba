"""Native (C++) I/O engine bindings: off-GIL double-buffered frame streaming.

Builds vfpio.cpp with g++ on first use (cached under native/build/); all
callers degrade gracefully to the pure-Python readers/writers when no
toolchain is present.
"""

from .build import load_vfpio, have_native  # noqa: F401
from .io import NativeRawVideoReader, NativeRawVideoWriter, NativePipeReader, NativePipeWriter  # noqa: F401
