"""Compile + load the vfpio shared library (ctypes)."""

from __future__ import annotations

import ctypes
import logging
import shutil
import subprocess
from functools import lru_cache
from pathlib import Path

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "vfpio.cpp"
_BUILD = Path(__file__).parent / "build"


def have_native() -> bool:
    return shutil.which("g++") is not None or (_BUILD / "libvfpio.so").exists()


_LOAD_ERROR: list = []  # lru_cache does not cache exceptions; a failed
# build/load must not re-spawn g++ on every hot-path call (host_ll /
# reconstruct fall back per call), so remember the first failure here


@lru_cache(maxsize=1)
def load_vfpio():
    """Build (if needed) and load libvfpio; returns configured ctypes CDLL.

    Raises RuntimeError when no compiler and no prebuilt library exist.
    Failures are sticky: the first error is re-raised on later calls
    without retrying the compile.
    """
    if _LOAD_ERROR:
        raise _LOAD_ERROR[0]
    try:
        return _load_vfpio_uncached()
    except Exception as e:
        _LOAD_ERROR.append(RuntimeError(f"vfpio build/load failed: {e}"))
        raise _LOAD_ERROR[0] from e


def _load_vfpio_uncached():
    so = _BUILD / "libvfpio.so"
    if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
        if shutil.which("g++") is None:
            raise RuntimeError("no g++ and no prebuilt libvfpio.so")
        _BUILD.mkdir(exist_ok=True)
        # -mf16c/-mavx2 (x86 only): _Float16 (host-LL f16 output) needs F16C;
        # -ffp-contract=off: no FMA fusion, so float association matches the
        # NumPy/cv2 reference paths as closely as the source order implies
        import platform

        arch_flags = (["-mf16c", "-mavx2"]
                      if platform.machine() in ("x86_64", "AMD64", "i686")
                      else [])
        cmd = ["g++", "-O3", *arch_flags, "-ffp-contract=off",
               "-shared", "-fPIC", "-std=c++17", "-pthread",
               str(_SRC), "-o", str(so)]
        logger.info("building vfpio: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(str(so))
    lib.vfpio_reader_open_file.restype = ctypes.c_void_p
    lib.vfpio_reader_open_file.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_long]
    lib.vfpio_reader_open_cmd.restype = ctypes.c_void_p
    lib.vfpio_reader_open_cmd.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_int]
    lib.vfpio_read_batch.restype = ctypes.c_long
    lib.vfpio_read_batch.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
    lib.vfpio_reader_close.argtypes = [ctypes.c_void_p]
    lib.vfpio_writer_open_file.restype = ctypes.c_void_p
    lib.vfpio_writer_open_file.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_int]
    lib.vfpio_writer_open_cmd.restype = ctypes.c_void_p
    lib.vfpio_writer_open_cmd.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_int]
    lib.vfpio_write_batch.restype = ctypes.c_long
    lib.vfpio_write_batch.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
    lib.vfpio_writer_close.restype = ctypes.c_int
    lib.vfpio_writer_close.argtypes = [ctypes.c_void_p]
    lib.vfpio_host_ll.restype = None
    lib.vfpio_host_ll.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.vfpio_qim_dll.restype = None
    lib.vfpio_qim_dll.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_float,
    ]
    lib.vfpio_qim_bits.restype = None
    lib.vfpio_qim_bits.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_float,
    ]
    try:  # absent from older prebuilt .so files (no g++ to rebuild):
        # callers hasattr-gate on it, so a missing symbol must not poison
        # the loader for the symbols that DO exist
        lib.vfpio_recentre2.restype = None
        lib.vfpio_recentre2.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ]
        lib.vfpio_qim_repair.restype = None
        lib.vfpio_qim_repair.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_float,
        ]
    except AttributeError:  # pragma: no cover - depends on .so vintage
        pass
    lib.vfpio_reconstruct.restype = None
    lib.vfpio_reconstruct.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long,
    ]
    return lib
