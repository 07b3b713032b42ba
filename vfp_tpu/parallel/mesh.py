"""Device mesh construction.

The workload's parallel axes (SURVEY.md §2.5): frames within a segment
("data") and watermark variants per segment ("variant" — the copies axis of
the HLS workflow, an expert-parallel analogue where every device holds a
different payload plane).  Segments themselves are embarrassingly parallel
across hosts via the work queue (no collectives needed there).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int | None = None, variant: int = 1, devices=None) -> Mesh:
    """('data', 'variant') mesh; data defaults to all devices / variant."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // variant
    if data * variant != n:
        raise ValueError(f"mesh {data}x{variant} != {n} devices")
    arr = np.asarray(devices).reshape(data, variant)
    return Mesh(arr, axis_names=("data", "variant"))
