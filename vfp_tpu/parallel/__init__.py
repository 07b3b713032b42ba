"""Multi-chip scaling: device meshes + sharded mark/detect steps."""

from .mesh import make_mesh  # noqa: F401
from .sharded import sharded_mark_step, sharded_detect_step  # noqa: F401
from .farm import mark_segments_parallel  # noqa: F401
