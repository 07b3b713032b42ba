"""Multi-chip scaling: device meshes + sharded mark/detect steps."""

from .mesh import make_mesh  # noqa: F401
from .sharded import sharded_mark_step, sharded_detect_step  # noqa: F401
from .farm import (  # noqa: F401
    mark_segments_distributed,
    mark_segments_parallel,
    merge_manifest_shards,
)
