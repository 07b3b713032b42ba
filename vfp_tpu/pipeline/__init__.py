"""Host pipeline drivers: overlap video I/O with batched TPU compute."""

from .embedder import Embedder, FrameMarker, MultiMarker  # noqa: F401
from .extractor import Extractor, FrameExtractor, ExtractResult  # noqa: F401
