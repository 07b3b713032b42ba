"""HTTP serving layer: upload -> watermark -> per-viewer HLS -> leak detection."""

from .service import VfpService  # noqa: F401
