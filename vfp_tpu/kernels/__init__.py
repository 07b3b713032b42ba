"""Pallas TPU kernels for the hot embed/extract block math."""

from .qim import qim_embed_soa, qim_decode_soa  # noqa: F401
