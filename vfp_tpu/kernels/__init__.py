"""Pallas TPU kernels for the hot embed/extract block math."""

from .qim import qim_embed_soa, qim_decode_soa, qim_triplet_soa  # noqa: F401
from .fused_embed import fused_mark_planar, fused_extract_planar  # noqa: F401
from .fused_dct_qim import fused_dct_qim_mark, fused_dct_qim_extract  # noqa: F401
