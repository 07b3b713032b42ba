"""Core batched math ops: color conversion, Haar DWT, blocked DCT, tiny SVD."""

from .color import bgr_to_yuv, yuv_to_bgr  # noqa: F401
from .haar import haar_dwt2, haar_idwt2  # noqa: F401
from .dct import dct2, idct2, dct_matrix  # noqa: F401
from .blocks import to_blocks, from_blocks  # noqa: F401
from .svd4 import top_singular_triplet, top_singular_value  # noqa: F401
