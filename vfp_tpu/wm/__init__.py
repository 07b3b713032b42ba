"""Watermark codecs (frequency-domain embed/extract) and payload spread codecs."""

from .payload import (  # noqa: F401
    Shuffler,
    DeShuffler,
    GrayScale,
    DeGrayScale,
    keyed_shuffle_indices,
    despread_mean,
)
from .dwt_dct_svd import DwtDctSvd  # noqa: F401
from .dct_qim import DctQim  # noqa: F401
from .dtcwt_codecs import DtcwtKey, DtcwtImg  # noqa: F401
from .payload_img import (  # noqa: F401
    CorrShuffler,
    DeCorrShuffler,
    BlockShuffler,
    DeBlockShuffler,
)
