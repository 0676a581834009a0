from .bss_eval import (
    BssEvalImagesResult,
    BssEvalResult,
    bss_eval_images,
    bss_eval_sources,
)
from .sisdr import MeanSiSdr, permute_si_sdr, si_sdr_np

__all__ = [
    "BssEvalImagesResult",
    "BssEvalResult",
    "bss_eval_images",
    "bss_eval_sources",
    "MeanSiSdr",
    "permute_si_sdr",
    "si_sdr_np",
]
