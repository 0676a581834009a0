from .framing import frame_signal, num_frames, num_samples, overlap_add
from .stft import (
    analysis_basis,
    istft,
    stft,
    stft_frame_count,
    synthesis_basis,
)
from .windows import analysis_window, biorthogonal_synthesis_window, blackman

__all__ = [
    "frame_signal",
    "num_frames",
    "num_samples",
    "overlap_add",
    "stft",
    "istft",
    "stft_frame_count",
    "analysis_basis",
    "synthesis_basis",
    "analysis_window",
    "biorthogonal_synthesis_window",
    "blackman",
]
