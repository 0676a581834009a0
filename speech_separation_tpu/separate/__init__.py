from .pipeline import (
    make_long_separate_fn,
    make_separate_fn,
    make_separate_from_spectrogram_fn,
    separate_directory,
    separate_from_records,
    separate_long_directory,
    separated_length,
)
from .streaming import StreamingSeparator, stream_separate
from .streaming_stateful import CausalStreamingSeparator, stateful_stream_separate
from .tasnet_chunked import separate_chunked

__all__ = [
    "CausalStreamingSeparator",
    "StreamingSeparator",
    "make_long_separate_fn",
    "make_separate_fn",
    "make_separate_from_spectrogram_fn",
    "separate_chunked",
    "separate_directory",
    "separate_from_records",
    "separate_long_directory",
    "separated_length",
    "stateful_stream_separate",
    "stream_separate",
]
