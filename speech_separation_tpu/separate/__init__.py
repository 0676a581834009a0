from .pipeline import (
    make_long_separate_fn,
    make_separate_fn,
    make_separate_from_spectrogram_fn,
    separate_directory,
    separate_from_records,
    separate_long_directory,
    separated_length,
)

__all__ = [
    "make_long_separate_fn",
    "make_separate_fn",
    "make_separate_from_spectrogram_fn",
    "separate_directory",
    "separate_from_records",
    "separate_long_directory",
    "separated_length",
]
