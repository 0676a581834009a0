from .pipeline import (
    make_separate_fn,
    make_separate_from_spectrogram_fn,
    separate_directory,
    separate_from_records,
    separated_length,
)

__all__ = [
    "make_separate_fn",
    "make_separate_from_spectrogram_fn",
    "separate_directory",
    "separate_from_records",
    "separated_length",
]
