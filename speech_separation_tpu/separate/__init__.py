from .pipeline import make_separate_fn, separate_directory, separated_length

__all__ = ["make_separate_fn", "separate_directory", "separated_length"]
