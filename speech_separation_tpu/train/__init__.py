from .checkpoint import CheckpointManager
from .loop import FitResult, fit
from .optim import adam, cosine_adam, exponential_decay_adam, nadam
from .state import TrainState
from .steps import (
    make_time_domain_steps,
    make_upit_packed_resident_steps,
    make_upit_packed_steps,
    make_upit_raw_steps,
    make_upit_spectrogram_steps,
    make_upit_waveform_steps,
    make_vae_steps,
)

__all__ = [
    "CheckpointManager",
    "FitResult",
    "fit",
    "adam",
    "cosine_adam",
    "exponential_decay_adam",
    "nadam",
    "TrainState",
    "make_time_domain_steps",
    "make_upit_packed_resident_steps",
    "make_upit_packed_steps",
    "make_upit_raw_steps",
    "make_upit_spectrogram_steps",
    "make_upit_waveform_steps",
    "make_vae_steps",
]
