from .audio_io import audioread, audiowrite, quantize_i16, read_normalized, read_wav, wait_for_pending_writes
from .datasets import (
    SpectrogramBatch,
    VaeBatch,
    VaeLoader,
    WaveformBatch,
    WaveformLoader,
    load_tfrecord_spectrograms,
    background_iterator,
    prefetch_to_device,
)
from .device_dataset import ResidentPackedCorpus
from .packing import PackedBatch, PackedWaveformLoader
from .features import FeatureConfig, generate_librimix, generate_split, max_length, utterance_names
from .fixture import make_synthetic_fixture, make_synthetic_librimix
from .speaker_info import load_speaker_genders, mixture_genders
from .tfrecord import (
    build_sequence_example,
    parse_sequence_example,
    read_tfrecord_file,
    write_tfrecord_file,
)

__all__ = [
    "audioread",
    "audiowrite",
    "read_normalized",
    "read_wav",
    "wait_for_pending_writes",
    "SpectrogramBatch",
    "VaeBatch",
    "VaeLoader",
    "WaveformBatch",
    "WaveformLoader",
    "load_tfrecord_spectrograms",
    "background_iterator",
    "prefetch_to_device",
    "PackedBatch",
    "PackedWaveformLoader",
    "ResidentPackedCorpus",
    "FeatureConfig",
    "generate_split",
    "generate_librimix",
    "max_length",
    "utterance_names",
    "build_sequence_example",
    "parse_sequence_example",
    "read_tfrecord_file",
    "write_tfrecord_file",
    "make_synthetic_fixture",
    "make_synthetic_librimix",
    "load_speaker_genders",
    "mixture_genders",
]
