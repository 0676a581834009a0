"""speech_separation_tpu — a TPU-native speech-separation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
wsj0-2mix stack (jsjs4013/Speech-Separation-Project-with-AI):

- ``ops``      : on-device DSP — framing, Blackman windowing, STFT/iSTFT with
                 biorthogonal-window overlap-add, both rFFT and MXU matmul-DFT
                 paths, plus Pallas kernels for the hot paths.
- ``data``     : audio I/O, feature pipelines (phase-sensitive-mask spectrogram,
                 per-source, raw-waveform modes), TFRecord-compatible readers and
                 writers (pure Python, no TensorFlow dependency), batching with
                 length bucketing, and a prefetching host loader.
- ``models``   : Flax models — the uPIT BLSTM spectral masker, the raw-waveform
                 conv-frontend variant, and the VQ-VAE codec family
                 (Gumbel-Softmax and codebook/straight-through quantizers,
                 hierarchical strided topologies).
- ``losses``   : masked, length-normalised permutation-invariant training loss
                 (any speaker count), SI-SDR loss, summed-square error.
- ``metrics``  : streaming SI-SDR, permutation-best SI-SDR, BSS-eval SDR.
- ``parallel`` : device mesh construction, sharding rules, SPMD train-step
                 wrappers (data/model axes over ICI).
- ``train``    : jitted train/eval steps, optax optimisers with exponential
                 decay, orbax checkpointing with full-state resume, early
                 stopping, metric streaming.
- ``separate`` : the wave-to-wave separation pipeline as one jitted function.
- ``evaluate`` : directory-level SI-SDR / BSS-eval SDR scoring.

Everything under ``jit`` uses static shapes; variable utterance lengths ride
along as explicit per-example length vectors with masks applied inside losses
and metrics (the reference smuggled lengths as an extra label row — see
`uPIT_baseline.ipynb cell 17` in the reference; here lengths are first-class).
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
