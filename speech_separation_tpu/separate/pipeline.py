"""Wave-to-wave separation as one jitted device program.

The reference's inference loop (`uPIT_baseline.ipynb cell 41`) crosses the
host/device boundary three times per batch (predict on device; complex mask ×
phase in host numpy; per-frame Python overlap-add). Here the entire chain —
STFT → mask estimation → phase reapply → iSTFT — is a single XLA program over
a padded batch; the host only trims each utterance to its true length and
writes wavs.

Variable lengths under static shapes: frames beyond an utterance's true frame
count are zeroed *before* overlap-add, which makes the device output within
the valid region bit-identical to running iSTFT on the truncated spectrogram
(the reference's semantics); the host then slices
``frames * shift - (size - shift)`` samples per utterance.
"""

from __future__ import annotations

import pathlib
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..data.audio_io import audiowrite, wait_for_pending_writes
from ..data.datasets import WaveformLoader, prefetch_to_device
from ..ops.features import magnitude_angle
from ..ops.stft import istft, stft

__all__ = [
    "make_separate_fn",
    "make_separate_from_spectrogram_fn",
    "make_long_separate_fn",
    "separated_length",
    "separate_directory",
    "separate_long_directory",
    "separate_from_records",
]


def separated_length(frames: int, size: int, shift: int) -> int:
    """Output sample count of a fade-cropped iSTFT over ``frames`` frames."""
    return frames * shift - (size - shift)


from ..ops.quant import (  # single home for the int16 wire convention
    dequant_i16 as _dequant,
    dequantize_estimates_i16,
    quantize_estimates_i16,
)


def make_separate_fn(
    model,
    size: int = 256,
    shift: int = 128,
    num_speakers: int = 2,
    method: str = "matmul",
    compute_dtype=None,
    dp_mesh=None,
    quantize_output: bool = False,
) -> Callable:
    """Returns jitted ``separate(params, mix, frame_lengths) -> [B, S, samples]``.

    ``compute_dtype=jnp.bfloat16`` runs the mask-estimation network in bf16
    (params + activations cast inside the jitted program; DSP stays fp32) —
    measured +33% throughput at batch 128 with ≤0.5% relative output change.

    ``dp_mesh``: a ``Mesh`` with a ``data`` axis → the batch axis is sharded
    over it (params replicated); each device separates its slice of the batch
    and writes its shard of the output — serving scales linearly over chips
    with no collectives on the hot path. Batch must divide by the axis size
    (``parallel.pad_batch_for_mesh``). Output ≡ single-device (pinned in
    ``tests/test_parallel.py``).

    ``mix`` may be int16 PCM (dequantized on device — half the upload bytes);
    ``quantize_output=True`` returns ``(codes int16, scale)`` per
    ``ops.quant.quantize_estimates_i16`` (half the fetch bytes, no clipping
    at any estimate amplitude).
    """

    def separate(params, mix, frame_lengths):
        spec = stft(_dequant(mix), size, shift, method=method)  # [B, T, F] complex
        mag, cos, sin = magnitude_angle(spec)
        if compute_dtype is not None:
            params = jax.tree.map(lambda x: x.astype(compute_dtype), params)
            net_in = mag.astype(compute_dtype)
        else:
            net_in = mag
        preds = model.apply({"params": params}, net_in, deterministic=True).astype(
            mag.dtype
        )
        t = mag.shape[-2]
        f = mag.shape[-1]
        frame_mask = (jnp.arange(t)[None, :] < frame_lengths[:, None]).astype(mag.dtype)
        wavs = []
        for s in range(num_speakers):
            est_mag = preds[..., s * f : (s + 1) * f]
            masked = est_mag * frame_mask[..., None]
            est_spec = jax.lax.complex(masked * cos, masked * sin)
            wavs.append(istft(est_spec, size, shift, method=method))
        out = jnp.stack(wavs, axis=1)
        return quantize_estimates_i16(out) if quantize_output else out

    if dp_mesh is None:
        return jax.jit(separate)

    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    repl = NamedSharding(dp_mesh, P())
    bsh = NamedSharding(dp_mesh, P("data"))
    return jax.jit(
        separate,
        in_shardings=(repl, bsh, bsh),
        out_shardings=(bsh, bsh) if quantize_output else bsh,
    )


def make_separate_from_spectrogram_fn(
    model,
    size: int = 256,
    shift: int = 128,
    num_speakers: int = 2,
    method: str = "matmul",
) -> Callable:
    """Jitted separation from precomputed magnitude/phase (the reference's
    exact inference inputs, `uPIT_baseline.ipynb cell 41`: model on magnitude,
    masks × magnitude, phase reapplied from the stored mixture angle)."""

    @jax.jit
    def separate(params, magnitude, cos_angle, sin_angle, frame_lengths):
        preds = model.apply({"params": params}, magnitude, deterministic=True)
        t, f = magnitude.shape[-2], magnitude.shape[-1]
        frame_mask = (jnp.arange(t)[None, :] < frame_lengths[:, None]).astype(
            magnitude.dtype
        )
        wavs = []
        for s in range(num_speakers):
            est = preds[..., s * f : (s + 1) * f] * frame_mask[..., None]
            spec = jax.lax.complex(est * cos_angle, est * sin_angle)
            wavs.append(istft(spec, size, shift, method=method))
        return jnp.stack(wavs, axis=1)

    return separate


def make_long_separate_fn(
    model,
    mesh,
    size: int = 256,
    shift: int = 128,
    num_speakers: int = 2,
    axis: str = "model",
    chunked_mask: bool = False,
) -> Callable:
    """Sequence-parallel separation for utterances beyond one chip's comfort.

    The waveform's *time axis* is sharded over ``mesh[axis]``: analysis and
    synthesis run as halo-exchange shards (``parallel.sequence``), so the
    STFT, masking, phase-reapply and overlap-add memory all scale 1/n per
    device. Two mask-net modes:

    - ``chunked_mask=False`` (default): the mask network runs over the full
      frame sequence (XLA gathers it), so the output is *identical* to the
      same computation on one device — pinned in
      ``tests/test_sequence_parallel.py``;
    - ``chunked_mask=True``: the mask network runs independently per time
      chunk inside ``shard_map`` — full 1/n activation scaling; recurrent
      mask nets (BLSTM) see chunk-local context, so outputs differ near
      chunk boundaries (framewise nets are exact).

    Input samples must divide by ``mesh.shape[axis] * shift``; the returned
    ``separate(params, mix) -> [B, S, samples]`` reconstructs everything but
    the leading ``size − shift`` no-fade edge.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.sequence import sharded_istft, sharded_stft

    bins = size // 2 + 1

    def _mask_apply(params, flat):  # [B, F, 2*bins] → [B, S, F, 2*bins]
        re, im = flat[..., :bins], flat[..., bins:]
        mag = jnp.sqrt(re * re + im * im)
        safe = jnp.maximum(mag, 1e-30)
        cos, sin = re / safe, im / safe
        preds = model.apply({"params": params}, mag, deterministic=True)
        outs = []
        for s in range(num_speakers):
            est = preds[..., s * bins : (s + 1) * bins]
            outs.append(jnp.concatenate([est * cos, est * sin], axis=-1))
        return jnp.stack(outs, axis=1)

    @jax.jit
    def separate(params, mix):
        flat = sharded_stft(mesh, mix, size, shift, axis=axis)
        if chunked_mask:
            masked = jax.shard_map(
                _mask_apply,
                mesh=mesh,
                in_specs=(P(), P(None, axis, None)),
                out_specs=P(None, None, axis, None),
                check_vma=False,
            )(params, flat)
        else:
            masked = _mask_apply(params, flat)
        b, f = mix.shape[0], flat.shape[1]
        merged = masked.reshape(b * num_speakers, f, 2 * bins)
        wavs = sharded_istft(mesh, merged, size, shift, axis=axis)
        return wavs.reshape(b, num_speakers, -1)

    return separate


def separate_long_directory(
    model,
    params,
    mesh,
    split_dir: str | pathlib.Path,
    out_dir: str | pathlib.Path,
    size: int = 256,
    shift: int = 128,
    num_speakers: int = 2,
    sample_rate: int = 8000,
    normalize: bool = True,
    axis: str = "model",
    chunked_mask: bool = False,
) -> list[pathlib.Path]:
    """Sequence-parallel variant of :func:`separate_directory`.

    Processes one utterance at a time (long-utterance regime), padding each
    to a multiple of ``n_dev · shift`` and trimming back to the true length.
    """
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n_dev = mesh.shape[axis]
    loader = WaveformLoader(
        split_dir,
        batch_size=1,
        sample_rate=sample_rate,
        stft_size=size,
        stft_shift=shift,
        num_speakers=num_speakers,
        pad_quantum_samples=n_dev * shift,
    )
    separate = make_long_separate_fn(
        model, mesh, size, shift, num_speakers, axis=axis, chunked_mask=chunked_mask
    )
    written: list[pathlib.Path] = []
    for batch in prefetch_to_device(iter(loader)):
        wavs = np.asarray(separate(params, jnp.asarray(batch.mix)))
        for i, name in enumerate(batch.names):
            stem = pathlib.Path(name).stem
            true_len = int(batch.sample_lengths[i])
            for s in range(num_speakers):
                path = out_dir / f"{stem}_s{s + 1}.wav"
                audiowrite(
                    wavs[i, s, :true_len],
                    path,
                    samplerate=sample_rate,
                    normalize=normalize,
                    threaded=True,
                )
                written.append(path)
    wait_for_pending_writes()
    return written


def separate_from_records(
    model,
    params,
    record_dir: str | pathlib.Path,
    out_dir: str | pathlib.Path,
    size: int = 256,
    shift: int = 128,
    num_speakers: int = 2,
    batch_size: int = 2,
    sample_rate: int = 8000,
    normalize: bool = True,
) -> list[pathlib.Path]:
    """Separate using the reference's pre-built spectrogram TFRecords as input."""
    from ..data.datasets import load_tfrecord_spectrograms

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    separate = make_separate_from_spectrogram_fn(model, size, shift, num_speakers)
    written: list[pathlib.Path] = []
    for batch in load_tfrecord_spectrograms(record_dir, batch_size=batch_size):
        wavs = np.asarray(
            separate(
                params,
                jnp.asarray(batch.magnitude),
                jnp.asarray(batch.cos_angle),
                jnp.asarray(batch.sin_angle),
                jnp.asarray(batch.lengths),
            )
        )
        for i, name in enumerate(batch.names):
            true_len = separated_length(int(batch.lengths[i]), size, shift)
            for s in range(num_speakers):
                path = out_dir / f"{name}_s{s + 1}.wav"
                audiowrite(
                    wavs[i, s, :true_len], path, samplerate=sample_rate, normalize=normalize
                )
                written.append(path)
    return written


def separate_directory(
    model,
    params,
    split_dir: str | pathlib.Path,
    out_dir: str | pathlib.Path,
    size: int = 256,
    shift: int = 128,
    num_speakers: int = 2,
    batch_size: int = 2,
    sample_rate: int = 8000,
    normalize: bool = True,
    threaded_writes: bool = True,
    compute_dtype=None,
    dp_mesh=None,
    transfer_int16: bool = False,
) -> list[pathlib.Path]:
    """Separate every mixture in ``split_dir/mix`` → ``out_dir/{name}_s{i}.wav``.

    Output naming and normalisation follow the reference's writer
    (`uPIT_baseline.ipynb cell 41`: peak-normalised int16, ``_s1``/``_s2``
    suffixes) so `evaluate` and the reference scorer both consume the result.

    ``dp_mesh``: shard each batch over the mesh's ``data`` axis (multi-chip
    data-parallel serving); ragged final batches are zero-padded to the axis
    size and trimmed after.

    ``transfer_int16``: ship int16 PCM over the host↔device link in BOTH
    directions (upload bit-exact for 16-bit sources; estimates via
    ``ops.quant.quantize_estimates_i16`` — per-signal scale, no clipping,
    ≈0.5 LSB of the int16 wavs written for in-range signals) — halves the
    bytes on the wire for link-bound deployments.
    """
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    loader = WaveformLoader(
        split_dir,
        batch_size=batch_size,
        sample_rate=sample_rate,
        stft_size=size,
        stft_shift=shift,
        num_speakers=num_speakers,
        transfer_int16=transfer_int16,
    )
    separate = make_separate_fn(
        model, size, shift, num_speakers, compute_dtype=compute_dtype,
        dp_mesh=dp_mesh, quantize_output=transfer_int16,
    )
    written: list[pathlib.Path] = []
    if dp_mesh is not None:
        # decode-ahead without default-device placement; pad ragged batches
        # to the data-axis size, then place each shard on its device
        from ..data.datasets import background_iterator
        from ..parallel.sharding import pad_batch_for_mesh, shard_batch

        batches = background_iterator(iter(loader), depth=2)
    else:
        batches = prefetch_to_device(iter(loader))
    for batch in batches:
        mix, lens = batch.mix, batch.frame_lengths
        n_real = mix.shape[0]
        if dp_mesh is not None:
            (mix, lens), n_real = pad_batch_for_mesh((mix, lens), dp_mesh)
            mix, lens = shard_batch((mix, lens), dp_mesh)
        else:
            mix, lens = jnp.asarray(mix), jnp.asarray(lens)
        out = separate(params, mix, lens)
        if transfer_int16:
            codes, scale = out
            wavs = dequantize_estimates_i16(
                np.asarray(codes)[:n_real], np.asarray(scale)[:n_real]
            )
        else:
            wavs = np.asarray(out)[:n_real]
        for i, name in enumerate(batch.names):
            stem = pathlib.Path(name).stem
            true_len = separated_length(int(batch.frame_lengths[i]), size, shift)
            for s in range(num_speakers):
                path = out_dir / f"{stem}_s{s + 1}.wav"
                audiowrite(
                    wavs[i, s, :true_len],
                    path,
                    samplerate=sample_rate,
                    normalize=normalize,
                    threaded=threaded_writes,
                )
                written.append(path)
    wait_for_pending_writes()
    return written
