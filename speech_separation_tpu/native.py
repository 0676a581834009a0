"""ctypes bindings for the native runtime library (``native/``).

Loads ``libsstpu_native.so`` if present (build with ``make -C native``) and
exposes:

- :func:`crc32c` — slice-by-8 Castagnoli CRC (TFRecord framing);
- :func:`wav_read` / :func:`wav_read_batch` — threaded RIFF decode to
  float32 mono;
- :func:`quantize_int16` — peak-normalise + clip-counting int16 quantise.

Import-time side effect: when the library loads, the pure-Python
``data.tfrecord.crc32c`` is transparently replaced with the native one.
Everything degrades gracefully to the numpy/Python fallbacks when the
library is absent (``available()`` reports which path is active).
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

__all__ = [
    "available",
    "crc32c",
    "wav_read",
    "wav_read_batch",
    "wav_read_batch_i16",
    "quantize_int16",
]

_LIB_PATHS = [
    pathlib.Path(__file__).resolve().parent.parent / "native" / "libsstpu_native.so",
    pathlib.Path(__file__).resolve().parent / "libsstpu_native.so",
]

_lib = None
for _p in _LIB_PATHS:
    if _p.exists():
        try:
            _lib = ctypes.CDLL(str(_p))
            break
        except OSError:
            _lib = None

if _lib is not None:
    _lib.sstpu_crc32c.restype = ctypes.c_uint32
    _lib.sstpu_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    _lib.sstpu_wav_read.restype = ctypes.c_int
    _lib.sstpu_wav_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib.sstpu_wav_read_batch.restype = None
    _lib.sstpu_wav_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    _lib.sstpu_free.restype = None
    _lib.sstpu_free.argtypes = [ctypes.c_void_p]
    if hasattr(_lib, "sstpu_wav_read_i16"):
        _lib.sstpu_wav_read_i16.restype = ctypes.c_int
        _lib.sstpu_wav_read_i16.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib.sstpu_wav_read_batch_i16.restype = None
        _lib.sstpu_wav_read_batch_i16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
    _lib.sstpu_quantize_int16.restype = ctypes.c_int64
    _lib.sstpu_quantize_int16.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int16),
    ]


def available() -> bool:
    return _lib is not None


def crc32c(data: bytes) -> int:
    if _lib is None:
        from .data.tfrecord import crc32c as py_crc

        return py_crc(data)
    return int(_lib.sstpu_crc32c(data, len(data)))


def _take_buffer(ptr, n: int) -> np.ndarray:
    array = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    _lib.sstpu_free(ptr)
    return array


def wav_read(path: str | pathlib.Path) -> tuple[np.ndarray, int]:
    """Decode one wav to float32 mono. Raises on failure."""
    if _lib is None:
        from .data.audio_io import read_wav

        return read_wav(path)
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    status = _lib.sstpu_wav_read(str(path).encode(), ctypes.byref(out), ctypes.byref(n), ctypes.byref(sr))
    if status != 0:
        raise IOError(f"native wav decode failed ({status}) for {path}")
    return _take_buffer(out, n.value), int(sr.value)


def wav_read_batch(
    paths: list[str | pathlib.Path], num_threads: int = 0
) -> list[tuple[np.ndarray, int]]:
    """Decode many wavs with the native thread pool."""
    if _lib is None:
        return [wav_read(p) for p in paths]
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_float) * n)()
    lens = (ctypes.c_int64 * n)()
    rates = (ctypes.c_int32 * n)()
    statuses = (ctypes.c_int32 * n)()
    _lib.sstpu_wav_read_batch(c_paths, n, outs, lens, rates, statuses, num_threads)
    results = []
    first_error = None
    for i in range(n):
        if statuses[i] != 0:
            # keep consuming: later entries hold malloc'd buffers that must
            # be freed even when an earlier file failed
            if first_error is None:
                first_error = IOError(
                    f"native wav decode failed ({statuses[i]}) for {paths[i]}"
                )
        else:
            results.append((_take_buffer(outs[i], lens[i]), int(rates[i])))
    if first_error is not None:
        raise first_error
    return results


def wav_read_batch_i16(
    paths: list[str | pathlib.Path], num_threads: int = 0
) -> list[tuple[np.ndarray, int] | None]:
    """Decode many mono-PCM16 wavs straight to int16 counts (no float
    round-trip — the int16 link-transfer hot path).

    Entries the fast path cannot serve (multichannel, non-PCM16, missing
    library) come back as ``None``; callers decode those via the float path
    and quantize. Other I/O errors raise.
    """
    if _lib is None or not hasattr(_lib, "sstpu_wav_read_i16"):
        return [None] * len(paths)
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_int16) * n)()
    lens = (ctypes.c_int64 * n)()
    rates = (ctypes.c_int32 * n)()
    statuses = (ctypes.c_int32 * n)()
    _lib.sstpu_wav_read_batch_i16(c_paths, n, outs, lens, rates, statuses, num_threads)
    results: list[tuple[np.ndarray, int] | None] = []
    first_error = None
    for i in range(n):
        if statuses[i] == -6:
            results.append(None)  # layout outside the fast path
        elif statuses[i] != 0:
            # consume the rest before raising — unfreed buffers would leak
            if first_error is None:
                first_error = IOError(
                    f"native wav decode failed ({statuses[i]}) for {paths[i]}"
                )
        else:
            results.append((_take_buffer(outs[i], lens[i]), int(rates[i])))
    if first_error is not None:
        raise first_error
    return results


def quantize_int16(data: np.ndarray, normalize: bool = False) -> tuple[np.ndarray, int]:
    """float audio → (int16 samples, clipped count)."""
    data = np.ascontiguousarray(data, dtype=np.float32)
    if _lib is None:
        scaled = data.astype(np.float64)
        if normalize and np.abs(scaled).max() > 0:
            scaled = scaled / np.abs(scaled).max()
        scaled *= 32767.0
        clipped = int(np.sum(scaled > 32767) + np.sum(scaled < -32768))
        return np.clip(scaled, -32768, 32767).astype(np.int16), clipped
    out = np.empty(data.shape, np.int16)
    clipped = _lib.sstpu_quantize_int16(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        data.size,
        1 if normalize else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out, int(clipped)


def _install_fast_paths() -> None:
    """Swap the pure-Python crc32c for the native one in the TFRecord codec."""
    if _lib is None:
        return
    from .data import tfrecord as _tfrecord

    _tfrecord.crc32c = crc32c


_install_fast_paths()
