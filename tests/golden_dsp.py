"""Independent numpy re-derivation of the reference STFT/iSTFT semantics.

Used as the golden oracle in unit tests. Deliberately written in plain,
loop-heavy numpy so it is easy to audit against the published formulas:
Blackman analysis window, fade padding of ``size - shift`` on both sides,
trailing pad to whole frames, rFFT; and for synthesis the Krueger-A.92
biorthogonal dual window (with the reference's exclusion of the final window
sample from the sum-of-squares, and its net cancellation of the ``1/size``
factor), per-frame irFFT and overlap-add, then fade-crop.
"""

import numpy as np


def blackman_np(m: int) -> np.ndarray:
    k = np.arange(m)
    return 0.42 - 0.5 * np.cos(2 * np.pi * k / (m - 1)) + 0.08 * np.cos(4 * np.pi * k / (m - 1))


def golden_stft(x: np.ndarray, size: int = 256, shift: int = 128, fading: bool = True) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    if fading:
        x = np.concatenate([np.zeros(size - shift), x, np.zeros(size - shift)])
    n_frames = int(np.ceil((len(x) - size + shift) / shift))
    total = n_frames * shift + size - shift
    x = np.concatenate([x, np.zeros(total - len(x))])
    win = blackman_np(size)
    out = np.empty((n_frames, size // 2 + 1), dtype=np.complex128)
    for j in range(n_frames):
        out[j] = np.fft.rfft(x[j * shift : j * shift + size] * win)
    return out


def golden_synthesis_window(size: int, shift: int) -> np.ndarray:
    win = blackman_np(size)
    periods = size // shift
    sos = np.zeros(shift)
    for s in range(shift):
        for p in range(periods + 1):
            a = s + p * shift
            if a + 1 < size:
                sos[s] += win[a] ** 2
    sos = np.tile(sos, periods)
    # net window: the /size of Krueger A.92 is cancelled by the reference's *= size
    return win / sos


def golden_istft(spec: np.ndarray, size: int = 256, shift: int = 128, fading: bool = True) -> np.ndarray:
    ws = golden_synthesis_window(size, shift)
    n_frames = spec.shape[0]
    out = np.zeros(n_frames * shift + size - shift)
    for j in range(n_frames):
        out[j * shift : j * shift + size] += ws * np.fft.irfft(spec[j], n=size)
    if fading:
        out = out[size - shift : len(out) - (size - shift)]
    return out
