"""Native runtime library tests (built on demand with make)."""

import pathlib
import subprocess

import numpy as np
import pytest

NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="session", autouse=False)
def native_lib():
    so = NATIVE_DIR / "libsstpu_native.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("native toolchain unavailable")
    from speech_separation_tpu import native

    if not native.available():
        pytest.skip("native library failed to load")
    return native


def test_native_crc32c_vectors(native_lib):
    assert native_lib.crc32c(b"") == 0
    assert native_lib.crc32c(b"a") == 0xC1D04330
    assert native_lib.crc32c(b"123456789") == 0xE3069283
    assert native_lib.crc32c(bytes(32)) == 0x8A9136AA


def test_native_crc_matches_python(native_lib):
    from speech_separation_tpu.data.tfrecord import _make_crc_table

    table = _make_crc_table()

    def py_crc(data: bytes) -> int:
        crc = 0xFFFFFFFF
        for b in data:
            crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
        return crc ^ 0xFFFFFFFF

    rng = np.random.default_rng(0)
    for n in (1, 7, 8, 9, 1000, 4096):
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native_lib.crc32c(blob) == py_crc(blob)


def test_native_wav_matches_scipy(native_lib, fixture_root):
    from scipy.io import wavfile

    path = next((fixture_root / "tt" / "mix").glob("*.wav"))
    got, sr = native_lib.wav_read(path)
    rate, raw = wavfile.read(str(path))
    want = raw.astype(np.float32) / 32768.0
    assert sr == rate
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_batch_decode(native_lib, fixture_root):
    paths = sorted((fixture_root / "tt" / "mix").glob("*.wav"))
    results = native_lib.wav_read_batch(paths, num_threads=4)
    assert len(results) == len(paths)
    single, _ = native_lib.wav_read(paths[0])
    np.testing.assert_array_equal(results[0][0], single)


def test_native_quantize(native_lib):
    data = np.asarray([0.0, 0.5, -0.5, 2.0], np.float32)
    q, clipped = native_lib.quantize_int16(data)
    assert clipped == 1
    assert q[3] == 32767
    np.testing.assert_allclose(q[1], 16383, atol=1)

    qn, c = native_lib.quantize_int16(np.asarray([0.25, -0.5], np.float32), normalize=True)
    assert c == 0 and qn[1] == -32767


def test_tfrecord_writer_uses_native_crc(native_lib, tmp_path):
    """Records written with the native CRC verify under strict reading."""
    from speech_separation_tpu import data

    records = [b"abc", bytes(1000)]
    path = tmp_path / "native_crc.tfrecords"
    data.write_tfrecord_file(path, records)
    assert list(data.read_tfrecord_file(path, verify_crc=True)) == records


def test_native_i16_decode_matches_quantized_float(native_lib, fixture_root):
    """The mono-PCM16 int16 fast path is a memcpy of the container payload:
    it must equal quantize_i16 of the float decode bit-for-bit (and imply
    the i/32768 dequantization reproduces the float decoder exactly)."""
    from speech_separation_tpu.data.audio_io import quantize_i16

    paths = sorted((fixture_root / "tt" / "mix").glob("*.wav"))[:3]
    decoded = native_lib.wav_read_batch_i16(paths)
    assert all(d is not None for d in decoded)
    for p, (i16, rate) in zip(paths, decoded):
        f32, rate_f = native_lib.wav_read(p)
        assert rate == rate_f
        assert i16.dtype == np.int16
        np.testing.assert_array_equal(i16, quantize_i16(f32))
        np.testing.assert_array_equal(i16.astype(np.float32) / 32768.0, f32)


def test_native_i16_decode_rejects_nonmono(native_lib, tmp_path):
    """Layouts outside the fast path come back as None (float fallback)."""
    from scipy.io import wavfile

    stereo = (np.random.default_rng(0).standard_normal((100, 2)) * 1000).astype(
        np.int16
    )
    path = tmp_path / "stereo.wav"
    wavfile.write(str(path), 8000, stereo)
    (result,) = native_lib.wav_read_batch_i16([path])
    assert result is None


def test_native_decoder_survives_malformed_wavs(native_lib, tmp_path):
    """Truncated/malformed RIFF containers must come back as error codes
    (or None on the i16 path), never crash or read out of bounds — the
    parser clamps declared chunk lengths to the actual payload."""
    from scipy.io import wavfile

    good = tmp_path / "good.wav"
    wavfile.write(str(good), 8000, (np.arange(200) % 100).astype(np.int16))
    payload = good.read_bytes()

    # a data chunk whose declared length overruns the file is CLAMPED (the
    # remaining samples decode) — intended lenient behavior, no OOB
    trunc_path = tmp_path / "truncated.wav"
    trunc_path.write_bytes(payload[: len(payload) - 150])
    (clamped,) = native_lib.wav_read_batch_i16([trunc_path])
    assert clamped is not None and clamped[0].size < 200

    cases = {
        # fmt chunk header as the very last 8 bytes (declared fields missing)
        "fmt_at_eof": payload[:12] + b"fmt \x10\x00\x00\x00",
        # truncated mid-header
        "short": payload[:20],
        # declared fmt length shorter than the fields the parser needs
        "tiny_fmt": payload[:12] + b"fmt \x04\x00\x00\x00" + b"\x01\x00\x01\x00",
        "garbage": bytes(64),
    }
    for name, blob in cases.items():
        path = tmp_path / f"{name}.wav"
        path.write_bytes(blob)
        with pytest.raises(IOError):
            native_lib.wav_read(path)
        # i16 path: clean per-file fallback (None) or a clean IOError —
        # what matters is no crash / no OOB read
        try:
            result = native_lib.wav_read_batch_i16([path])
            assert result[0] is None
        except IOError:
            pass

    # the good file still decodes after all that
    sig, rate = native_lib.wav_read(good)
    assert rate == 8000 and sig.size == 200
