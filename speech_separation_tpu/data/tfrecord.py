"""TFRecord + ``tf.train.SequenceExample`` codec, pure Python, no TensorFlow.

The reference stores features as TFRecord files of ``SequenceExample`` protos
(`uPIT_baseline.ipynb cell 10`, `parallel_stft.py:217-229`). This module
re-implements both layers from the wire formats so the framework can read the
reference's records (including the bundled fixture's pre-built ones) and write
records the reference could read back — without importing TensorFlow:

- TFRecord framing: ``uint64 length | masked crc32c(length) | payload |
  masked crc32c(payload)`` with the Castagnoli CRC and TF's rotate+add mask;
- a minimal protobuf wire-format codec for the ``SequenceExample`` /
  ``FeatureLists`` / ``Feature`` message graph (float lists packed or
  unpacked, bytes lists).

Interop is pinned by tests that cross-check against TensorFlow's own parser
when TF is importable.
"""

from __future__ import annotations

import pathlib
import struct
from typing import Iterator

import numpy as np

__all__ = [
    "read_tfrecord_file",
    "write_tfrecord_file",
    "parse_sequence_example",
    "build_sequence_example",
]

# ---------------------------------------------------------------------------
# crc32c (Castagnoli, reflected polynomial 0x82F63B78) + TF masking
# ---------------------------------------------------------------------------

def _make_crc_table() -> list[int]:
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (0x82F63B78 if c & 1 else 0)
        table.append(c)
    return table


_CRC_TABLE = _make_crc_table()


def crc32c(data: bytes) -> int:
    """Pure-Python crc32c; the native runtime library overrides this when built."""
    crc = 0xFFFFFFFF
    table = _CRC_TABLE
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


# ---------------------------------------------------------------------------
# TFRecord framing
# ---------------------------------------------------------------------------


def read_tfrecord_file(path: str | pathlib.Path, verify_crc: bool = False) -> Iterator[bytes]:
    """Yield the raw payload of each record in a TFRecord file."""
    with open(path, "rb") as handle:
        while True:
            header = handle.read(12)
            if not header:
                return
            if len(header) < 12:
                raise ValueError(f"truncated TFRecord header in {path}")
            (length,) = struct.unpack("<Q", header[:8])
            if verify_crc:
                (length_crc,) = struct.unpack("<I", header[8:])
                if _masked_crc(header[:8]) != length_crc:
                    raise ValueError(f"length CRC mismatch in {path}")
            payload = handle.read(length)
            footer = handle.read(4)
            if len(payload) < length or len(footer) < 4:
                raise ValueError(f"truncated TFRecord payload in {path}")
            if verify_crc:
                (payload_crc,) = struct.unpack("<I", footer)
                if _masked_crc(payload) != payload_crc:
                    raise ValueError(f"payload CRC mismatch in {path}")
            yield payload


def write_tfrecord_file(path: str | pathlib.Path, records: list[bytes]) -> None:
    with open(path, "wb") as handle:
        for payload in records:
            header = struct.pack("<Q", len(payload))
            handle.write(header)
            handle.write(struct.pack("<I", _masked_crc(header)))
            handle.write(payload)
            handle.write(struct.pack("<I", _masked_crc(payload)))


# ---------------------------------------------------------------------------
# protobuf wire-format primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7


def _write_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _iter_fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) over a message's fields."""
    pos = 0
    end = len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:
            value, pos = _read_varint(buf, pos)
        elif wire == 1:
            value = buf[pos : pos + 8]
            pos += 8
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            value = buf[pos : pos + length]
            pos += length
        elif wire == 5:
            value = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, value


def _ld(field: int, payload: bytes) -> bytes:
    """Encode a length-delimited field."""
    return _write_varint((field << 3) | 2) + _write_varint(len(payload)) + payload


# ---------------------------------------------------------------------------
# SequenceExample messages
# ---------------------------------------------------------------------------


def _parse_feature(buf: bytes):
    """Feature { bytes_list = 1; float_list = 2; int64_list = 3 }."""
    for field, wire, value in _iter_fields(buf):
        if field == 2 and wire == 2:  # FloatList
            floats: list[float] = []
            for f2, w2, v2 in _iter_fields(value):
                if f2 != 1:
                    continue
                if w2 == 2:  # packed
                    floats.extend(np.frombuffer(v2, dtype="<f4").tolist())
                elif w2 == 5:
                    floats.append(struct.unpack("<f", v2)[0])
            return np.asarray(floats, dtype=np.float32)
        if field == 1 and wire == 2:  # BytesList
            items = [v2 for f2, w2, v2 in _iter_fields(value) if f2 == 1 and w2 == 2]
            return items if len(items) != 1 else items[0]
        if field == 3 and wire == 2:  # Int64List
            ints: list[int] = []
            for f2, w2, v2 in _iter_fields(value):
                if f2 != 1:
                    continue
                if w2 == 2:  # packed varints
                    pos = 0
                    while pos < len(v2):
                        item, pos = _read_varint(v2, pos)
                        ints.append(item)
                elif w2 == 0:
                    ints.append(v2)
            return np.asarray(ints, dtype=np.int64)
    return np.zeros(0, dtype=np.float32)


def parse_sequence_example(payload: bytes) -> dict[str, list]:
    """Decode a SequenceExample's feature_lists into {name: [per-step values]}.

    Float features come back as float32 arrays, bytes features as ``bytes``.
    """
    out: dict[str, list] = {}
    for field, wire, value in _iter_fields(payload):
        if field != 2 or wire != 2:  # feature_lists
            continue
        for f1, w1, entry in _iter_fields(value):
            if f1 != 1 or w1 != 2:  # map entry
                continue
            key = None
            features: list = []
            for f2, w2, v2 in _iter_fields(entry):
                if f2 == 1 and w2 == 2:
                    key = v2.decode("utf-8")
                elif f2 == 2 and w2 == 2:  # FeatureList
                    for f3, w3, v3 in _iter_fields(v2):
                        if f3 == 1 and w3 == 2:
                            features.append(_parse_feature(v3))
            if key is not None:
                out[key] = features
    return out


def _encode_float_feature(values: np.ndarray) -> bytes:
    packed = np.asarray(values, dtype="<f4").tobytes()
    float_list = _ld(1, packed)
    return _ld(2, float_list)


def _encode_bytes_feature(value: bytes) -> bytes:
    bytes_list = _ld(1, value)
    return _ld(1, bytes_list)


def build_sequence_example(feature_lists: dict[str, list]) -> bytes:
    """Encode {name: [per-step values]} as SequenceExample bytes.

    Each list item is either a 1-D float array (FloatList feature) or
    ``bytes`` / ``str`` (BytesList feature).
    """
    entries = b""
    for key, steps in feature_lists.items():
        features = b""
        for step in steps:
            if isinstance(step, (bytes, str)):
                raw = step.encode("utf-8") if isinstance(step, str) else step
                features += _ld(1, _encode_bytes_feature(raw))
            else:
                features += _ld(1, _encode_float_feature(np.atleast_1d(step)))
        entry = _ld(1, key.encode("utf-8")) + _ld(2, features)
        entries += _ld(1, entry)
    return _ld(2, entries)
