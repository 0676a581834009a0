"""Typed configuration: one dataclass per workload, JSON round-trip.

Replaces the reference's in-notebook constants and mode strings
(``CASE = 'mixed'|'signal'|'raw'``, hardcoded batch sizes and dataset roots —
`uPIT_baseline.ipynb cells 10, 13`, `parallel_stft.py:23-27`). Every config
serialises to/from JSON so runs are reproducible artifacts.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from dataclasses import dataclass, field
from typing import Any

__all__ = [
    "StftConfig",
    "MeshConfig",
    "UPitTrainConfig",
    "VaeTrainConfig",
    "PriorTrainConfig",
    "SeparateConfig",
    "EvaluateConfig",
    "PrepareDataConfig",
    "load_config",
    "save_config",
]


@dataclass(frozen=True)
class StftConfig:
    size: int = 256
    shift: int = 128
    sample_rate: int = 8000
    method: str = "matmul"  # "matmul" (MXU) or "fft"


@dataclass(frozen=True)
class MeshConfig:
    data: int | None = None  # None → all devices
    model: int = 1
    tensor_parallel: bool = False


@dataclass(frozen=True)
class UPitTrainConfig:
    data_root: str = "./mycode/wsj0_2mix/use_this"
    train_split: str = "tr"
    val_split: str = "cv"
    variant: str = "blstm"  # "blstm" (spectral) / "conv" (raw frames) / "tasnet" (time domain)
    batch_size: int = 2
    epochs: int = 5
    patience: int = 50
    hidden: int = 496
    num_layers: int = 3
    num_speakers: int = 2
    dropout: float = 0.8
    learning_rate: float = 1e-3
    lr_decay_steps: int = 20
    lr_decay_rate: float = 0.96
    lr_schedule: str = "default"  # "cosine": warmup+cosine over the whole run (corpus-scale convergence)
    lr_warmup_steps: int = 500
    sched_epochs: int = 0  # cosine horizon for chunked runs (0 → epochs); resumed chunks keep the global step counter, so pin the full-run horizon here
    dynamic_mix: bool = False  # re-pair sources across utterances + fresh gains every epoch (train loader only)
    grad_clip_norm: float = 0.0  # >0: optax global-norm gradient clipping (bounds transient loss spikes in long runs)
    bf16_compute: bool = False  # mixed-precision train step (blstm/tasnet)
    blstm_pallas_scan: bool = False  # blstm: fused Pallas fwd+bwd recurrence kernels (ops/lstm_train_pallas.py)
    pack: bool = False  # blstm: sequence-packed rows (data/packing.py) — one compiled shape, ~95% frame occupancy
    transfer_int16: bool = False  # ship int16 PCM to the device (half the link bytes; bit-exact for 16-bit sources)
    pack_rows_per_batch: int = 16
    pack_row_seconds: float = 16.0
    tasnet_pallas_trunk: bool = False  # tasnet: Pallas fwd+bwd TCN trunk (implies bf16; DP via make_time_domain_steps(dp_mesh=...))
    frame_size: int = 40  # conv variant
    tasnet_enc_dim: int = 256  # tasnet variant
    tasnet_win: int = 16  # encoder window (stride = win/2); 32 ≈ 2× serving speed
    tasnet_bottleneck: int = 128
    tasnet_hidden: int = 256
    tasnet_blocks: int = 7
    tasnet_repeats: int = 3
    tasnet_causal: bool = False  # cLN + causal depthwise convs (streaming-grade; XLA step path)
    checkpoint_dir: str = "./CKPT"
    seed: int = 42
    stft: StftConfig = field(default_factory=StftConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


@dataclass(frozen=True)
class VaeTrainConfig:
    data_root: str = "./mycode/wsj0_2mix/use_this"
    train_split: str = "tr"
    val_split: str = "cv"
    variant: str = "t3"  # gumbel | v2 | t2 | t3 | t3tok
    source: str = "s1"
    batch_size: int = 2
    epochs: int = 5
    patience: int = 50
    latent_dim: int = 1024  # gumbel variant
    embedding_dim: int = 64
    num_embeddings: int = 512
    skip_embeddings: int = 512  # t3tok variant: second VQ over the U-skip
    deep_depth: int = 2  # t3tok: residual-VQ stages on the bottleneck
    skip_depth: int = 2  # t3tok: residual-VQ stages on the skip
    skip_pq: int = 2  # t3tok: product-quantization sub-vectors per skip stage
    learning_rate: float = 1e-3
    checkpoint_dir: str = "./CKPT"
    seed: int = 42
    sample_rate: int = 8000


@dataclass(frozen=True)
class PriorTrainConfig:
    """Autoregressive CodePrior over a trained tokenizer codec's codes."""

    codec_dir: str = "./CKPT"
    data_root: str = "./mycode/wsj0_2mix/use_this"
    train_split: str = "tr"
    val_split: str = "cv"
    source: str = "s1"
    seq_len: int = 160  # tokens; must be a multiple of the group size (5)
    batch_size: int = 8
    epochs: int = 10
    patience: int = 50
    dim: int = 128
    depth: int = 2
    num_heads: int = 4
    max_distance: int = 16
    learning_rate: float = 3e-4
    checkpoint_dir: str = "./PRIOR"
    seed: int = 42


@dataclass(frozen=True)
class SeparateConfig:
    data_root: str = "./mycode/wsj0_2mix/use_this"
    split: str = "tt"
    out_dir: str = "./test_wav"
    checkpoint_dir: str = "./CKPT"
    batch_size: int = 2
    variant: str = "blstm"
    hidden: int = 496
    num_layers: int = 3
    num_speakers: int = 2
    stft: StftConfig = field(default_factory=StftConfig)


@dataclass(frozen=True)
class EvaluateConfig:
    data_root: str = "./mycode/wsj0_2mix/use_this"
    est_dir: str = "./test_wav"
    split: str = "tt"
    bss_filter_length: int = 512


@dataclass(frozen=True)
class PrepareDataConfig:
    data_root: str = "./mycode/wsj0_2mix/use_this"
    out_root: str = "./mycode/tfrecords"
    splits: tuple[str, ...] = ("tr", "cv", "tt")
    mode: str = "mixed"  # mixed | signal | raw
    stft: StftConfig = field(default_factory=StftConfig)
    max_workers: int = 8


_NESTED = {"StftConfig": None, "MeshConfig": None}  # filled below


def _resolve_type(tp):
    """Field types are strings under `from __future__ import annotations`."""
    if isinstance(tp, str):
        return _NESTED.get(tp)
    return tp if dataclasses.is_dataclass(tp) else None


def _from_dict(cls, payload: dict[str, Any]):
    known = {f.name for f in dataclasses.fields(cls)}
    unknown = set(payload) - known
    if unknown:
        raise ValueError(
            f"unknown {cls.__name__} config keys: {sorted(unknown)} "
            f"(valid: {sorted(known)})"
        )
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in payload:
            continue
        value = payload[f.name]
        nested = _resolve_type(f.type)
        if nested is not None and isinstance(value, dict):
            value = _from_dict(nested, value)
        elif isinstance(value, list):
            value = tuple(value)
        kwargs[f.name] = value
    return cls(**kwargs)


def _register_nested() -> None:
    _NESTED["StftConfig"] = StftConfig
    _NESTED["MeshConfig"] = MeshConfig


_register_nested()


def load_config(cls, path: str | pathlib.Path | None = None, overrides: dict | None = None):
    """Build a config from JSON file + flat overrides (dot-free keys)."""
    payload: dict[str, Any] = {}
    if path is not None:
        payload = json.loads(pathlib.Path(path).read_text())
    if overrides:
        payload.update({k: v for k, v in overrides.items() if v is not None})
    return _from_dict(cls, payload)


def save_config(config, path: str | pathlib.Path) -> None:
    pathlib.Path(path).write_text(json.dumps(dataclasses.asdict(config), indent=2))
