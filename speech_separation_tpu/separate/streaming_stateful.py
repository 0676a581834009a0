"""Exact stateful streaming for the causal Conv-TasNet.

The window streamer (``separate/streaming.py``) re-runs the model on a
sliding ``context + hop`` window every hop: O(window) compute per hop and
an approximation (window-local norm statistics, truncated receptive field).
For the **causal** configuration (``ConvTasNet(causal=True)`` —
cumulative layer norm + left-padded depthwise convs) none of that is
necessary: every layer's dependence on the past is a finite carried state,
so a hop can be processed **exactly** with O(hop) compute:

- encoder: a ring of the last few raw samples (the conv window overlap);
- each TCN block's causal depthwise conv: the last ``(kernel−1)·dilation``
  frames of its input;
- every cumulative layer norm: three running scalars per batch row
  (count, Σx, Σx²) — the stats continue across hops exactly as offline;
- decoder (transposed conv): the overlap-add tail of partial sums.

``CausalStreamingSeparator.push(hop)`` runs ONE fixed-shape jitted step per
hop (state lives on device between pushes; only emitted audio is fetched)
and the concatenated emissions equal ``model.apply`` on the whole utterance
to float tolerance — pinned by ``tests/test_streaming_stateful.py``.
Algorithmic latency: one hop + ``win`` samples (2 ms at 8 kHz, win=16) for
the encoder/decoder window overlap.

The reference has no streaming story at all (its notebooks separate whole
pre-padded utterances, `uPIT_baseline.ipynb cell 41`); this is the
TPU-native low-latency serving mode built on the causal model.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["CausalStreamingSeparator", "stateful_stream_separate"]


class _ClnState(NamedTuple):
    count: jnp.ndarray  # [B] elements seen so far (channels × frames)
    s1: jnp.ndarray  # [B] running Σx
    s2: jnp.ndarray  # [B] running Σx²


def _cln_chunk(x, gamma, beta, st: _ClnState):
    """Cumulative layer norm over a chunk, continuing carried statistics.

    ``x``: [B, F, C] fp32. Matches ``models.tasnet._CumulativeLayerNorm``
    exactly when the carried stats cover the preceding frames.
    """
    b, f, c = x.shape
    fsum = jnp.sum(x, axis=2)  # [B, F]
    fsq = jnp.sum(jnp.square(x), axis=2)
    csum = st.s1[:, None] + jnp.cumsum(fsum, axis=1)
    csq = st.s2[:, None] + jnp.cumsum(fsq, axis=1)
    count = st.count[:, None] + c * jnp.arange(1, f + 1, dtype=jnp.float32)[None]
    mean = csum / count
    var = jnp.maximum(csq / count - jnp.square(mean), 0.0)
    out = gamma * (x - mean[..., None]) / jnp.sqrt(var + 1e-8)[..., None] + beta
    new = _ClnState(count[:, -1], csum[:, -1], csq[:, -1])
    return out, new


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _dense(x, p):  # 1×1 conv == dense over channels
    return jnp.einsum("bfc,co->bfo", x, p["kernel"][0]) + p["bias"]


class _State(NamedTuple):
    in_buf: jnp.ndarray  # [B, 12] raw samples not yet framed (incl. SAME pad)
    cln: tuple  # per-norm _ClnState, order: input_norm, then (norm1, norm2)*blocks
    dw_tails: tuple  # per-block [B, (k−1)·d, hidden] depthwise context
    ola: jnp.ndarray  # [B, S, win−stride] decoder partial sums not yet final


class CausalStreamingSeparator:
    """Exact O(hop) streaming around a causal ``ConvTasNet`` param pytree.

    ``model``: the ``ConvTasNet`` module instance (``causal=True``) whose
    ``params`` were trained; hyperparameters are read off the module.
    ``hop_samples`` must be a multiple of the encoder stride (``win // 2``).
    """

    def __init__(self, model, params, hop_samples: int):
        if not model.causal:
            raise ValueError("stateful streaming requires ConvTasNet(causal=True)")
        if model.dtype is not None and model.dtype != jnp.float32:
            # the exactness contract (emissions ≡ model.apply) is proven in
            # fp32; this engine computes fp32 throughout, so a bf16 module
            # would diverge from its own offline forward — stream the fp32
            # twin instead (params are dtype-independent)
            raise ValueError(
                "stateful streaming computes fp32; construct the fp32 model "
                f"(dtype=None) for streaming, got dtype={model.dtype}"
            )
        stride = model.win // 2
        if hop_samples % stride != 0 or hop_samples < model.win:
            raise ValueError(f"hop must be a multiple of {stride} and ≥ {model.win}")
        self.model = model
        self.params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
        self.hop = hop_samples
        self.stride = stride
        self.win = model.win
        # SAME conv (kernel=win, stride=win/2) pads (win−stride)/2 each side
        self.pad = (self.win - stride) // 2
        # _stream_step is itself jitted (model_cfg/first static); partial
        # only binds the static config — wrapping in another jit would make
        # `first` a tracer
        self._step = functools.partial(_stream_step, model_cfg=_cfg(model))
        self._state = None
        self._batch = None
        self._flushed = False

    def _init_state(self, b: int) -> _State:
        m = self.model
        cln = [_ClnState(jnp.zeros(b), jnp.zeros(b), jnp.zeros(b))]
        tails = []
        for r in range(m.repeats):
            for x in range(m.blocks):
                cln.append(_ClnState(jnp.zeros(b), jnp.zeros(b), jnp.zeros(b)))
                cln.append(_ClnState(jnp.zeros(b), jnp.zeros(b), jnp.zeros(b)))
                tails.append(jnp.zeros((b, (m.kernel - 1) * 2**x, m.hidden)))
        # in_buf starts as the offline SAME left pad (zeros); after the first
        # push it settles at pad+stride samples (one extra jit shape)
        return _State(
            in_buf=jnp.zeros((b, self.pad)),
            cln=tuple(cln),
            dw_tails=tuple(tails),
            ola=jnp.zeros((b, m.num_speakers, self.win - self.stride)),
        )

    def push(self, hop: np.ndarray) -> np.ndarray:
        """Feed ``[B, hop]`` (or ``[hop]``) samples; returns the newly
        finalized ``[B, S, n]`` samples. The first push emits
        ``hop − win + stride − pad`` samples (its frames minus the one kept
        for overlap, minus the decoder's one-time SAME left-pad trim of
        ``pad = (win − stride) // 2``); steady pushes emit exactly ``hop``."""
        if self._flushed:
            raise RuntimeError("push() after flush(): the stream is finalized")
        hop = jnp.atleast_2d(jnp.asarray(hop, jnp.float32))
        # `first` derives from _state (single source of truth) and the
        # one-time left-pad trim applies only after a successful first step
        first = self._state is None
        if first:
            self._batch = hop.shape[0]
            self._state = self._init_state(self._batch)
        try:
            self._state, out = self._step(self.params, self._state, hop, first=first)
        except Exception:
            if first:
                self._state = None  # a retried push is still the first push
            raise
        return np.asarray(out)

    def flush(self) -> np.ndarray:
        """Finalize: push one stride of zero runout (the offline SAME right
        pad) to produce the last frame, then emit the overlap-add tail that
        no future frame can touch. Total stream = offline ``model.apply`` on
        the hop-padded waveform. Call exactly once, after ≥1 push."""
        if self._state is None:
            raise RuntimeError("flush() before any push(): nothing to finalize")
        if self._flushed:
            raise RuntimeError("flush() called twice: the stream is finalized")
        self._flushed = True
        zeros = jnp.zeros((self._batch, self.stride), jnp.float32)
        self._state, out = self._step(self.params, self._state, zeros, first=False)
        tail = (
            self._state.ola[:, :, : self.pad]
            + self.params["decoder"]["bias"][0]
        )
        return np.concatenate([np.asarray(out), np.asarray(tail)], axis=2)


def _cfg(model):
    # hashable (static jit arg): tuple of items, rebuilt as a dict inside
    return (
        ("num_speakers", model.num_speakers),
        ("enc_dim", model.enc_dim),
        ("win", model.win),
        ("bottleneck", model.bottleneck),
        ("hidden", model.hidden),
        ("kernel", model.kernel),
        ("blocks", model.blocks),
        ("repeats", model.repeats),
    )


@functools.partial(jax.jit, static_argnames=("model_cfg", "first"))
def _stream_step(params, st: _State, hop, *, model_cfg, first: bool):
    model_cfg = dict(model_cfg)
    S = model_cfg["num_speakers"]
    N = model_cfg["enc_dim"]
    win = model_cfg["win"]
    stride = win // 2
    b, h = hop.shape

    # ---- encoder: frame whatever is now complete ------------------------
    buf = jnp.concatenate([st.in_buf, hop], axis=1)  # [B, 12 + hop] steady
    n_frames = (buf.shape[1] - win) // stride + 1
    used = n_frames * stride
    new_buf = buf[:, used:]
    feats = jax.nn.relu(
        jax.lax.conv_general_dilated(
            buf[:, : (n_frames - 1) * stride + win, None],
            params["encoder"]["kernel"],
            window_strides=(stride,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        + params["encoder"]["bias"]
    )  # [B, F, N]

    cln = list(st.cln)
    tails = list(st.dw_tails)
    ci = 0

    x, cln[ci] = _cln_chunk(
        feats, params["input_norm"]["gamma"], params["input_norm"]["beta"], cln[ci]
    )
    ci += 1
    hcur = _dense(x, params["input_proj"])  # [B, F, bottleneck]
    skip_sum = jnp.zeros_like(hcur)

    ti = 0
    for r in range(model_cfg["repeats"]):
        for xblk in range(model_cfg["blocks"]):
            p = params[f"tcn_{r}_{xblk}"]
            dil = 2**xblk
            y = _dense(hcur, p["expand"])
            y = _prelu(y, p["prelu1"]["alpha"])
            y, cln[ci] = _cln_chunk(y, p["norm1"]["gamma"], p["norm1"]["beta"], cln[ci])
            ci += 1
            ctx = jnp.concatenate([tails[ti], y], axis=1)
            tails[ti] = ctx[:, -tails[ti].shape[1] :] if tails[ti].shape[1] else tails[ti]
            ti += 1
            y = (
                jax.lax.conv_general_dilated(
                    ctx,
                    p["depthwise"]["kernel"],
                    window_strides=(1,),
                    padding="VALID",
                    rhs_dilation=(dil,),
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    feature_group_count=model_cfg["hidden"],
                )
                + p["depthwise"]["bias"]
            )
            y = _prelu(y, p["prelu2"]["alpha"])
            y, cln[ci] = _cln_chunk(y, p["norm2"]["gamma"], p["norm2"]["beta"], cln[ci])
            ci += 1
            hcur = hcur + _dense(y, p["res_out"])
            skip_sum = skip_sum + _dense(y, p["skip_out"])

    m = _prelu(skip_sum, params["mask_prelu"]["alpha"])
    masks = jax.nn.sigmoid(_dense(m, params["mask_proj"]))  # [B, F, S*N]
    f = feats.shape[1]
    masks = masks.reshape(b, f, S, N)
    masked = (masks * feats[:, :, None, :]).transpose(0, 2, 1, 3)  # [B, S, F, N]

    # ---- decoder: VALID transpose + carried overlap-add ------------------
    flat = masked.reshape(b * S, f, N)
    seg = jax.lax.conv_transpose(
        flat,
        params["decoder"]["kernel"],
        strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[..., 0].reshape(b, S, (f - 1) * stride + win)
    seg = seg.at[:, :, : win - stride].add(st.ola)
    emit = seg[:, :, : f * stride] + params["decoder"]["bias"][0]
    new_ola = seg[:, :, f * stride :]
    if first:
        # offline SAME trims the decoder's left pad: drop those samples once
        emit = emit[:, :, (win - stride) // 2 :]
    return (
        _State(in_buf=new_buf, cln=tuple(cln), dw_tails=tuple(tails), ola=new_ola),
        emit,
    )


def stateful_stream_separate(model, params, mix: np.ndarray, hop_samples: int):
    """Stream a full waveform through :class:`CausalStreamingSeparator`.

    Returns ``([S, samples], per_hop_latency_seconds)`` — the emissions
    stitched and trimmed to the input length (matching ``model.apply`` on
    the whole utterance), plus each push's wall-clock time.
    """
    import time

    mix = np.asarray(mix, np.float32)
    if mix.ndim == 1:
        mix = mix[None]
    b, samples = mix.shape
    sep = CausalStreamingSeparator(model, params, hop_samples)
    n_hops = -(-samples // hop_samples)
    padded = np.zeros((b, n_hops * hop_samples), np.float32)
    padded[:, :samples] = mix
    outs, lat = [], []
    for i in range(n_hops):
        t0 = time.perf_counter()
        outs.append(sep.push(padded[:, i * hop_samples : (i + 1) * hop_samples]))
        lat.append(time.perf_counter() - t0)
    outs.append(sep.flush())
    wav = np.concatenate(outs, axis=2)[:, :, :samples]
    return (wav[0] if wav.shape[0] == 1 else wav), lat
