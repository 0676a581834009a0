"""Jitted train / eval step factories.

Each factory closes over a model and returns ``(train_step, eval_step)`` pure
functions. The uPIT waveform steps fuse the whole pipeline into one XLA
program: STFT → PSM labels → BLSTM → masks → PIT loss → backward → Adam — the
host only supplies padded waveforms (compare the reference, which streams
precomputed 258-dim frames from disk per step: `uPIT_baseline.ipynb cell 31`).

Steps take raw arrays (not loader NamedTuples) so the same compiled function
serves both the single-chip and the mesh-sharded paths.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..losses.pit import pit_loss, pit_loss_packed, pit_si_sdr_loss
from ..losses.sisdr import summed_squared_error
from ..ops.features import psm_features

__all__ = [
    "make_upit_waveform_steps",
    "make_upit_packed_steps",
    "make_upit_packed_resident_steps",
    "make_upit_raw_steps",
    "make_upit_spectrogram_steps",
    "make_vae_steps",
    "make_time_domain_steps",
]


# int16 batches from loaders' transfer_int16=True dequantize on device
# (ops/quant.py — the single home for the wire convention)
from ..ops.quant import dequant_i16 as _dequant  # noqa: E402


def make_upit_waveform_steps(
    model,
    size: int = 256,
    shift: int = 128,
    num_speakers: int = 2,
    donate_state: bool = True,
    compute_dtype=None,
    pallas_scan: bool = False,
):
    """Steps over (mix [B,S], sources [B,n,S], frame_lengths [B]).

    ``compute_dtype=jnp.bfloat16`` runs the mask network's forward+backward
    in bf16 (mixed precision: fp32 master weights cast inside the step, DSP
    features, PIT loss and optimizer update stay fp32 — the gradient of the
    cast delivers fp32 grads to Adam).

    ``pallas_scan=True`` runs every BiLSTM recurrence — forward AND
    backward-through-time — as fused Pallas kernels
    (``ops/lstm_train_pallas.py``) over the same param pytree; dense layers,
    DSP, loss and optimizer stay XLA. Same checkpoints. Dropout uses a
    different RNG stream derivation than the flax path (statistically
    equivalent; deterministic-mode losses/grads match to fp rounding).
    """
    if pallas_scan:
        from ..models.upit import upit_blstm_train_forward

        interp = jax.default_backend() != "tpu"

    def _loss(params, mix, sources, frame_lengths, dropout_rng, deterministic):
        feats = psm_features(_dequant(mix), _dequant(sources), size, shift)
        kwargs = dict(deterministic=deterministic)
        if not deterministic:
            kwargs["rngs"] = {"dropout": dropout_rng}
        net_in = feats.magnitude
        p = params
        if compute_dtype is not None:
            p = jax.tree.map(lambda x: x.astype(compute_dtype), params)
            net_in = net_in.astype(compute_dtype)
        if pallas_scan:
            preds = upit_blstm_train_forward(
                p,
                net_in,
                num_layers=model.num_layers,
                num_speakers=model.num_speakers,
                dropout_rate=model.dropout_rate,
                dropout_rng=None if deterministic else dropout_rng,
                compute_dtype=compute_dtype or jnp.float32,
                interpret=interp,
            ).astype(jnp.float32)
        else:
            preds = model.apply({"params": p}, net_in, **kwargs).astype(jnp.float32)
        return pit_loss(preds, feats.labels, frame_lengths, num_speakers)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate_state else ())
    def train_step(state, mix, sources, frame_lengths):
        rng, sub = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(_loss)(
            state.params, mix, sources, frame_lengths, sub, False
        )
        return state.apply_gradients(grads).replace(rng=rng), loss

    @jax.jit
    def eval_step(state, mix, sources, frame_lengths):
        return _loss(state.params, mix, sources, frame_lengths, state.rng, True)

    return train_step, eval_step


def _packed_loss_builder(
    model,
    size: int,
    shift: int,
    num_speakers: int,
    num_segments: int,
    compute_dtype,
    pallas_scan: bool,
):
    """The packed-row loss shared by the loader-fed and device-resident
    step factories (semantics documented on :func:`make_upit_packed_steps`)."""
    if pallas_scan:
        from ..models.upit import upit_blstm_train_forward

        interp = jax.default_backend() != "tpu"

    def _loss(params, mix, sources, frame_seg, dropout_rng, deterministic):
        feats = psm_features(_dequant(mix), _dequant(sources), size, shift)
        kwargs = dict(deterministic=deterministic, segment_ids=frame_seg)
        if not deterministic:
            kwargs["rngs"] = {"dropout": dropout_rng}
        net_in = feats.magnitude
        p = params
        if compute_dtype is not None:
            p = jax.tree.map(lambda x: x.astype(compute_dtype), params)
            net_in = net_in.astype(compute_dtype)
        if pallas_scan:
            preds = upit_blstm_train_forward(
                p,
                net_in,
                num_layers=model.num_layers,
                num_speakers=model.num_speakers,
                dropout_rate=model.dropout_rate,
                dropout_rng=None if deterministic else dropout_rng,
                compute_dtype=compute_dtype or jnp.float32,
                interpret=interp,
                segment_ids=frame_seg,
            ).astype(jnp.float32)
        else:
            preds = model.apply({"params": p}, net_in, **kwargs).astype(jnp.float32)
        return pit_loss_packed(
            preds, feats.labels, frame_seg, num_speakers, num_segments
        )

    return _loss


def make_upit_packed_steps(
    model,
    size: int = 256,
    shift: int = 128,
    num_speakers: int = 2,
    num_segments: int = 8,
    donate_state: bool = True,
    compute_dtype=None,
    pallas_scan: bool = False,
):
    """Steps over sequence-packed rows (``data/packing.py``):
    ``(mix [R, row_samples], sources [R, n, row_samples],
    frame_seg [R, row_frames])``.

    Semantics are exactly :func:`make_upit_waveform_steps` applied to each
    packed utterance individually — segment-id carry resets isolate
    utterances inside the BiLSTM, and :func:`pit_loss_packed` runs the
    permutation search per segment (the returned loss is the same "sum over
    utterances" the unpacked step reports; parity pinned in
    ``tests/test_packed.py``). Every batch has one static shape: one XLA /
    Pallas compile for the whole corpus, and no padding waste beyond one
    guard frame per utterance.

    ``pallas_scan=True`` routes the recurrences through the packed variant
    of the fused fwd+bwd Pallas kernels
    (``ops/lstm_train_pallas.bilstm_train_pallas_packed``).
    """
    _loss = _packed_loss_builder(
        model, size, shift, num_speakers, num_segments, compute_dtype, pallas_scan
    )

    @functools.partial(jax.jit, donate_argnums=(0,) if donate_state else ())
    def train_step(state, mix, sources, frame_seg):
        rng, sub = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(_loss)(
            state.params, mix, sources, frame_seg, sub, False
        )
        return state.apply_gradients(grads).replace(rng=rng), loss

    @jax.jit
    def eval_step(state, mix, sources, frame_seg):
        return _loss(state.params, mix, sources, frame_seg, state.rng, True)

    return train_step, eval_step


def make_upit_packed_resident_steps(
    model,
    mix_all,
    sources_all,
    frame_seg_all,
    size: int = 256,
    shift: int = 128,
    num_speakers: int = 2,
    num_segments: int = 8,
    donate_state: bool = True,
    compute_dtype=None,
    pallas_scan: bool = False,
):
    """:func:`make_upit_packed_steps` over a **device-resident corpus**
    (``data/device_dataset.ResidentPackedCorpus``): the packed row arrays
    live in HBM once, and each step takes only ``idx [R] int32`` — the
    per-step host→device traffic is a few dozen bytes instead of the rows
    themselves. Rows are gathered on device (``jnp.take``), then the exact
    packed loss runs; losses/gradients are identical to the loader-fed
    steps on the same rows (pinned in ``tests/test_packed.py``).

    The closed-over arrays are captured by the jitted programs (passed by
    reference each call, never re-uploaded). No reference counterpart —
    this is the TPU-idiomatic answer to input-bound training: the
    reference streams every batch from host TFRecords each step
    (`uPIT_baseline.ipynb cell 31`).
    """
    _loss = _packed_loss_builder(
        model, size, shift, num_speakers, num_segments, compute_dtype, pallas_scan
    )

    def _gather(idx):
        return (
            jnp.take(mix_all, idx, axis=0),
            jnp.take(sources_all, idx, axis=0),
            jnp.take(frame_seg_all, idx, axis=0),
        )

    @functools.partial(jax.jit, donate_argnums=(0,) if donate_state else ())
    def train_step(state, idx):
        mix, sources, frame_seg = _gather(idx)
        rng, sub = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(_loss)(
            state.params, mix, sources, frame_seg, sub, False
        )
        return state.apply_gradients(grads).replace(rng=rng), loss

    @jax.jit
    def eval_step(state, idx):
        mix, sources, frame_seg = _gather(idx)
        return _loss(state.params, mix, sources, frame_seg, state.rng, True)

    return train_step, eval_step


def make_upit_raw_steps(
    model,
    frame_size: int = 40,
    num_speakers: int = 2,
    donate_state: bool = True,
):
    """Steps for the raw-waveform conv-frontend separator.

    Waveforms are framed on device into non-overlapping ``frame_size`` frames
    (the reference's ``RawDataGenerator`` did this on the host,
    `Raw_with_Convlayer.ipynb cell 2`); PIT loss runs in the frame domain with
    per-utterance frame counts ``ceil(samples / frame_size)``.
    """

    def _frame(wave):
        b, samples = wave.shape
        assert samples % frame_size == 0, "pad waveforms to a frame multiple"
        return wave.reshape(b, samples // frame_size, frame_size)

    def _loss(params, mix, sources, frame_lengths, dropout_rng, deterministic):
        frames = _frame(_dequant(mix))  # [B, K, L]
        b, k, l = frames.shape
        sources = _dequant(sources)
        src_frames = sources.reshape(b, sources.shape[1], k, l)
        labels = jnp.moveaxis(src_frames, 1, 2).reshape(b, k, -1)  # [B, K, n*L]
        kwargs = dict(deterministic=deterministic)
        if not deterministic:
            kwargs["rngs"] = {"dropout": dropout_rng}
        preds = model.apply({"params": params}, frames, **kwargs)
        return pit_loss(preds, labels, frame_lengths, num_speakers)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate_state else ())
    def train_step(state, mix, sources, frame_lengths):
        rng, sub = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(_loss)(
            state.params, mix, sources, frame_lengths, sub, False
        )
        return state.apply_gradients(grads).replace(rng=rng), loss

    @jax.jit
    def eval_step(state, mix, sources, frame_lengths):
        return _loss(state.params, mix, sources, frame_lengths, state.rng, True)

    return train_step, eval_step


def make_upit_spectrogram_steps(model, num_speakers: int = 2, donate_state: bool = True):
    """Steps over precomputed (magnitude [B,T,F], labels [B,T,nF], lengths)."""

    def _loss(params, magnitude, labels, lengths, dropout_rng, deterministic):
        kwargs = dict(deterministic=deterministic)
        if not deterministic:
            kwargs["rngs"] = {"dropout": dropout_rng}
        preds = model.apply({"params": params}, magnitude, **kwargs)
        return pit_loss(preds, labels, lengths, num_speakers)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate_state else ())
    def train_step(state, magnitude, labels, lengths):
        rng, sub = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(_loss)(
            state.params, magnitude, labels, lengths, sub, False
        )
        return state.apply_gradients(grads).replace(rng=rng), loss

    @jax.jit
    def eval_step(state, magnitude, labels, lengths):
        return _loss(state.params, magnitude, labels, lengths, state.rng, True)

    return train_step, eval_step


def make_time_domain_steps(
    model,
    donate_state: bool = True,
    compute_dtype=None,
    pallas_trunk: bool = False,
    dp_mesh=None,
):
    """Steps for wave-in/wave-out separators (ConvTasNet): negative
    permutation-best SI-SDR objective over (mix, sources, sample_lengths).

    ``compute_dtype=jnp.bfloat16`` runs the network fwd/bwd in bf16 (fp32
    master weights; gLN statistics stay fp32 inside the module); the SI-SDR
    loss is computed in fp32 on the cast-back estimates.

    ``pallas_trunk=True`` (bf16 only) runs the TCN trunk — forward AND
    backward — as fused Pallas kernels (`ops/tcn_train_pallas.py`), a
    custom_vjp whose gradients map back onto the same param pytree;
    encoder/mask/decoder and the loss stay XLA-autodiff. Same checkpoints.

    ``dp_mesh``: data-parallel steps via ``shard_map`` over the mesh's
    ``data`` axis — each device runs fwd+bwd on its batch shard (Pallas
    kernels included) and gradients/losses are ``pmean``-ed over ICI.
    Batch must divide by the axis size; required for multi-chip training
    with ``pallas_trunk`` (XLA's auto-sharding cannot partition the
    custom_vjp's pallas_call). Parity with the single-device step is
    pinned in ``tests/test_tcn_train_pallas.py``.
    """
    if pallas_trunk and getattr(model, "causal", False):
        # the Pallas trunk implements gLN/SAME-padded blocks only; training a
        # causal-configured model through it would silently produce a gLN
        # checkpoint whose config claims causal — and the exact stateful
        # streaming engine would then stream a model never trained causally
        raise ValueError(
            "pallas_trunk=True trains the gLN/SAME-padded trunk; "
            "causal ConvTasNet must train via the XLA path (pallas_trunk=False)"
        )
    net = model if compute_dtype is None else model.clone(dtype=compute_dtype)

    if pallas_trunk:
        from ..models.tasnet_serving import _encode_and_project, _mask_and_decode
        from ..ops.tcn_train_pallas import stack_canonical, tcn_trunk_train

        m = model  # config source
        dils = tuple(2**x for _ in range(m.repeats) for x in range(m.blocks))
        interp = jax.default_backend() != "tpu"

        def _forward(params, mix):
            dt = jnp.bfloat16
            feats, h = _encode_and_project(params, mix, m.win // 2, dt)
            arrs = stack_canonical(params, blocks=m.blocks, repeats=m.repeats)
            skip = tcn_trunk_train(h, *arrs, dils, m.kernel, 512, interp)
            return _mask_and_decode(
                params, feats, skip, m.num_speakers, m.enc_dim, m.win // 2,
                mix.shape[1], dt,
            )

        def _loss(params, mix, sources, sample_lengths, dropout_rng, deterministic):
            del dropout_rng, deterministic
            est = _forward(params, _dequant(mix)).astype(jnp.float32)
            return pit_si_sdr_loss(est, _dequant(sources), sample_lengths)

    else:

        def _loss(params, mix, sources, sample_lengths, dropout_rng, deterministic):
            kwargs = dict(deterministic=deterministic)
            if not deterministic and dropout_rng is not None:
                kwargs["rngs"] = {"dropout": dropout_rng}
            est = net.apply({"params": params}, _dequant(mix), **kwargs).astype(
                jnp.float32
            )
            return pit_si_sdr_loss(est, _dequant(sources), sample_lengths)

    if dp_mesh is not None:
        from jax.sharding import PartitionSpec as P

        def _sharded_grads(params, mix, sources, sample_lengths):
            loss, grads = jax.value_and_grad(_loss)(
                params, mix, sources, sample_lengths, None, False
            )
            return jax.lax.pmean(loss, "data"), jax.lax.pmean(grads, "data")

        grads_fn = jax.shard_map(
            _sharded_grads,
            mesh=dp_mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        )

        @functools.partial(jax.jit, donate_argnums=(0,) if donate_state else ())
        def train_step(state, mix, sources, sample_lengths):
            rng, _ = jax.random.split(state.rng)
            loss, grads = grads_fn(state.params, mix, sources, sample_lengths)
            return state.apply_gradients(grads).replace(rng=rng), loss

        def _sharded_eval(params, mix, sources, sample_lengths):
            return jax.lax.pmean(
                _loss(params, mix, sources, sample_lengths, None, True), "data"
            )

        eval_fn = jax.shard_map(
            _sharded_eval,
            mesh=dp_mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )

        @jax.jit
        def eval_step(state, mix, sources, sample_lengths):
            return eval_fn(state.params, mix, sources, sample_lengths)

        return train_step, eval_step

    @functools.partial(jax.jit, donate_argnums=(0,) if donate_state else ())
    def train_step(state, mix, sources, sample_lengths):
        rng, sub = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(_loss)(
            state.params, mix, sources, sample_lengths, sub, False
        )
        return state.apply_gradients(grads).replace(rng=rng), loss

    @jax.jit
    def eval_step(state, mix, sources, sample_lengths):
        return _loss(state.params, mix, sources, sample_lengths, None, True)

    return train_step, eval_step


def make_vae_steps(
    model,
    loss_fn: Callable = summed_squared_error,
    donate_state: bool = True,
    schedule: Callable | None = None,
):
    """Steps for the VQ-VAE family: reconstruction loss + the model's own
    auxiliary losses (KL / commitment+codebook), mirroring the reference's
    ``loss + sum(model.losses)`` (`vq-vae_for_1d_data.ipynb cell 18`).

    ``schedule``: optional ``step -> dict`` of extra model kwargs applied on
    the TRAINING forward only (eval stays deterministic/unscheduled). Used by
    the Gumbel codec to anneal ``temperature`` and warm up ``kl_scale`` with
    traced scalars — one compiled program for the whole run."""

    def _loss(params, inputs, targets, rng, deterministic, extra_kwargs=None):
        kwargs = dict(deterministic=deterministic)
        if extra_kwargs:
            kwargs.update(extra_kwargs)
        rngs = {}
        if not deterministic:
            rngs["gumbel"] = rng
            rngs["dropout"] = jax.random.fold_in(rng, 1)
        if rngs:
            kwargs["rngs"] = rngs
        preds, aux_losses = model.apply({"params": params}, inputs, **kwargs)
        recon = loss_fn(preds, targets)
        return recon + sum(aux_losses, jnp.zeros(())), (recon, preds)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate_state else ())
    def train_step(state, inputs, targets):
        rng, sub = jax.random.split(state.rng)
        extra = schedule(state.step) if schedule is not None else None
        (loss, (recon, _)), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params, inputs, targets, sub, False, extra
        )
        return state.apply_gradients(grads).replace(rng=rng), loss, recon

    @jax.jit
    def eval_step(state, inputs, targets):
        loss, (recon, preds) = _loss(state.params, inputs, targets, state.rng, True)
        return loss, recon, preds

    return train_step, eval_step
