"""Train-path coverage for the raw conv-frontend model and the
TFRecord-spectrogram (reference-record) path."""

import numpy as np

import jax
import jax.numpy as jnp

from speech_separation_tpu import data, train
from speech_separation_tpu.models import UPitBlstm, UPitConv


def test_raw_conv_model_trains(fixture_root):
    loader = data.WaveformLoader(fixture_root / "tr", batch_size=2)
    batch = next(iter(loader))
    model = UPitConv(hidden=16, num_layers=1)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, 40)))["params"]
    state = train.TrainState.create(
        model.apply, params, train.exponential_decay_adam(), rng
    )
    train_step, eval_step = train.make_upit_raw_steps(model)

    l = 40
    raw_frames = np.ceil(batch.sample_lengths / l).astype(np.int32)
    args = (
        jnp.asarray(batch.mix),
        jnp.asarray(batch.sources),
        jnp.asarray(raw_frames),
    )
    first = float(eval_step(state, *args))
    for _ in range(10):
        state, loss = train_step(state, *args)
    last = float(eval_step(state, *args))
    assert np.isfinite(first) and last < first


def test_spectrogram_steps_on_reference_records(reference_root):
    """Train directly from the reference's pre-built fixture TFRecords."""
    batches = data.load_tfrecord_spectrograms(
        reference_root / "mycode" / "tfrecords" / "tr_tfrecord", batch_size=2
    )
    model = UPitBlstm(hidden=16, num_layers=1)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8, 129)))["params"]
    state = train.TrainState.create(
        model.apply, params, train.exponential_decay_adam(), rng
    )
    train_step, eval_step = train.make_upit_spectrogram_steps(model)

    b = batches[0]
    args = (jnp.asarray(b.magnitude), jnp.asarray(b.labels), jnp.asarray(b.lengths))
    first = float(eval_step(state, *args))
    for _ in range(8):
        state, loss = train_step(state, *args)
    last = float(eval_step(state, *args))
    assert np.isfinite(first) and last < first
