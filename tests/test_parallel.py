"""SPMD tests on the virtual 8-device CPU mesh: DP and TP shardings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu import parallel, train
from speech_separation_tpu.models import UPitBlstm

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU test mesh"
)

SMALL = dict(input_size=129, output_size=129, hidden=8, num_layers=1)


def _make_state(model, rng):
    params = model.init(rng, jnp.zeros((1, 4, 129)))["params"]
    return train.TrainState.create(model.apply, params, train.exponential_decay_adam(), rng)


def _fake_batch(b=8, samples=4000):
    rng = np.random.default_rng(0)
    s = rng.standard_normal((b, 2, samples)).astype(np.float32) * 0.1
    mix = s.sum(axis=1)
    from speech_separation_tpu.ops import stft_frame_count

    fl = np.full((b,), stft_frame_count(samples, 256, 128), dtype=np.int32)
    return mix, s, fl


def test_mesh_shapes():
    mesh = parallel.make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = parallel.make_mesh()  # all devices on data
    assert mesh.shape["data"] == 8


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
@pytest.mark.slow
def test_sharded_train_step_matches_single_device(data, model):
    mdl = UPitBlstm(**SMALL)
    rng = jax.random.key(0)
    state = _make_state(mdl, rng)
    train_step, eval_step = train.make_upit_waveform_steps(
        mdl, num_speakers=2, donate_state=False
    )
    mix, sources, fl = _fake_batch()
    args = (jnp.asarray(mix), jnp.asarray(sources), jnp.asarray(fl))

    # single-device reference
    ref_state, ref_loss = train_step(state, *args)

    mesh = parallel.make_mesh(data=data, model=model)
    sharded_state = parallel.shard_state(state, mesh, tensor_parallel=(model > 1))
    sharded_args = parallel.shard_batch(args, mesh)
    new_state, loss = train_step(sharded_state, *sharded_args)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    # parameters after one step agree across the sharded and single runs
    ref_leaves = jax.tree.leaves(ref_state.params)
    got_leaves = jax.tree.leaves(new_state.params)
    for r, g in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)


def test_tp_params_actually_sharded():
    mdl = UPitBlstm(**SMALL)
    state = _make_state(mdl, jax.random.key(0))
    mesh = parallel.make_mesh(data=4, model=2)
    sharded = parallel.shard_params(state.params, mesh, tensor_parallel=True)
    kernel = sharded["bilstm_0"]["cells"]["kernel"]
    assert not kernel.sharding.is_fully_replicated
    spec = kernel.sharding.spec
    assert spec[-1] == "model"


def test_eval_step_sharded_runs():
    mdl = UPitBlstm(**SMALL)
    state = _make_state(mdl, jax.random.key(0))
    _, eval_step = train.make_upit_waveform_steps(mdl)
    mesh = parallel.make_mesh(data=8, model=1)
    mix, sources, fl = _fake_batch()
    args = parallel.shard_batch(
        (jnp.asarray(mix), jnp.asarray(sources), jnp.asarray(fl)), mesh
    )
    sharded_state = parallel.shard_state(state, mesh, tensor_parallel=False)
    loss = eval_step(sharded_state, *args)
    assert np.isfinite(float(loss))


def test_pad_batch_for_mesh_and_divisibility_guard():
    mesh = parallel.make_mesh(data=4, model=2)
    arrays = (np.zeros((6, 3), np.float32), np.zeros((6,), np.int32))
    with pytest.raises(ValueError, match="not divisible"):
        parallel.shard_batch(tuple(jnp.asarray(a) for a in arrays), mesh)
    padded, orig = parallel.pad_batch_for_mesh(arrays, mesh)
    assert orig == 6 and padded[0].shape[0] == 8
    sharded = parallel.shard_batch(tuple(jnp.asarray(a) for a in padded), mesh)
    assert sharded[0].shape[0] == 8


def test_moment_sharding_maps_by_path_not_shape():
    """Two same-shaped params with *different* shardings: each optimizer
    moment must follow its own parameter's placement (regression for the
    old shape-keyed lookup, which gave both whichever sharding came first)."""
    from jax.sharding import PartitionSpec as P

    mesh = parallel.make_mesh(data=4, model=2)
    params = {
        "a": {"kernel": jnp.ones((4, 8))},  # TP rule: shard last dim on model
        "b": {"proj": jnp.ones((4, 8))},  # no rule match: replicated
    }
    state = train.TrainState.create(lambda p, x: x, params, train.adam(1e-3), jax.random.key(0))
    sharded = parallel.shard_state(state, mesh, tensor_parallel=True)

    assert sharded.params["a"]["kernel"].sharding.spec == P(None, "model")
    assert sharded.params["b"]["proj"].sharding.is_fully_replicated
    import optax

    def _find_adam(tree):
        # nesting-agnostic: optimizers wrap in optax.chain (clip/identity
        # heads keep the state structure CLIP-independent — train/optim.py)
        if isinstance(tree, optax.ScaleByAdamState):
            return tree
        if isinstance(tree, (tuple, list)):
            for sub in tree:
                found = _find_adam(sub)
                if found is not None:
                    return found
        return None

    adam_state = _find_adam(sharded.opt_state)
    assert adam_state is not None
    for tree in (adam_state.mu, adam_state.nu):
        assert tree["a"]["kernel"].sharding.spec == P(None, "model")
        assert tree["b"]["proj"].sharding.is_fully_replicated
    # scalars (adam count) replicated
    assert adam_state.count.sharding.is_fully_replicated
    # and the sharded state still trains: one step, placements preserved
    def loss_fn(p, x):
        return jnp.sum((x @ p["a"]["kernel"] + x @ p["b"]["proj"]) ** 2)

    import functools

    @functools.partial(jax.jit, donate_argnums=())
    def step(s, x):
        grads = jax.grad(lambda p: loss_fn(p, x))(s.params)
        return s.apply_gradients(grads)

    x = parallel.shard_batch((jnp.ones((8, 4)),), mesh)[0]
    new_state = step(sharded, x)
    new_adam = _find_adam(new_state.opt_state)
    assert new_adam.mu["a"]["kernel"].sharding.spec == P(None, "model")


def test_tasnet_tp_sharded_step_matches_single_device():
    from speech_separation_tpu.models import ConvTasNet

    model = ConvTasNet(enc_dim=32, bottleneck=16, hidden=32, blocks=2, repeats=1)
    rng = jax.random.key(0)
    gen = np.random.default_rng(0)
    sources = jnp.asarray(gen.standard_normal((8, 2, 4000)).astype(np.float32) * 0.1)
    mix = sources.sum(axis=1)
    lengths = jnp.full((8,), 4000, jnp.int32)

    params = model.init(rng, mix)["params"]
    state = train.TrainState.create(model.apply, params, train.adam(1e-3), rng)
    train_step, _ = train.make_time_domain_steps(model, donate_state=False)
    ref_state, ref_loss = train_step(state, mix, sources, lengths)

    mesh = parallel.make_mesh(data=4, model=2)
    sharded = parallel.shard_state(state, mesh, tensor_parallel=True)
    args = parallel.shard_batch((mix, sources, lengths), mesh)
    new_state, loss = train_step(sharded, *args)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    for r, g in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-5)


def test_dp_serving_matches_single_device():
    """make_separate_fn(dp_mesh=...): batch sharded over 8 devices, params
    replicated — output identical to the single-device program."""
    from speech_separation_tpu.separate import make_separate_fn

    mdl = UPitBlstm(**SMALL)
    params = mdl.init(jax.random.key(0), jnp.zeros((1, 4, 129)))["params"]
    mix, _, fl = _fake_batch(b=8)
    mix, fl = jnp.asarray(mix), jnp.asarray(fl)

    ref = np.asarray(make_separate_fn(mdl)(params, mix, fl))

    mesh = parallel.make_mesh()  # all 8 on data
    sep = make_separate_fn(mdl, dp_mesh=mesh)
    smix, sfl = parallel.shard_batch((mix, fl), mesh)
    out = sep(params, smix, sfl)
    # each row really lives on its own device
    assert not out.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_dp_tasnet_shard_map_matches_single_device():
    """The tasnet time-domain DP path (shard_map over the data axis, as the
    CLI builds it): per-item gLN stats make batch sharding exact."""
    from jax.sharding import PartitionSpec as P

    from speech_separation_tpu.models import ConvTasNet

    model = ConvTasNet(enc_dim=32, bottleneck=16, hidden=32, blocks=2, repeats=1)
    gen = np.random.default_rng(1)
    mix = jnp.asarray(gen.standard_normal((8, 4000)).astype(np.float32) * 0.1)
    params = model.init(jax.random.key(0), mix)["params"]

    def base(p, m):
        return model.apply({"params": p}, m)

    ref = np.asarray(jax.jit(base)(params, mix))

    mesh = parallel.make_mesh()
    sep = jax.jit(
        jax.shard_map(
            base, mesh=mesh, in_specs=(P(), P("data")), out_specs=P("data"),
            check_vma=False,
        )
    )
    (smix,) = parallel.shard_batch((mix,), mesh)
    np.testing.assert_allclose(np.asarray(sep(params, smix)), ref, atol=1e-5)


def test_separate_directory_dp(tmp_path, fixture_root):
    """End-to-end DP serving over the 4-utterance fixture (ragged batch →
    pad to the 8-device axis, trim): wav outputs ≡ the single-device run."""
    from speech_separation_tpu.data.audio_io import read_wav
    from speech_separation_tpu.separate import separate_directory

    mdl = UPitBlstm(**SMALL)
    params = mdl.init(jax.random.key(0), jnp.zeros((1, 4, 129)))["params"]

    single = separate_directory(mdl, params, fixture_root / "tt", tmp_path / "one")
    mesh = parallel.make_mesh()
    multi = separate_directory(
        mdl, params, fixture_root / "tt", tmp_path / "dp", dp_mesh=mesh
    )
    assert len(multi) == len(single) == 8
    for p1 in single:
        a, _ = read_wav(p1)
        b, _ = read_wav(tmp_path / "dp" / p1.name)
        np.testing.assert_allclose(a, b, atol=2e-4)
