"""Parity of the traffic-optimal TasNet serving path with the flax module.

``fused_apply`` must compute the same function as ``ConvTasNet.apply`` over
the identical param pytree (gLN folding, combined res|skip dot, depthwise
edge correction are all exact up to fp rounding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_separation_tpu.models import ConvTasNet
from speech_separation_tpu.models.tasnet_serving import fused_apply


def _snr_db(ref, est):
    err = np.square(ref - est).sum()
    return 10 * np.log10(np.square(ref).sum() / max(err, 1e-30))


@pytest.fixture(scope="module")
def small_setup():
    # small but non-trivial: multiple dilations so the SAME-padding edge
    # correction is exercised (dilation up to 2^(blocks-1) = 8 on T=128 frames)
    cfg = dict(
        num_speakers=2,
        enc_dim=64,
        win=16,
        bottleneck=32,
        hidden=48,
        kernel=3,
        blocks=4,
        repeats=2,
    )
    model = ConvTasNet(**cfg)
    samples = 1024
    mix = (
        jax.random.normal(jax.random.key(1), (3, samples), jnp.float32) * 0.3
    )
    params = model.init(jax.random.key(0), mix)["params"]
    return cfg, model, params, mix


class TestFusedServingParity:
    def test_fp32_matches_module(self, small_setup):
        cfg, model, params, mix = small_setup
        ref = np.asarray(model.apply({"params": params}, mix))
        est = np.asarray(fused_apply(params, mix, dtype=None, **cfg))
        assert ref.shape == est.shape
        # identical math modulo reassociation (scale after the matmul)
        assert _snr_db(ref, est) > 90.0

    def test_bf16_matches_bf16_module(self, small_setup):
        cfg, model, params, mix = small_setup
        ref32 = np.asarray(model.apply({"params": params}, mix))
        ref_bf16 = np.asarray(
            model.clone(dtype=jnp.bfloat16).apply({"params": params}, mix)
        )
        est_bf16 = np.asarray(fused_apply(params, mix, dtype=jnp.bfloat16, **cfg))
        # the fused bf16 path must be at least as close to the fp32 oracle as
        # the standard bf16 path (it applies the norm scales in fp32 *after*
        # the matmul, so it should be slightly more accurate, not less)
        assert _snr_db(ref32, est_bf16) >= _snr_db(ref32, ref_bf16) - 1.0
        assert _snr_db(ref32, est_bf16) > 25.0

    def test_edge_correction_matters(self, small_setup):
        """The depthwise SAME-padding correction term is load-bearing: a
        naive fold (pretending zero-padded x implies zero-padded n) would be
        wrong at the edges. Verify edge frames match the module exactly."""
        cfg, model, params, mix = small_setup
        ref = np.asarray(model.apply({"params": params}, mix))
        est = np.asarray(fused_apply(params, mix, dtype=None, **cfg))
        edge = 2 ** (cfg["blocks"] - 1) * (cfg["win"] // 2) * 2
        np.testing.assert_allclose(est[:, :, :edge], ref[:, :, :edge], atol=2e-4)
        np.testing.assert_allclose(est[:, :, -edge:], ref[:, :, -edge:], atol=2e-4)

    def test_pallas_trunk_matches_module(self, small_setup):
        """The fused Pallas TCN trunk (interpret mode on CPU) reproduces the
        bf16 module output: gLN folding, halo'd depthwise taps, edge
        correction and VMEM-resident skip accumulation are all exact up to
        bf16 rounding."""
        from speech_separation_tpu.models.tasnet_serving import pallas_apply

        cfg, model, params, mix = small_setup
        ref32 = np.asarray(model.apply({"params": params}, mix))
        ref_bf16 = np.asarray(
            model.clone(dtype=jnp.bfloat16).apply({"params": params}, mix)
        )
        cfg_np = {k: v for k, v in cfg.items()}
        est = np.asarray(pallas_apply(params, mix, interpret=True, **cfg_np))
        assert est.shape == ref32.shape
        # bf16-grade agreement with the fp32 oracle, comparable to standard bf16
        assert _snr_db(ref32, est) >= _snr_db(ref32, ref_bf16) - 3.0
        assert _snr_db(ref32, est) > 22.0

    def test_pallas_trunk_ragged_length(self, small_setup):
        """K not a multiple of the chunk: stats masking + zeroed slab tail
        keep the padded rows out of the norms and the dilated taps."""
        from speech_separation_tpu.models.tasnet_serving import pallas_apply

        cfg, model, params, _ = small_setup
        # 1040 samples -> K=130 frames (not a multiple of any pow-2 chunk)
        mix = jax.random.normal(jax.random.key(3), (2, 1040), jnp.float32) * 0.3
        ref32 = np.asarray(model.apply({"params": params}, mix))
        est = np.asarray(pallas_apply(params, mix, interpret=True, **cfg))
        assert est.shape == ref32.shape
        assert _snr_db(ref32, est) > 22.0

    @pytest.mark.slow
    def test_default_config_shapes(self):
        """fused_apply defaults mirror ConvTasNet defaults (full-size tree)."""
        model = ConvTasNet()
        mix = jnp.zeros((1, 2048))
        params = model.init(jax.random.key(0), mix)["params"]
        out = fused_apply(params, mix, dtype=jnp.bfloat16)
        assert out.shape == (1, 2, 2048)
        assert out.dtype == jnp.float32


@pytest.mark.parametrize("win", [16, 32])
@pytest.mark.parametrize("dtype", ["fp32", "bf16"])
@pytest.mark.slow
def test_forward_contract_matrix(win, dtype):
    """THE TasNet forward contract: all four implementations of the forward
    (flax module, fused_apply, Pallas serving trunk, Pallas training trunk)
    compute the same function over one param pytree, across dtypes and
    encoder windows. Both Pallas paths stack weights through the single
    canonical stacker (``stack_canonical``), so a param rename or layout
    drift in any path fails here, loudly, in one place."""
    from speech_separation_tpu.models.tasnet_serving import (
        _encode_and_project,
        _mask_and_decode,
        pallas_apply,
    )
    from speech_separation_tpu.ops.tcn_train_pallas import (
        stack_canonical,
        tcn_trunk_train,
    )

    cfg = dict(
        num_speakers=2, enc_dim=64, win=win, bottleneck=32, hidden=48,
        kernel=3, blocks=4, repeats=2,
    )
    model = ConvTasNet(**cfg)
    mix = jax.random.normal(jax.random.key(7), (2, 1024), jnp.float32) * 0.3
    params = model.init(jax.random.key(0), mix)["params"]
    ref32 = np.asarray(model.apply({"params": params}, mix))

    if dtype == "fp32":
        # the Pallas paths are bf16-by-contract; the fp32 row of the matrix
        # covers flax == fused at near-exact precision
        est = np.asarray(fused_apply(params, mix, dtype=None, **cfg))
        assert _snr_db(ref32, est) > 90.0
        return

    ref_bf16 = np.asarray(model.clone(dtype=jnp.bfloat16).apply({"params": params}, mix))
    outs = {"flax_bf16": ref_bf16}
    outs["fused"] = np.asarray(fused_apply(params, mix, dtype=jnp.bfloat16, **cfg))
    outs["pallas_serve"] = np.asarray(pallas_apply(params, mix, interpret=True, **cfg))

    # training trunk composed into the same wave-to-wave pipeline
    stride = win // 2
    feats, h = _encode_and_project(params, mix, stride, jnp.bfloat16)
    we, wdw, wcat, vecs = stack_canonical(
        params, blocks=cfg["blocks"], repeats=cfg["repeats"]
    )
    dils = tuple(2**x for _ in range(cfg["repeats"]) for x in range(cfg["blocks"]))
    skip = tcn_trunk_train(
        h, we, wdw, wcat, vecs, dils, taps=cfg["kernel"], interpret=True
    )
    outs["pallas_train"] = np.asarray(
        _mask_and_decode(
            params, feats, skip, cfg["num_speakers"], cfg["enc_dim"], stride,
            mix.shape[1], jnp.bfloat16,
        )
    )

    for name, est in outs.items():
        assert est.shape == ref32.shape, name
        assert _snr_db(ref32, est) > 22.0, (name, _snr_db(ref32, est))
