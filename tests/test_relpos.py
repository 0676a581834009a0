"""Relative-position attention and code-prior tests."""

import numpy as np

import jax
import jax.numpy as jnp

from speech_separation_tpu.models.relpos import (
    CodePrior,
    RelativeSelfAttention,
    relative_position_index,
)


def test_relative_position_index_matches_reference_table():
    # reference `Untitled.ipynb cell 1`: seq_len=10, k=3
    table = np.asarray(relative_position_index(10, 3))
    assert table.shape == (10, 10)
    assert table[0, 0] == 3  # distance 0 → k
    assert table[0, 9] == 6  # clipped +k → 2k
    assert table[9, 0] == 0  # clipped −k → 0
    assert table[2, 4] == 5  # j − i = 2 → k + 2


def test_relative_attention_causality():
    attn = RelativeSelfAttention(num_heads=2, head_dim=8, causal=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 6, 16)), jnp.float32)
    params = attn.init(jax.random.key(0), x)
    base = np.asarray(attn.apply(params, x))
    # perturbing a future position must not change earlier outputs
    x2 = x.at[0, 4, :].add(10.0)
    out2 = np.asarray(attn.apply(params, x2))
    np.testing.assert_allclose(out2[0, :4], base[0, :4], atol=1e-5)
    assert not np.allclose(out2[0, 4:], base[0, 4:])


def test_code_prior_trains_to_memorize():
    num_codes = 8
    codes = jnp.asarray([[1, 3, 5, 7, 2, 4, 6, 0]], jnp.int32)
    model = CodePrior(num_codes=num_codes, dim=32, depth=1, num_heads=2)
    params = model.init(jax.random.key(0), codes)

    import optax

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, codes)
            return CodePrior.loss(logits, codes)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(60):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.2
    # greedy decode reproduces the memorised sequence (teacher-forced logits)
    logits = model.apply(params, codes)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits, -1))[0], np.asarray(codes)[0])


def test_code_prior_kv_decode_matches_full_forward():
    """Incremental KV-cached decoding (CodePrior.decode) is numerically
    identical to the full causal forward at every position — the O(T) VERDICT
    r2 #5 sampler computes the same distribution the prior was trained on."""
    import numpy as np

    layout_group = 5
    T = 4 * layout_group
    model = CodePrior(num_codes=24, dim=32, depth=2, num_heads=2, max_distance=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, T), jnp.int32))["params"]
    toks = jax.random.randint(jax.random.key(1), (1, T), 0, 24)

    full = model.apply({"params": params}, toks)  # [1, T, V]

    dm = model.clone(decode_length=T)
    cache = None
    prev = jnp.zeros((1,), jnp.int32)
    for t in range(T):
        variables = {"params": params} if cache is None else {"params": params, "cache": cache}
        logits, mut = dm.apply(
            variables, prev, jnp.int32(t), method=CodePrior.decode, mutable=["cache"]
        )
        cache = mut["cache"]
        np.testing.assert_allclose(
            np.asarray(logits[0]), np.asarray(full[0, t]), atol=1e-4
        )
        prev = toks[:, t]
