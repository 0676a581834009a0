"""LSTM / bidirectional LSTM layers built on ``lax.scan`` for TPU.

Recurrence does not map onto the MXU, so the design keeps the systolic array
busy where it can be:

- the input projection ``x @ W`` for *all* timesteps of *all* sequences is
  hoisted out of the scan as one large matmul;
- only the small ``h @ U`` recurrent matmul stays inside the scan body;
- the bidirectional wrapper runs forward and time-reversed sequences as a
  single scan over a doubled batch, so one compiled loop serves both
  directions (2× arithmetic intensity per step, one set of scan overheads).

Cell semantics mirror Keras ``LSTM`` (reference `uPIT_baseline.ipynb cell 29`):
gate order (i, f, g, o), sigmoid recurrent activation, tanh output activation,
forget-gate bias initialised to one, glorot-uniform input kernel and
orthogonal recurrent kernel. Parameter shapes (and counts) are identical to
Keras, which the tests pin against the reference's recorded totals.

Like the reference (whose Keras layers receive no mask), padded timesteps are
processed as ordinary zeros; masking happens in the loss.

Sequence packing (``data/packing.py``) adds an optional per-frame carry gate:
``segment_ids [B, T]`` marks which utterance owns each frame, and the scan
multiplies the (h, c) carry by 0 whenever the segment id changes — each
packed utterance is processed in complete isolation in both directions,
bit-identical to running it alone (pinned in ``tests/test_packed.py``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["LSTM", "BiLSTM", "segment_keep"]


def segment_keep(segment_ids: jnp.ndarray) -> jnp.ndarray:
    """Per-step carry-keep gate for a forward-time scan: ``keep[b, t] = 1``
    iff frame ``t`` continues frame ``t-1``'s segment (``keep[:, 0] = 1``;
    the scan's zero initial carry handles the row start)."""
    same = segment_ids[:, 1:] == segment_ids[:, :-1]
    first = jnp.ones_like(same[:, :1])
    return jnp.concatenate([first, same], axis=1).astype(jnp.float32)


class LSTM(nn.Module):
    """Unidirectional LSTM over ``[batch, time, features]``, returns all states."""

    features: int
    unroll: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, keep: jnp.ndarray | None = None) -> jnp.ndarray:
        b, t, f = x.shape
        h = self.features
        kernel = self.param("kernel", nn.initializers.glorot_uniform(), (f, 4 * h))
        recurrent = self.param(
            "recurrent_kernel", nn.initializers.orthogonal(), (h, 4 * h)
        )

        def forget_one_bias(key, shape, dtype=jnp.float32):
            del key
            bias = jnp.zeros(shape, dtype)
            return bias.at[h : 2 * h].set(1.0)

        bias = self.param("bias", forget_one_bias, (4 * h,))

        # One big MXU matmul for every timestep's input projection.
        xw = jnp.einsum("btf,fg->btg", x, kernel) + bias  # [B, T, 4H]

        def step(carry, inp):
            h_prev, c_prev = carry
            if keep is not None:
                xt, kt = inp
                h_prev = h_prev * kt[:, None]
                c_prev = c_prev * kt[:, None]
            else:
                xt = inp
            z = xt + h_prev @ recurrent
            i = jax.nn.sigmoid(z[:, 0 * h : 1 * h])
            fg = jax.nn.sigmoid(z[:, 1 * h : 2 * h])
            g = jnp.tanh(z[:, 2 * h : 3 * h])
            o = jax.nn.sigmoid(z[:, 3 * h : 4 * h])
            c = fg * c_prev + i * g
            new_h = o * jnp.tanh(c)
            return (new_h, c), new_h

        init = (jnp.zeros((b, h), x.dtype), jnp.zeros((b, h), x.dtype))
        xs = xw.swapaxes(0, 1)
        scanned = xs if keep is None else (xs, keep.astype(x.dtype).swapaxes(0, 1))
        _, ys = jax.lax.scan(step, init, scanned, unroll=self.unroll)
        return ys.swapaxes(0, 1)


class BiLSTM(nn.Module):
    """Bidirectional LSTM with concatenated outputs: ``[B, T, 2 * features]``.

    Both directions share one scan: the time-reversed batch is stacked below
    the forward batch, and the backward half of the outputs is reversed again
    on the way out.
    """

    features: int
    unroll: int = 16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, segment_ids: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        stacked = jnp.stack([x, x[:, ::-1, :]], axis=0)  # [2, B, T, F]
        if segment_ids is None:
            fwd = nn.vmap(
                LSTM,
                in_axes=0,
                out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                axis_size=2,
            )
            ys = fwd(self.features, self.unroll, name="cells")(stacked)
        else:
            # packed rows: carry resets at segment changes; the reverse
            # direction resets where segments change in reversed time
            # (= segment *ends* in forward time)
            keeps = jnp.stack(
                [segment_keep(segment_ids), segment_keep(segment_ids[:, ::-1])],
                axis=0,
            )  # [2, B, T]
            fwd = nn.vmap(
                LSTM,
                in_axes=(0, 0),
                out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                axis_size=2,
            )
            ys = fwd(self.features, self.unroll, name="cells")(stacked, keeps)
        return jnp.concatenate([ys[0], ys[1][:, ::-1, :]], axis=-1)
