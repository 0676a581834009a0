"""Where does the fused BiLSTM recurrence kernel's step time go?

RESULTS.md reports ~51 TFLOP/s (~26% of v5e bf16 peak) for the training
path and attributes the gap to the recurrence's serial latency floor. This
bench decomposes one forward-recurrence kernel step at the production
geometry (H=496 → GP=512, batch rows 2·Bp) into:

  full     — the production kernel math (matmul + sigmoid/tanh gate VPU math)
  nogate   — transcendentals replaced by cheap polynomials of the same shape
             (isolates the sigmoid/tanh lowering cost)
  matmul   — per-step MXU matmul only, gate math deleted (the hard floor:
             what a recurrence step costs if the VPU were free)

Arithmetic expectation (v5e): per step per direction the matmul is
[Bp, 512]·[512, 2048] → 2·Bp·512·2048 MACs; at Bp=32 rows only 32/128 of
the MXU row tile is live. The gate math is ~15 VPU ops (incl. 3 sigmoid +
2 tanh lowered to polynomials) over [2Bp, 2048] fp32 lanes. If `matmul` ≪
`full`, the kernel is VPU/latency-bound and wider batches (not more MXU)
are the lever; if `matmul` ≈ `full`, the MXU row occupancy is the wall.

Usage: B=32 T=500 python scripts/blstm_kernel_ceiling_bench.py
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("B", "32"))
T = int(os.environ.get("T", "500"))
H = 496
GP = 512
TILE_T = 16
SLAB = jnp.bfloat16
TRIALS = int(os.environ.get("TRIALS", "5"))
INTERPRET = os.environ.get("INTERPRET") == "1"  # CPU correctness path


def make_kernel(variant: str, tile_t: int, bp: int, gp: int):
    def kernel(xw_ref, u_ref, h_ref, h_s, c_s):
        @pl.when(pl.program_id(0) == 0)
        def _():
            h_s[:] = jnp.zeros_like(h_s)
            c_s[:] = jnp.zeros_like(c_s)

        for tt in range(tile_t):
            hb = h_s[:].astype(u_ref.dtype)
            z0 = jnp.dot(hb[:bp], u_ref[0], preferred_element_type=jnp.float32)
            z1 = jnp.dot(hb[bp:], u_ref[1], preferred_element_type=jnp.float32)
            z = xw_ref[tt].astype(jnp.float32) + jnp.concatenate([z0, z1], axis=0)
            if variant == "full":
                i = jax.nn.sigmoid(z[:, 0 * gp : 1 * gp])
                f = jax.nn.sigmoid(z[:, 1 * gp : 2 * gp])
                g = jnp.tanh(z[:, 2 * gp : 3 * gp])
                o = jax.nn.sigmoid(z[:, 3 * gp : 4 * gp])
                c = f * c_s[:] + i * g
                h = o * jnp.tanh(c)
            elif variant == "nogate":
                # same data flow, transcendentals → clipped linear surrogates
                i = jnp.clip(z[:, 0 * gp : 1 * gp] * 0.25 + 0.5, 0.0, 1.0)
                f = jnp.clip(z[:, 1 * gp : 2 * gp] * 0.25 + 0.5, 0.0, 1.0)
                g = jnp.clip(z[:, 2 * gp : 3 * gp], -1.0, 1.0)
                o = jnp.clip(z[:, 3 * gp : 4 * gp] * 0.25 + 0.5, 0.0, 1.0)
                c = f * c_s[:] + i * g
                h = o * jnp.clip(c, -1.0, 1.0)
            else:  # matmul-only floor
                c = z[:, 0 * gp : 1 * gp]
                h = z[:, 1 * gp : 2 * gp] + c
            h_s[:] = h
            c_s[:] = c
            h_ref[tt] = h.astype(h_ref.dtype)

    return kernel


def build(variant: str):
    bp = max(8, B)
    t_pad = (T + TILE_T - 1) // TILE_T * TILE_T
    r = 2 * bp
    kernel = make_kernel(variant, TILE_T, bp, GP)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t_pad, r, GP), SLAB),
        grid=(t_pad // TILE_T,),
        in_specs=[
            pl.BlockSpec((TILE_T, r, 4 * GP), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, GP, 4 * GP), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_T, r, GP), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((r, GP), jnp.float32),
            pltpu.VMEM((r, GP), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )

    gen = np.random.default_rng(0)
    xw = jnp.asarray(gen.standard_normal((t_pad, r, 4 * GP)).astype(np.float32) * 0.1, SLAB)
    u = jnp.asarray(gen.standard_normal((2, GP, 4 * GP)).astype(np.float32) * 0.05, SLAB)

    fn = jax.jit(lambda a: call(a, u))
    out = fn(xw)
    np.asarray(out[0, 0, :8])  # force compile + run

    def measure(iters=10):
        cur = xw
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(cur)
            # feed a slab back to serialize (keep shapes: write into xw row 0)
            cur = cur.at[0, :, :GP].set(out[-1])
        np.asarray(out[0, 0, :8])
        dt = (time.perf_counter() - t0) / iters
        return dt

    return measure, t_pad, bp


def main():
    results = {}
    measures = {v: build(v) for v in ("full", "nogate", "matmul")}
    samples = {v: [] for v in measures}
    for _ in range(TRIALS):
        for v, (m, t_pad, bp) in measures.items():
            samples[v].append(m())
    t_pad = (T + TILE_T - 1) // TILE_T * TILE_T
    bp = max(8, B)
    flops = 2 * (2 * bp) * GP * (4 * GP) * t_pad  # per kernel run (both dirs)
    for v, xs in samples.items():
        dt = float(np.median(xs))
        results[v] = {
            "kernel_ms": round(dt * 1e3, 3),
            "us_per_step": round(dt / t_pad * 1e6, 2),
            "matmul_tflops": round(flops / dt / 1e12, 1),
        }
    results["geometry"] = {"B": B, "T": T, "rows": 2 * bp, "GP": GP, "tile_t": TILE_T}
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
