"""Conv-TasNet quality run on the fixture benchmark (same protocol as
scripts/fixture_quality_run.py; the time-domain model should outperform the
spectral uPIT BLSTM)."""

import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from speech_separation_tpu import data, train
from speech_separation_tpu.data import audiowrite, wait_for_pending_writes
from speech_separation_tpu.evaluate import eval_sdr, eval_si_sdr
from speech_separation_tpu.models import ConvTasNet

FIXTURE = pathlib.Path("/root/reference/mycode/wsj0_2mix/use_this")
OUT = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else pathlib.Path("/tmp/tasnet_run")
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
WIN = int(sys.argv[3]) if len(sys.argv) > 3 else 16  # encoder window (samples)
EVAL_EVERY = 1000


def main():
    loader = data.WaveformLoader(FIXTURE / "tr", batch_size=4)
    batch = next(iter(loader))
    mix = jnp.asarray(batch.mix)
    sources = jnp.asarray(batch.sources)
    lengths = jnp.asarray(batch.sample_lengths)

    model = ConvTasNet(win=WIN)
    rng = jax.random.key(42)
    params = model.init(rng, mix)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    state = train.TrainState.create(model.apply, params, train.adam(1e-3), rng)
    train_step, eval_step = train.make_time_domain_steps(model)
    print(json.dumps({"params": n_params}), flush=True)

    separate = jax.jit(lambda p, m: model.apply({"params": p}, m))

    t0 = time.time()
    for step in range(1, STEPS + 1):
        state, loss = train_step(state, mix, sources, lengths)
        if step % EVAL_EVERY == 0 or step == STEPS:
            sep_dir = OUT / f"sep_{step}"
            sep_dir.mkdir(parents=True, exist_ok=True)
            tt = data.WaveformLoader(FIXTURE / "tt", batch_size=4)
            clipped_total = 0
            for b in tt:
                est = np.asarray(separate(state.params, jnp.asarray(b.mix)))
                for i, name in enumerate(b.names):
                    stem = pathlib.Path(name).stem
                    n = int(b.sample_lengths[i])
                    for s in range(2):
                        # scale-preserving write: BSS-eval images SDR compares
                        # est to ref with NO gain allowed, so peak-normalizing
                        # here would turn the SDR column into a measurement of
                        # the sources' natural peak levels (SI-SDR is immune)
                        clipped_total += audiowrite(
                            est[i, s, :n], sep_dir / f"{stem}_s{s + 1}.wav", 8000, False
                        )
            if clipped_total:
                # hard int16 clipping is a nonlinearity that corrupts the SDR
                # and SI-SDR columns below — surface it instead of silently
                # reporting metrics of clipped audio
                print(
                    json.dumps({"warning": "clipped_samples", "count": clipped_total}),
                    flush=True,
                )
            wait_for_pending_writes()
            si = eval_si_sdr(FIXTURE, sep_dir)
            sdr = eval_sdr(FIXTURE, sep_dir)
            print(
                json.dumps(
                    {
                        "step": step,
                        "neg_si_sdr_loss": float(loss),
                        "si_sdr_db": round(si, 4),
                        "sdr_db": round(sdr, 4),
                        "wall_s": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
