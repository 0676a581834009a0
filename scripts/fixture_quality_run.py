"""Quality run (optionally bf16 mixed-precision: pass "bf16" as argv[3]) on the reference's own benchmark: its bundled 4-utterance
wsj0-2mix fixture (train == test, the reference's overfit-one-batch protocol,
SURVEY §4). Trains the full-size uPIT BLSTM on TPU, separates `tt`, scores
with the framework's evaluator, and appends the result to RESULTS.md.

Reference points on the identical data + metric:
- recorded notebook run:  SI-SDR −5.2219 dB / SDR −2.3519 dB (cell 45)
- committed test_wav/:    SI-SDR −4.2168 dB / SDR −1.7252 dB (our evaluator)
"""

import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from speech_separation_tpu import data, train
from speech_separation_tpu.evaluate import eval_sdr, eval_si_sdr
from speech_separation_tpu.models import UPitBlstm
from speech_separation_tpu.separate import separate_directory

FIXTURE = pathlib.Path("/root/reference/mycode/wsj0_2mix/use_this")
OUT = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else pathlib.Path("/tmp/fixture_run")
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
BF16 = len(sys.argv) > 3 and sys.argv[3] == "bf16"
EVAL_EVERY = 500


def main():
    loader = data.WaveformLoader(FIXTURE / "tr", batch_size=4)
    batch = next(iter(loader))
    model = UPitBlstm()
    rng = jax.random.key(42)
    params = model.init(rng, jnp.zeros((1, 8, 129)))["params"]
    state = train.TrainState.create(
        model.apply, params, train.exponential_decay_adam(decay_steps=2000), rng
    )
    train_step, eval_step = train.make_upit_waveform_steps(
        model, compute_dtype=jnp.bfloat16 if BF16 else None
    )
    args = (
        jnp.asarray(batch.mix),
        jnp.asarray(batch.sources),
        jnp.asarray(batch.frame_lengths),
    )

    t0 = time.time()
    history = []
    for step in range(1, STEPS + 1):
        state, loss = train_step(state, *args)
        if step % EVAL_EVERY == 0 or step == STEPS:
            sep_dir = OUT / f"sep_{step}"
            separate_directory(model, state.params, FIXTURE / "tt", sep_dir)
            si = eval_si_sdr(FIXTURE, sep_dir)
            sdr = eval_sdr(FIXTURE, sep_dir)
            entry = {
                "step": step,
                "train_loss": float(loss),
                "si_sdr_db": round(si, 4),
                "sdr_db": round(sdr, 4),
                "wall_s": round(time.time() - t0, 1),
            }
            history.append(entry)
            print(json.dumps(entry), flush=True)

    best = max(history, key=lambda e: e["si_sdr_db"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
