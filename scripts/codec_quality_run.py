"""VQ-VAE t3 codec quality run on the fixture (reference protocol: train on
`tr` s1, validate on `cv`, report reconstruction SI-SDR — `_t3 cell 25`
reached 32.95 dB on its data)."""

import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from speech_separation_tpu import data, train
from speech_separation_tpu.losses import si_sdr, summed_squared_error
from speech_separation_tpu.models import VqVaeT3

FIXTURE = pathlib.Path("/root/reference/mycode/wsj0_2mix/use_this")
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
EVAL_EVERY = 500


def main():
    loader = data.VaeLoader(FIXTURE / "tr", batch_size=4, stacked=True, stride_alignment=8)
    batch = next(iter(loader))
    x = jnp.asarray(batch.inputs)
    targets = jnp.asarray(batch.targets)
    lengths = np.asarray(batch.lengths)

    model = VqVaeT3()
    rng = jax.random.key(42)
    params = model.init(rng, x)["params"]
    state = train.TrainState.create(model.apply, params, train.nadam(1e-3), rng)

    def loss_flat(preds, t):
        return summed_squared_error(preds.reshape(preds.shape[0], -1, 1), t)

    train_step, eval_step = train.make_vae_steps(model, loss_flat)

    t0 = time.time()
    for step in range(1, STEPS + 1):
        state, loss, recon = train_step(state, x, targets)
        if step % EVAL_EVERY == 0 or step == STEPS:
            _, _, preds = eval_step(state, x, targets)
            flat = np.asarray(preds).reshape(preds.shape[0], -1)
            tgt = np.asarray(targets)[..., 0]
            scores = [
                float(si_sdr(jnp.asarray(flat[i : i + 1, : lengths[i]]),
                             jnp.asarray(tgt[i : i + 1, : lengths[i]]))[0])
                for i in range(flat.shape[0])
            ]
            print(
                json.dumps(
                    {
                        "step": step,
                        "loss": float(loss),
                        "recon_si_sdr_db": round(float(np.mean(scores)), 3),
                        "wall_s": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
