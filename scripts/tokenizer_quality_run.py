"""Tokenizer codec (t3tok) quality run on the fixture.

Trains the skip-free VqVaeT3Tok codec (both VQ levels quantized — codes
fully determine reconstruction) on `tr` s1 per the reference's t3 protocol
(`_t3 cell 25`), reports reconstruction SI-SDR from the forward pass AND
from codes alone, then saves a CLI-compatible checkpoint so `prior-train`,
`prior-sample`, `codec-encode` and `codec-decode` can consume it.

Usage: python scripts/tokenizer_quality_run.py OUT_DIR [STEPS] [SKIP_PQ]
"""

import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from speech_separation_tpu import data, tokenizer, train
from speech_separation_tpu.losses import si_sdr, summed_squared_error
from speech_separation_tpu.models import VqVaeT3Tok
from speech_separation_tpu.utils import VaeTrainConfig, save_config

FIXTURE = pathlib.Path("/root/reference/mycode/wsj0_2mix/use_this")
OUT = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else pathlib.Path("/tmp/tokenizer_run")
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
SKIP_PQ = int(sys.argv[3]) if len(sys.argv) > 3 else 2
EVAL_EVERY = 500


def main():
    cfg = VaeTrainConfig(
        data_root=str(FIXTURE),
        variant="t3tok",
        checkpoint_dir=str(OUT / "codec"),
        skip_pq=SKIP_PQ,
        seed=42,
    )
    loader = data.VaeLoader(FIXTURE / "tr", batch_size=4, stacked=True, stride_alignment=8)
    batch = next(iter(loader))
    x = jnp.asarray(batch.inputs)
    targets = jnp.asarray(batch.targets)
    lengths = np.asarray(batch.lengths)

    model = VqVaeT3Tok(
        embedding_dim=cfg.embedding_dim,
        num_embeddings=cfg.num_embeddings,
        skip_embeddings=cfg.skip_embeddings,
        deep_depth=cfg.deep_depth,
        skip_depth=cfg.skip_depth,
        skip_pq=cfg.skip_pq,
    )
    rng = jax.random.key(cfg.seed)
    params = model.init(rng, jnp.zeros((1, 16, 40)))["params"]
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    state = train.TrainState.create(model.apply, params, train.nadam(cfg.learning_rate), rng)

    def loss_flat(preds, t):
        return summed_squared_error(preds.reshape(preds.shape[0], -1, 1), t)

    train_step, eval_step = train.make_vae_steps(model, loss_flat)

    def recon_scores(preds):
        flat = np.asarray(preds).reshape(preds.shape[0], -1)
        tgt = np.asarray(targets)[..., 0]
        return [
            float(si_sdr(jnp.asarray(flat[i : i + 1, : lengths[i]]),
                         jnp.asarray(tgt[i : i + 1, : lengths[i]]))[0])
            for i in range(flat.shape[0])
        ]

    t0 = time.time()
    for step in range(1, STEPS + 1):
        state, loss, recon = train_step(state, x, targets)
        if step % EVAL_EVERY == 0 or step == STEPS:
            _, _, preds = eval_step(state, x, targets)
            print(
                json.dumps(
                    {
                        "step": step,
                        "loss": float(loss),
                        "recon_si_sdr_db": round(float(np.mean(recon_scores(preds))), 3),
                        "wall_s": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )

    # reconstruction from codes ALONE (the tokenizer property under test)
    deep, skip = model.apply({"params": state.params}, x, method=VqVaeT3Tok.codes)
    from_codes = model.apply(
        {"params": state.params}, deep, skip, method=VqVaeT3Tok.decode_codes
    )
    codes_scores = recon_scores(from_codes)

    OUT.mkdir(parents=True, exist_ok=True)
    ckpt = train.CheckpointManager(OUT / "codec")
    ckpt.save_if_best(int(np.asarray(state.step)), jax.device_get(state), 0.0)
    ckpt.close()
    save_config(cfg, OUT / "codec" / "train_config.json")

    summary = {
        "params": int(n_params),
        "steps": STEPS,
        "recon_from_codes_si_sdr_db": round(float(np.mean(codes_scores)), 3),
        "deep_codebook": tokenizer.code_metrics(np.asarray(deep), cfg.num_embeddings),
        "skip_codebook": tokenizer.code_metrics(np.asarray(skip), cfg.skip_embeddings),
        "train_wall_s": round(time.time() - t0, 1),
        "checkpoint": str(OUT / "codec"),
    }
    (OUT / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
