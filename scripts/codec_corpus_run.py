"""Tokenizer codec (t3tok) generalization at corpus scale.

Trains the skip-free RVQ/PQ codec with the full `fit` workflow on the
1,700-utterance synthetic corpus split (from `scripts/data_scale_run.py`),
then reports held-out `dev` reconstruction SI-SDR **from codes alone** —
the tokenizer property, measured off the training set (the fixture runs can
only show overfit capacity).

Usage: python scripts/codec_corpus_run.py [CORPUS_ROOT] [EPOCHS]
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

from speech_separation_tpu import data, train
from speech_separation_tpu.losses import si_sdr, summed_squared_error
from speech_separation_tpu.models import VqVaeT3Tok
from speech_separation_tpu.tokenizer import TokenLayout, code_metrics
from speech_separation_tpu.utils import MetricsLogger

PROFILE = os.environ.get("PROFILE", "easy")  # corpus difficulty regime
_default_root = "/tmp/data_scale/corpus" + ("" if PROFILE == "easy" else f"_{PROFILE}")
ROOT = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else pathlib.Path(_default_root)
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
BAND = ROOT / "wav8k" / "min"
OUT = pathlib.Path("/tmp/codec_corpus" + ("" if PROFILE == "easy" else f"_{PROFILE}"))


def main():
    if not ROOT.exists():
        import time as _time

        from speech_separation_tpu.data import make_synthetic_librimix

        t_gen = _time.time()
        make_synthetic_librimix(
            ROOT,
            utterances={"dev": 50, "test": 50, "train-100": 200, "train-360": 1700},
            min_seconds=2.0,
            max_seconds=6.0,
            profile=PROFILE,
        )
        print(json.dumps({"stage": "corpus_gen", "profile": PROFILE,
                          "wall_s": round(_time.time() - t_gen, 1)}), flush=True)
    model = VqVaeT3Tok(skip_pq=4)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 16, 40)))["params"]
    state = train.TrainState.create(model.apply, params, train.nadam(1e-3), rng)

    def loss_flat(preds, t):
        return summed_squared_error(preds.reshape(preds.shape[0], -1, 1), t)

    train_step, eval_step = train.make_vae_steps(model, loss_flat)

    make_loader = lambda split, shuffle: data.VaeLoader(
        BAND / split,
        source="s1",
        batch_size=8,
        stacked=True,
        stride_alignment=8,
        shuffle=shuffle,
        seed=0,
    )
    OUT.mkdir(parents=True, exist_ok=True)
    logger = MetricsLogger(OUT / "metrics.jsonl")
    t0 = time.time()
    result = train.fit(
        state,
        train_step,
        eval_step,
        make_loader("train-360", True),
        make_loader("dev", False),
        lambda b: (jnp.asarray(b.inputs), jnp.asarray(b.targets)),
        epochs=EPOCHS,
        metrics=logger,
    )
    logger.close()
    train_s = time.time() - t0

    # held-out reconstruction from codes alone
    @jax.jit
    def decode_from_codes(params, frames):
        deep, skip = model.apply({"params": params}, frames, method=VqVaeT3Tok.codes)
        return model.apply({"params": params}, deep, skip, method=VqVaeT3Tok.decode_codes), deep, skip

    scores = []
    all_deep, all_skip = [], []
    for batch in make_loader("dev", False):
        recon, deep, skip = decode_from_codes(result.state.params, jnp.asarray(batch.inputs))
        flat = np.asarray(recon).reshape(recon.shape[0], -1)
        tgt = np.asarray(batch.targets)[..., 0]
        for i, n in enumerate(np.asarray(batch.lengths)):
            scores.append(
                float(si_sdr(jnp.asarray(flat[i : i + 1, :n]), jnp.asarray(tgt[i : i + 1, :n]))[0])
            )
        all_deep.append(np.asarray(deep).reshape(-1))
        all_skip.append(np.asarray(skip).reshape(-1))

    layout = TokenLayout.for_codec(model)
    summary = {
        "corpus_profile": PROFILE,
        "epochs": EPOCHS,
        "train_utterances": 1700,
        "history_val_loss": [round(x, 3) for x in result.history["val_loss"]],
        "train_wall_s": round(train_s, 1),
        "heldout_dev_recon_from_codes_si_sdr_db": round(float(np.mean(scores)), 3),
        "tokens_per_second_of_audio": 25 * layout.group,
        "deep_codebook": code_metrics(np.concatenate(all_deep), model.num_embeddings),
        "skip_codebook": code_metrics(np.concatenate(all_skip), model.skip_embeddings),
    }
    (OUT / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
