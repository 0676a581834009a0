"""Post-hoc CodePrior calibration from a (possibly mid-run) checkpoint.

`cli prior-train` writes its entropy-calibration summary only when the
training loop completes; a run killed by a round deadline or relay drop
strands the measurement even though the best-val checkpoint and per-epoch
metrics are already on disk (this is exactly how round 4 lost a finished
CPU run). This script reconstructs the SAME summary (reference lineage:
`Untitled.ipynb` cells 1-4 — the scratchpad this prior finishes) from:

  - the prior checkpoint dir (best-val params + prior_config.json),
  - the codec dir,
  - the data root (re-tokenises the val split; fast since encode_split's
    shape-quantised batching).

Usage: python scripts/prior_calibrate.py PRIOR_DIR [DATA_ROOT] [OUT_JSON]
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from speech_separation_tpu import data, train
from speech_separation_tpu.cli import _build_prior, _load_train_config, _restore_vae
from speech_separation_tpu.tokenizer import (
    TokenLayout,
    TokenWindowLoader,
    code_metrics,
    empirical_token_entropy,
    encode_split,
    make_prior_steps,
)
from speech_separation_tpu.utils import PriorTrainConfig

PRIOR_DIR = sys.argv[1]
DATA_ROOT = sys.argv[2] if len(sys.argv) > 2 else None
OUT = pathlib.Path(sys.argv[3]) if len(sys.argv) > 3 else pathlib.Path(PRIOR_DIR) / "summary.json"


def main():
    cfg = _load_train_config(PriorTrainConfig, PRIOR_DIR, "prior")
    codec_cfg, codec_model, codec_state = _restore_vae(cfg.codec_dir)
    layout = TokenLayout.for_codec(codec_model)
    seq_len = max(layout.group, cfg.seq_len // layout.group * layout.group)

    root = pathlib.Path(DATA_ROOT or cfg.data_root)
    loader = data.VaeLoader(
        root / cfg.val_split,
        source=cfg.source,
        batch_size=4,
        sample_rate=codec_cfg.sample_rate,
        stacked=True,
        stride_alignment=8,
    )
    val_tokens = encode_split(codec_model, codec_state.params, loader, seq_len, layout)

    model = _build_prior(cfg, layout.vocab)
    rng = __import__("jax").random.key(cfg.seed)
    params = model.init(rng, jnp.zeros((1, seq_len), jnp.int32))["params"]
    state = train.TrainState.create(model.apply, params, train.adam(cfg.learning_rate), rng)
    ckpt = train.CheckpointManager(PRIOR_DIR)
    state = ckpt.restore_params(state)
    ckpt.close()

    _, eval_step = make_prior_steps(model)
    losses, counts = [], []
    for batch in TokenWindowLoader(val_tokens, cfg.batch_size):
        loss = eval_step(state, jnp.asarray(batch))
        loss = loss[0] if isinstance(loss, tuple) else loss
        losses.append(float(loss) * batch.shape[0])
        counts.append(batch.shape[0])
    nats = float(np.sum(losses) / np.sum(counts))

    deep_stream, skip_stream = (np.asarray(s) for s in layout.deinterleave(val_tokens))
    entropy = empirical_token_entropy(val_tokens, layout)

    # best epoch bookkeeping from the on-disk metrics (fit writes per epoch)
    best_epoch, best_val = None, None
    metrics_path = pathlib.Path(PRIOR_DIR) / "metrics.jsonl"
    if metrics_path.exists():
        for line in metrics_path.read_text().splitlines():
            rec = json.loads(line)
            if "val_loss" in rec and (best_val is None or rec["val_loss"] < best_val):
                best_val, best_epoch = rec["val_loss"], rec.get("epoch")

    summary = {
        "best_val_loss": best_val,
        "best_epoch": best_epoch,
        "restored_ckpt_heldout_nats_per_token": round(nats, 4),
        "windows_val": int(val_tokens.shape[0]),
        "vocab": layout.vocab,
        "deep_codebook": code_metrics(deep_stream, codec_cfg.num_embeddings),
        "skip_codebook": code_metrics(skip_stream, codec_cfg.skip_embeddings),
        "prior_calibration": {
            "heldout_nats_per_token": round(nats, 4),
            "heldout_bits_per_token": round(nats / float(np.log(2.0)), 4),
            "heldout_perplexity": round(float(np.exp(nats)), 4),
            "unigram_positional_nats": entropy["positional_nats"],
            "unigram_marginal_nats": entropy["marginal_nats"],
            "context_gain_nats": round(entropy["positional_nats"] - nats, 4),
        },
    }
    OUT.write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
