"""End-to-end directory-serving wall time: fp32 vs int16 link transfer.

`separate_directory(transfer_int16=True)` ships int16 PCM up and fetches
device-quantized int16 estimates (2 speakers × utterance length — the fetch
is the bigger half). Interleaved A/B passes over the hard-corpus test split
with a randomly-initialized full-size BLSTM (throughput only; estimate
quality is irrelevant to the wire cost). Prints one JSON line.

Usage: [TRIALS=3] python scripts/serving_transfer_bench.py [CORPUS_ROOT]
"""

import json
import os
import pathlib
import statistics
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from speech_separation_tpu.models import UPitBlstm
from speech_separation_tpu.separate import separate_directory

ROOT = (
    pathlib.Path(sys.argv[1])
    if len(sys.argv) > 1
    else pathlib.Path("/tmp/data_scale/corpus_hard")
)
SPLIT = ROOT / "wav8k" / "min" / "test"
TRIALS = int(os.environ.get("TRIALS", "3"))


def main() -> None:
    model = UPitBlstm()
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 129)))["params"]

    def one_pass(int16: bool) -> float:
        with tempfile.TemporaryDirectory() as out:
            t0 = time.time()
            written = separate_directory(
                model,
                params,
                SPLIT,
                out,
                batch_size=16,
                compute_dtype=jnp.bfloat16,
                transfer_int16=int16,
            )
            wall = time.time() - t0
        assert written, "no estimates written"
        return wall

    for int16 in (False, True):  # compile both programs
        print(
            json.dumps(
                {"stage": "warmup", "int16": int16, "wall_s": round(one_pass(int16), 2)}
            ),
            flush=True,
        )
    walls: dict[bool, list[float]] = {False: [], True: []}
    for _ in range(TRIALS):
        for int16 in (False, True):
            wall = one_pass(int16)
            walls[int16].append(wall)
            print(
                json.dumps({"stage": "trial", "int16": int16, "wall_s": round(wall, 2)}),
                flush=True,
            )
    f32, i16 = statistics.median(walls[False]), statistics.median(walls[True])
    print(
        json.dumps(
            {
                "split": str(SPLIT),
                "trials": TRIALS,
                "fp32_wall_s": round(f32, 2),
                "int16_wall_s": round(i16, 2),
                "fp32_band_s": [round(min(walls[False]), 2), round(max(walls[False]), 2)],
                "int16_band_s": [round(min(walls[True]), 2), round(max(walls[True]), 2)],
                "speedup": round(f32 / i16, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
