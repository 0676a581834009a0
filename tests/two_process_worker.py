"""Worker for the 2-process jax.distributed test (VERDICT round-1 item 10).

Each process owns 4 virtual CPU devices; together they form the same
8-device mesh the single-process suite uses. Run as:

    python tests/two_process_worker.py PROCESS_ID NUM_PROCESSES PORT

Prints one JSON line with the post-step loss (identical across processes —
the loss is replicated, so agreement with the single-process value proves
the cross-process collective path).
"""

import json
import os
import sys

PROC_ID = int(sys.argv[1]) if len(sys.argv) > 1 else 0
NPROC = int(sys.argv[2]) if len(sys.argv) > 2 else 1
PORT = sys.argv[3] if len(sys.argv) > 3 else "0"

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
# keep the axon TPU plugin out of this process
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speech_separation_tpu import parallel, train  # noqa: E402
from speech_separation_tpu.models import UPitBlstm  # noqa: E402
from speech_separation_tpu.ops import stft_frame_count  # noqa: E402


def main():
    if NPROC > 1:
        parallel.initialize_distributed(f"localhost:{PORT}", NPROC, PROC_ID)

    mesh = parallel.make_mesh()  # every (global) device on the data axis
    model = UPitBlstm(input_size=129, output_size=129, hidden=8, num_layers=1)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 4, 129)))["params"]
    state = train.TrainState.create(
        model.apply, params, train.exponential_decay_adam(), rng
    )

    # replicate state onto the (possibly multi-process) mesh
    replicated = NamedSharding(mesh, P())

    def _replicate(x):
        if not hasattr(x, "shape"):
            return x
        if jnp.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            impl = jax.random.key_impl(x)
            raw = jax.make_array_from_callback(
                data.shape, replicated, lambda idx: data[idx]
            )
            return jax.random.wrap_key_data(raw, impl=impl)
        return jax.make_array_from_callback(
            np.shape(x), replicated, lambda idx: np.asarray(x)[idx]
        )

    state = jax.tree.map(_replicate, state)

    # deterministic global batch, assembled from per-process local shards
    gen = np.random.default_rng(0)
    sources = gen.standard_normal((8, 2, 4000)).astype(np.float32) * 0.1
    mix = sources.sum(axis=1)
    fl = np.full((8,), stft_frame_count(4000, 256, 128), dtype=np.int32)
    batch_sharding = NamedSharding(mesh, P("data"))

    def _global(arr):
        return jax.make_array_from_callback(arr.shape, batch_sharding, lambda idx: arr[idx])

    args = tuple(_global(a) for a in (mix, sources, fl))

    train_step, eval_step = train.make_upit_waveform_steps(model, donate_state=False)
    new_state, loss = train_step(state, *args)
    loss2 = eval_step(new_state, *args)
    print(
        json.dumps(
            {
                "process": jax.process_index(),
                "num_processes": jax.process_count(),
                "devices": len(jax.devices()),
                "local_devices": len(jax.local_devices()),
                "loss": float(loss),
                "loss_after": float(loss2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
