"""Multi-process distribution: 2 × 4-device CPU processes, one sharded step.

Exercises the only distribution code path the single-process suite can't:
``parallel.initialize_distributed`` → cross-process mesh → XLA collectives
over the process boundary. Loss parity with a single-process run of the
identical program proves the gradient all-reduce crossed processes correctly.
"""

import json
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = pathlib.Path(__file__).resolve().parent / "two_process_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, timeout: int = 300):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


@pytest.mark.slow
def test_two_process_step_matches_single_process():
    single = _run_workers(1)[0]
    assert single["devices"] == 4  # one process alone sees its 4 devices

    duo = _run_workers(2)
    for record in duo:
        assert record["num_processes"] == 2
        assert record["devices"] == 8 and record["local_devices"] == 4
    # replicated loss agrees across processes…
    np.testing.assert_allclose(duo[0]["loss"], duo[1]["loss"], rtol=1e-6)
    np.testing.assert_allclose(duo[0]["loss_after"], duo[1]["loss_after"], rtol=1e-6)
    # …and with the single-process value (the data is identical; only the
    # device/process topology differs)
    np.testing.assert_allclose(duo[0]["loss"], single["loss"], rtol=1e-4)
    np.testing.assert_allclose(duo[0]["loss_after"], single["loss_after"], rtol=1e-4)
    # training actually moved the loss
    assert duo[0]["loss_after"] < duo[0]["loss"]
