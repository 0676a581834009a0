"""Outage-proofing tests for the driver entry points.

Round-3 post-mortem: ``dryrun_multichip`` hung forever because
``_ensure_virtual_cpu_mesh`` queried ``jax.devices()`` before forcing the
CPU platform, which initialized the axon TPU plugin while the relay was
down (MULTICHIP_r03.json rc=124). These tests pin the invariant that the
CPU-only entry points never touch the default (TPU) backend.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(**overrides):
    env = dict(os.environ)
    # drop the conftest-forced CPU settings so the subprocess sees the
    # driver's real environment shape (JAX_PLATFORMS pinned to a TPU
    # backend), minus the actual axon plugin registration.
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize won't register axon
    env.update(overrides)
    return env


@pytest.mark.slow
def test_ensure_virtual_cpu_mesh_never_inits_tpu_backend():
    """Simulate the outage: JAX_PLATFORMS points at a backend that does not
    exist (like axon with the relay down, minus the hang). If the helper
    queries devices before forcing CPU, jax raises 'Backend ... is not in
    the list of known backends'; the fixed helper must succeed."""
    code = (
        "import __graft_entry__ as ge\n"
        "import jax\n"
        "ge._ensure_virtual_cpu_mesh(4)\n"
        "devs = jax.devices()\n"
        "assert len(devs) >= 4, devs\n"
        "assert all(d.platform == 'cpu' for d in devs), devs\n"
        "print('ok', len(devs))\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(JAX_PLATFORMS="axon"),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert "ok 4" in r.stdout


@pytest.mark.slow
def test_bench_emits_parseable_line_when_backend_unreachable():
    """bench.py must print one parseable JSON line (value 0.0, floor_ok
    false) when every backend probe fails, instead of hanging."""
    import json

    code = (
        "import bench\n"
        "import threading\n"
        "bench._EMITTED = threading.Event()\n"
        "bench._probe_backend = lambda **kw: False\n"
        "samples = {k: [] for k in bench.FLOORS}\n"
        "try:\n"
        "    bench._emit(samples, 'TPU backend unreachable after 3 probes', None)\n"
        "except SystemExit:\n"
        "    pass\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(JAX_PLATFORMS="axon"),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    line = r.stdout.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["metric"] == "separation_throughput"
    assert parsed["value"] == 0.0
    assert parsed["floor_ok"] is False
    assert "unreachable" in parsed["extra"]["error"]


def test_bench_partial_emit_keeps_measured_variants():
    """A mid-run stall must still produce a line carrying every variant
    measured so far, with floor_ok false because the run is incomplete."""
    import json

    import bench

    samples = {k: [] for k in bench.FLOORS}
    samples["blstm_bf16_x_realtime"] = [20000.0, 21000.0, 20500.0]
    samples["blstm_fp32_x_realtime"] = [15000.0]
    saved = bench._EMITTED
    bench._EMITTED = None  # direct-call mode: no event, no exit
    try:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench._emit(samples, "stalled >420s mid-run", None)
    finally:
        bench._EMITTED = saved
    parsed = json.loads(buf.getvalue().strip())
    assert parsed["value"] == 20500.0
    assert parsed["extra"]["blstm_fp32_x_realtime"] == 15000.0
    assert parsed["extra"]["complete"] is False
    assert parsed["floor_ok"] is False
    assert "stalled" in parsed["extra"]["error"]


@pytest.mark.parametrize("probe_ok", [True])
def test_probe_backend_subprocess_isolation(probe_ok, monkeypatch):
    """The probe runs in a subprocess so a hung init can't wedge bench
    itself; with the axon plugin registration disabled (sitecustomize keys
    off PALLAS_AXON_POOL_IPS) a cpu probe answers quickly."""
    import bench

    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert bench._probe_backend(attempts=1, probe_timeout_s=90.0) is probe_ok
