"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initialises its backends, which conftest
guarantees since pytest imports it before any test module.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize may have force-registered a TPU plugin and
# pinned jax_platforms before this file runs; override it back to CPU.
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")
FIXTURE_ROOT = REFERENCE_ROOT / "mycode" / "wsj0_2mix" / "use_this"


@pytest.fixture(scope="session")
def fixture_root(tmp_path_factory) -> pathlib.Path:
    if FIXTURE_ROOT.exists():
        return FIXTURE_ROOT
    # no reference checkout: generate the synthetic equivalent
    from speech_separation_tpu.data.fixture import make_synthetic_fixture

    return make_synthetic_fixture(tmp_path_factory.mktemp("synthetic_fixture"))


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference checkout not available")
    return REFERENCE_ROOT
