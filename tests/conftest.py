"""Pytest configuration.

* Forces an 8-device virtual CPU platform to exist alongside any real TPU,
  so sharding tests always have a mesh (`jax.devices("cpu")`).
* Heavy conformance/device suites run only when a TPU backend is present
  (or when GOETHKZG_FORCE_HEAVY=1); the 1-core CPU fallback would take
  hours for the 4096-point kernels.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import glob

import pytest
import yaml

VECTOR_ROOT = os.path.join(os.path.dirname(__file__), "vectors")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "heavy: needs a TPU (or GOETHKZG_FORCE_HEAVY=1)")


def has_accelerator() -> bool:
    if os.environ.get("GOETHKZG_FORCE_HEAVY") == "1":
        return True
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # CPU-only run requested: skip the backend probe entirely — when the
        # axon TPU tunnel is down, default_backend() retries for ~25 min
        # before failing, which would stall every CPU-only test run.
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if has_accelerator():
        return
    skip = pytest.mark.skip(
        reason="heavy kernels need a TPU; set GOETHKZG_FORCE_HEAVY=1 to force")
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)


def load_vectors(op: str):
    files = sorted(glob.glob(f"{VECTOR_ROOT}/{op}/*/*/data.yaml"))
    out = []
    for f in files:
        d = yaml.safe_load(open(f))
        out.append((f.split(os.sep)[-2], d["input"], d["output"]))
    return out


@pytest.fixture(scope="session")
def ctx():
    from goethkzg_tpu.api import new_context_4096_secure
    return new_context_4096_secure()
