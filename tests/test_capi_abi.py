"""The loadable C ABI (native/libisle_trainer.so): a plain-C host drives
CreateTrainer/feedData/finalizeData/Train/GetBasicModel via dlopen with no
Python of its own (reference drivers/trainer_export.cpp:31-99). The smoke
binary is pure C; the embedded interpreter is pinned to the CPU backend
through ISLE_CAPI_BOOTSTRAP."""

import os
import subprocess
import sys
import sysconfig

import pytest

NATIVE = os.path.join(os.path.dirname(__file__), "..", "native")
SMOKE = os.path.abspath(os.path.join(NATIVE, "capi_smoke"))
LIB = os.path.abspath(os.path.join(NATIVE, "libisle_trainer.so"))


def _env():
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    site = sysconfig.get_paths()["purelib"]
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{repo}:{site}"
    env["ISLE_CAPI_BOOTSTRAP"] = (
        'import jax; jax.config.update("jax_platforms", "cpu")'
    )
    return env


@pytest.mark.skipif(
    not (os.path.exists(SMOKE) and os.path.exists(LIB)),
    reason="native C ABI not built (make -C native)",
)
def test_capi_smoke_from_c_host():
    out = subprocess.run(
        [SMOKE, LIB], env=_env(), capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, out.stderr + out.stdout
    assert "CAPI SMOKE OK" in out.stdout


@pytest.mark.skipif(
    not (os.path.exists(SMOKE) and os.path.exists(LIB)),
    reason="native C ABI not built (make -C native)",
)
def test_capi_smoke_with_edge_topics():
    env = _env()
    env["ISLE_CAPI_EDGE_TOPICS"] = "6"
    out = subprocess.run(
        [SMOKE, LIB], env=env, capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, out.stderr + out.stdout
    assert "CAPI SMOKE OK" in out.stdout
    edges = int(out.stdout.split()[-3])
    assert edges > 0
