"""Smoke tests for the runnable examples (tiny sizes, forced CPU)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {
    **os.environ,
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def _run(*args):
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, env=ENV,
        capture_output=True, text=True, timeout=420,
    )


@pytest.mark.parametrize("extra", [[], ["--distributed"]])
def test_train_gcn(extra):
    r = _run(
        "examples/train_gcn.py", "--epochs", "2", "--nodes", "128",
        "--edges", "600", "--features", "16", "--hidden", "8", *extra,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss=" in r.stdout


def test_train_sage_minibatch():
    r = _run(
        "examples/train_sage_minibatch.py", "--steps", "3", "--nodes",
        "400", "--edges", "3000", "--features", "16", "--hidden", "8",
        "--batch", "32", "--fanouts", "4", "3",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "minibatch SAGE" in r.stdout


def test_train_cluster_gcn():
    r = _run(
        "examples/train_cluster_gcn.py", "--epochs", "2", "--nodes", "300",
        "--edges", "2400", "--features", "16", "--hidden", "8",
        "--classes", "4", "--parts", "4",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "full-graph train accuracy" in r.stdout


def test_train_gat():
    r = _run(
        "examples/train_gat.py", "--epochs", "3", "--nodes", "200",
        "--edges", "1200", "--features", "16", "--hidden", "8",
        "--classes", "3", "--heads", "2",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "train accuracy" in r.stdout
