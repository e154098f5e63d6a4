"""Pod-scale program health (VERDICT r4 item 2): the rolled ring/halo
programs must compile within budget at P=16 with ~O(1) program size in
P.  Runs ``tools/dryrun_scale.py`` in a SUBPROCESS because this test
process's backend is pinned to 8 virtual devices by conftest."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_scale_p16():
    env = dict(os.environ)
    # the child must pick its own device count
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "dryrun_scale.py"),
         "--devices", "8", "16", "--budget-s", "300",
         "--mb", "256", "--feat", "16"],
        capture_output=True, text=True, timeout=900, env=env, cwd=_REPO,
    )
    assert proc.returncode == 0, (
        f"dryrun_scale failed:\n{proc.stdout}\n{proc.stderr}"
    )
    lines = [json.loads(ln) for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    verdict = lines[-1]
    assert verdict["ok"] is True
    # O(1) program size in P: the rolled scan ring must not replicate
    # its body per shard (the old unroll=True form roughly doubled
    # going 8 -> 16).
    assert verdict["hlo_growth"]["ring"] <= 1.3, verdict
