"""The driver's entry points must compile and run."""

import sys

import jax
import numpy as np
import pytest


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2708, 7)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
