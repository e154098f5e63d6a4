"""The headline bench's correctness gate must catch regional faults.

Round-2 verdict (Weak #6): a head-only oracle slice would let a
wrong-but-mostly-right kernel (e.g. a bucket-boundary bug past row 256)
ship a headline number.  ``bench.oracle_check`` samples head + tail +
512 random rows; these tests plant exactly such regional faults and
assert the gate trips.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import bench
import pytorch_sparse_tpu as ts


@pytest.fixture(scope="module")
def graph():
    from pytorch_sparse_tpu.testing import community_graph

    M = 4096
    A = community_graph(M, 120_000, n_comm=8, seed=3)
    mat = jnp.asarray(
        np.random.RandomState(2).randn(M, 16).astype(np.float32)
    )
    out = ts.spmm_sum(A, mat)
    return A, mat, out, M


def test_gate_passes_on_correct_output(graph):
    A, mat, out, M = graph
    ok, err = bench.oracle_check(A, mat, out, M)
    assert ok and err < 2e-3


def test_gate_catches_midrange_fault(graph):
    """Corrupt a 5% row band starting past the head slice (the planted
    bucket-boundary fault of the verdict's self-test ask)."""
    A, mat, out, M = graph
    bad = np.asarray(out).copy()
    lo = 300
    hi = lo + M // 20
    bad[lo:hi] += 10.0 * (np.abs(bad).max() + 1.0)
    ok, err = bench.oracle_check(A, mat, jnp.asarray(bad), M)
    assert not ok


def test_gate_catches_tail_fault(graph):
    A, mat, out, M = graph
    bad = np.asarray(out).copy()
    bad[-7:] = 0.12345
    ok, _ = bench.oracle_check(A, mat, jnp.asarray(bad), M)
    assert not ok
