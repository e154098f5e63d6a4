"""relabel / relabel_one_hop tests (reference ``cpu/relabel_cpu.cpp``)."""

import jax.numpy as jnp

from pytorch_sparse_tpu.sample import relabel, relabel_one_hop


def test_relabel():
    col = jnp.array([5, 3, 9, 5, 7])
    idx = jnp.array([3, 5])
    out_col, n_id = relabel(col, idx)
    assert n_id.tolist() == [3, 5, 9, 7]
    assert out_col.tolist() == [1, 0, 2, 1, 3]


def test_relabel_one_hop():
    # graph: 0->{1,2}, 1->{0}, 2->{0,1}
    rowptr = jnp.array([0, 2, 3, 5])
    col = jnp.array([1, 2, 0, 0, 1])
    value = jnp.array([10.0, 20.0, 30.0, 40.0, 50.0])

    out_rowptr, out_col, out_value, n_id = relabel_one_hop(
        rowptr, col, value, jnp.array([2]), bipartite=True
    )
    assert n_id.tolist() == [2, 0, 1]
    assert out_rowptr.tolist() == [0, 2]
    assert out_col.tolist() == [1, 2]
    assert out_value.tolist() == [40.0, 50.0]

    out_rowptr, out_col, out_value, n_id = relabel_one_hop(
        rowptr, col, value, jnp.array([2]), bipartite=False
    )
    # rowptr padded with the total edge count for the appended nodes
    assert out_rowptr.tolist() == [0, 2, 2, 2]
