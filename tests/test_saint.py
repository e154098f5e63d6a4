"""Port of reference ``test/test_saint.py`` + exactness checks."""

import jax.numpy as jnp
import numpy as np

from pytorch_sparse_tpu import SparseTensor


def test_saint_subgraph():
    row = jnp.array([0, 0, 1, 1, 2, 2, 2, 3, 3, 4])
    col = jnp.array([1, 2, 0, 2, 0, 1, 3, 2, 4, 3])
    adj = SparseTensor(row=row, col=col)
    node_idx = jnp.array([0, 1, 2])

    sub, edge_index = adj.saint_subgraph(node_idx)
    assert sub.sparse_sizes() == (3, 3)
    # induced edges among {0,1,2}: all except those touching 3/4
    dense = np.asarray(adj.set_value(jnp.ones(10)).to_dense())
    expected = dense[np.ix_([0, 1, 2], [0, 1, 2])]
    got = np.asarray(sub.set_value(jnp.ones(sub.nnz())).to_dense())
    assert np.array_equal(got, expected)


def test_saint_subgraph_permuted_idx():
    row = jnp.array([0, 0, 1, 1, 2, 2, 2, 3, 3, 4])
    col = jnp.array([1, 2, 0, 2, 0, 1, 3, 2, 4, 3])
    value = jnp.arange(10.0)
    adj = SparseTensor(row=row, col=col, value=value)

    sub, e_id = adj.saint_subgraph(jnp.array([2, 0, 4]))
    # relabeling follows node_idx position: 2->0, 0->1, 4->2
    r, c, v = sub.coo()
    dense = np.zeros((3, 3))
    dense[np.asarray(r), np.asarray(c)] = np.asarray(v)
    assert dense[0, 1] == 4.0  # edge (2,0) value 4
    assert dense[1, 0] == 1.0  # edge (0,2) value 1
