"""Port of reference ``test/test_ego_sample.py`` (exact stitched ego-net)."""

import jax.numpy as jnp

from pytorch_sparse_tpu import SparseTensor
from pytorch_sparse_tpu.sample import ego_k_hop_sample_adj


def test_ego_k_hop_sample_adj():
    row = jnp.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 3, 4, 4, 5, 5])
    col = jnp.array([1, 2, 3, 0, 2, 0, 1, 4, 5, 0, 2, 5, 2, 4])
    adj = SparseTensor(row=row, col=col, sparse_sizes=(6, 6))

    nid = jnp.array([0, 1])
    out, n_id, e_id, ptr, root_n_id = ego_k_hop_sample_adj(
        adj, nid, depth=1, num_neighbors=3, replace=False, seed=0
    )

    assert n_id.tolist() == [0, 1, 2, 3, 0, 1, 2]
    rowptr = out.storage.rowptr()
    assert rowptr.tolist() == [0, 3, 5, 7, 8, 10, 12, 14]
    assert out.storage.col().tolist() == [
        1, 2, 3, 0, 2, 0, 1, 0, 5, 6, 4, 6, 4, 5]
    assert e_id.tolist() == [0, 1, 2, 3, 4, 5, 6, 9, 0, 1, 3, 4, 5, 6]
    assert ptr.tolist() == [0, 4, 7]
    assert root_n_id.tolist() == [0, 5]
