"""Port of reference ``test/test_metis.py`` (partition smoke matrix) plus
partition-quality sanity."""

from itertools import product

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sparse_tpu import SparseTensor


@pytest.mark.parametrize("weighted", [False, True])
def test_metis(weighted):
    rng = np.random.RandomState(0)
    mat1 = jnp.asarray(rng.randn(6, 6), jnp.float32)
    mat2 = jnp.arange(36, dtype=jnp.float32).reshape(6, 6)
    mat3 = jnp.ones((6, 6), jnp.float32)

    vec1 = None
    vec2 = jnp.asarray(rng.rand(6), jnp.float32)

    for mat, vec in product([mat1, mat2, mat3], [vec1, vec2]):
        sp = SparseTensor.from_dense(mat)

        _, partptr, perm = sp.partition(
            num_parts=1, recursive=False, weighted=weighted, node_weight=vec
        )
        assert partptr.shape[0] == 2
        assert perm.shape[0] == 6

        _, partptr, perm = sp.partition(
            num_parts=2, recursive=False, weighted=weighted, node_weight=vec
        )
        assert partptr.shape[0] == 3
        assert perm.shape[0] == 6


def test_partition_locality():
    """Two disconnected cliques must be split apart by a 2-way partition."""
    blocks = []
    for off in (0, 8):
        for i in range(8):
            for j in range(8):
                if i != j:
                    blocks.append((off + i, off + j))
    row = jnp.asarray(np.array([e[0] for e in blocks], np.int32))
    col = jnp.asarray(np.array([e[1] for e in blocks], np.int32))
    adj = SparseTensor(row=row, col=col, sparse_sizes=(16, 16))

    out, partptr, perm = adj.partition(num_parts=2)
    assert partptr.tolist() == [0, 8, 16]
    groups = [sorted(np.asarray(perm[:8]).tolist()),
              sorted(np.asarray(perm[8:]).tolist())]
    assert sorted(map(tuple, groups)) == [tuple(range(8)),
                                          tuple(range(8, 16))]

    # permuted adjacency must be block-diagonal: no cross-part edges
    r, c, _ = out.coo()
    assert not bool(((r < 8) & (c >= 8)).any())
    assert not bool(((r >= 8) & (c < 8)).any())
