"""Port of reference ``test/test_neighbor_sample.py`` + hetero/temporal
coverage."""

import jax.numpy as jnp

from pytorch_sparse_tpu import SparseTensor
from pytorch_sparse_tpu.sample import (
    hetero_neighbor_sample, hetero_temporal_neighbor_sample, neighbor_sample,
)


def test_neighbor_sample():
    adj = SparseTensor.from_edge_index(jnp.array([[0], [1]]))
    colptr, row, _ = adj.csc()

    # Sampling in a non-directed way should not sample in wrong direction:
    out = neighbor_sample(colptr, row, jnp.array([0]), [1], False, False)
    assert out[0].tolist() == [0]
    assert out[1].tolist() == []
    assert out[2].tolist() == []

    out = neighbor_sample(colptr, row, jnp.array([1]), [1], False, False)
    assert out[0].tolist() == [1, 0]
    assert out[1].tolist() == [1]
    assert out[2].tolist() == [0]

    # More hops don't revisit:
    out = neighbor_sample(colptr, row, jnp.array([1]), [1, 1], False, False)
    assert out[0].tolist() == [1, 0]
    assert out[1].tolist() == [1]
    assert out[2].tolist() == [0]


def test_neighbor_sample_seed():
    colptr = jnp.array([0, 3, 6, 9])
    row = jnp.array([0, 1, 2, 0, 1, 2, 0, 1, 2])
    input_nodes = jnp.array([0, 1])

    out1 = neighbor_sample(colptr, row, input_nodes, [1, 1], True, False,
                           seed=42)
    out2 = neighbor_sample(colptr, row, input_nodes, [1, 1], True, False,
                           seed=42)
    for data1, data2 in zip(out1, out2):
        assert data1.tolist() == data2.tolist()


def _hetero_graph():
    # paper -> author edges ('author__writes__paper': colptr over paper)
    colptr = {"author__writes__paper": jnp.array([0, 2, 3])}
    row = {"author__writes__paper": jnp.array([0, 1, 1])}
    return colptr, row


def test_hetero_neighbor_sample():
    colptr, row = _hetero_graph()
    nodes, rows, cols, edges = hetero_neighbor_sample(
        node_types=["paper", "author"],
        edge_types=[("author", "writes", "paper")],
        colptr_dict=colptr,
        row_dict=row,
        input_node_dict={"paper": jnp.array([0])},
        num_neighbors_dict={"author__writes__paper": [-1]},
        num_hops=1,
        directed=True,
        seed=0,
    )
    assert nodes["paper"].tolist() == [0]
    assert nodes["author"].tolist() == [0, 1]
    assert rows["author__writes__paper"].tolist() == [0, 1]
    assert cols["author__writes__paper"].tolist() == [0, 0]
    assert edges["author__writes__paper"].tolist() == [0, 1]


def test_hetero_temporal_neighbor_sample():
    colptr, row = _hetero_graph()
    # author 1 is "in the future" of paper 0 -> must be excluded
    nodes, rows, cols, edges = hetero_temporal_neighbor_sample(
        node_types=["paper", "author"],
        edge_types=[("author", "writes", "paper")],
        colptr_dict=colptr,
        row_dict=row,
        input_node_dict={"paper": jnp.array([0])},
        num_neighbors_dict={"author__writes__paper": [-1]},
        node_time_dict={
            "paper": jnp.array([5, 5]),
            "author": jnp.array([3, 9]),
        },
        num_hops=1,
        seed=0,
    )
    assert nodes["author"].tolist() == [0]
    assert rows["author__writes__paper"].tolist() == [0]
