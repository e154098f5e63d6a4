"""HGT sampling tests (reference ``cpu/hgt_sample_cpu.cpp``)."""

import jax.numpy as jnp

from pytorch_sparse_tpu.sample import hgt_sample


def _bipartite():
    # 2 papers, 3 authors; author -> paper edges in CSC over paper
    colptr = {"author__writes__paper": jnp.array([0, 2, 3])}
    row = {"author__writes__paper": jnp.array([0, 1, 2])}
    return colptr, row


def test_hgt_sample_basic():
    colptr, row = _bipartite()
    nodes, rows, cols, edges = hgt_sample(
        colptr, row,
        input_node_dict={"paper": jnp.array([0, 1])},
        num_samples_dict={"author": [2], "paper": [0]},
        num_hops=1,
        seed=0,
    )
    assert nodes["paper"].tolist() == [0, 1]
    assert len(nodes["author"].tolist()) == 2
    rel = "author__writes__paper"
    # every returned edge connects sampled endpoints
    assert len(rows[rel].tolist()) == len(edges[rel].tolist())
    for r, c in zip(rows[rel].tolist(), cols[rel].tolist()):
        assert 0 <= r < len(nodes["author"])
        assert 0 <= c < len(nodes["paper"])


def test_hgt_sample_deterministic():
    colptr, row = _bipartite()
    out1 = hgt_sample(
        colptr, row, {"paper": jnp.array([0, 1])},
        {"author": [1], "paper": [0]}, 1, seed=11,
    )
    out2 = hgt_sample(
        colptr, row, {"paper": jnp.array([0, 1])},
        {"author": [1], "paper": [0]}, 1, seed=11,
    )
    assert out1[0]["author"].tolist() == out2[0]["author"].tolist()
