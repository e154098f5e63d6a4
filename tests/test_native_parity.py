"""Native C++ kernels and the pure-numpy fallbacks must agree exactly on
deterministic (full-neighborhood) sampling, where no RNG is drawn."""

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_sparse_tpu as ts
from pytorch_sparse_tpu.csrc import bindings


pytestmark = pytest.mark.skipif(
    not bindings.available(), reason="native library not built"
)


def _force_fallback(monkeypatch):
    monkeypatch.setattr(bindings, "available", lambda: False)


def _graph(M=60, E=300, seed=0):
    rng = np.random.RandomState(seed)
    return ts.SparseTensor(
        row=jnp.asarray(rng.randint(0, M, E)),
        col=jnp.asarray(rng.randint(0, M, E)),
        sparse_sizes=(M, M),
    ).coalesce("add")


def test_sample_adj_full_parity(monkeypatch):
    A = _graph()
    subset = jnp.asarray(np.arange(0, 30, 3))
    native = ts.sample_adj(A, subset, -1, False, seed=7)
    _force_fallback(monkeypatch)
    fallback = ts.sample_adj(A, subset, -1, False, seed=7)
    adj_n, nid_n = native
    adj_f, nid_f = fallback
    assert nid_n.tolist() == nid_f.tolist()
    assert adj_n.storage.rowptr().tolist() == adj_f.storage.rowptr().tolist()
    assert adj_n.storage.col().tolist() == adj_f.storage.col().tolist()


def test_ego_full_parity(monkeypatch):
    A = _graph()
    seeds = jnp.asarray([1, 5, 9])
    native = ts.ego_k_hop_sample_adj(A, seeds, 2, -1, seed=3)
    _force_fallback(monkeypatch)
    fallback = ts.ego_k_hop_sample_adj(A, seeds, 2, -1, seed=3)
    for a, b in zip(native[1:], fallback[1:]):
        assert a.tolist() == b.tolist()
    assert (
        native[0].storage.col().tolist() == fallback[0].storage.col().tolist()
    )


def test_saint_parity(monkeypatch):
    A = _graph()
    idx = jnp.asarray(np.arange(0, 40, 2))
    native = ts.saint_subgraph(A, idx)
    _force_fallback(monkeypatch)
    fallback = ts.saint_subgraph(A, idx)
    assert native[1].tolist() == fallback[1].tolist()
    assert (
        native[0].storage.row().tolist() == fallback[0].storage.row().tolist()
    )


def test_hetero_neighbor_full_parity(monkeypatch):
    rng = np.random.RandomState(1)
    N = {"x": 40, "y": 30}
    node_types = ["x", "y"]
    edge_types = [("x", "to", "y"), ("y", "to", "x")]
    colptr, rowd = {}, {}
    for (s, t, d) in edge_types:
        E = 150
        key = f"{s}__{t}__{d}"
        col = np.sort(rng.randint(0, N[d], E))
        cp = np.zeros(N[d] + 1, np.int64)
        np.add.at(cp, col + 1, 1)
        colptr[key] = jnp.asarray(np.cumsum(cp))
        rowd[key] = jnp.asarray(rng.randint(0, N[s], E))
    seeds = {"x": jnp.asarray([0, 3, 7])}
    nn = {k: [-1, -1] for k in colptr}

    native = ts.hetero_neighbor_sample(
        node_types, edge_types, colptr, rowd, seeds, nn,
        num_hops=2, replace=False, directed=True, seed=5,
    )
    _force_fallback(monkeypatch)
    fallback = ts.hetero_neighbor_sample(
        node_types, edge_types, colptr, rowd, seeds, nn,
        num_hops=2, replace=False, directed=True, seed=5,
    )
    for dn, df in zip(native, fallback):
        assert set(dn.keys()) == set(df.keys())
        for k in dn:
            assert dn[k].tolist() == df[k].tolist(), k


def test_hetero_temporal_full_parity(monkeypatch):
    rng = np.random.RandomState(2)
    N = {"x": 40, "y": 30}
    node_types = ["x", "y"]
    edge_types = [("x", "to", "y"), ("y", "to", "x")]
    colptr, rowd = {}, {}
    for (s, t, d) in edge_types:
        E = 150
        key = f"{s}__{t}__{d}"
        col = np.sort(rng.randint(0, N[d], E))
        cp = np.zeros(N[d] + 1, np.int64)
        np.add.at(cp, col + 1, 1)
        colptr[key] = jnp.asarray(np.cumsum(cp))
        rowd[key] = jnp.asarray(rng.randint(0, N[s], E))
    times = {nt: jnp.asarray(rng.randint(0, 10, N[nt])) for nt in node_types}
    seeds = {"x": jnp.asarray([0, 3, 7])}
    nn = {k: [-1, -1] for k in colptr}

    native = ts.hetero_temporal_neighbor_sample(
        node_types, edge_types, colptr, rowd, seeds, nn, times,
        num_hops=2, replace=False, directed=True, seed=5,
    )
    _force_fallback(monkeypatch)
    fallback = ts.hetero_temporal_neighbor_sample(
        node_types, edge_types, colptr, rowd, seeds, nn, times,
        num_hops=2, replace=False, directed=True, seed=5,
    )
    for dn, df in zip(native, fallback):
        for k in dn:
            assert dn[k].tolist() == df[k].tolist(), k
